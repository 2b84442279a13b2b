"""Local replica of the driver's correctness gate.

Runs every queries() entry at the given SF; for oracle-paired queries,
compares row count, column names, and order-insensitive values against
DuckDB (columns sorted by name, rows sorted, values normalized). For
rows-only queries, checks the query runs and reports the row count.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from go_readability_spark.plans.cache import persist_scope  # noqa: E402
from go_readability_spark.plans.session import get_spark  # noqa: E402
from go_readability_spark.queries import oracle_sql, queries  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "timestamp"):  # datetime
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    try:  # Decimal → float
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v


def compare(name, spark_df, con, sql) -> str:
    sdf = spark_df
    s_cols = sorted(sdf.columns)
    srows = sorted(
        tuple(_norm(row[c]) for c in s_cols) for row in sdf.collect()
    )
    rel = con.sql(sql)
    d_cols_raw = rel.columns
    order = sorted(range(len(d_cols_raw)), key=lambda i: d_cols_raw[i])
    d_cols = [d_cols_raw[i] for i in order]
    drows = sorted(
        tuple(_norm(r[i]) for i in order) for r in rel.fetchall()
    )
    if s_cols != d_cols:
        return f"SCHEMA MISMATCH spark={s_cols} duck={d_cols}"
    if len(srows) != len(drows):
        return f"ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}"
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            return f"VALUE MISMATCH at sorted row {i}:\n  spark={a}\n  duck ={b}"
    return f"OK ({len(srows)} rows)"


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    only = [a for a in args if "/" not in a]

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    try:
        # DuckDB >= 1.1 defaults ieee_floating_point_ops=true (double
        # x/0 -> inf/nan, not NULL). The oracle SQL no longer leans on
        # the old default (zero-norm cosine pins NULL via nullif,
        # queries._cos_pair), but pin the 1.0 semantics anyway so any
        # future oracle formula is version-stable. DuckDB 1.0 doesn't
        # know the setting — ignore the error there.
        con.sql("set ieee_floating_point_ops=false")
    except Exception:
        pass
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    from go_readability_spark.queries import GOLDEN_SF_BOUND

    qs, oracles = queries(), oracle_sql()
    at_golden_sf = sf_dir.rstrip("/").endswith("sf0.01")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            # scope per query (mirrors bench.py): operator persists and
            # localCheckpoint blocks are freed after each comparison —
            # without this, 34 queries' worth of persists accumulate in
            # one session and pressure memory at larger SFs
            with persist_scope(spark):
                df = fn(spark, sf_dir)
                if name in GOLDEN_SF_BOUND and not at_golden_sf:
                    # golden pinned at the driver's correctness SF
                    # (sf0.01); at other scales only a rows-only check
                    # is meaningful
                    verdict = (
                        f"rows-only ({df.count()} rows; golden is sf0.01-bound)"
                    )
                elif name in oracles:
                    verdict = compare(name, df, con, oracles[name])
                else:
                    verdict = f"rows-only ({df.count()} rows)"
        except Exception as exc:  # noqa: BLE001
            verdict = f"ERROR {type(exc).__name__}: {str(exc)[:300]}"
        status = "PASS" if verdict.startswith(("OK", "rows-only")) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"[{status}] {name}: {verdict}")
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
