"""Regenerate the extraction-family golden parquets (tests/golden/).

The readability extraction itself has no SQL form, so its registry
queries can't be verified by a DuckDB formula. Instead we pin their
exact output: each golden file is the query's result at the driver's
correctness scale (sf0.01), committed to the repo; the paired oracle in
queries.py is `select * from read_parquet('<golden>')`, which turns the
driver's rows/schema/hash comparison into a regression gate — any later
change to the parser, scorer, or span codec that shifts a single span
hash fails CORRECTNESS instead of passing rows-only.

The goldens are NOT independent ground truth (they are produced by this
repo's own extractor — the independent anchor is the reference fixture
001 parity test in tests/test_extract.py). Regenerate ONLY when an
intentional behavior change is made, and say so in the commit:

    python tools/make_goldens.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_SF_DIR = "/root/testdata/sf0.01"


def golden_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "golden",
    )


def main() -> None:
    from go_readability_spark.plans.session import get_spark
    # single source of truth: the generator list IS the oracle-
    # registration list, so the two can't drift
    from go_readability_spark.queries import GOLDEN_ORACLE_QUERIES, queries

    out_dir = golden_dir()
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="make-goldens", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in GOLDEN_ORACLE_QUERIES:
        df = qs[name](spark, GOLDEN_SF_DIR)
        with tempfile.TemporaryDirectory() as tmp:
            tgt = os.path.join(tmp, name)
            df.coalesce(1).write.mode("overwrite").parquet(tgt)
            part = glob.glob(os.path.join(tgt, "part-*.parquet"))[0]
            final = os.path.join(out_dir, f"{name}.parquet")
            shutil.copyfile(part, final)
        n = df.count()
        print(f"golden {name}: {n} rows -> {final}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
