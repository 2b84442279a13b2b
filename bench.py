"""Bench harness: extraction throughput + per-query timings.

Prints ONE JSON line:
  {"metric": "...", "value": <extraction wall sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extraction": {...}}

Env:
  SPARK_GRAFT_SF_DIR      input tables (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        local[] core count (default 32)
  SPARK_GRAFT_BENCH_DOCS  synthetic corpus size (default 6000)
  SPARK_GRAFT_BENCH_SKIP_QUERIES  "1" → only the extraction benchmark

The headline number is the synthetic-corpus extraction: N interleaved
span documents (every population, one giant per 200 docs for skew)
through the full pipeline — native doc_bytes pre-pass, salted size-aware
repartition, Arrow-batched extraction UDF, metrics rollup. Scaling
evidence across core counts is produced by tools/scaling_bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_bench = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "6000"))
    skip_queries = os.environ.get("SPARK_GRAFT_BENCH_SKIP_QUERIES") == "1"
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from go_readability_spark.operators.extract import (
        extract_documents,
        metrics_rollup,
    )
    from go_readability_spark.plans.session import get_spark
    from go_readability_spark.queries import queries
    from go_readability_spark.sources.tables import corpus_df

    spark = get_spark(app_name=f"bench-sf{sf}", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up JVM + Python workers so the headline number measures the
    # pipeline, not interpreter fork cost.
    extract_documents(corpus_df(spark, 32), num_partitions=cpus).count()

    # Materialize the corpus once (parquet, like the production Iceberg
    # scan) so the headline times scan → extract, not synthesis.
    corpus_path = f"/tmp/gr_bench_corpus_{n_bench}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_df(spark, n_bench, giant_every=200, num_partitions=cpus).write.mode(
            "overwrite"
        ).parquet(corpus_path)

    # --- headline: extraction throughput over the interleaved corpus ---
    corpus = spark.read.parquet(corpus_path)
    t0 = time.time()
    ext = extract_documents(corpus, num_partitions=cpus * 2)
    roll = metrics_rollup(ext).collect()
    extract_sec = time.time() - t0
    n_docs = sum(r["n_docs"] for r in roll)
    n_errors = sum(r["n_errors"] for r in roll)
    total_bytes = sum(r["total_bytes"] for r in roll)

    timings: dict[str, float] = {}
    if not skip_queries:
        for name, fn in queries().items():
            t = time.time()
            try:
                fn(spark, sf_dir).count()
                timings[name] = round(time.time() - t, 3)
            except Exception as exc:  # noqa: BLE001
                timings[name] = -1.0
                print(f"# query {name} failed: {exc}", file=sys.stderr)

    result = {
        "metric": "extraction_wall_sec",
        "value": round(extract_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extraction": {
            "n_docs": n_docs,
            "n_errors": n_errors,
            "total_mb": round(total_bytes / 1e6, 1),
            "docs_per_sec": round(n_docs / extract_sec, 1),
            "mb_per_sec": round(total_bytes / 1e6 / extract_sec, 2),
            "cpus": cpus,
        },
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
