"""Per-partition checkpointing with lineage + metrics; idempotent resume.

North-rule requirement: the 10^12-row job must checkpoint per Iceberg
partition and resume idempotently. Mechanics (SURVEY.md §4.2):

- work is keyed by a partition column ``part`` (in production: the Iceberg
  partition value, e.g. a crawl-date/bucket; here: an explicit column or
  ``pmod(xxhash64(doc_id), n_parts)``);
- a **manifest table** records one row per finished partition:
  (part, status, n_docs, n_errors, lineage_hash, finished_at). The lineage
  hash is order-insensitive (XOR of xxhash64(doc_id)) so reruns verify they
  processed the same input slice;
- resume = ``input LEFT ANTI JOIN manifest ON part`` — the manifest is tiny
  (one row per partition, ≤ tens of thousands at 10^12 docs), so the join
  side is **broadcast** and the anti-join costs one map-side probe, no
  shuffle of the input;
- output per partition is written with dynamic partition overwrite
  (parquet here, ``writeTo(...).overwritePartitions()`` on Iceberg), which
  makes a rerun of a half-written partition idempotent.

In this sandbox the manifest + output live in parquet directories; the
Iceberg calls are the same shape.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MANIFEST_SCHEMA",
    "with_part",
    "read_manifest",
    "resume_filter",
    "mark_partition_done",
    "run_checkpointed",
]

MANIFEST_SCHEMA = StructType(
    [
        StructField("part", LongType(), nullable=False),
        StructField("n_parts", LongType()),
        StructField("status", StringType()),
        StructField("n_docs", LongType()),
        StructField("n_errors", LongType()),
        StructField("total_bytes", LongType()),
        StructField("avg_prune_ratio", DoubleType()),
        StructField("lineage_hash", LongType()),
        StructField("finished_at", DoubleType()),
    ]
)


def with_part(df: DataFrame, n_parts: int, col: str = "doc_id") -> DataFrame:
    """Derive a stable partition key when the table has none."""
    return df.withColumn("part", F.pmod(F.xxhash64(F.col(col)), F.lit(n_parts)))


def read_manifest(spark: SparkSession, manifest_dir: str) -> DataFrame:
    if os.path.isdir(manifest_dir) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(manifest_dir) for f in fs
    ):
        return spark.read.parquet(manifest_dir)
    return spark.createDataFrame([], MANIFEST_SCHEMA)


def resume_filter(input_df: DataFrame, manifest: DataFrame) -> DataFrame:
    """Drop partitions already marked done — broadcast anti-join."""
    done = manifest.filter(F.col("status") == "done").select("part").distinct()
    return input_df.join(F.broadcast(done), "part", "left_anti")


def _lineage_and_counts(extracted_part: DataFrame) -> dict:
    row = extracted_part.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_errors"),
        F.sum("doc_bytes").alias("total_bytes"),
        F.avg("metrics.prune_ratio").alias("avg_prune_ratio"),
        # bit_xor: order-insensitive and overflow-free under ANSI mode
        # (doc_ids are unique, so XOR cancellation needs identical dupes)
        F.expr("bit_xor(xxhash64(doc_id))").alias("lineage_hash"),
    ).collect()[0]
    return row.asDict()


def mark_partition_done(
    spark: SparkSession, manifest_dir: str, part: int, stats: dict,
    n_parts: int = 0,
) -> None:
    row = {
        "part": int(part),
        "n_parts": int(n_parts),
        "status": "done",
        "n_docs": int(stats.get("n_docs") or 0),
        "n_errors": int(stats.get("n_errors") or 0),
        "total_bytes": int(stats.get("total_bytes") or 0),
        "avg_prune_ratio": float(stats.get("avg_prune_ratio") or 0.0),
        "lineage_hash": int(stats.get("lineage_hash") or 0),
        "finished_at": time.time(),
    }
    spark.createDataFrame([row], MANIFEST_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(manifest_dir)


def run_checkpointed(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str,
    manifest_dir: str,
    n_parts: int = 8,
    options=None,
    num_partitions: Optional[int] = None,
    concurrency: int = 1,
) -> DataFrame:
    """Extract ``documents`` partition-by-partition with checkpointing.

    Already-done partitions (per the manifest) are skipped via broadcast
    anti-join; each pending partition is extracted, written to its own
    hive-style ``part=N`` directory (full-directory overwrite — idempotent
    on rerun, exactly the guarantee Iceberg's ``overwritePartitions()``
    gives per partition), and marked done with lineage + metrics. Returns
    the full output DataFrame.

    ``concurrency > 1`` runs that many partitions as concurrent Spark
    jobs from a driver thread pool — the scheduler interleaves their
    stages, so at 10⁴ parts the pipeline is not serialized through one
    driver loop. Safe because (a) each part writes under its own output
    root, so the Hadoop committer's ``_temporary`` staging dirs never
    collide, and (b) manifest appends are tiny and serialized by a
    driver-side lock. Failed parts don't block the others; the first
    failure is re-raised after the pool drains (finished parts are in
    the manifest, so a rerun resumes past them).
    """
    from ..operators.extract import extract_documents

    manifest = read_manifest(spark, manifest_dir)
    # the part key is pmod(hash, n_parts): resuming with a DIFFERENT
    # n_parts would anti-join new-scheme part ids against old-scheme done
    # ids — silent loss AND duplication. Refuse instead.
    prior = [
        r["n_parts"]
        for r in manifest.select("n_parts").distinct().collect()
        if r["n_parts"]
    ]
    if prior and set(prior) != {n_parts}:
        raise ValueError(
            f"manifest at {manifest_dir} was written with n_parts={prior}; "
            f"resume must use the same value (got {n_parts})"
        )

    # persisted: the hash-derived part column prunes nothing at the scan,
    # so without this every per-part filter would rescan the full input
    parts_df = with_part(documents, n_parts).persist()
    try:
        pending = resume_filter(parts_df, manifest)
        pending_parts = [
            r["part"] for r in pending.select("part").distinct().collect()
        ]

        manifest_lock = threading.Lock()

        def process_part(part: int) -> None:
            slice_df = parts_df.filter(F.col("part") == part).drop("part")
            extracted = extract_documents(
                slice_df, options=options, num_partitions=num_partitions
            )
            part_dir = os.path.join(out_dir, f"part={int(part)}")
            extracted.write.mode("overwrite").parquet(part_dir)
            stats = _lineage_and_counts(spark.read.parquet(part_dir))
            with manifest_lock:
                mark_partition_done(
                    spark, manifest_dir, part, stats, n_parts=n_parts
                )

        if concurrency <= 1:
            for part in sorted(pending_parts):
                process_part(part)
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=concurrency) as pool:
                futures = {
                    part: pool.submit(process_part, part)
                    for part in sorted(pending_parts)
                }
            errors = [
                (part, f.exception())
                for part, f in futures.items()
                if f.exception() is not None
            ]
            if errors:
                part, exc = errors[0]
                raise RuntimeError(
                    f"{len(errors)} partition(s) failed; first: part={part}"
                ) from exc
    finally:
        parts_df.unpersist()

    if not os.path.isdir(out_dir):
        # nothing was ever written (empty input, or fully-done manifest
        # with a cleaned output dir): return an empty result, not a crash
        from ..schemas import EXTRACTED_SCHEMA

        schema = EXTRACTED_SCHEMA.add("part", LongType())
        return spark.createDataFrame([], schema)
    return spark.read.parquet(out_dir)
