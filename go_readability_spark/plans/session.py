"""SparkSession builder with the pipeline's tuned defaults.

Local-mode mirror of the production `spark-submit --py-files` launch
(SURVEY.md §3 Spark lifecycle). Every knob is set for the extraction
workload: Arrow batches sized for documents (not rows of scalars), AQE on,
shuffle partitions matched to core count at test scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "go-readability-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 256,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    - ``arrow_max_records=256``: an Arrow batch of average (~10 KiB) docs is
      a few MiB; giant docs are additionally isolated by skew_partitioned()
      so a batch never aggregates many multi-MiB documents (SURVEY.md §4.2).
    - AQE coalesces the small shuffles of metrics rollups; the extraction
      stage itself is map-side only (no shuffle after the repartition).
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(arrow_max_records),
        )
        # Columnar PARQUET READ batches need the same document-sized
        # bound as the Arrow transfer batches: at the default 4096 rows
        # per batch, a row group dense with multi-MiB span documents
        # asks the vectorized reader for >100 MB of contiguous column
        # buffer and the scan fails outright ("Cannot reserve additional
        # contiguous bytes") — first hit at the 600k-doc corpus (3,000
        # giants; SCALE.md §10). Measured trade (interleaved A/B):
        # 4096 fails that scan, 1024 OOMs the executor heap on it, 256
        # completes it and costs ~10-15% on the two most scan-heavy
        # narrow-row registry queries — robustness wins; a session doing
        # only narrow-row relational work can raise it back via conf.
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/gr_warehouse"),
        )
    )
    return builder.getOrCreate()
