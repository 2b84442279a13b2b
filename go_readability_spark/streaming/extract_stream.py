"""Streaming extraction over a landing zone of span documents.

``readStream`` (file source, same DOCUMENTS_SCHEMA parquet) →
the SAME mapInArrow extraction operator (mapInArrow/mapInPandas are
streaming-compatible: per-micro-batch, stateless) → parquet sink with a
Structured Streaming checkpoint. The checkpoint gives exactly-once file
processing and idempotent restart — the streaming analog of the batch
manifest in plans/checkpoint.py.

``stream_events_hourly`` demonstrates the watermark + event-time window
path on the events table (late data older than the watermark is
dropped; accumulating state is bounded).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import extract_documents
from ..schemas import DOCUMENTS_SCHEMA

__all__ = ["extract_stream", "run_extract_stream", "stream_events_hourly"]


def extract_stream(
    spark: SparkSession,
    input_path: str,
    options=None,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming DataFrame of extraction results over a parquet dir.

    The skew repartition is skipped (a micro-batch is already bounded;
    ``maxFilesPerTrigger`` bounds it further) — the per-doc size cap and
    error rows still apply inside the UDF."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    return extract_documents(stream, options=options, repartition=False)


def run_extract_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    options=None,
    available_now: bool = True,
):
    """Start (or resume, via the checkpoint) the streaming extraction.

    ``available_now=True`` processes the current backlog and stops —
    the batch-refresh pattern; ``False`` runs continuously."""
    out = extract_stream(spark, input_path, options)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events_hourly(
    spark: SparkSession,
    events_path: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time hourly rollup of the events stream.

    State for a window is dropped once the watermark passes its end, so
    long-running state is bounded; events later than the watermark are
    discarded (the documented late-data contract)."""
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        ).parquet(events_path)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("value_sum"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("hour_ts"),
            "event_type",
            "n_events",
            F.col("value_sum").cast("double").alias("value_sum"),
        )
    )
