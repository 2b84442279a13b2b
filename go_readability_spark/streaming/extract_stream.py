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

__all__ = [
    "extract_stream",
    "run_extract_stream",
    "stream_events_hourly",
    "stream_sessionize",
]


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


_EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_sessionize(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom STATEFUL streaming operator: per-user sessionization via
    ``applyInPandasWithState`` (the semantics of the batch
    ``operators.relational.sessionize``, maintained incrementally).

    State per user = the open session (start, last event, count) as
    epoch-microseconds. Within a micro-batch, events are folded in
    event-time order; a gap > ``gap_minutes`` closes the session (row
    emitted immediately). The trailing open session is kept in state
    with an EVENT-TIME timeout at ``last + gap``: when the watermark
    passes it, the timed-out callback emits the closed session and
    clears the state — so state is bounded by the number of concurrently
    active users, never by history. Late events older than the watermark
    are dropped by the watermark operator upstream.

    Output rows: (user_id, session_start, session_end, n_events), one
    per CLOSED session (append mode — a session is final when emitted).
    """
    import pandas as pd  # local: executors import lazily

    gap_us = gap_minutes * 60 * 1_000_000

    def fold(key, pdf_iter, state):
        user_id = key[0]

        def row(start_us: int, end_us: int, n: int) -> "pd.DataFrame":
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield row(start_us, last_us, n)
            return

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = -1
            n = 0
        for pdf in pdf_iter:
            # datetime64[ns] -> epoch microseconds, event-time order
            ts_us = (pdf["ts"].astype("int64") // 1000).sort_values()
            for t in ts_us:
                t = int(t)
                if n == 0:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    yield row(start_us, last_us, n)
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = t, n + 1
        if n:
            state.update((start_us, last_us, n))
            # event-time timeout: fire when the watermark passes the
            # session's close boundary (milliseconds API)
            state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        else:
            state.remove()

    events = (
        spark.readStream.schema(_EVENTS_DDL)
        .parquet(events_path)
        .withWatermark("ts", watermark)
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=(
            "user_id long, session_start timestamp, "
            "session_end timestamp, n_events long"
        ),
        stateStructType="start long, last long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
