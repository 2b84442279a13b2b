"""Structured Streaming wrappers.

The reference has no streaming surface (SURVEY.md §2.8) and the north
rule is batch-with-checkpoint; these wrappers exist for pipelines that
tail a landing zone of span documents instead of re-running batch jobs.
"""

from .extract_stream import (  # noqa: F401
    extract_stream,
    run_extract_stream,
    stream_dedup_exact,
    stream_events_hourly,
    stream_sessionize,
)
