"""Structured Streaming jobs (the reference's cron-batch + CDC hop, collapsed)."""

from batch_processing_pipeline_spark.streaming.jobs import (
    stream_query_log,
    tumbling_event_counts,
    sliding_event_counts,
    session_event_counts,
    run_autocomplete_stream,
)

__all__ = [
    "stream_query_log",
    "tumbling_event_counts",
    "sliding_event_counts",
    "session_event_counts",
    "run_autocomplete_stream",
]
