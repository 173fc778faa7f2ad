"""Structured Streaming jobs (the reference's cron-batch + CDC hop, collapsed)."""

from batch_processing_pipeline_spark.streaming.jobs import (
    stream_query_log,
    tumbling_event_counts,
    sliding_event_counts,
    session_event_counts,
    run_autocomplete_stream,
)
from batch_processing_pipeline_spark.streaming.dedup import (
    dedup_within_watermark,
    run_dedup_stream,
)

__all__ = [
    "dedup_within_watermark",
    "run_dedup_stream",
    "stream_query_log",
    "tumbling_event_counts",
    "sliding_event_counts",
    "session_event_counts",
    "run_autocomplete_stream",
]
