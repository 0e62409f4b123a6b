"""Structured Streaming operators (event streams)."""

from .events import (  # noqa: F401
    foreach_batch_upsert,
    latest_wins,
    read_events_stream,
    read_snapshot_as_of,
    run_available_now,
    streaming_dedup,
    streaming_enrich,
    streaming_interval_join,
    streaming_moment_stats,
    streaming_session_stats,
    streaming_sliding_counts,
    streaming_tumbling_counts,
)
from .metrics import MetricsRecorder, record_metrics  # noqa: F401
