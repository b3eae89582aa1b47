"""Structured Streaming extension (SURVEY.md §7 phase 6).

The reference is batch-only — its "time series" are polled snapshots
(SURVEY §0). These operators give the same monitoring semantics over a live
stream: windowed row counts, windowed quality metrics, and freshness, all
with event-time watermarks so late data is bounded and state is pruned.
"""

from sparvi_spark.streaming.monitor import (
    events_stream,
    freshness,
    kafka_stream,
    parse_event_payload,
    stream_source,
    windowed_counts,
    windowed_quality,
)
from sparvi_spark.streaming.stateful import running_metrics
from sparvi_spark.streaming.dedup import (
    streaming_dedup_exact,
    streaming_dedup_fingerprint,
)
from sparvi_spark.streaming.detect import streaming_detection
from sparvi_spark.streaming.profile import streaming_incremental_profile
from sparvi_spark.streaming.sessions import streaming_sessions

__all__ = ["events_stream", "windowed_counts", "windowed_quality", "freshness",
           "stream_source", "kafka_stream", "parse_event_payload",
           "streaming_sessions",
           "running_metrics", "streaming_detection",
           "streaming_incremental_profile",
           "streaming_dedup_exact", "streaming_dedup_fingerprint"]
