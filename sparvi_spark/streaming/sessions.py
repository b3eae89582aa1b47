"""Streaming sessionization via Spark's native session windows.

The batch operator (`operators/sessions.py`) numbers sessions with
lag+running-sum windows; the streaming twin uses `F.session_window` —
Structured Streaming's built-in merging session state, which handles
late/out-of-order events up to the watermark and evicts closed sessions
from the state store automatically (state is O(open sessions), never
O(events)).

Semantics note: `session_window` merges an event into a session while
`event_ts < session_end (= last_ts + gap)`, i.e. it starts a new session
when the gap is >= `gap`; the batch operator starts one when the gap is
strictly > `gap`. The two disagree only for events exactly `gap` apart —
microsecond-resolution data makes that a measure-zero boundary (the
parity test runs both over the full events table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessions(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-(user, session) summaries, emitted when the watermark closes the
    session. Output: user, session_start, session_end (last event + gap),
    n_events, sum_value."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            "last_ts",
            "n_events",
        )
    )
