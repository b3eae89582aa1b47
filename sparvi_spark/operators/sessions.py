"""Gap-based sessionization of event streams (training-pipeline extension).

The reference has no session concept (its "time series" are polled metric
snapshots — SURVEY.md §0), but any large-scale behavioral/training-data
pipeline needs it. Spark-first shape: ONE shuffle on the entity key, then
two window functions (lag + running sum) inside each partition — no UDFs,
no iteration, no driver involvement. At 100 TB the cost is exactly one
hash exchange of the events table; skew on a hot user is bounded by that
user's event count, not table size.

Gap arithmetic is integer microseconds (``unix_micros``) end-to-end so an
engine-independent oracle (DuckDB ``epoch_us``) reproduces session ids
bit-for-bit — float durations only appear in the final rounded output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    tiebreak_col: str | None = None,
    keep_epoch: bool = False,
) -> DataFrame:
    """Assign ``session_no`` (1-based per user) via the classic gap rule:
    a new session starts when the previous event is more than ``gap_minutes``
    older (strictly greater), or at the user's first event.

    Ordering within a user is (ts, tiebreak) so equal timestamps produce a
    deterministic numbering. The public output is the input plus
    ``session_no`` only; ``keep_epoch=True`` additionally keeps the
    internal ``__us`` epoch-micros column (session_stats reuses it for
    exact dwell arithmetic without a second timestamp conversion).
    """
    order: list[Column] = [F.col("__us")]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = int(gap_minutes * 60_000_000)
    return (
        df.withColumn("__us", F.unix_micros(F.col(ts_col).cast("timestamp")))
        .withColumn("__prev_us", F.lag("__us").over(w))
        .withColumn(
            "__new_s",
            F.when(
                F.col("__prev_us").isNull()
                | ((F.col("__us") - F.col("__prev_us")) > gap_us),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_no",
            F.sum("__new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .drop("__prev_us", "__new_s",
              *([] if keep_epoch else ["__us"]))
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-user session summary: session count, event count, largest
    session, and total in-session dwell time (exact integer microseconds —
    a float-seconds output would hit engine-dependent round() tie behavior).

    Two aggregations after the single sessionize shuffle; both reuse the
    (user) partitioning, so no additional exchange of the full table — the
    second groupBy is over the already-small per-session frame.
    """
    s = sessionize(df, user_col, ts_col, gap_minutes, tiebreak_col,
                   keep_epoch=True)
    per_session = s.groupBy(user_col, "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("__us") - F.min("__us")).alias("dur_us"),
    )
    return per_session.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
        F.sum("dur_us").alias("total_session_us"),
    )
