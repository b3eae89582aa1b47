"""Join strategies for skewed keys (scale utilities).

AQE's skew-join splitting (on in session.py) handles most skew at runtime
for sort-merge joins. ``salted_join`` is the explicit fallback for the cases
AQE can't fix — aggregations-after-join on a hot key, or a skewed key joined
against a non-broadcastable mid-size table: the hot side's key space is
split into ``salt`` shards, the other side replicated per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted ``salt`` ways.

    ``skewed`` gets a random shard per row; ``other`` is exploded ×salt so
    every (key, shard) pair can meet. Shuffle keys become (key, shard) —
    a hot key's rows spread over ``salt`` tasks instead of one straggler.
    Cost: ``other`` is replicated ×salt, so keep salt × |other| modest
    (for larger dims prefer AQE; for small ones broadcast beats both).
    Only inner/left are salting-safe: right/full would emit one unmatched
    copy of a right row per shard.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if how in ("left_semi", "leftsemi"):
        raise ValueError("semi join does not need salting of the probe side")
    left = skewed.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int"))
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = left.join(right, [on, "__salt"], how)
    return out.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` per ``by`` key (inclusive, like DuckDB/kdb ASOF).

    Spark has no native as-of join; the scalable formulation is the
    union+window trick: tag both sides, union, and forward-fill right
    values over (by ORDER BY ts) — one shuffle on the key, no range
    self-join blowup. ``tolerance_seconds`` nulls out matches older than
    the window (pandas merge_asof semantics).

    Right side must be unique per (by, ts) — pre-aggregate it otherwise
    (equal-timestamp ties would be nondeterministic).
    """
    from pyspark.sql import Window

    value_cols = value_cols or [
        c for c in right.columns if c not in (by, ts_col)]
    # Fill ONE struct carrying the whole right row, never per-column:
    # per-column last(ignorenulls) would skip OVER a matched right row
    # whose value is NULL (returning a stale older value — DuckDB ASOF
    # returns the matched row's NULL) and could mix columns from
    # different right rows. The struct is non-null iff a right row
    # exists, so the fill always lands on the latest right ROW intact.
    rrow_type = ", ".join(
        [f"`{c}`:{dict(right.dtypes)[c]}" for c in value_cols]
        + [f"__rts:{dict(right.dtypes)[ts_col]}"])
    l_tag = left.withColumn("__src", F.lit(1)).withColumn(
        "__rrow", F.lit(None).cast(f"struct<{rrow_type}>"))
    r_tag = right.select(
        F.col(by), F.col(ts_col),
        F.struct(*[F.col(c) for c in value_cols],
                 F.col(ts_col).alias("__rts")).alias("__rrow"),
    ).withColumn("__src", F.lit(0))
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))
    # right rows (__src=0) sort before left rows at equal ts -> inclusive <=
    w = (Window.partitionBy(by).orderBy(F.col(ts_col).asc(), F.col("__src").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.withColumn(
        "__rrow", F.last("__rrow", ignorenulls=True).over(w))
    for c in value_cols:
        filled = filled.withColumn(f"__r_{c}", F.col(f"__rrow.{c}"))
    filled = filled.withColumn("__r_ts", F.col("__rrow.__rts"))
    out = filled.where(F.col("__src") == 1)
    if tolerance_seconds is not None:
        stale = (F.col(ts_col).cast("timestamp").cast("double")
                 - F.col("__r_ts").cast("timestamp").cast("double")) > tolerance_seconds
        for c in value_cols:
            out = out.withColumn(
                f"__r_{c}", F.when(stale, F.lit(None)).otherwise(F.col(f"__r_{c}")))
    renames = [F.col(c) for c in left.columns] + [
        F.col(f"__r_{c}").alias(f"right_{c}") for c in value_cols]
    return out.select(*renames)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join points into [lo, hi] intervals (inclusive both ends) without a
    nested-loop cross product.

    Spark plans a bare non-equi join as BroadcastNestedLoopJoin (O(n·m)).
    The scale path buckets the number line at ``bucket_width``: each
    interval is exploded to the buckets it overlaps, each point maps to one
    bucket, and the equi-join on bucket prefilters candidates before the
    exact BETWEEN refine. Cost: O(points + Σ interval_span/width + matches).
    Pick width ≈ median interval length so intervals explode to O(1) buckets.
    """
    if how != "inner":
        raise ValueError("range_join currently supports inner joins")
    p = points.withColumn(
        "__b", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long"))
    iv = intervals.withColumn(
        "__b",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
            F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"))))
    joined = p.join(iv, "__b").where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
    return joined.drop("__b")


def broadcast_threshold_join(
    fact: DataFrame, dim: DataFrame, on: str, how: str = "left",
    force_broadcast: bool | None = None,
) -> DataFrame:
    """Join a fact to a dim, hinting broadcast only when ASKED
    (``force_broadcast=True``) or when the dim's plan-estimated size fits
    under the session's autoBroadcastJoinThreshold.

    An unconditional hint would be wrong: Spark honors explicit broadcast
    hints REGARDLESS of size — AQE does not demote user hints — so a
    mis-hinted 50 GB dim kills the job. Default (None) estimates from the
    optimized plan's statistics; when the estimate is unusably large or
    missing the join is left to the planner/AQE, which already broadcasts
    genuinely-small sides on its own."""
    if force_broadcast is None:
        try:
            est = (dim._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
            raw = dim.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10485760")
            # the conf accepts byte-unit strings ("10MB", "1g") — parse
            # with the same JVM helper Spark itself uses, so a unit-
            # suffixed setting doesn't throw here and silently disable
            # the size-based broadcast path forever
            jvm = dim.sparkSession._jvm
            thresh = int(
                jvm.org.apache.spark.network.util.JavaUtils
                .byteStringAsBytes(raw))
            # py4j maps the BigInt statistic to a plain int on Spark 4;
            # older versions hand back a Java object
            est_bytes = int(est.toString()) if hasattr(est, "toString") \
                else int(est)
            force_broadcast = 0 < thresh and est_bytes <= thresh
        except Exception:
            force_broadcast = False
    d = F.broadcast(dim) if force_broadcast else dim
    return fact.join(d, on, how)
