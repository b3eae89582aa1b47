"""Trend / rollup / analytics operators T1-T14 (SURVEY.md §2.E), Spark-first.

These run over state tables (profiles, validation results, historical
metrics, schema changes). The reference does them in SQL-over-Postgres or
Python loops; here each is a declarative DataFrame job: latest-per-key via
row_number windows (deterministic tiebreak — SURVEY §7.9), date spines via
``F.sequence`` + explode (broadcastable), daily groupBys with
count(when(...)) pivots.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: list[str], order_col: str, tiebreak: list[str] | None = None
) -> DataFrame:
    """Keep the newest row per key (ties broken deterministically).

    Reference pattern: ``ORDER BY run_at DESC LIMIT 1`` per rule
    (backend/app.py:4462-4471, 4556-4596).
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def date_spine(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Dense daily spine [start, end] (reference: generate_series,
    core/anomalies/api.py:590-594). Tiny — broadcast by the optimizer."""
    return spark.sql(
        f"SELECT explode(sequence(date '{start}', date '{end}', "
        f"interval 1 day)) AS day"
    )


def metric_trends(
    df: DataFrame, keys: list[str], order_col: str, value_col: str
) -> DataFrame:
    """T2 historical-trends pivot (app.py:4701-4750): per series ->
    current/min/max/first + percent & absolute change (last-first)."""
    w = Window.partitionBy(*keys).orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    first_v = F.first(value_col).over(w)
    last_v = F.last(value_col).over(w)
    per_row = df.select(
        *keys,
        F.count(F.lit(1)).over(w).alias("n_points"),
        F.min(value_col).over(w).alias("min_value"),
        F.max(value_col).over(w).alias("max_value"),
        first_v.alias("first_value"),
        last_v.alias("current_value"),
        (last_v - first_v).alias("absolute_change"),
        F.when(first_v != 0, F.round((last_v - first_v) * 100.0 / first_v, 4))
        .alias("percent_change"),
    )
    return per_row.dropDuplicates(keys)


def validation_daily_rollup(
    results: DataFrame,
    spark: SparkSession,
    start: str,
    end: str,
    rule_col: str = "rule_id",
    ts_col: str = "run_at",
    valid_col: str = "is_valid",
    total_rules: int | None = None,
) -> DataFrame:
    """T3 daily rollup (app.py:4425-4553): keep the LATEST result per rule
    per day, count passed/failed, densify over the full date range, and
    compute health = passed/(passed+failed)*100."""
    # tiebreak on the validity flag: two results for one rule at the SAME
    # timestamp (second-granularity re-runs) must not flip pass/fail
    # counts between executions of the same query
    daily = latest_per_key(
        results.withColumn("day", F.to_date(ts_col)),
        [rule_col, "day"], ts_col, tiebreak=[valid_col],
    )
    per_day = daily.groupBy("day").agg(
        F.count(F.when(F.col(valid_col), 1)).alias("passed"),
        F.count(F.when(~F.col(valid_col), 1)).alias("failed"),
        F.count(F.when(F.col(valid_col).isNull(), 1)).alias("errored"),
        F.count(F.lit(1)).alias("seen"),
    )
    spine = date_spine(spark, start, end)
    out = (
        spine.join(per_day, spine.day == per_day.day, "left")
        .select(
            spine.day,
            F.coalesce("passed", F.lit(0)).alias("passed"),
            F.coalesce("failed", F.lit(0)).alias("failed"),
            F.coalesce("errored", F.lit(0)).alias("errored"),
            F.coalesce("seen", F.lit(0)).alias("seen"),
        )
    )
    if total_rules is not None:
        out = out.withColumn("not_run", F.lit(total_rules) - F.col("seen"))
    return out.withColumn(
        "health_score",
        F.when(
            (F.col("passed") + F.col("failed")) > 0,
            F.round(F.col("passed") * 100.0 / (F.col("passed") + F.col("failed")), 2),
        ),
    )


def current_health_score(
    results: DataFrame,
    rule_col: str = "rule_id",
    ts_col: str = "run_at",
    valid_col: str = "is_valid",
) -> DataFrame:
    """T4 (app.py:4556-4596): latest result per rule -> overall health."""
    latest = latest_per_key(results, [rule_col], ts_col,
                            tiebreak=[valid_col])
    return latest.agg(
        F.count(F.when(F.col(valid_col), 1)).alias("passed"),
        F.count(F.when(~F.col(valid_col), 1)).alias("failed"),
    ).select(
        "passed", "failed",
        F.when((F.col("passed") + F.col("failed")) > 0,
               F.round(F.col("passed") * 100.0 / (F.col("passed") + F.col("failed")), 2))
        .alias("health_score"),
    )


def per_group_summary(
    results: DataFrame,
    group_col: str,
    rule_col: str = "rule_id",
    ts_col: str = "run_at",
    valid_col: str = "is_valid",
) -> DataFrame:
    """T5 per-table validation summary (routes/validations.py:100-206)."""
    latest = latest_per_key(results, [group_col, rule_col], ts_col,
                            tiebreak=[valid_col])
    return latest.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("total_rules"),
        F.count(F.when(F.col(valid_col), 1)).alias("passing"),
        F.count(F.when(~F.col(valid_col), 1)).alias("failing"),
        F.count(F.when(F.col(valid_col).isNull(), 1)).alias("unknown"),
        F.max(ts_col).alias("last_run"),
    ).withColumn(
        "health_score",
        F.when((F.col("passing") + F.col("failing")) > 0,
               F.round(F.col("passing") * 100.0 / (F.col("passing") + F.col("failing")), 2)),
    )


def dashboard_daily_metrics(
    df: DataFrame, ts_col: str, value_col: str, entity_col: str
) -> DataFrame:
    """T6 (app.py:5659-5845): daily mean value + distinct entities + volume."""
    return df.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.round(F.avg(value_col), 4).alias("avg_value"),
        F.countDistinct(entity_col).alias("n_entities"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def anomaly_summary(anomalies: DataFrame) -> DataFrame:
    """T7 (core/anomalies/api.py:356-488): counts by severity. (Per-table
    grouping lives in ``anomaly_top_tables``; this function deliberately
    has no table parameter.)"""
    return anomalies.groupBy("severity").agg(F.count(F.lit(1)).alias("cnt"))


def anomaly_top_tables(
    anomalies: DataFrame, table_col: str = "metric_name", k: int = 10
) -> DataFrame:
    """T7 top-K tables by anomaly count (deterministic tiebreak)."""
    counted = anomalies.groupBy(table_col).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc(table_col))
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k).drop("__rn")
    )


def anomaly_daily_trend(
    anomalies: DataFrame, spark: SparkSession, start: str, end: str,
    ts_col: str = "ts",
) -> DataFrame:
    """T8 (api.py:569-624): day spine LEFT JOIN daily severity-filtered counts."""
    daily = anomalies.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("severity") == "high", 1)).alias("high"),
        F.count(F.when(F.col("severity") == "medium", 1)).alias("medium"),
        F.count(F.when(F.col("severity") == "low", 1)).alias("low"),
    )
    spine = date_spine(spark, start, end)
    return spine.join(daily, spine.day == daily.day, "left").select(
        spine.day,
        F.coalesce("total", F.lit(0)).alias("total"),
        F.coalesce("high", F.lit(0)).alias("high"),
        F.coalesce("medium", F.lit(0)).alias("medium"),
        F.coalesce("low", F.lit(0)).alias("low"),
    )


def change_frequency(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    changed_col: Column | str = "change_detected",
) -> DataFrame:
    """T9 (core/metadata/change_analytics.py:80-177): per object,
    change_ratio = changes/checks bucketed high(>=0.5)/medium(>=0.1)/low,
    avg hours between changes (lag window), most recent change."""
    changed = F.col(changed_col) if isinstance(changed_col, str) else changed_col
    w = Window.partitionBy(*keys).orderBy(ts_col)
    gaps = (
        df.where(changed)
        .withColumn("__prev", F.lag(ts_col).over(w))
        .withColumn(
            "__gap_h",
            (F.col(ts_col).cast("timestamp").cast("double")
             - F.col("__prev").cast("timestamp").cast("double")) / 3600.0,
        )
    )
    gap_stats = gaps.groupBy(*keys).agg(
        F.round(F.avg("__gap_h"), 4).alias("avg_hours_between_changes"),
        F.max(ts_col).alias("last_change"),
    )
    totals = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("total_checks"),
        F.count(F.when(changed, 1)).alias("changes"),
    ).withColumn(
        "change_ratio",
        F.round(F.col("changes") * F.lit(1.0) / F.col("total_checks"), 4),
    ).withColumn(
        "frequency",
        F.when(F.col("change_ratio") >= 0.5, "high")
        .when(F.col("change_ratio") >= 0.1, "medium")
        .otherwise("low"),
    )
    return totals.join(gap_stats, keys, "left")


def high_impact_objects(
    freq: DataFrame, keys: list[str], min_changes: int = 5, k: int = 10
) -> DataFrame:
    """T10 (change_analytics.py:295-323): HAVING changes>=N, top-K by ratio
    (deterministic tiebreak on key)."""
    w = Window.orderBy(F.desc("change_ratio"), *[F.asc(c) for c in keys])
    return (
        freq.where(F.col("changes") >= min_changes)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def suggest_refresh_interval(
    frequency: str, current_interval_hours: float, avg_hours_between: float | None
) -> float:
    """T11 (change_analytics.py:179-271) heuristic, clamped to [1, 168] h."""
    if frequency == "high":
        suggestion = (
            avg_hours_between / 3 if avg_hours_between else current_interval_hours / 2
        )
    elif frequency == "low":
        suggestion = current_interval_hours * 2
    else:
        suggestion = current_interval_hours
    return max(1.0, min(168.0, suggestion))


def usage_patterns(
    log: DataFrame,
    entity_col: str = "table_name",
    ts_col: str = "detected_at",
    type_col: str | None = "event_type",
    as_of: str | None = None,
) -> DataFrame:
    """P16 usage patterns from an event log.

    The reference computes ``{access_count, last_accessed}`` per table by
    grepping Snowflake QUERY_HISTORY (collector.py:281-321) — warehouse
    introspection the survey scopes out. The engine derives the same shape
    from its OWN event log (``engine_events``) or any access log: ONE
    groupBy on the entity giving access_count, first/last access, distinct
    access types, and staleness hours against ``as_of``. At scale this is
    a keyed aggregation over a run_date-partitioned log — partial aggs
    map-side, no joins.
    """
    aggs = [
        F.count(F.lit(1)).alias("access_count"),
        F.min(ts_col).alias("first_accessed"),
        F.max(ts_col).alias("last_accessed"),
    ]
    if type_col is not None:
        aggs.append(F.count_distinct(F.col(type_col)).alias("n_access_types"))
    out = log.groupBy(F.col(entity_col)).agg(*aggs)
    if as_of is not None:
        # cast through TIMESTAMP first: the docstring promises "any access
        # log", and a string/date ts column cast straight to double is
        # NULL — the same two-step every other epoch-math helper uses
        out = out.withColumn(
            "hours_since_access",
            F.round((F.lit(as_of).cast("timestamp").cast("double")
                     - F.col("last_accessed").cast("timestamp")
                     .cast("double")) / 3600.0, 2))
    return out


def append_metrics(df: DataFrame, path: str) -> None:
    """T12 metric tracking: append-only series store
    (core/analytics/historical_metrics.py:28-163)."""
    df.write.mode("append").parquet(path)


def fetch_metric_history(
    metrics: DataFrame,
    metric_name: str | None = None,
    table_name: str | None = None,
    column_name: str | None = None,
    since: str | None = None,
    limit: int | None = None,
    ts_col: str = "timestamp",
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """T13 (historical_metrics.py:165-217): filter + order + limit.

    ``tiebreak`` columns make the LIMIT cutoff deterministic under equal
    timestamps (SURVEY §7.9 latest-per-key discipline).
    """
    out = metrics
    if metric_name is not None:
        out = out.where(F.col("metric_name") == metric_name)
    if table_name is not None:
        out = out.where(F.col("table_name") == table_name)
    if column_name is not None:
        out = out.where(F.col("column_name") == column_name)
    if since is not None:
        out = out.where(F.col(ts_col) >= F.lit(since).cast("timestamp"))
    out = out.orderBy(F.col(ts_col).desc(), *[F.col(c).desc() for c in tiebreak])
    if limit is not None:
        out = out.limit(limit)
    return out


def retain_latest(df: DataFrame, keys: list[str], order_col: str, n: int = 30) -> DataFrame:
    """T14 retention (supabase_manager.py:275-305): keep newest N per key."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def profile_trends(
    history: DataFrame,
    table_name: str,
    n: int = 30,
    ts_col: str = "collected_at",
) -> DataFrame:
    """T1 (supabase_manager.py:218-273): last-N profiles of one table as an
    ordered trend frame (row_counts, duplicate_counts, validation rates)."""
    recent = (
        history.where(F.col("table_name") == table_name)
        .orderBy(F.col(ts_col).desc())
        .limit(n)
    )
    return recent.orderBy(ts_col)


def incremental_time_rollup(
    state: DataFrame | None,
    new_events: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    width_seconds: int,
) -> DataFrame:
    """Continuous-aggregate maintenance (hypertable-style): fold a NEW batch
    of events into a (bucket, key) rollup WITHOUT rescanning history.

    count and the decimal value sum are associative partials, so merging is
    a re-aggregation of (old state ∪ fresh partials) — identical math to
    computing the rollup from scratch (test-asserted). At 100 TB: the fresh
    side scans only the new batch; the merge groupBy shuffles O(buckets ×
    keys) state rows, not events, and with bucket-partitioned state +
    partitionOverwriteMode=dynamic only touched bucket partitions rewrite.
    Exact decimal sums make the result independent of batch arrival order.
    """
    from sparvi_spark.functions import time_bucket

    fresh = (
        new_events.groupBy(
            time_bucket(ts_col, width_seconds).alias("bucket"),
            F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col(value_col).cast("decimal(28,8)"))
             .cast("decimal(38,8)").alias("sum_dec"))
    )
    if state is None:
        return fresh
    return (
        state.unionByName(fresh)
        .groupBy("bucket", "key")
        .agg(F.sum("n").alias("n"),
             F.sum("sum_dec").cast("decimal(38,8)").alias("sum_dec"))
    )
