"""Key-skew diagnosis — the pre-flight check for every big join/groupBy.

At 100 TB the difference between a 20-minute and a 6-hour job is usually
ONE hot key: a join/groupBy shuffles on the key, and the heaviest key's
rows all land on a single reducer. This profiler measures the per-key count
distribution (imbalance factor, tail quantiles, heaviest keys) and derives
the salt factor that would flatten it — the number the `joins.salted_join`
path consumes. AQE's skew-join handles sort-merge join spills at runtime;
this measures BEFORE running, catches groupBy/window skew AQE does not
split, and records the evidence.

No reference parity citation: the reference delegates execution to a
warehouse and never sees physical skew; this is engine-native tooling
(SURVEY §2 scale extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_profile(
    df: DataFrame, key_cols: list[str], top: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """-> (summary one-row frame, top-N heaviest keys frame).

    Summary: n_keys, n_rows, max_count, avg_count (double),
    imbalance = max/avg (the straggler multiplier a key-partitioned stage
    suffers), p50/p90/p99 of per-key counts (exact percentiles — the count
    frame is n_keys rows, already aggregated), null_key_rows, and
    suggested_salt = ceil(imbalance) capped at 256 (splitting the hottest
    key into ~avg-sized slices; 1 = no salting needed).

    Plan shape: ONE groupBy over the keys (the same shuffle the real job
    would do — measuring costs what one run of the aggregation costs),
    then tiny aggregates over the n_keys-row count frame.
    """
    null_key = F.lit(False)
    for c in key_cols:
        null_key = null_key | F.col(c).isNull()
    counts = (df.withColumn("__nullkey", null_key)
              .groupBy(*key_cols, "__nullkey")
              .agg(F.count(F.lit(1)).alias("cnt")))
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_count"),
        F.round(F.avg("cnt"), 4).alias("avg_count"),
        F.expr("round(percentile(cnt, 0.5), 4)").alias("p50_count"),
        F.expr("round(percentile(cnt, 0.9), 4)").alias("p90_count"),
        F.expr("round(percentile(cnt, 0.99), 4)").alias("p99_count"),
        F.coalesce(F.sum(F.when(F.col("__nullkey"), F.col("cnt"))),
                   F.lit(0)).alias("null_key_rows"),
    ).withColumn(
        "imbalance",
        F.round(F.col("max_count") / (F.col("n_rows")
                                      / F.col("n_keys")), 4),
    ).withColumn(
        "suggested_salt",
        F.least(F.lit(256), F.greatest(F.lit(1), F.ceil("imbalance")))
        .cast("int"),
    )
    w = Window.orderBy(F.desc("cnt"),
                       *[F.asc(c) for c in key_cols])
    heaviest = (counts.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= top)
                .select(*key_cols, "cnt", "rank"))
    return summary, heaviest


__all__ = ["key_skew_profile"]
