"""Incremental profiling (SURVEY.md §7 phase 6).

At 100 TB a daily full profile re-scans everything; incremental profiling
scans only NEW partitions and merges their stats into a running state —
the change-aware refresh the reference approximates with adaptive intervals
(core/metadata/change_analytics.py:179-271) done properly at the storage
layer.

Mergeable stats per (partition, column): count, nulls, sum (decimal-exact),
sumsq, min, max. Merging = groupBy-sum / min / max over partition rows —
associative, so any subset of partitions can be (re)computed independently.
Distinct counts are NOT mergeable exactly; the incremental path reports
approx sketches or defers exact distincts to the (rarer) full pass — the
same exact/approx mode split as the profiler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATS_SCHEMA = ("partition_value string, column_name string, cnt bigint, "
                "nulls bigint, sum_dec decimal(38,8), sumsq_dec decimal(38,8), "
                "min_val double, max_val double")


def partition_stats(df: DataFrame, partition_col: str,
                    numeric_cols: list[str]) -> DataFrame:
    """Per-partition mergeable stats, one groupBy pass (melted long form)."""
    pieces = []
    for c in numeric_cols:
        pieces.append(df.groupBy(
            F.col(partition_col).cast("string").alias("partition_value"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.count(F.when(F.col(c).isNull(), 1)).alias("nulls"),
                F.sum(F.col(c).cast("decimal(28,8)")).cast("decimal(38,8)")
                .alias("sum_dec"),
                # decimal(19,4) x decimal(18,4): exact scale-8 product up to
                # |value| < 10^14 (see validation._STATS_SXX)
                F.sum(F.col(c).cast("decimal(19,4)")
                      * F.col(c).cast("decimal(18,4)")).cast("decimal(38,8)")
                .alias("sumsq_dec"),
                F.min(F.col(c)).cast("double").alias("min_val"),
                F.max(F.col(c)).cast("double").alias("max_val"),
            ).select("partition_value", F.lit(c).alias("column_name"),
                     "cnt", "nulls", "sum_dec", "sumsq_dec", "min_val", "max_val"))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionAll(p)
    return out


def merge_partition_stats(
    state: DataFrame, fresh: DataFrame
) -> DataFrame:
    """Replace refreshed partitions' rows in the running state."""
    refreshed = fresh.select("partition_value").distinct()
    kept = state.join(refreshed, "partition_value", "left_anti")
    return kept.unionByName(fresh)


def rollup_profile(stats: DataFrame) -> DataFrame:
    """Fold per-partition stats into table-level per-column stats.

    Same derived formulas as the one-pass profiler (avg from decimal sum,
    sample stddev from sum/sumsq) — a full profile computed WITHOUT
    rescanning unchanged partitions.
    """
    agg = stats.groupBy("column_name").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("nulls").alias("nulls"),
        F.sum("sum_dec").alias("sum_dec"),
        F.sum("sumsq_dec").alias("sumsq_dec"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
    )
    nn = F.col("cnt") - F.col("nulls")
    sx = F.col("sum_dec").cast("double")
    sxx = F.col("sumsq_dec").cast("double")
    avg = F.when(nn > 0, F.round(sx / nn, 6))
    std = F.when(nn > 1, F.round(
        F.sqrt(F.greatest((sxx - (sx * sx) / nn) / (nn - 1), F.lit(0.0))), 4))
    return agg.select(
        "column_name", "cnt", "nulls", "min_val", "max_val",
        avg.alias("avg_val"), std.alias("stddev_val"),
    )


def incremental_profile(
    df: DataFrame,
    partition_col: str,
    numeric_cols: list[str],
    state: DataFrame | None = None,
    changed_partitions: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One incremental round: (new_state, table_profile).

    ``changed_partitions=None`` computes everything (bootstrap). Otherwise
    only those partitions are scanned — predicate pushdown prunes the rest
    at the parquet/partition layer.
    """
    scan = df
    if changed_partitions is not None:
        scan = df.where(
            F.col(partition_col).cast("string").isin(changed_partitions))
    fresh = partition_stats(scan, partition_col, numeric_cols)
    new_state = fresh if state is None else merge_partition_stats(state, fresh)
    return new_state, rollup_profile(new_state)
