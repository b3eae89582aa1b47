"""Continuous incremental profiling: stream -> durable sketch state.

Glues the streaming sources to ``Engine.run_incremental_profile`` with
``foreachBatch``: as data lands, each microbatch triggers one incremental
round over the ACCUMULATED table, and the engine's change detection scans
only the partitions the batch touched (their row counts changed) — the
same mergeable stats/quantile/distinct/top-values state families, the same
pointer-file commits, one code path for batch and streaming. The reference
re-profiles on a polling schedule (change_analytics.py:179-271 adaptive
intervals); here the profile is as fresh as the last microbatch at
changed-partition cost.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def streaming_incremental_profile(
    stream: DataFrame,
    engine,
    table_name: str,
    table_path: str,
    partition_col: str,
    numeric_cols: list[str],
    on_profile: Callable[[DataFrame, int], None] | None = None,
):
    """Start a query that lands each microbatch into ``table_path``
    (parquet append — the accumulating monitored table) and folds an
    incremental profile round over it.

    Returns the StreamingQuery. ``on_profile(profile_df, batch_id)``
    receives the folded full-table profile after each non-empty batch.
    The profile cost per batch is proportional to the partitions the
    batch touched, never the accumulated table — the property that makes
    continuous profiling viable at ingest rates where full re-profiles
    cannot keep up.
    """

    def fold(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            if batch.isEmpty():
                return
            # idempotent landing: foreachBatch is at-least-once, and a
            # blind append would double every replayed batch's rows in
            # the accumulated table forever. Keying the write by batch_id
            # (one overwritten subdir per batch) makes the replay a
            # no-op rewrite of identical data.
            batch.write.mode("overwrite").parquet(
                f"{table_path}/ingest_batch={batch_id}")
            spark = batch.sparkSession
            accumulated = spark.read.option(
                "basePath", table_path).parquet(table_path)
            if "ingest_batch" in accumulated.columns:
                accumulated = accumulated.drop("ingest_batch")
            profile = engine.run_incremental_profile(
                accumulated, table_name, partition_col, numeric_cols)
            if on_profile is not None:
                on_profile(profile, batch_id)
        finally:
            batch.unpersist()

    return (stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", table_path + "_checkpoint")
            .start())


__all__ = ["streaming_incremental_profile"]
