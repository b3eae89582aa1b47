"""Continuous anomaly detection: stream -> metric series -> detectors.

Bridges the streaming monitors to the batch detectors (SURVEY §2.C) with
``foreachBatch``: each microbatch folds new windowed metrics into the
metrics store, then re-runs detection over the affected series only. The
detectors themselves are unchanged batch window jobs — one code path for
both batch and streaming, which is the point of the design (the reference
polls; we detect as data lands).

State stays bounded: each detection pass reads back only the series
touched by the batch (`metric_name IS IN touched` prunes at the scan).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparvi_spark.operators.anomalies import detect_anomalies


def streaming_detection(
    stream: DataFrame,
    metrics_path: str,
    config: dict | None = None,
    window: str = "1 hour",
    watermark: str = "0 seconds",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    on_anomalies: Callable[[DataFrame, int], None] | None = None,
):
    """Start a query that appends windowed sums to ``metrics_path`` and
    re-detects anomalies per touched series each microbatch.

    Returns the StreamingQuery. ``on_anomalies(anomalies_df, batch_id)``
    receives each batch's detections (default: appended next to the
    metrics as parquet at ``metrics_path + "_anomalies"``).
    """
    windowed = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.round(F.sum(F.col(value_col).cast("decimal(18,2)")), 2)
             .cast("double").alias("value"))
        .select(F.col("w.start").alias("ts"),
                F.col(key_col).alias("metric_name"), "value")
    )

    def fold(batch: DataFrame, batch_id: int) -> None:
        # persist first: the foreachBatch frame is NOT materialized —
        # isEmpty, the append write, and the semi-join below would each
        # re-execute the source read + windowed aggregation (3x the
        # microbatch work) without it
        batch = batch.persist()
        try:
            if batch.isEmpty():
                return
            spark = batch.sparkSession
            batch.write.mode("append").parquet(metrics_path)
            # prune the read-back to series touched by THIS batch via a
            # semi-join on the batch's distinct names — no driver collect
            # in the microbatch loop, and the join's build side is one
            # small already-materialized batch
            touched = batch.select("metric_name").distinct()
            series = (spark.read.parquet(metrics_path)
                      .join(F.broadcast(touched), "metric_name", "left_semi"))
            # late duplicates of a window (append mode re-emits on
            # updates): keep the newest value per (series, ts)
            series = series.groupBy("metric_name", "ts").agg(
                F.max("value").alias("value"))
            found = detect_anomalies(series, ["metric_name"], config=config)
            if on_anomalies is not None:
                on_anomalies(found, batch_id)
            else:
                (found.withColumn("batch_id", F.lit(batch_id))
                 .write.mode("append").parquet(metrics_path + "_anomalies"))
        finally:
            batch.unpersist()

    return (windowed.writeStream.outputMode("append")
            .foreachBatch(fold).start())
