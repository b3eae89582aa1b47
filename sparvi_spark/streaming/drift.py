"""Continuous distribution-drift monitoring: stream -> per-batch drift
metrics against a stored baseline histogram.

Composes the stored-histogram drift design (operators/drift.py +
Engine.save_drift_baseline) with ``foreachBatch``: each microbatch is
binned map-side against the baseline's edges and compared — per-batch
cost is one count-bounded groupBy over the batch, the baseline snapshot
is never re-read (its histogram is kilobytes of engine state), and a
drifting input stream raises a ``distribution_drift`` engine event
within one microbatch of the shift instead of at the next scheduled
batch audit. The reference's analogue is its polled metric collection
(core/history/change_analytics.py); continuous drift is an extension a
training-ingest pipeline needs — a crawler source going off-distribution
should stop shard export NOW, not at tomorrow's audit.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def streaming_drift_monitor(
    stream: DataFrame,
    engine,
    table_name: str,
    psi_alert: float = 0.2,
    min_rows: int = 100,
    on_drift: Callable[[DataFrame, int], None] | None = None,
):
    """Start a query that drift-checks each microbatch against the stored
    baseline for ``table_name``. Returns the StreamingQuery.

    Batches smaller than ``min_rows`` are skipped (a 10-row microbatch's
    histogram is all smoothing noise — psi on it is meaningless);
    ``on_drift(metrics_df, batch_id)`` receives each computed metric
    frame. Alerts/state flow through ``Engine.run_drift_check`` — the
    exact code path batch audits use, so thresholds and event semantics
    cannot diverge between the batch and streaming paths.
    """

    def check(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            if batch.count() < min_rows:
                return
            out = engine.run_drift_check(batch, table_name,
                                         psi_alert=psi_alert)
            if out is not None and on_drift is not None:
                on_drift(out, batch_id)
        finally:
            batch.unpersist()

    return (stream.writeStream.foreachBatch(check)
            .option("checkpointLocation",
                    f"{engine.state.root}/_checkpoints/drift_{table_name}")
            .start())
