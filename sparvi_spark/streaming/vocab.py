"""Continuous vocabulary-drift monitoring: stream of documents ->
per-batch token-mix TVD against a stored vocabulary baseline.

Composes the stored-vocab design (Engine.save_vocab_baseline /
check_vocab_drift) with ``foreachBatch``, exactly the shape
streaming/drift.py gives numeric metrics: per-batch cost is one scan of
the batch joined against the KILOBYTE baseline vocabulary (broadcast)
into a K+1-row groupBy, the reference corpus is never reread, and a
crawl source whose token mix goes off-distribution raises a
``vocab_drift`` engine event within one microbatch — the language/
boilerplate/spam shifts a numeric histogram cannot see.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def streaming_vocab_monitor(
    stream: DataFrame,
    engine,
    corpus_name: str,
    text_col: str = "text",
    tvd_alert: float = 0.2,
    min_docs: int = 20,
    on_drift: Callable[[DataFrame, int], None] | None = None,
):
    """Start a query that vocab-drift-checks each microbatch against the
    stored baseline for ``corpus_name``. Returns the StreamingQuery.

    Batches smaller than ``min_docs`` are skipped (a few documents'
    token mix is sampling noise, not drift); ``on_drift(row_df,
    batch_id)`` receives each computed one-row metric frame. Alerts and
    metric history flow through ``Engine.check_vocab_drift`` — the exact
    code path batch audits use, so thresholds and event semantics cannot
    diverge between the batch and streaming paths.
    """

    def check(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            if batch.count() < min_docs:
                return
            out = engine.check_vocab_drift(batch, corpus_name,
                                           text_col=text_col,
                                           tvd_alert=tvd_alert)
            if out is not None and on_drift is not None:
                on_drift(out, batch_id)
        finally:
            batch.unpersist()

    return (stream.writeStream.foreachBatch(check)
            .option("checkpointLocation",
                    f"{engine.state.root}/_checkpoints/vocab_{corpus_name}")
            .start())
