"""Continuous corpus intake: stream -> near-dedup against everything
already admitted -> append survivors.

Glues the streaming sources to ``Engine.dedup_corpus_incremental`` with
``foreachBatch``: each microbatch near-dedups in-batch (exact-verified
MinHash LSH), then against the corpus' stored signature state — never
rereading a byte of admitted text — and survivors land in the corpus
directory while their signatures extend the state for the NEXT batch.
This is the shape that keeps a 100 TB corpus duplicate-free at ingest
time: per-batch cost is the batch's LSH band join against a signature
table of num_hashes longs/doc, not a join against the corpus.

The reference has no streaming surface (batch Flask tasks only); this is
the extension mandated alongside the batch dedup family (BASELINE.json).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def streaming_corpus_intake(
    stream: DataFrame,
    engine,
    corpus_name: str,
    corpus_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    on_batch: Callable[[dict, int], None] | None = None,
):
    """Start a query that admits each microbatch's near-dedup survivors
    into ``corpus_path`` (parquet append). Returns the StreamingQuery.

    ``on_batch(summary, batch_id)`` receives the
    ``dedup_corpus_incremental`` summary (counts only). ``hash_fn`` is
    pinned per corpus (stored signatures are only comparable to batches
    signed by the same family — see the engine docstring); pass
    ``"arrow"`` for the vectorized signature lane (measured ~25% less
    per-batch wall at 50k-doc batches — 5.8s vs 7.8s,
    scripts/streaming_latency.py; the gap was 2-4× before the zip_with
    signature fix made the expression lane competitive too). Batch-parity:
    admitting the same data in any microbatch partitioning yields the
    same survivor SET as one batch call whenever duplicates arrive after
    their originals (streaming keep-first == batch keep-smallest when
    ids are arrival-ordered); the test asserts exactly that equivalence.

    Replay safety (foreachBatch is at-least-once): survivors are written
    through the engine's ``sink`` hook, which runs BEFORE the signature
    append — a crash anywhere up to and including the write leaves NO
    signatures behind, so the replayed batch recomputes cleanly; a
    replay after a completed batch matches every doc against its own
    stored signature and admits nothing twice. The write itself is keyed
    by batch_id (``ingest_batch=N`` subdirectory, mode=overwrite — same
    pattern as streaming/profile.py), so the remaining at-least-once
    window — crash after the write but before the signature append —
    REWRITES the same files on replay instead of appending duplicates:
    output is exactly-once. Readers see ``ingest_batch`` as a partition
    column.
    """

    def admit(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            if batch.isEmpty():
                return
            summary = engine.dedup_corpus_incremental(
                batch, corpus_name, id_col=id_col, text_col=text_col,
                n=n, num_hashes=num_hashes, bands=bands,
                threshold=threshold, hash_fn=hash_fn,
                sink=lambda kept: kept.write.mode("overwrite")
                .parquet(f"{corpus_path}/ingest_batch={batch_id}"))
            if on_batch is not None:
                on_batch({k: v for k, v in summary.items() if k != "kept"},
                         batch_id)
        finally:
            batch.unpersist()

    return (stream.writeStream.foreachBatch(admit)
            .option("checkpointLocation", corpus_path + "_checkpoint")
            .start())
