"""Streaming deduplication: first-occurrence filtering over a live stream.

A training-data ingest pipeline sees the same document again minutes or
hours later (re-crawls, retries, mirrored feeds). Batch dedup
(operators/dedup.py) handles the corpus; these operators drop repeats AT
INGEST so they never land: `dropDuplicatesWithinWatermark` keeps one
fixed-width state row per key and evicts it once event time passes the
watermark — state is O(distinct keys per watermark window), independent of
stream volume, which is the only state bound that survives an unbounded
stream.

Two key flavors, both pure projections feeding the same stateful operator:
- exact: xxhash64 over the content columns — byte-identical repeats;
- fingerprint: the SimHash projection from operators/dedup.py — near-dup
  collapse for docs whose 64-bit fingerprints coincide (whitespace/token
  reorderings hash apart; it is the cheap first line, not a replacement
  for the batch LSH pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_exact(
    stream: DataFrame,
    cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Pass through only the FIRST arrival of each distinct content key
    within the watermark horizon.

    The key is xxhash64 over ``cols`` (8 bytes of state per key instead of
    the full row — the same shuffle-a-hash-not-the-row trade as the batch
    duplicate counter). NULLs are coalesced to a sentinel first: xxhash64
    SKIPS null inputs (it does not null-propagate), so ("x", NULL) and
    (NULL, "x") would otherwise collide and a genuinely distinct row
    would be dropped as a duplicate. Repeats arriving after state
    eviction pass again: the watermark IS the dedup horizon, by contract.
    """
    keyed = stream.withColumn(
        "__key",
        F.xxhash64(*[F.coalesce(F.col(c).cast("string"),
                                F.lit("<<NULL>>"))
                     for c in cols]))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__key"])
        .drop("__key")
    )


def streaming_dedup_fingerprint(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    bits: int = 64,
) -> DataFrame:
    """First arrival per SimHash fingerprint — near-duplicate collapse at
    ingest for documents whose bit-vote fingerprints coincide exactly.

    The fingerprint is the same stateless per-row projection the batch
    SimHash operator uses (token-hash bit votes packed into a bigint), so
    batch and stream agree on which documents are fingerprint-equal.
    """
    from sparvi_spark.operators.dedup import tokens_expr

    token_hash = "xxhash64(t)"
    hashed = f"transform({tokens_expr(text_col)}, t -> {token_hash})"
    votes = (
        f"transform(sequence(0, {bits - 1}), b -> "
        f"aggregate(__th, 0L, (acc, h) -> acc + "
        f"case when shiftright(h, b) & 1 = 1 then 1 else -1 end))"
    )
    packed = (
        f"aggregate(zip_with({votes}, sequence(0, {bits - 1}), "
        f"(v, b) -> case when v > 0 then shiftleft(1L, b) else 0L end), "
        f"0L, (acc, x) -> acc | x)"
    )
    keyed = (
        stream.withColumn("__th", F.expr(hashed))
        .withColumn("__fp", F.expr(packed))
        .drop("__th")
    )
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


__all__ = ["streaming_dedup_exact", "streaming_dedup_fingerprint"]
