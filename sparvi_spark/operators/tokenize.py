"""BPE tokenizer: sampled training + Arrow-batched application.

A training-data export ships TOKEN IDS, not text (sequence packing —
text.pack_sequences — consumes per-doc token counts; this produces the
ids themselves). Two halves, each shaped for its true cost profile:

- **Training** (`train_bpe`): classic Sennrich BPE (merge the most
  frequent adjacent symbol pair, repeat) over a WORD-FREQUENCY table.
  The distributed part is exactly one job — a word-count groupBy (plus a
  cap to the top `max_words` forms; tail-of-tail words contribute
  nothing to merge ranks) — because tokenizer quality saturates on a
  frequency sample, which is how production tokenizers are actually
  trained. The merge loop itself runs driver-side over the collected
  KB-MB frequency dict; a distributed merge loop would cost one shuffle
  PER MERGE (32k merges = 32k jobs) for no quality gain.
- **Application** (`bpe_encode`): greedy rank-ordered merge application
  per word — inherently iterative, per-symbol-pair, data-dependent: the
  textbook case where Spark's vectorized surface genuinely cannot
  express the computation and ``mapInPandas`` (Arrow batches) is the
  honest tool. The model ships with the task closure (kilobytes); a
  per-batch word memo exploits natural-language repetition (the same
  words dominate every batch), so per-row work collapses to dict
  lookups for the hot vocabulary.

Unknown symbols map to ``unk_id`` — byte-fallback vocabularies can make
that unreachable; the operator does not assume one.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    """A word's initial symbol sequence: characters + end-of-word marker
    (the marker lets merges distinguish suffixes from infixes)."""
    return tuple(word) + (END_OF_WORD,)


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_words: int = 200_000,
) -> dict:
    """Train a BPE model -> {'merges': [(a, b), ...] rank-ordered,
    'vocab': {token: id}}. One Spark job: word counts, top ``max_words``
    forms by frequency (ties by word for determinism); the merge loop is
    driver-side over that frequency table.

    The loop maintains pair counts INCREMENTALLY (the standard Sennrich
    trick): each merge touches only the words that contain the merged
    pair — via a pair→words inverted index — and the global argmax comes
    from a lazy-invalidation heap (stale entries are discarded on pop).
    A naive rescan of all ≤200k word forms per merge is O(merges×vocab)
    and takes tens of driver minutes at a real 32k-merge vocabulary;
    this shape trains 32k merges in seconds-to-minutes. The greedy
    choice sequence is bit-identical to the naive loop: the heap orders
    by (count desc, lexicographic pair), the exact tie-break the rescan
    used."""
    import heapq
    from collections import Counter

    toks = f"split(lower(trim(`{text_col}`)), '\\\\s+')"
    rows = (df.selectExpr(f"explode({toks}) AS w")
            .where("w <> ''")
            .groupBy("w").agg(F.expr("count(1)").alias("c"))
            .orderBy(F.desc("c"), "w")
            .limit(max_words)
            .collect())
    # distinct raw words stay distinct under merging (a word's symbol
    # concatenation is invariant), so plain parallel lists suffice
    words: list[list[str]] = [list(_word_symbols(r["w"])) for r in rows]
    counts: list[int] = [int(r["c"]) for r in rows]

    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, c) in enumerate(zip(words, counts)):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def _push(p: tuple[str, str]) -> None:
        c = pair_counts.get(p, 0)
        if c > 0:
            heapq.heappush(heap, (-c, p))

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, best = heapq.heappop(heap)
        if pair_counts.get(best, 0) != -negc:
            continue  # stale entry — current count was pushed separately
        merges.append(best)
        merged = best[0] + best[1]
        touched: set[tuple[str, str]] = set()
        for wi in pair_words.pop(best, ()):
            syms, c = words[wi], counts[wi]
            old = Counter(zip(syms, syms[1:]))
            res, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[wi] = res
            new = Counter(zip(res, res[1:]))
            for p in old.keys() | new.keys():
                d = new[p] - old[p]
                if d:
                    pair_counts[p] += d * c
                    touched.add(p)
                    if d > 0:
                        pair_words.setdefault(p, set()).add(wi)
        for p in touched:
            if pair_counts.get(p, 0) <= 0:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
            else:
                _push(p)
        pair_counts.pop(best, None)

    symbols: set[str] = set()
    for syms in words:
        symbols.update(syms)
    for a, b in merges:
        symbols.update((a, b, a + b))
    vocab = {s: i + 1 for i, s in enumerate(sorted(symbols))}  # 0 = unk
    return {"merges": merges, "vocab": vocab}


def _encode_word(word: str, ranks: dict, vocab: dict, unk_id: int) -> list:
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return [vocab.get(s, unk_id) for s in syms]


def bpe_encode(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_id: int = 0,
) -> DataFrame:
    """(id, token_ids, n_tokens) per document — Arrow-batched greedy BPE
    application with a per-batch word memo."""
    ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    vocab = dict(model["vocab"])

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        memo: dict[str, list] = {}
        for pdf in batches:
            ids_out, toks_out, n_out = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                ids: list = []
                for w in str(text or "").strip().lower().split():
                    got = memo.get(w)
                    if got is None:
                        got = _encode_word(w, ranks, vocab, unk_id)
                        memo[w] = got
                    ids.extend(got)
                ids_out.append(rid)
                toks_out.append(ids)
                n_out.append(len(ids))
            yield pd.DataFrame({id_col: ids_out, "token_ids": toks_out,
                                "n_tokens": n_out})

    src_t = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {src_t}, token_ids array<int>, n_tokens int")


def pack_token_ids(
    encoded: DataFrame,
    ctx_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "token_ids",
    shard_col: str | None = None,
) -> DataFrame:
    """Materialize fixed-length training sequences from encoded documents
    -> (shard, pack_id, token_ids, n_tokens, n_docs) — the actual arrays a
    training loader reads, not just the layout.

    ``text.pack_sequences`` computes WHERE every document's tokens land
    under concat-and-chop (one row per document×pack overlap); this joins
    those segments back to the token arrays, slices each document's
    contribution (`slice` — JVM HOF, no UDF), and reassembles each pack in
    document order (`array_sort` on (doc_id, seg) structs + `flatten`).
    Every pack holds exactly ``ctx_len`` tokens except the final partial
    pack of each shard.

    Scale: one equi-join on the id (co-partitioned shuffle; a document
    straddling k packs ships its array k times — k ≤ 1 + n_tokens/ctx_len,
    so duplication is bounded by total token volume) and one groupBy pack.
    With ``shard_col`` both shuffles key on (shard, ...) and shards pack
    independently — the same near-linear layout contract as
    ``pack_sequences``.
    """
    from sparvi_spark.operators.text import pack_sequences

    layout = pack_sequences(
        encoded, ctx_len, id_col=id_col, shard_col=shard_col,
        token_count_col="n_tokens")
    segs = (layout.join(
        encoded.select(F.col(id_col).alias("doc_id"), tokens_col),
        "doc_id")
        .selectExpr(
            "shard", "pack_id", "doc_id",
            f"slice(`{tokens_col}`, seg_start + 1, seg_tokens) AS seg"))
    return (segs.groupBy("shard", "pack_id")
            .agg(F.expr(
                "flatten(transform(array_sort(collect_list("
                "struct(doc_id, seg))), x -> x.seg)) AS token_ids"),
                F.expr("count(1)").alias("n_docs"))
            .selectExpr("shard", "pack_id", "token_ids",
                        "cast(size(token_ids) as int) AS n_tokens",
                        "cast(n_docs as int) AS n_docs"))


def binpack_token_ids(
    encoded: DataFrame,
    ctx_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "token_ids",
    n_shards: int = 1,
    shard_method: str = "portable",
) -> DataFrame:
    """Materialize WHOLE-DOCUMENT packs from encoded documents — the
    no-split complement of ``pack_token_ids`` with the same output shape
    (shard, pack_id, token_ids, n_tokens, n_docs), so the export flow
    swaps policies without changing its write/summary path.

    Layout comes from ``text.pack_sequences_binpack`` (next-fit-
    decreasing bins per hash shard — each document lands intact in
    exactly one pack; documents longer than ``ctx_len`` are truncated to
    it). Tokens are reassembled in the bin's FILL order (length DESC,
    id ASC — the order the packer placed them), via one equi-join on the
    id and one groupBy pack: each document's array ships exactly once
    (no straddling, unlike chop), so the shuffle is bounded by total
    token volume. Packs are at most ``ctx_len`` tokens; the slack per
    pack is the padding the loader pays for intact examples.
    """
    from sparvi_spark.operators.text import pack_sequences_binpack

    layout = pack_sequences_binpack(
        encoded, ctx_len, id_col=id_col, n_shards=n_shards,
        token_count_col="n_tokens", shard_method=shard_method)
    rows = (layout.join(
        encoded.select(F.col(id_col).alias("doc_id"), tokens_col),
        "doc_id")
        .selectExpr(
            "shard", "pack_idx AS pack_id", "doc_id", "n_tokens",
            # n_tokens is the EFFECTIVE length (min(raw, ctx_len)), so
            # the slice is the truncation the layout already accounted
            f"slice(`{tokens_col}`, 1, n_tokens) AS seg"))
    return (rows.groupBy("shard", "pack_id")
            .agg(F.expr(
                # fill order: length DESC then id ASC — encode as
                # (-n_tokens, doc_id) so the ascending struct sort
                # reproduces it
                "flatten(transform(array_sort(collect_list("
                "struct(-n_tokens AS neg_len, doc_id, seg))), "
                "x -> x.seg)) AS token_ids"),
                F.expr("count(1)").alias("n_docs"))
            .selectExpr("shard", "pack_id", "token_ids",
                        "cast(size(token_ids) as int) AS n_tokens",
                        "cast(n_docs as int) AS n_docs"))
