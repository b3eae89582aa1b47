"""Hostile-corpus robustness sweep: every text/dedup/tokenize operator
must COMPLETE (drop or pass rows through, never throw) on pathological
documents — NULL text, empty string, whitespace-only, one token, n-1
tokens, unicode/CJK, control characters, a single enormous token, a
10k-token doc, and a doc of all-identical tokens.

Why this exists: the round-9 short-document crash (sequence(1, 0) is
DESCENDING in Spark, so slice(toks, 0, n) threw inside every gram
consumer) was unreachable on the synthetic testdata — every generated
doc has >= n tokens — and would have killed whole jobs on the first
real corpus. The synthetic data verifies VALUES; this file verifies the
operators' domain is actually "any string column".
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def hostile(spark):
    rows = [
        (1, None),
        (2, ""),
        (3, "   \t  \n  "),
        (4, "one"),
        (5, "two words"),
        (6, "exactly three tokens"),
        (7, "这是 中文 文本 测试 句子"),
        (8, "emoji 🎉 and\x00control\x07chars mixed in text here"),
        (9, "x" * 5000),  # one enormous token
        (10, " ".join(f"t{i % 97}" for i in range(10_000))),  # long doc
        (11, "same same same same same same same same"),
        (12, "normal english sentence with enough ordinary tokens to "
             "pass every gate and exercise the happy path too"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


ALL_IDS = set(range(1, 13))


def test_text_operators_complete_on_hostile_corpus(hostile):
    from sparvi_spark.operators.text import (
        chunk_documents,
        dedup_lines_corpus,
        dedup_lines_in_doc,
        lang_id_expr,
        quality_features,
        quality_filter,
        repetition_features,
        top_tokens,
    )

    qf = quality_features(hostile, repetition=True).collect()
    assert {r["doc_id"] for r in qf} == ALL_IDS  # projection keeps all
    got = quality_filter(hostile).collect()
    assert {r["doc_id"] for r in got} == ALL_IDS
    # NULL text fails every rule (documented contract)
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[1]["keep"] is False and by_id[1]["n_failed"] == 7
    assert by_id[12]["pass_word_count"] is False  # short but evaluated

    rep = repetition_features(hostile).collect()
    assert {r["doc_id"] for r in rep} == ALL_IDS
    one = {r["doc_id"]: r for r in rep}
    assert one[11]["dup_token_frac"] > 0.8  # all-identical tokens

    lang = hostile.select("doc_id", lang_id_expr("text").alias("g"))
    assert lang.count() == 12

    assert top_tokens(hostile, k=5).count() <= 5

    ch = chunk_documents(hostile, chunk_tokens=16).collect()
    # every non-NULL doc yields >= 1 chunk; doc 10 yields many
    assert sum(1 for r in ch if r["doc_id"] == 10) >= 10_000 // 16

    dl = dedup_lines_in_doc(hostile, "doc_id", "text").collect()
    assert len(dl) == 12
    dc = dedup_lines_corpus(hostile, "doc_id", "text", min_count=2)
    assert dc.count() == 12


def test_dedup_operators_complete_on_hostile_corpus(hostile):
    from sparvi_spark.operators.dedup import (
        contamination,
        dedup_near,
        duplicate_spans,
        jaccard_pairs,
        minhash_lsh_pairs,
        remove_duplicate_spans,
        simhash_pairs,
    )

    pairs = jaccard_pairs(hostile, "doc_id", "text", n=3, threshold=0.2)
    pairs.count()  # completes; short/NULL docs silently dropped
    mh = minhash_lsh_pairs(hostile, "doc_id", "text", n=3, num_hashes=16,
                           bands=8, threshold=0.2)
    survivors = dedup_near(hostile, mh, "doc_id")
    # near-dedup must RETAIN the short/NULL docs it never shingled
    assert {r["doc_id"] for r in survivors.collect()} <= ALL_IDS
    assert {1, 2, 3, 4, 5} <= {r["doc_id"] for r in survivors.collect()}

    simhash_pairs(hostile, "doc_id", "text", hash_fn="portable",
                  max_hamming=3).count()

    ref = hostile.where("doc_id >= 10")
    cand = hostile.where("doc_id < 10")
    cont = contamination(cand, ref, "doc_id", "text", n=3).collect()
    assert all(r["n_shingles"] > 0 for r in cont)

    spans = duplicate_spans(hostile, "doc_id", "text", n=8)
    cleaned = remove_duplicate_spans(hostile, spans, "doc_id", "text")
    assert cleaned.count() == 12  # rewrite keeps every row, NULLs too


def test_fingerprint_and_tokenize_complete_on_hostile_corpus(hostile):
    from sparvi_spark.operators.text import (
        fingerprint_expr,
        pack_sequences,
        pack_sequences_binpack,
    )
    from sparvi_spark.operators.tokenize import (
        binpack_token_ids,
        bpe_encode,
        pack_token_ids,
        train_bpe,
    )

    fp = hostile.select("doc_id", fingerprint_expr("text").alias("fp"))
    assert fp.count() == 12

    model = train_bpe(hostile, num_merges=4)
    enc = bpe_encode(hostile, model)
    rows = {r["doc_id"]: r["n_tokens"] for r in enc.collect()}
    assert rows[1] == 0 and rows[2] == 0  # NULL/empty -> zero tokens
    assert rows[10] > 10_000

    packed = pack_token_ids(enc, 64)
    assert packed.where("n_tokens > 64").count() == 0
    layout = pack_sequences(hostile, 64)
    assert layout.where("seg_tokens <= 0").count() == 0
    bp = pack_sequences_binpack(hostile, 64, n_shards=2)
    assert bp.where("n_tokens > 64").count() == 0
    mat = binpack_token_ids(enc, 64, n_shards=2)
    assert mat.where("n_tokens > 64").count() == 0


def test_engine_export_flow_completes_on_hostile_corpus(spark, tmp_path, hostile):
    """The composed engine path — screen (quality/dup/contamination
    gates) -> curation rewrites -> filter -> dedup -> shard export ->
    BPE tokenize + pack — completes on the hostile corpus and publishes
    only filterable survivors. Glue-level insurance: each operator is
    hostile-tested above, but the engine chains them through persist/
    unpersist, gates, and state appends."""
    from sparvi_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    ref = hostile.where("doc_id >= 11")
    out = str(tmp_path / "corpus")
    s = eng.export_training_corpus(
        hostile, "hostile", out, n_shards=2, ref=ref,
        require_gate=False, dedup_lines_min_count=2,
        strip_duplicate_spans_n=8,
        tokenize_merges=4, pack_ctx=64,
        quality_overrides={"min_words": 5, "min_stopword_hits": 0,
                           "min_alpha_word_frac": 0.0},
        run_at="2026-01-07 00:00:00")
    assert s["exported"] is True
    back = spark.read.parquet(out)
    ids = {r["doc_id"] for r in back.collect()}
    assert ids and ids <= {7, 8, 10, 11, 12}  # survivors only
    assert 1 not in ids and 2 not in ids     # NULL/empty never exported
    screen = eng.state.read("corpus_screens").collect()
    assert len(screen) == 1 and screen[0]["n_docs"] >= len(ids)
