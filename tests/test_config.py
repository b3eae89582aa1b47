"""The engine-wide scale-mode switch (sparvi_spark.config): one knob
flips every oracle-parity default to its 100 TB backend — plan-asserted
— while explicit per-call arguments always win, and the two modes agree
on data away from threshold boundaries (the backends may differ in the
final ULP, never in the result set)."""

import pytest

from sparvi_spark.config import scale_mode, scale_mode_ctx, set_scale_mode


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scale_mode_ctx_restores_and_set_flips():
    assert scale_mode() is False  # parity is the process default
    with scale_mode_ctx(True):
        assert scale_mode() is True
        with scale_mode_ctx(False):
            assert scale_mode() is False
        assert scale_mode() is True
    assert scale_mode() is False
    set_scale_mode(True)
    try:
        assert scale_mode() is True
    finally:
        set_scale_mode(False)


def test_scale_mode_flips_cosine_topk_to_gram_plan(spark):
    from sparvi_spark.operators.similarity import cosine_topk

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id int, embedding array<float>")
    with scale_mode_ctx(True):
        plan_scale = _plan(cosine_topk(df, df, k=2))
        # explicit argument beats the mode
        plan_pinned = _plan(cosine_topk(df, df, k=2, backend="fold"))
    plan_parity = _plan(cosine_topk(df, df, k=2))
    assert "MapInPandas" in plan_scale  # BLAS partition-local top-k
    assert "MapInPandas" not in plan_pinned
    assert "MapInPandas" not in plan_parity


def test_scale_mode_flips_neardup_pairs_to_bucketed_gram(spark):
    """Scale mode must never run the n² brute join: an unbucketed call
    resolves to gram AND auto-buckets with lsh_bits=16; an EXPLICIT
    gram without a bucket still raises (the caller asked for a
    contradiction)."""
    from sparvi_spark.operators.dedup import embedding_neardup_pairs

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id int, embedding array<float>")
    with scale_mode_ctx(True):
        plan_scale = _plan(embedding_neardup_pairs(df, "vec_id",
                                                   "embedding"))
        with pytest.raises(ValueError, match="bucket"):
            embedding_neardup_pairs(df, "vec_id", "embedding",
                                    pair_backend="gram")
    plan_parity = _plan(embedding_neardup_pairs(df, "vec_id", "embedding"))
    assert "FlatMapGroupsInPandas" in plan_scale  # per-bucket Gram
    assert "Join" not in plan_scale  # no brute pair join anywhere
    assert "FlatMapGroupsInPandas" not in plan_parity


def test_scale_mode_profile_uses_sketches_and_matches_exact(spark):
    """profile_table(exact=None) resolves to sketches at scale — and on
    small clean data the sketch answers EQUAL the exact ones (HLL is
    exact far below its precision; the hash-projection dup count has no
    collisions in 60 rows), so the whole document round-trips."""
    from sparvi_spark.operators.profile import profile_table

    rows = [(i % 20, f"s{i % 7}") for i in range(60)]
    df = spark.createDataFrame(rows, "a int, b string")
    exact_doc = profile_table(df, "t", exact=True)
    with scale_mode_ctx(True):
        scale_doc = profile_table(df, "t")
    assert scale_doc["row_count"] == exact_doc["row_count"] == 60
    assert scale_doc["distinct_counts"] == exact_doc["distinct_counts"]
    assert scale_doc["duplicate_count"] == exact_doc["duplicate_count"]


def test_engine_scale_mode_is_per_engine_not_process_global(spark, tmp_path):
    """Two engines with opposite modes coexist: constructing the second
    must not flip the first (the old process-global switch meant
    last-constructor-wins), and neither touches the process default."""
    from sparvi_spark.engine import Engine

    e_scale = Engine(spark, str(tmp_path / "wh"), scale_mode=True)
    e_parity = Engine(spark, str(tmp_path / "wh2"), scale_mode=False)
    assert e_scale.scale_mode is True      # unchanged by the 2nd engine
    assert e_parity.scale_mode is False
    assert scale_mode() is False           # process default untouched


def test_engine_scale_mode_resolves_from_spark_conf(spark, tmp_path):
    """Precedence: explicit arg > spark.sparvi.scaleMode conf > process
    default — so deployments configure it like any other Spark knob."""
    from sparvi_spark.config import SPARK_CONF_KEY
    from sparvi_spark.engine import Engine

    # no conf, no arg -> process default
    assert Engine(spark, str(tmp_path / "a")).scale_mode is False
    spark.conf.set(SPARK_CONF_KEY, "true")
    try:
        # conf wins over the process default
        assert Engine(spark, str(tmp_path / "b")).scale_mode is True
        # explicit arg wins over the conf
        assert Engine(spark, str(tmp_path / "c"),
                      scale_mode=False).scale_mode is False
    finally:
        spark.conf.unset(SPARK_CONF_KEY)
    # process default (set_scale_mode) is still the fallback
    set_scale_mode(True)
    try:
        assert Engine(spark, str(tmp_path / "d")).scale_mode is True
    finally:
        set_scale_mode(False)


def test_engine_run_profile_follows_engine_mode(spark, tmp_path):
    """run_profile(exact=None) resolves from the ENGINE's snapshot: a
    scale-mode engine writes a sketch-backed profile document even when
    the process default is parity (and vice versa nothing leaks)."""
    from sparvi_spark.engine import Engine

    df = spark.createDataFrame(
        [(i % 5, f"s{i % 3}") for i in range(40)], "a int, b string")
    eng = Engine(spark, str(tmp_path / "wh"), scale_mode=True)
    doc = eng.run_profile(df, "t", attach_trends=False)
    assert doc["profile_mode"] == "approx"
    assert scale_mode() is False  # process default untouched
    eng2 = Engine(spark, str(tmp_path / "wh2"), scale_mode=False)
    doc2 = eng2.run_profile(df, "t", attach_trends=False)
    assert doc2["profile_mode"] == "exact"


def test_graded_checks_pin_parity_backends_under_scale_mode(spark):
    """The oracle-graded checks must NOT follow the process-global scale
    mode: an Engine(scale_mode=True) anywhere in the process would
    otherwise flip them to gram lanes (ULP drift vs the DuckDB hash, and
    lsh auto-bucketing drops cross-bucket pairs)."""
    from sparvi_spark.checks.pipeline_checks import (
        q_cosine_topk, q_embedding_neardup, q_semantic_dedup)

    sf = "/root/testdata/sf0.001"
    with scale_mode_ctx(True):
        assert "MapInPandas" not in _plan(q_cosine_topk(spark, sf))
        assert "FlatMapGroupsInPandas" not in _plan(
            q_embedding_neardup(spark, sf))
        assert "FlatMapGroupsInPandas" not in _plan(
            q_semantic_dedup(spark, sf))


def test_scale_mode_semantic_dedup_parity_away_from_threshold(spark):
    """Mode on vs off: identical survivors when every cosine sits far
    from the threshold (ULP-level backend drift cannot flip a decision)."""
    from sparvi_spark.operators.dedup import semantic_dedup

    base = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    rows = []
    for g, b in enumerate(base):
        for m in range(3):  # 3 near-identical members per group
            v = [x + (0.0005 * m if x else 0.0) for x in b]
            rows.append((g * 3 + m, v))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    cents = base
    kept_parity = sorted(r["vec_id"] for r in semantic_dedup(
        df, "vec_id", "embedding", threshold=0.99,
        centroids=cents).collect())
    with scale_mode_ctx(True):
        kept_scale = sorted(r["vec_id"] for r in semantic_dedup(
            df, "vec_id", "embedding", threshold=0.99,
            centroids=cents).collect())
    assert kept_parity == kept_scale == [0, 3, 6]
