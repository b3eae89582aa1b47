"""Round-6 repack of the driver's 50 recorded slots.

The driver records at most ``DRIVER_CHECK_CAP`` (50) oracle pairs per round
(checks/__init__.py). Rounds 1-5 filled all 50 with the SURVEY §2 families;
the 13 round-5 LLM-pipeline checks (drift, classifier/LM scoring, SemDeDup,
duplicate spans, corpus line dedup, shard export, eval splits, BPE encode,
sequence packing, incremental signatures, corpus diff) were verified only by
the local replica (``EXTRA_CHECKS``). This module frees 9 slots by merging
same-family checks — the tag-union pattern already graded since r3
(a01 global+rolling, d06 simhash+rolling, x01 brute+ivf, x13
bernoulli+stratified) — and registers the round-5 families in the freed
slots. NOTHING is dropped: every previously-graded value still flows into a
recorded hash, via either an aligned superset union (same meaning columns,
NULL-padded extras CAST to DOUBLE so both engines materialize float64) or a
long-format melt (keys stringified, numeric metrics as DOUBLE, string
metrics as STRING). Standalone shapes stay in each module's EXTRA_CHECKS for
local fine-grained diagnosis (scripts/check_oracle.py runs both).

Slot map (old graded names -> new slot):
- a01_zscore + a03_iqr              -> a01_anomaly_scores (4-part union)
- d02_jaccard_pairs + d03_minhash_lsh + d05_embedding_neardup
                                    -> d02_pair_scores (aligned)
- x13_sampling + d07_dedup_corpus + t14_retention
                                    -> x13_id_checksums (aligned; checksums
                                       stay BIGINT — never through DOUBLE)
- t02_daily_rollup + t05_dashboard_daily -> t02_rollups (melt)
- t03_health_summary + t06_anomaly_summary -> t03_summaries (melt)
- p14_preview + t13_metric_history + x06_top_tokens -> p14_misc_small (melt)
New round-5 slots: x24_drift (x24+x25), x27_doc_scores (x27+x28),
x26_shard_split (x26+x29), e10_tokenize_pack (e10+e09), and the singles
x30_semantic_dedup, x31_duplicate_spans, e11_sig_pairs, e13_dedup_lines,
e14_corpus_diff promoted verbatim from EXTRA.
Round-10: the round-9 families join their natural slots — e16/e17
(classifier AUC + P/R sweep) as x27_doc_scores melt parts clf_auc /
clf_pr, e18/e19 (vocabulary drift + TVD) as x24_drift parts vocab /
vocab_tvd. The AUC and PR parts deliberately derive from ONE identical
grouped subplan (classify._score_class_counts) so the union's physical
plan ReusedExchange runs the scoring pass once for both.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparvi_spark.checks import aligned_union_check, melted_check, union_check
from sparvi_spark.checks.anomaly_checks import (
    SQL_IQR_GLOBAL,
    SQL_IQR_ROLLING,
    SQL_ZSCORE_GLOBAL,
    SQL_ZSCORE_ROLLING,
    q_anomaly_scores_4way,
    q_iqr_global,
    q_iqr_rolling,
    q_zscore_global,
    q_zscore_rolling,
)
from sparvi_spark.checks.pipeline_checks import (
    SQL_BPE_TOKENIZE,
    SQL_CORPUS_DIFF,
    SQL_DEDUP_CORPUS,
    SQL_DEDUP_LINES,
    SQL_DUPLICATE_SPANS,
    SQL_EMBEDDING_NEARDUP,
    SQL_HASH_SAMPLE,
    SQL_JACCARD_PAIRS,
    SQL_LM_SCORE,
    SQL_MINHASH_LSH,
    SQL_PACK_SEQUENCES,
    SQL_STRATIFIED_SAMPLE_AGG,
    SQL_TOP_TOKENS,
    _sql_binpack,
    _sql_categorical_drift,
    _sql_classifier_eval,
    _sql_classifier_pr,
    _sql_classifier_scores,
    _sql_eval_split,
    _sql_numeric_drift,
    _sql_vocab_drift,
    _sql_vocab_tvd,
    _sql_semantic_dedup,
    _sql_shard_plan,
    _sql_sig_pairs,
    q_binpack,
    q_bpe_tokenize,
    q_categorical_drift,
    q_classifier_eval,
    q_classifier_pr,
    q_classifier_scores,
    q_corpus_diff,
    q_dedup_corpus,
    q_dedup_lines,
    q_duplicate_spans,
    q_embedding_neardup,
    q_eval_split,
    q_hash_sample,
    q_jaccard_pairs,
    q_lm_score,
    q_minhash_lsh,
    q_numeric_drift,
    q_pack_sequences,
    q_semantic_dedup,
    q_shard_plan,
    q_sig_pairs,
    q_stratified_sample_agg,
    q_top_tokens,
    q_vocab_drift,
    q_vocab_tvd,
)
from sparvi_spark.checks.profile_checks import SQL_PREVIEW, q_preview
from sparvi_spark.checks.trend_checks import (
    SQL_ANOMALY_SUMMARY_COMBINED,
    SQL_DAILY_ROLLUP,
    SQL_DASHBOARD_COMBINED,
    SQL_HEALTH_SUMMARY,
    SQL_METRIC_HISTORY,
    SQL_RETENTION,
    q_anomaly_summary_combined,
    q_daily_rollup,
    q_dashboard_combined,
    q_health_summary,
    q_metric_history,
    q_retention,
)

_PAIR_PAD = {"shared": "CAST(NULL AS DOUBLE)", "sz_a": "CAST(NULL AS DOUBLE)",
             "sz_b": "CAST(NULL AS DOUBLE)"}

# a01: the Spark side uses the hand-fused builder (finalize + tag in one
# projection per part — see q_anomaly_scores_4way); the oracle SQL is the
# identical union_check-generated text over the four standalone checks.
_A01_SQL = union_check([
    ("zscore_global", q_zscore_global, SQL_ZSCORE_GLOBAL),
    ("zscore_rolling", q_zscore_rolling, SQL_ZSCORE_ROLLING),
    ("iqr_global", q_iqr_global, SQL_IQR_GLOBAL),
    ("iqr_rolling", q_iqr_rolling, SQL_IQR_ROLLING),
], tag_col="method")[1]

# x13: the four id-checksum parts; the SQL comes from the shared
# aligned-union spec, the Spark side is hand-fused (r11) — the two
# sampling parts previously each scanned documents (one filter-agg, one
# window-agg); the fused builder computes the hash ONCE per row, ranks
# once, and emits BOTH parts' (n, checksum) aggregates from one grouped
# frame via a two-struct explode: one scan + one shuffle for the pair,
# bit-identical integers. dedup_corpus/retention are unrelated subplans
# and build as before.
_X13_PARTS = [
    ("sample_bernoulli", q_hash_sample, SQL_HASH_SAMPLE,
     {"key": "source", "n": "n_sampled", "id_checksum": "id_checksum"}),
    ("sample_stratified", q_stratified_sample_agg,
     SQL_STRATIFIED_SAMPLE_AGG,
     {"key": "source", "n": "n_sampled", "id_checksum": "id_checksum"}),
    ("dedup_corpus", q_dedup_corpus, SQL_DEDUP_CORPUS,
     {"key": "source", "n": "n_kept", "id_checksum": "id_checksum"}),
    ("retention", q_retention, SQL_RETENTION,
     {"key": "CAST(user_id AS STRING)", "n": "kept",
      "id_checksum": "id_checksum"}),
]
_X13_COLS = ["key", "n", "id_checksum"]
_X13_SQL = aligned_union_check(_X13_PARTS, columns=_X13_COLS)[1]


def q_id_checksums_fused(spark, sf_dir):
    """x13 Spark side, hand-fused sampling subplan (see the comment on
    _X13_PARTS). Values are the exact integers the per-part fns emit —
    the window rank and the hash bucket derive from the same hash_expr
    the standalone operators use."""
    from pyspark.sql import Window

    from sparvi_spark.checks.pipeline_checks import SAMPLE_PCT, STRAT_N
    from sparvi_spark.operators.sampling import hash_expr
    from sparvi_spark.testdata import load_table

    docs = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy(hash_expr("doc_id"),
                                             F.col("doc_id"))
    base = (docs.select("source", "doc_id",
                        (hash_expr("doc_id") % 100).alias("__bk"))
            .withColumn("__rk", F.row_number().over(w))
            .groupBy("source")
            .agg(F.expr(f"cast(sum(case when __bk < {SAMPLE_PCT} then 1 "
                        f"else 0 end) as bigint)").alias("bn"),
                 F.expr(f"cast(sum(case when __bk < {SAMPLE_PCT} then "
                        f"doc_id else 0 end) as bigint)").alias("bc"),
                 F.expr(f"cast(sum(case when __rk <= {STRAT_N} then 1 "
                        f"else 0 end) as bigint)").alias("sn"),
                 F.expr(f"cast(sum(case when __rk <= {STRAT_N} then "
                        f"doc_id else 0 end) as bigint)").alias("sc")))
    sampled = base.selectExpr(
        "explode(array("
        "named_struct('part', 'sample_bernoulli', 'key', source, "
        "'n', bn, 'id_checksum', bc), "
        "named_struct('part', 'sample_stratified', 'key', source, "
        "'n', sn, 'id_checksum', sc))) AS u"
        # n = 0 can only mean "no row survived the filter" — the
        # standalone fns (and the oracle GROUP BYs) omit such groups
        # entirely rather than emitting a zero row
    ).where("u.n > 0").selectExpr("u.part AS part", "u.key AS key",
                                  "u.n AS n", "u.id_checksum AS id_checksum")
    out = sampled
    for tag, f, _sql, exprs in _X13_PARTS[2:]:
        out = out.unionAll(f(spark, sf_dir).selectExpr(
            f"'{tag}' as part",
            *[f"{exprs[c]} AS {c}" for c in _X13_COLS]))
    return out


# x27: the four doc-scores parts, ONE melt spec used twice — the
# generated oracle SQL pairs with a hand-fused Spark builder (the a01
# idiom) so the classifier scoring pass runs ONCE for the classifier,
# clf_auc, and clf_pr parts instead of once per part. The per-part fns
# in the spec stay for scripts/check_oracle.py's standalone diagnosis.
_X27_PARTS = [
    ("classifier", q_classifier_scores, _sql_classifier_scores(),
     ["doc_id"], ["n_tokens", "feature_sum", "label"], []),
    ("lm_bigram", q_lm_score, SQL_LM_SCORE, ["doc_id"],
     ["n_bigrams", "avg_p"], []),
    # r10: classifier EVALUATION (round-9 e16/e17) driver-graded in the
    # classifier slot — exact grouped-count AUC and the P/R sweep
    ("clf_auc", q_classifier_eval, _sql_classifier_eval(), [],
     ["n_pos", "n_neg", "auc"], []),
    ("clf_pr", q_classifier_pr, _sql_classifier_pr(), ["threshold"],
     ["n_kept", "tp", "precision", "recall"], []),
]
_X27_SQL = melted_check(_X27_PARTS)[1]


def q_doc_scores_fused(spark, sf_dir):
    """x27 Spark side, hand-fused (r11): ONE ``linear_scores`` pass —
    localCheckpoint-pinned, n_docs small rows — feeds the classifier
    melt part (direct projection) AND both evaluation parts (grouped by
    feature_sum; AUC and P/R still share their exchange). The generated
    melt fn re-ran the interpreted per-token scoring fold once for the
    classifier part and once for the shared eval subplan (~0.4s of the
    1.5s serial at sf0.1). Values are bit-identical: the checkpoint is a
    materialization point, not a recompute. The lm_bigram part
    shares the slot's single tokenize via ``tokens_col`` (self_lm_score
    pins its result via localCheckpoint before the shared frame is
    released)."""
    from sparvi_spark.checks import melt_part_df
    from sparvi_spark.checks.pipeline_checks import (
        CLF_BIAS,
        _clf_weights,
    )
    from sparvi_spark.operators.classify import (
        classifier_eval,
        linear_scores,
        precision_recall_table,
    )
    from sparvi_spark.operators.lm import self_lm_score
    from sparvi_spark.testdata import load_table

    docs = load_table(spark, "documents", sf_dir)
    # ONE tokenize for the whole slot (r11): the classifier fold and the
    # bigram LM consume the same lowercased-whitespace split, so both
    # read a single persisted (doc_id, lang, token-array) frame instead
    # of each splitting `text` again. Outputs are bit-identical (same
    # arrays, same downstream math); both consumers pin their results
    # via localCheckpoint before the frame is released. Honest local
    # measurement: a WASH at sf0.1 (warm A/B 0.95s both forms — the
    # arrays-frame persist materialization costs about what the saved
    # split cost, with `text` already in the load_table cache). Kept
    # because it deletes a redundant subplan and, on an uncached corpus
    # at scale, decodes the text column once instead of twice.
    from sparvi_spark.operators.dedup import tokens_expr

    tk = docs.selectExpr(
        "doc_id", "lang", f"{tokens_expr('text')} AS __tk").persist()
    try:
        scored = linear_scores(tk, _clf_weights(), bias=CLF_BIAS,
                               emit_sum=True, keep_cols=["lang"],
                               tokens_col="__tk").localCheckpoint()
        lm = self_lm_score(tk, tokens_col="__tk")
    finally:
        tk.unpersist()
    lab = scored.selectExpr("doc_id", "feature_sum",
                            "cast(lang = 'en' as int) AS y")
    frames = {
        "classifier": scored.select("doc_id", "n_tokens", "feature_sum",
                                    "label"),
        "lm_bigram": lm,
        "clf_auc": classifier_eval(lab, "y", "feature_sum"),
        "clf_pr": precision_recall_table(lab, "y", "feature_sum"),
    }
    out = None
    for tag, _f, _sql, keys, nums, strs in _X27_PARTS:
        d = melt_part_df(frames[tag], tag, keys, nums, strs)
        out = d if out is None else out.unionAll(d)
    return out


CHECKS = {
    # -- merged slots for previously-graded families --------------------
    "a01_anomaly_scores": (q_anomaly_scores_4way, _A01_SQL),
    "d02_pair_scores": aligned_union_check([
        ("jaccard_exact", q_jaccard_pairs, SQL_JACCARD_PAIRS, {
            "id_a": "id_a", "id_b": "id_b",
            "shared": "CAST(shared AS DOUBLE)",
            "sz_a": "CAST(sz_a AS DOUBLE)", "sz_b": "CAST(sz_b AS DOUBLE)",
            "score": "jaccard"}),
        ("minhash_lsh", q_minhash_lsh, SQL_MINHASH_LSH,
         {"id_a": "id_a", "id_b": "id_b", "score": "jaccard", **_PAIR_PAD}),
        ("embedding_cosine", q_embedding_neardup, SQL_EMBEDDING_NEARDUP,
         {"id_a": "id_a", "id_b": "id_b", "score": "cosine", **_PAIR_PAD}),
    ], columns=["id_a", "id_b", "shared", "sz_a", "sz_b", "score"]),
    "x13_id_checksums": (q_id_checksums_fused, _X13_SQL),
    "t02_rollups": melted_check([
        ("daily_rollup", q_daily_rollup, SQL_DAILY_ROLLUP, ["day"],
         ["passed", "failed", "seen", "health_score"], []),
        ("dashboard_daily", q_dashboard_combined, SQL_DASHBOARD_COMBINED,
         ["day"],
         ["total", "high", "medium", "low", "avg_value", "n_entities",
          "n_rows"], []),
    ]),
    "t03_summaries": melted_check([
        ("health_summary", q_health_summary, SQL_HEALTH_SUMMARY, ["grp"],
         ["total_rules", "passing", "failing", "health_score"],
         ["last_run"]),
        ("anomaly_summary", q_anomaly_summary_combined,
         SQL_ANOMALY_SUMMARY_COMBINED, ["section", "key"], ["cnt"], []),
    ]),
    "p14_misc_small": melted_check([
        ("preview", q_preview, SQL_PREVIEW, ["c_custkey"],
         ["c_nationkey", "c_acctbal"], ["c_name", "c_mktsegment"]),
        ("metric_history", q_metric_history, SQL_METRIC_HISTORY,
         ["metric_name", "event_id"], ["metric_value"], ["ts_s"]),
        ("top_tokens", q_top_tokens, SQL_TOP_TOKENS, ["token"],
         ["cnt", "rank"], []),
    ]),
    # -- round-5 LLM-pipeline families, now driver-graded ----------------
    "x24_drift": melted_check([
        ("numeric", q_numeric_drift, _sql_numeric_drift(), ["column_name"],
         ["n_expected", "n_actual", "tvd", "chi2"], []),
        ("categorical", q_categorical_drift, _sql_categorical_drift(),
         ["category"],
         ["p_expected", "p_actual", "delta", "abs_delta"], []),
        # r10: the round-9 vocabulary-drift family, previously EXTRA-only
        # (e18/e19) — now driver-graded in the drift slot it belongs to
        ("vocab", q_vocab_drift, _sql_vocab_drift(), ["token"],
         ["n_a", "n_b", "p_a", "p_b", "delta"], []),
        ("vocab_tvd", q_vocab_tvd, _sql_vocab_tvd(), [],
         ["tvd", "n_tokens_union"], []),
    ]),
    "x27_doc_scores": (q_doc_scores_fused, _X27_SQL),
    "x26_shard_split": aligned_union_check([
        ("shard_plan", q_shard_plan, _sql_shard_plan(),
         {"key": "CAST(shard AS STRING)", "n": "n_rows",
          "min_id": "min_id", "max_id": "CAST(max_id AS DOUBLE)"}),
        ("eval_split", q_eval_split, _sql_eval_split(),
         {"key": "split", "n": "n", "min_id": "min_id",
          "max_id": "CAST(NULL AS DOUBLE)"}),
    ], columns=["key", "n", "min_id", "max_id"]),
    "e10_tokenize_pack": melted_check([
        ("bpe_encode", q_bpe_tokenize, SQL_BPE_TOKENIZE, ["doc_id"],
         ["n_tokens", "n_unk"], []),
        ("pack", q_pack_sequences, SQL_PACK_SEQUENCES,
         ["doc_id", "seg_idx"],
         ["shard", "n_tokens", "pack_id", "seg_start", "seg_tokens"], []),
        # r8: the no-split complement — next-fit-decreasing whole-document
        # bins, oracle-replayed sequentially via a recursive CTE
        ("binpack", q_binpack, _sql_binpack(), ["doc_id"],
         ["shard", "n_tokens", "truncated", "pack_idx", "pack_fill"], []),
    ]),
    "x30_semantic_dedup": (q_semantic_dedup, _sql_semantic_dedup()),
    "x31_duplicate_spans": (q_duplicate_spans, SQL_DUPLICATE_SPANS),
    "e11_sig_pairs": (q_sig_pairs, _sql_sig_pairs()),
    "e13_dedup_lines": (q_dedup_lines, SQL_DEDUP_LINES),
    "e14_corpus_diff": (q_corpus_diff, SQL_CORPUS_DIFF),
}
