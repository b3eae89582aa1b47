"""Training-data pipeline checks: dedup, similarity search, text analysis,
multimodal plumbing — paired with DuckDB oracles wherever the math is
engine-portable (fold-based dot products, integer rolling hashes); MinHash/
SimHash use engine hash builtins and register as rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparvi_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from sparvi_spark.operators.multimodal import documents_as_media, extract_image_features
from sparvi_spark.operators.similarity import cosine_topk, ivf_topk
from sparvi_spark.operators.text import (
    LANG_MARKERS,
    STOPWORDS_EN,
    fingerprint_expr,
    lang_id_expr,
    quality_features,
    top_tokens,
)
from sparvi_spark.testdata import load_table

DOC_CAP = 120  # doc_id bound for O(n²) pair checks

_DUCK_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"


# ---------------------------------------------------------------------------
# d01 exact dedup stats per source
# ---------------------------------------------------------------------------

def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("text").alias("n_distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("dup_count"),
    )


SQL_EXACT_DEDUP = """
SELECT source, count(*) AS n_rows, count(distinct text) AS n_distinct_texts,
  count(*) - count(distinct text) AS dup_count
FROM documents GROUP BY source
""".strip()

# ---------------------------------------------------------------------------
# d02 token-set (1-gram) Jaccard near-dup pairs — exact, oracle-checked
# ---------------------------------------------------------------------------

JACCARD_T = 0.9


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < DOC_CAP)
    return jaccard_pairs(docs, "doc_id", "text", n=1, threshold=JACCARD_T)


SQL_JACCARD_PAIRS = f"""
WITH sh AS (SELECT DISTINCT doc_id AS id, unnest({_DUCK_TOKS}) AS shingle
            FROM documents WHERE doc_id < {DOC_CAP}),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
shared AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
           FROM sh a JOIN sh b USING (shingle) WHERE a.id < b.id GROUP BY 1, 2)
SELECT id_a, id_b, shared, x.sz AS sz_a, y.sz AS sz_b,
  round(shared * cast(1 as double) / (x.sz + y.sz - shared), 6) AS jaccard
FROM shared JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
WHERE round(shared * cast(1 as double) / (x.sz + y.sz - shared), 6) >= {JACCARD_T}
""".strip()

# ---------------------------------------------------------------------------
# d07 near-dedup materialization: survivors after dropping the larger id of
# every Jaccard>=T pair (greedy keep-smallest policy)
# ---------------------------------------------------------------------------

def q_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparvi_spark.operators.dedup import dedup_near

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < DOC_CAP)
    pairs = jaccard_pairs(docs, "doc_id", "text", n=1, threshold=JACCARD_T)
    kept = dedup_near(docs, pairs, "doc_id")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_checksum"),
    )


SQL_DEDUP_CORPUS = f"""
WITH sh AS (SELECT DISTINCT doc_id AS id, unnest({_DUCK_TOKS}) AS shingle
            FROM documents WHERE doc_id < {DOC_CAP}),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
shared AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
           FROM sh a JOIN sh b USING (shingle) WHERE a.id < b.id GROUP BY 1, 2),
dups AS (SELECT DISTINCT id_b FROM shared
         JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
         WHERE round(shared * cast(1 as double) / (x.sz + y.sz - shared), 6)
               >= {JACCARD_T})
SELECT source, count(*) AS n_kept, cast(sum(doc_id) as bigint) AS id_checksum
FROM documents WHERE doc_id < {DOC_CAP}
  AND doc_id NOT IN (SELECT id_b FROM dups)
GROUP BY source
""".strip()

# ---------------------------------------------------------------------------
# d03 MinHash-LSH, portable-hash mode: the ORACLE recomputes the identical
# polynomial base hash, affine signature slots, band folds, candidate pairs,
# and exact-Jaccard verification. d04 SimHash stays rows-only (64-bit
# engine-native hashing has no portable DuckDB twin).
# ---------------------------------------------------------------------------

MH_HASHES, MH_BANDS = 16, 4


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < DOC_CAP)
    return minhash_lsh_pairs(docs, "doc_id", "text", n=1, num_hashes=MH_HASHES,
                             bands=MH_BANDS, threshold=JACCARD_T,
                             hash_fn="portable")


def _sql_minhash_lsh() -> str:
    from sparvi_spark.operators.dedup import (
        PORTABLE_BAND_M as M,
        PORTABLE_P as P,
        _affine_params,
    )

    rpb = MH_HASHES // MH_BANDS
    mins = ", ".join(
        "min(({a} * x + {b}) % {p}) AS h{i}".format(
            a=_affine_params(i)[0], b=_affine_params(i)[1], p=P, i=i)
        for i in range(MH_HASHES)
    )
    band_selects = []
    for bnd in range(MH_BANDS):
        expr = "0"
        for k in range(bnd * rpb, (bnd + 1) * rpb):
            expr = f"(({expr}) * {M} + h{k}) % {P}"
        band_selects.append(
            f"SELECT id, {bnd} AS band, {expr} AS bh FROM sig")
    banded = " UNION ALL ".join(band_selects)
    return f"""
WITH sh AS (SELECT DISTINCT doc_id AS id, unnest({_DUCK_TOKS}) AS shingle
            FROM documents WHERE doc_id < {DOC_CAP}),
hx AS (SELECT id, list_reduce(list_prepend(cast(0 as bigint),
         list_transform(range(1, strlen(shingle) + 1),
           i -> cast(ascii(substring(shingle, i, 1)) as bigint))),
         (acc, c) -> (acc * 131 + c) % {P}) AS x FROM sh),
sig AS (SELECT id, {mins} FROM hx GROUP BY id),
banded AS ({banded}),
cands AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
          WHERE a.id < b.id),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
shared AS (SELECT c.id_a, c.id_b, count(*) AS shared
           FROM cands c
           JOIN sh a ON a.id = c.id_a
           JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
           GROUP BY c.id_a, c.id_b)
SELECT id_a, id_b,
  round(shared * cast(1 as double) / (x.sz + y.sz - shared), 6) AS jaccard
FROM shared JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
WHERE round(shared * cast(1 as double) / (x.sz + y.sz - shared), 6)
      >= {JACCARD_T}
""".strip()


SQL_MINHASH_LSH = _sql_minhash_lsh()


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < DOC_CAP)
    return simhash_pairs(docs, "doc_id", "text", max_hamming=10)


# d06: portable SimHash fingerprints — the oracle reproduces the token
# hashes, per-bit majority votes, and bit packing exactly (30-bit portable
# base hash; the 64-bit xxhash64 variant above stays the production path).

SIMHASH_BITS = 30


def q_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparvi_spark.operators.dedup import simhash

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < DOC_CAP)
    return simhash(docs, "doc_id", "text", hash_fn="portable", bits=SIMHASH_BITS)


def _sql_simhash_portable() -> str:
    from sparvi_spark.operators.dedup import PORTABLE_P as P

    votes = ", ".join(
        f"sum(case when (h >> {b}) & 1 = 1 then 1 else -1 end) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    pack = " + ".join(
        f"(case when v{b} > 0 then cast({1 << b} as bigint) else 0 end)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (SELECT doc_id AS id, unnest({_DUCK_TOKS}) AS t
              FROM documents WHERE doc_id < {DOC_CAP}),
hx AS (SELECT id, list_reduce(list_prepend(cast(0 as bigint),
         list_transform(range(1, strlen(t) + 1),
           i -> cast(ascii(substring(t, i, 1)) as bigint))),
         (acc, c) -> (acc * 131 + c) % {P}) AS h FROM toks),
votes AS (SELECT id, {votes} FROM hx GROUP BY id)
SELECT id AS doc_id, {pack} AS simhash FROM votes
""".strip()


SQL_SIMHASH_PORTABLE = _sql_simhash_portable()


# d08: portable SimHash PAIRS — banding with n_chunks=4 > max_hamming=3
# guarantees exact recall (pigeonhole), so the oracle can brute-force all
# pairs over the d06 fingerprint CTE with bit_count(xor(...)) <= h.

SIMHASH_MAX_HAMMING = 3


def q_simhash_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < DOC_CAP)
    pairs = simhash_pairs(docs, "doc_id", "text",
                          max_hamming=SIMHASH_MAX_HAMMING,
                          hash_fn="portable", bits=SIMHASH_BITS)
    # bit_count returns int in Spark / tinyint in DuckDB; align on bigint
    return pairs.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def _sql_simhash_pairs_portable() -> str:
    fp = _sql_simhash_portable()
    return f"""
WITH fp AS ({fp})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  cast(bit_count(xor(a.simhash, b.simhash)) as bigint) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
""".strip()


SQL_SIMHASH_PAIRS_PORTABLE = _sql_simhash_pairs_portable()


# ---------------------------------------------------------------------------
# d05 embedding-cosine near-dup pairs (fold dot product, oracle-checked)
# ---------------------------------------------------------------------------

EMB_CAP = 100
COSINE_T = 0.3

_DUCK_DOT = (
    "list_reduce(list_prepend(cast(0 as double), "
    "list_transform(range(1, len({a}) + 1), "
    "i -> cast({a}[i] as double) * cast({b}[i] as double))), "
    "(acc, v) -> acc + v)"
)


def _duck_cosine(a: str, b: str) -> str:
    dot = _DUCK_DOT.format(a=a, b=b)
    na = _DUCK_DOT.format(a=a, b=a)
    nb = _DUCK_DOT.format(a=b, b=b)
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparvi_spark.operators.dedup import embedding_neardup_pairs

    emb = load_table(spark, "embeddings", sf_dir).where(F.col("vec_id") < EMB_CAP)
    return embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=COSINE_T)


SQL_EMBEDDING_NEARDUP = f"""
WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {EMB_CAP}),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        {_duck_cosine('a.embedding', 'b.embedding')} AS cosine
      FROM v a, v b WHERE a.vec_id < b.vec_id)
SELECT id_a, id_b, round(cosine, 6) AS cosine FROM p WHERE cosine >= {COSINE_T}
""".strip()

# ---------------------------------------------------------------------------
# x01 brute-force cosine top-k / x02 IVF (label-bucketed) top-k
# ---------------------------------------------------------------------------

N_QUERIES = 5
TOP_K = 10


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return cosine_topk(emb, queries, k=TOP_K)


SQL_COSINE_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < {N_QUERIES}),
scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             {_duck_cosine('e.embedding', 'q.qv')} AS cosine
           FROM embeddings e, q WHERE e.vec_id <> q.query_id)
SELECT query_id, neighbor_id,
  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
    AS rank,
  round(cosine, 6) AS cosine
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id ASC) <= {TOP_K}
""".strip()


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return ivf_topk(emb, queries, bucket_col="label", k=TOP_K)


SQL_IVF_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qb
           FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             {_duck_cosine('e.embedding', 'q.qv')} AS cosine
           FROM embeddings e JOIN q ON e.label = q.qb
           WHERE e.vec_id <> q.query_id)
SELECT query_id, neighbor_id,
  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
    AS rank,
  round(cosine, 6) AS cosine
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id ASC) <= {TOP_K}
""".strip()

# ---------------------------------------------------------------------------
# x03 text quality features
# ---------------------------------------------------------------------------

def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < DOC_CAP)
    return quality_features(docs)


_DUCK_STOP = ", ".join(f"'{w}'" for w in STOPWORDS_EN)

SQL_TEXT_QUALITY = f"""
WITH f AS (SELECT doc_id, length(text) AS n_chars,
  len({_DUCK_TOKS}) AS n_tokens,
  round(list_sum(list_transform({_DUCK_TOKS}, t -> length(t)))
        * cast(1 as double) / greatest(len({_DUCK_TOKS}), 1), 4) AS avg_token_len,
  round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
        * cast(1 as double) / greatest(length(text), 1), 4) AS punct_ratio,
  round(len(list_filter({_DUCK_TOKS}, t -> list_contains([{_DUCK_STOP}], t)))
        * cast(1 as double) / greatest(len({_DUCK_TOKS}), 1), 4) AS stopword_ratio
 FROM documents WHERE doc_id < {DOC_CAP})
SELECT *, round(greatest(1.0
  - case when n_tokens < 5 then 0.4 else 0.0 end
  - case when punct_ratio > 0.3 then 0.3 else 0.0 end
  - case when stopword_ratio = 0.0 then 0.2 else 0.0 end
  - case when avg_token_len < 2 or avg_token_len > 12 then 0.2 else 0.0 end,
  0.0), 4) AS quality_score
FROM f
""".strip()

# ---------------------------------------------------------------------------
# x04 language-ID confusion matrix (stopword-hit heuristic vs labeled lang)
# ---------------------------------------------------------------------------

def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.withColumn("guessed", lang_id_expr("text"))
        .groupBy("lang", "guessed").agg(F.count(F.lit(1)).alias("cnt"))
    )


def _sql_langid() -> str:
    langs = sorted(LANG_MARKERS)
    hits = ", ".join(
        "len(list_filter({toks}, t -> list_contains([{words}], t))) AS h_{lang}".format(
            toks=_DUCK_TOKS,
            words=", ".join(f"'{w}'" for w in LANG_MARKERS[lang]),
            lang=lang,
        )
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    case = "case when " + best + " = 0 then 'und' " + " ".join(
        f"when h_{lang} = {best} then '{lang}'" for lang in langs
    ) + " end"
    return (
        f"WITH h AS (SELECT lang, {hits} FROM documents) "
        f"SELECT lang, {case} AS guessed, count(*) AS cnt FROM h GROUP BY 1, 2"
    )


SQL_LANGID = _sql_langid()

# ---------------------------------------------------------------------------
# x05 rolling-hash fingerprint (portable integer arithmetic)
# ---------------------------------------------------------------------------

def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < DOC_CAP)
    return docs.select("doc_id", fingerprint_expr("text").alias("fingerprint"))


SQL_FINGERPRINT = f"""
SELECT doc_id, list_reduce(
  list_prepend(cast(0 as bigint),
    list_transform({_DUCK_TOKS},
      t -> cast(ascii(substring(t, 1, 1)) * 1000 + length(t) as bigint))),
  (acc, v) -> (acc * 31 + v) % 1000000007) AS fingerprint
FROM documents WHERE doc_id < {DOC_CAP}
""".strip()

# ---------------------------------------------------------------------------
# x06 corpus top tokens
# ---------------------------------------------------------------------------

def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return top_tokens(docs, "text", k=10)


SQL_TOP_TOKENS = f"""
WITH toks AS (SELECT unnest({_DUCK_TOKS}) AS token FROM documents),
counted AS (SELECT token, count(*) AS cnt FROM toks WHERE token <> ''
            GROUP BY token)
SELECT token, cnt,
  row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank
FROM counted QUALIFY row_number() OVER (ORDER BY cnt DESC, token ASC) <= 10
""".strip()

# ---------------------------------------------------------------------------
# m01 multimodal decode plumbing (mapInPandas; deterministic fake decoder)
# ---------------------------------------------------------------------------

def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < DOC_CAP)
    media = documents_as_media(docs)
    feats = extract_image_features(media, fake=True)
    return feats.select("media_id", "width", "height", "n_bytes")


SQL_MULTIMODAL_FEATURES = f"""
SELECT doc_id AS media_id,
  cast(strlen(text) % 640 + 1 as int) AS width,
  cast(strlen(text) % 480 + 1 as int) AS height,
  cast(strlen(text) as bigint) AS n_bytes
FROM documents WHERE doc_id < {DOC_CAP}
""".strip()


# ---------------------------------------------------------------------------
# x07 as-of join: each click joined to the user's latest preceding purchase
# (Spark: union+window forward-fill; oracle: DuckDB's native ASOF JOIN)
# ---------------------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparvi_spark.operators.joins import asof_join

    ev = load_table(spark, "events", sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id")
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .groupBy("user_id", "ts")
                 .agg(F.round(F.max("value"), 4).alias("purchase_value")))
    out = asof_join(clicks, purchases, by="user_id", ts_col="ts",
                    value_cols=["purchase_value"])
    return out.select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("right_purchase_value").alias("purchase_value"),
    )


SQL_ASOF_JOIN = """
WITH clicks AS (SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'click'),
purchases AS (SELECT user_id, ts, round(max(value), 4) AS purchase_value
              FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT c.user_id, c.event_id,
  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts, p.purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""".strip()


# ---------------------------------------------------------------------------
# x08 range join: lineitem prices into part price bands — bucketed equi-join
# prefilter + exact BETWEEN refine vs the oracle's plain theta join
# ---------------------------------------------------------------------------

RANGE_PART_CAP, RANGE_ORDER_CAP, RANGE_HALF_W = 100, 2000, 100.0


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparvi_spark.operators.joins import range_join

    points = (load_table(spark, "lineitem", sf_dir)
              .where(F.col("l_orderkey") < RANGE_ORDER_CAP)
              .select("l_extendedprice"))
    intervals = (load_table(spark, "part", sf_dir)
                 .where(F.col("p_partkey") < RANGE_PART_CAP)
                 .select("p_partkey",
                         (F.col("p_retailprice") - RANGE_HALF_W).alias("lo"),
                         (F.col("p_retailprice") + RANGE_HALF_W).alias("hi")))
    joined = range_join(points, intervals, "l_extendedprice", "lo", "hi",
                        bucket_width=2 * RANGE_HALF_W)
    return joined.groupBy("p_partkey").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
        .cast("double").alias("sum_price"),
    )


SQL_RANGE_JOIN = f"""
SELECT p_partkey, count(*) AS n_points,
  cast(round(sum(cast(l_extendedprice as decimal(18,2))), 2) as double)
    AS sum_price
FROM part, lineitem
WHERE p_partkey < {RANGE_PART_CAP} AND l_orderkey < {RANGE_ORDER_CAP}
  AND l_extendedprice BETWEEN p_retailprice - {RANGE_HALF_W}
                          AND p_retailprice + {RANGE_HALF_W}
GROUP BY p_partkey
""".strip()


# ---------------------------------------------------------------------------
# x09 semi-structured profiling: stats on a field INSIDE the events.props
# JSON column (get_json_object vs DuckDB ->> extraction)
# ---------------------------------------------------------------------------

def q_json_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparvi_spark.operators.profile import json_field_stats

    ev = load_table(spark, "events", sf_dir)
    out = json_field_stats(ev, "props", ["k"], group_by="event_type")
    return out.select(
        "event_type", "row_count", "k__present", "k__min", "k__max",
        F.round("k__sum", 2).alias("k__sum"))


SQL_JSON_PROFILE = """
SELECT event_type, count(*) AS row_count,
  count(props ->> 'k') AS k__present,
  min(cast(props ->> 'k' as double)) AS k__min,
  max(cast(props ->> 'k' as double)) AS k__max,
  round(cast(sum(cast(cast(props ->> 'k' as double) as decimal(28,8)))
             as double), 2) AS k__sum
FROM events GROUP BY event_type
""".strip()


CHECKS = {
    "d01_exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
    "d02_jaccard_pairs": (q_jaccard_pairs, SQL_JACCARD_PAIRS),
    "d03_minhash_lsh": (q_minhash_lsh, SQL_MINHASH_LSH),
    "d04_simhash_pairs": (q_simhash_pairs, None),
    "d06_simhash_portable": (q_simhash_portable, SQL_SIMHASH_PORTABLE),
    "d08_simhash_pairs_portable": (q_simhash_pairs_portable, SQL_SIMHASH_PAIRS_PORTABLE),
    "d07_dedup_corpus": (q_dedup_corpus, SQL_DEDUP_CORPUS),
    "d05_embedding_neardup": (q_embedding_neardup, SQL_EMBEDDING_NEARDUP),
    "x01_cosine_topk": (q_cosine_topk, SQL_COSINE_TOPK),
    "x02_ivf_topk": (q_ivf_topk, SQL_IVF_TOPK),
    "x03_text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "x04_langid": (q_langid, SQL_LANGID),
    "x05_fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "x06_top_tokens": (q_top_tokens, SQL_TOP_TOKENS),
    "x07_asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "x08_range_join": (q_range_join, SQL_RANGE_JOIN),
    "x09_json_profile": (q_json_profile, SQL_JSON_PROFILE),
    "m01_multimodal_features": (q_multimodal_features, SQL_MULTIMODAL_FEATURES),
}
