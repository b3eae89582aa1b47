"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json extension mandate): exact
dedup, n-gram Jaccard near-dup, MinHash+LSH, SimHash, and embedding-cosine
near-dup — all as declarative DataFrame programs designed for 100 TB:

- Shingling/token ops stay JVM-side (higher-order array functions, no UDFs).
- The Jaccard self-join joins on shingle (not doc×doc), so cost is
  Σ df(shingle)² — cap hot shingles with ``max_shingle_df`` at scale.
- MinHash uses xxhash64(shingle, seed) signatures; LSH bands shrink the
  candidate space from O(n²) to near-linear before exact verification.
- SimHash packs a 64-bit fingerprint via bit-position majority votes and
  finds Hamming-near pairs by pigeonhole banding (4×16-bit chunks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tokens_expr(text_col: str) -> str:
    """Lowercased whitespace tokens (dialect-common building block)."""
    return f"split(lower(trim({text_col})), '\\\\s+')"


def word_shingles(text_col: str, n: int) -> Column:
    """n-gram word shingles as an array<string> (JVM-side, no UDF)."""
    toks = tokens_expr(text_col)
    if n == 1:
        return F.expr(toks)
    return F.expr(
        f"transform(sequence(1, greatest(size({toks}) - {n - 1}, 0)), "
        f"i -> concat_ws(' ', slice({toks}, i, {n})))"
    )


def exact_duplicates(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact dedup groups: value tuple -> count (count>1 == duplicates)."""
    return (
        df.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
    )


def dedup_exact(df: DataFrame, cols: list[str]) -> DataFrame:
    """Keep one row per distinct value tuple (hash-shuffle dedup)."""
    return df.dropDuplicates(cols)


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct (id, shingle) pairs.

    The tokens array is materialized as its own column BEFORE the n-gram
    transform: an expression embedded in a lambda body is re-evaluated per
    array element, turning shingling O(tokens²)-per-doc (measured ~5×
    slower). Same idiom as word_shingles but projection-staged.
    """
    toks = df.select(F.col(id_col).alias("__id"),
                     F.expr(tokens_expr(text_col)).alias("__toks"))
    if n == 1:
        sh = toks.select("__id", F.explode("__toks").alias("shingle"))
    else:
        gram = (f"transform(sequence(1, greatest(size(__toks) - {n - 1}, 0)), "
                f"i -> concat_ws(' ', slice(__toks, i, {n})))")
        sh = toks.select("__id", F.explode(F.expr(gram)).alias("shingle"))
    return sh.distinct()


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """N-gram Jaccard near-duplicate pairs (exact, oracle-checkable).

    shared/(|A|+|B|-shared) >= threshold over distinct shingle sets; join on
    shingle so only docs sharing a shingle are compared. ``max_shingle_df``
    drops shingles appearing in more than N docs (stop-shingles) — the
    standard skew guard at scale (changes semantics; off by default).
    """
    sh = _doc_shingles(df, id_col, text_col, n)
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
               .where(F.col("__df") <= max_shingle_df).select("shingle"))
        sh = sh.join(hot, "shingle")
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))
    a = sh.select(F.col("__id").alias("id_a"), "shingle")
    b = sh.select(F.col("__id").alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared
        .join(sizes.select(F.col("__id").alias("id_a"), F.col("__sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("__id").alias("id_b"), F.col("__sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") * F.lit(1.0)
                    / (F.col("sz_a") + F.col("sz_b") - F.col("shared")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "shared", "sz_a", "sz_b", "jaccard")
    )


# Portable polynomial hashing (identical integer arithmetic in Spark SQL
# and DuckDB — lets the oracle recompute MinHash bit-for-bit; xxhash64 is
# the faster engine-native default for production).
PORTABLE_P = 1_000_000_007
PORTABLE_BAND_M = 1_000_003


def portable_hash_expr(col: str) -> str:
    """Character-fold polynomial hash of a string column -> [0, P)."""
    return (
        f"aggregate(transform(sequence(1, length({col})), "
        f"i -> ascii(substring({col}, i, 1))), 0L, "
        f"(acc, c) -> (acc * 131 + c) % {PORTABLE_P})"
    )


def _affine_params(i: int) -> tuple[int, int]:
    """Deterministic universal-hash params (a odd, both < P)."""
    a = ((i + 1) * 2654435761) % PORTABLE_P | 1
    b = ((i + 1) * 40503 * 65537 + 17) % PORTABLE_P
    return a, b


def dedup_near(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """Materialize a near-deduplicated corpus from a pair list.

    Greedy keep-smallest-id policy: every pair (id_a < id_b) marks id_b a
    duplicate; survivors = df anti-join duplicates. One distinct + one
    anti-join — no iterative connected components, which large-scale text
    dedup pipelines deliberately avoid (chains collapse toward the smallest
    id well enough for training-data purposes, and the policy is
    deterministic).
    """
    dups = pairs.select(F.col("id_b").alias("__dup")).distinct()
    return df.join(dups, df[id_col] == F.col("__dup"), "left_anti")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 64,
    hash_fn: str = "xxhash64", shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures: sig[i] = min(h_i(shingle)).

    ``hash_fn="xxhash64"``: engine-native seeded hashes (production).
    ``hash_fn="portable"``: one polynomial base hash per shingle + affine
    (a_i·x+b_i) mod P per signature slot — oracle-reproducible.
    One explode + one groupBy either way. Returns (id, sig: array<bigint>).
    ``shingles`` lets callers share a precomputed (__id, shingle) frame.
    """
    sh = shingles if shingles is not None else _doc_shingles(df, id_col, text_col, n)
    if hash_fn == "portable":
        sh = sh.select("__id", F.expr(portable_hash_expr("shingle")).alias("__x"))
        mins = []
        for i in range(num_hashes):
            a, b = _affine_params(i)
            mins.append(F.min((F.col("__x") * F.lit(a) + F.lit(b)) % PORTABLE_P)
                        .alias(f"h{i}"))
    else:
        mins = [
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    wide = sh.groupBy("__id").agg(*mins)
    return wide.select(
        F.col("__id").alias(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash+LSH near-dup candidates, verified with exact Jaccard.

    Band hashes bucket-join candidate pairs (near-linear vs O(n²)); the
    verification join recomputes exact Jaccard so output quality matches the
    exact operator on whatever candidates banding surfaces.
    """
    rows_per_band = num_hashes // bands
    # The shingle frame feeds FOUR subtrees (signatures, both sides of the
    # verification join, sizes); Spark's ReusedExchange can't dedup them
    # (projections differ), so persist once — 3 explode+distinct shuffles
    # saved. MEMORY_AND_DISK: shingle sets are ~tokens×n per doc.
    sh = _doc_shingles(df, id_col, text_col, n).persist()
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes, hash_fn,
                              shingles=sh)
    if hash_fn == "portable":
        band_hash = (f"aggregate(slice(sig, b * {rows_per_band} + 1, "
                     f"{rows_per_band}), 0L, "
                     f"(acc, v) -> (acc * {PORTABLE_BAND_M} + v) % {PORTABLE_P})")
    else:
        band_hash = f"xxhash64(slice(sig, b * {rows_per_band} + 1, {rows_per_band}))"
    banded = sigs.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b as band, {band_hash} as bh))"
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bh")
    cands = (
        a.join(b, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Exact-Jaccard verification driven by the candidate pairs only: expand
    # each pair by side-A's shingles, probe side-B on (id, shingle). Cost is
    # O(candidates × shingles/doc) — near-linear — instead of the
    # O(Σ df(shingle)²) all-pairs shingle self-join of jaccard_pairs.
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))
    shared = (
        cands
        .join(sh.select(F.col("__id").alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col("__id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared
        .join(sizes.select(F.col("__id").alias("id_a"), F.col("__sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("__id").alias("id_b"), F.col("__sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") * F.lit(1.0)
                    / (F.col("sz_a") + F.col("sz_b") - F.col("shared")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str,
            hash_fn: str = "xxhash64", bits: int = 64) -> DataFrame:
    """SimHash fingerprint per document (JVM-side bit votes).

    For each bit position, majority vote of token-hash bits; packed into one
    bigint. ``hash_fn="portable"`` (with bits<=30) uses the polynomial token
    hash so a DuckDB oracle reproduces fingerprints exactly. Returns
    (id, simhash: bigint).
    """
    if hash_fn == "portable":
        token_hash = portable_hash_expr("t")
        bits = min(bits, 30)  # portable base hash has 30 usable bits
    else:
        token_hash = "xxhash64(t)"
    # Token hashes materialized once per row (see _doc_shingles note: a
    # lambda-embedded subexpression is re-evaluated per element — here the
    # votes loop reads the hash array `bits` times).
    hashed = df.select(
        F.col(id_col),
        F.expr(f"transform({tokens_expr(text_col)}, t -> {token_hash})").alias("__h"),
    )
    votes = (
        f"transform(sequence(0, {bits - 1}), b -> "
        "aggregate(__h, 0L, (acc, h) -> acc + "
        "case when shiftright(h, b) & 1 = 1 then 1 else -1 end))"
    )
    packed = (
        f"aggregate(zip_with({votes}, sequence(0, {bits - 1}), "
        f"(v, b) -> case when v > 0 then shiftleft(1L, b) else 0L end), "
        f"0L, (acc, x) -> acc | x)"
    )
    return hashed.select(F.col(id_col), F.expr(packed).alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Hamming-near SimHash pairs via pigeonhole banding (4×16-bit chunks):
    any pair within Hamming distance 3 shares at least one exact chunk."""
    sh = simhash(df, id_col, text_col)
    chunks = sh.select(
        id_col, "simhash",
        F.explode(F.expr(
            "transform(sequence(0, 3), c -> struct(c as chunk, "
            "shiftright(simhash, c * 16) & 65535 as ch))"
        )).alias("cc"),
    ).select(id_col, "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.ch").alias("ch"))
    a = chunks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
                      "chunk", "ch")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
                      "chunk", "ch")
    return (
        a.join(b, ["chunk", "ch"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95,
    bucket_col: str | None = None, lsh_bits: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Brute self-join by default (the oracle-checkable exact path). Scale
    paths restrict the join to a coarse bucket: ``bucket_col`` (IVF-style
    pre-assigned) or ``lsh_bits`` (random-hyperplane LSH bucket computed
    inline — near-identical vectors share all sign bits, so true near-dups
    collide with prob ≈ (1-θ/π)^bits). Dot products are fold-based for
    deterministic summation order.
    """
    from sparvi_spark.operators.similarity import cosine_expr, lsh_bucket_expr

    cols = [F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")]
    if bucket_col:
        cols.append(F.col(bucket_col).alias("__b"))
    elif lsh_bits:
        cols.append(lsh_bucket_expr(vec_col, n_bits=lsh_bits).alias("__b"))
        bucket_col = "__b"
    v = df.select(*cols)
    a = v.select(F.col("__id").alias("id_a"), F.col("__v").alias("va"),
                 *([F.col("__b").alias("ba")] if bucket_col else []))
    b = v.select(F.col("__id").alias("id_b"), F.col("__v").alias("vb"),
                 *([F.col("__b").alias("bb")] if bucket_col else []))
    joined = a.crossJoin(b) if not bucket_col else a.join(b, F.col("ba") == F.col("bb"))
    return (
        joined.where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_expr("va", "vb"))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
