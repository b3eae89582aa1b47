"""Corpus-trained bigram language-model scoring — CCNet-style quality
filtering (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", public): score each document by how
typical its word transitions are of a reference corpus, then filter or
bucket by score. The reference corpus here can be the corpus itself
(self-scoring surfaces outlier documents: boilerplate, gibberish,
wrong-language) or a curated reference (cross-scoring).

Model = bigram transition counts with add-a smoothing:

    p(w2 | w1) = (c(w1,w2) + a) / (c(w1·) + a·V)

where c(w1·) = Σ_w2 c(w1,w2) (context count) and V = vocabulary size.
A document's score is the MEAN transition probability over its bigrams
(not log-perplexity: the mean of exact-ratio probabilities keeps every
compared number inside IEEE basic arithmetic — ln is libm-bound — so
the DuckDB oracle replays scores bit-for-bit; a log-space variant is a
consumer-side `ln()` away and ranks identically for filtering).

Spark shape at 100 TB: training is one explode + two groupBys (bigram
counts are corpus-wide aggregates — the shuffle carries (w1, w2, cnt),
bounded by distinct bigrams, with map-side partial aggregation);
scoring joins each document's bigrams against the model on (w1, w2) —
a plain shuffle join both sides of which are already keyed, no driver
state, model never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SMOOTH_A = 0.5
_DEC = "decimal(38,18)"


def _toks(text_col: str) -> str:
    return f"split(lower(trim(`{text_col}`)), '\\\\s+')"


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per ADJACENT token pair, order-preserving.

    The token array is MATERIALIZED as a column before the transform:
    higher-order-function lambdas are interpreted, so a split() spliced
    into the lambda body re-runs per ELEMENT — O(tokens²) per document
    (the dedup._doc_shingles / langid cliff). As a column reference it
    evaluates once per row and the transform is linear."""
    toks = _toks(text_col)
    return _bigrams_from_tokens(
        df.selectExpr(f"`{id_col}` as __id", f"{toks} as __tk"))


def _bigrams_from_tokens(tk: DataFrame) -> DataFrame:
    """(__id, token-array ``__tk``) -> (__id, w1, w2) — the ONE canonical
    bigram-explode used by both the text path above and the shared-
    tokens path in ``self_lm_score`` (the DuckDB oracle SQL_LM_SCORE
    replays the same pairing; keeping a single copy means a future
    change cannot silently desynchronize the two callers).

    r12: built from ``arrays_zip`` of two ``slice``s instead of a
    ``transform(sequence(...), i -> struct(element_at...))`` lambda —
    higher-order lambdas evaluate interpreted per ELEMENT while
    slice/arrays_zip are ordinary codegen'd expressions (guide §4.1:
    prefer built-ins over per-element evaluation). Pair stream is
    byte-identical (verified row-for-row at sf0.1: 265,704 identical
    (id, w1, w2) rows)."""
    return (tk.where("size(__tk) >= 2")
            .selectExpr("__id",
                        "explode(arrays_zip("
                        "slice(__tk, 1, size(__tk) - 1), "
                        "slice(__tk, 2, size(__tk) - 1))) as p")
            .selectExpr("__id", "p.`0` as w1", "p.`1` as w2"))


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Train on a corpus -> {'bigrams': (w1, w2, c12), 'contexts':
    (w1, c1), 'vocab': one-row (v)} — all lazy frames, never collected;
    reuse across many scoring calls."""
    toks = _toks(text_col)
    bigrams = (_doc_bigrams(df.selectExpr(f"monotonically_increasing_id() "
                                          f"as __rid", f"`{text_col}`"),
                            "__rid", text_col)
               .groupBy("w1", "w2").agg(F.expr("count(1)").alias("c12")))
    contexts = bigrams.groupBy("w1").agg(F.expr("sum(c12)").alias("c1"))
    vocab = (df.selectExpr(f"explode({toks}) as w")
             .agg(F.expr("count(distinct w)").alias("v")))
    return {"bigrams": bigrams, "contexts": contexts, "vocab": vocab}


def bigram_lm_score(
    df: DataFrame,
    model: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    smooth_a: float = SMOOTH_A,
    round_to: int = 9,
    doc_bg: DataFrame | None = None,
) -> DataFrame:
    """(id, n_bigrams, avg_p) per document with >= 2 tokens — mean
    smoothed transition probability under the model (higher = more
    typical of the training corpus). Unseen bigrams/contexts fall back
    to the smoothing floor via zero-filled left joins.

    Determinism: each probability is exact-integer ratios through IEEE
    division; the per-document mean routes the (rounded) terms through
    DECIMAL so in-document summation order cannot matter.
    """
    a = float(smooth_a)
    if doc_bg is None:
        doc_bg = _doc_bigrams(df, id_col, text_col)
    scored = (doc_bg
              .join(model["bigrams"], ["w1", "w2"], "left")
              .join(model["contexts"], ["w1"], "left")
              .join(F.broadcast(model["vocab"])))
    prob = (f"((cast(coalesce(c12, 0) as double) + {a!r}d) / "
            f"(cast(coalesce(c1, 0) as double) + {a!r}d * cast(v as double)))")
    return (scored
            .selectExpr("__id",
                        f"cast(round({prob}, 15) as {_DEC}) as __p")
            .groupBy("__id")
            .agg(F.expr("count(1)").alias("n_bigrams"),
                 F.expr(f"round(cast(sum(__p) as double) / count(1), "
                        f"{round_to})").alias("avg_p"))
            .withColumnRenamed("__id", id_col))


def self_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 9,
    tokens_col: str | None = None,
    shape: str | None = None,
) -> DataFrame:
    """Score a corpus against its own bigram statistics — the outlier
    screen: documents whose transitions are rare in-corpus (gibberish,
    boilerplate explosions, wrong language) land at the bottom.

    ``train_bigram_lm`` stays the separate-corpus API.

    ``tokens_col`` names a PRE-SPLIT token-array column on ``df`` —
    callers that already tokenized the corpus for another consumer (the
    graded x27 melt shares one tokens frame with linear_scores) skip
    this function's own split; arrays must be the same lowercased-
    whitespace split for outputs to stay bit-identical.

    ``shape`` picks the physical plan; every lane computes the SAME
    integer counts, so outputs are bit-identical (same IEEE division,
    same decimal rounding) and the choice is purely physical:

    - ``"agg"`` (default, r13 — the skew-safe lane): c(w1,w2) is a
      two-level aggregation of the bigram stream (map-side partial agg,
      shuffle bounded by DISTINCT bigrams, never by stream length) and
      c(w1·) = sum over w2 is a window over the AGGREGATED model frame
      (a w1 partition there holds at most |vocab| one-row-per-bigram
      rows, bounded regardless of corpus size). The model then joins
      back onto the stream on (w1, w2) — a join AQE can broadcast when
      the model is small and SKEW-SPLIT when one bigram is hot, which
      no window over the raw stream can be. The r12 window lane put
      count(1) OVER (PARTITION BY w1) on the FULL bigram stream: at
      100 TB a natural-language corpus guarantees a hot "the" partition
      that one task must sort alone (VERDICT r12 item 1). Cost: the
      stream subtree is consumed twice (model build + join probe) — two
      passes over the token arrays instead of one, which measures at
      parity locally (see OPTIMIZATION_r13.md) and is the right trade
      at scale, where a single straggler partition dominates wall.
    - ``"window"`` (the r12 lane, kept for A/B and for corpora KNOWN to
      have no hot context token): c1/c12 as two window counts sharing
      one full-stream Exchange on w1.
    """
    toks = f"`{tokens_col}`" if tokens_col else _toks(text_col)
    tk = df.selectExpr(f"`{id_col}` as __id", f"{toks} as __tk")
    doc_bg = _bigrams_from_tokens(tk)
    vocab = (tk.selectExpr("explode(__tk) as w")
             .agg(F.expr("count(distinct w)").alias("v")))
    a = float(SMOOTH_A)
    prob = (f"((cast(c12 as double) + {a!r}d) / "
            f"(cast(c1 as double) + {a!r}d * cast(v as double)))")
    shape = shape or "agg"
    if shape == "agg":
        model = (doc_bg.groupBy("w1", "w2")
                 .agg(F.expr("count(1)").alias("c12"))
                 .selectExpr("w1", "w2", "c12",
                             "sum(c12) OVER (PARTITION BY w1) as c1"))
        scored = doc_bg.join(model, ["w1", "w2"]).join(F.broadcast(vocab))
    elif shape == "window":
        scored = (doc_bg.join(F.broadcast(vocab))
                  .selectExpr("__id",
                              "count(1) OVER (PARTITION BY w1) as c1",
                              "count(1) OVER (PARTITION BY w1, w2) as c12",
                              "v"))
    else:
        raise ValueError(f"unknown self_lm_score shape {shape!r}")
    return (scored
            .selectExpr("__id",
                        f"cast(round({prob}, 15) as {_DEC}) as __p")
            .groupBy("__id")
            .agg(F.expr("count(1)").alias("n_bigrams"),
                 F.expr(f"round(cast(sum(__p) as double) / count(1), "
                        f"{round_to})").alias("avg_p"))
            .withColumnRenamed("__id", id_col))
