"""fastText-style hashed linear text classifier SCORING — the quality /
domain / toxicity classifier application step of a training-data
pipeline. The model trains offline on labeled KBs; scoring 100 TB of
candidate documents is the Spark-shaped problem, and it is a pure
projection here: no shuffle, no UDF, no join.

Score shape (binary classifier over hashed bag-of-tokens features):

    margin = bias + (Σ_tokens qw[hash(token) mod dim]) / (n_tokens · S)
    label  = margin > 0

Two engineering choices make it scale- and oracle-clean:

- **Int-quantized weights** (``S = 10^6`` — the int16/int8 quantization
  production classifiers ship with anyway): the per-document feature sum
  is exact integer arithmetic — overflow-safe in int64 to ~9·10^12
  tokens/doc, order-free, bit-identical in every engine — and the only
  float ops are one division and one add at the end (IEEE basic ops,
  correctly rounded everywhere). The oracle recomputes margins
  bit-for-bit; no transcendental enters the compared columns (sigmoid is
  offered as a separate convenience expression).
- **Model as one constant-folded literal**: the dim-int weight table
  (kilobytes) rides in the plan like the IVF centroid table
  (similarity.centroid_probe_expr) — parsed JVM-side in one call,
  collapsed to a single Literal by ConstantFolding, shipped with the
  task binary. No broadcast variable, no join against a weights table.

Token features use the portable character-fold polynomial hash
(dedup.portable_hash_expr arithmetic), the same one the MinHash/SimHash
oracles replay in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparvi_spark.operators.dedup import PORTABLE_P

WEIGHT_SCALE = 1_000_000


def quantize_weights(weights: list[float]) -> list[int]:
    """Float weights -> the int table the scorer folds into the plan."""
    return [int(round(float(w) * WEIGHT_SCALE)) for w in weights]


def _tok_hash(var: str) -> str:
    """Portable char-fold hash of a lambda-bound token variable (the
    expression dedup.portable_hash_expr builds for a column, re-rooted on
    a higher-order-function variable)."""
    return (f"aggregate(transform(sequence(1, length({var})), "
            f"i -> ascii(substring({var}, i, 1))), 0L, "
            f"(acc, c) -> (acc * 131 + c) % {PORTABLE_P})")


def linear_scores(
    df: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    bias: float = 0.0,
    round_to: int = 9,
) -> DataFrame:
    """(id, n_tokens, margin, label) per document.

    ``weights`` is the trained dense weight table (its length is the
    feature dimension); tokens are lowercased whitespace words (the text
    module's split semantics). ``label`` compares the UNROUNDED margin
    to 0 so it can never disagree with the sign of the true score;
    ``margin`` is rounded for stable comparison/storage.
    """
    dim = len(weights)
    qw = quantize_weights(weights)
    wlit = "array(%s)" % ", ".join(f"{w}L" for w in qw)
    toks = f"split(lower(trim(`{text_col}`)), '\\\\s+')"
    feat = (f"element_at({wlit}, "
            f"cast({_tok_hash('t')} % {dim} as int) + 1)")
    ssum = f"aggregate({toks}, 0L, (s, t) -> s + {feat})"
    margin = (f"(cast({float(bias)!r} as double) + cast({ssum} as double) "
              f"/ (cast(size({toks}) as double) * {WEIGHT_SCALE}.0d))")
    return df.selectExpr(
        f"`{id_col}`",
        f"size({toks}) AS n_tokens",
        f"round({margin}, {round_to}) AS margin",
        f"{margin} > 0.0d AS label",
    )


def sigmoid_expr(margin_col: str) -> Column:
    """P(label) from a margin column — convenience for consumers that
    want calibrated-ish probabilities; exp() is libm-bound, so this is
    deliberately NOT part of the oracle-compared projection."""
    return F.expr(f"1.0d / (1.0d + exp(-`{margin_col}`))")
