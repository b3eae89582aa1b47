"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-stable only for a fixed partitioning — repartition
the input and the sample changes, which poisons reproducibility and makes
an engine-independent oracle impossible. These operators instead derive
the sampling decision from a *portable affine hash of the row key*, so the
sample is (a) identical across engines, partitionings, and cluster sizes,
(b) a pure narrow projection/filter — zero shuffles for the Bernoulli
path — and (c) stable under incremental reprocessing (a re-ingested row
lands in the same bucket).

Knuth multiplicative hashing: h = (key * 2654435761 + B) mod 2^32 — the
golden-ratio multiplier spreads sequential ids uniformly across buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_A = 2654435761  # 2^32 / golden ratio (Knuth)
HASH_B = 12345
HASH_M = 1 << 32


def hash_expr(id_col: str) -> Column:
    """Portable 32-bit affine hash of an integer key, as bigint.

    Valid for |key| < 2^63 / HASH_A ≈ 3.47e9: beyond that the multiply
    overflows int64 — Spark wraps while DuckDB raises, so the oracle and
    engine would diverge (error vs result). Keys above the bound must be
    pre-reduced mod 2^32 on BOTH sides before multiplying.

    pmod, not %: Spark's % keeps the dividend's sign, so a NEGATIVE key
    would hash negative — every bucket comparison (`bucket < percent`)
    would then be true and hash_sample would keep 100% of negative-id
    rows. pmod lands every key in [0, 2^32); the DuckDB oracle mirrors it
    with ((h % m) + m) % m (identical for non-negative keys)."""
    return F.expr(
        f"pmod(cast({id_col} as bigint) * {HASH_A}L + {HASH_B}L, {HASH_M}L)")


def hash_bucket(id_col: str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from an integer key column."""
    return (hash_expr(id_col) % buckets).cast("int")


def hash_sample(df: DataFrame, id_col: str, percent: int, buckets: int = 100) -> DataFrame:
    """Deterministic ~percent% Bernoulli sample: keep rows whose hash bucket
    is below ``percent``. Narrow filter — pushes down to the scan, no
    shuffle, no driver randomness."""
    return df.where(hash_bucket(id_col, buckets) < percent)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by hash order — a deterministic stand-in for uniform
    random choice. One shuffle on the strata key; the rank window never
    materializes more than the stratum on one task, and for the common
    "few rows per stratum" target AQE's skew handling bounds a hot stratum.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_expr(id_col), F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    proportions: dict[str, float],
) -> DataFrame:
    """Downsample to target mixture PROPORTIONS across groups — the data-
    mixing step of a training pipeline (e.g. rebalance web/books/code
    shares). Output size is maximized subject to the targets: the binding
    group is kept whole (quota = floor(N_out·p_g) with
    N_out = min_g(n_g / p_g)); every other group is cut to quota by hash
    order, so the selection is deterministic across engines, partitionings
    and re-runs, and a group's sample is a PREFIX of any larger sample
    (growing a quota never swaps previously selected rows).

    One tiny groupBy count to the driver (n_groups rows), then one shuffle
    on the group key for the rank window — the same shape as
    stratified_sample. Groups absent from ``proportions`` are dropped.
    """
    import math

    if not proportions or all(p <= 0 for p in proportions.values()):
        raise ValueError("proportions must contain at least one positive share")
    counts = {r[0]: r[1] for r in df.groupBy(group_col).count().collect()}
    missing = [g for g, p in proportions.items()
               if p > 0 and counts.get(g, 0) == 0]
    if missing:
        # a zero-count group would force n_out (and EVERY quota) to 0 —
        # surface the configuration error instead of returning 0 rows
        raise ValueError(f"groups {missing} have no rows; drop them from "
                         "proportions or fix the group column")
    n_out = min(counts[g] / p for g, p in proportions.items() if p > 0)
    # +1e-9 guard: at the binding group n_out·p IS n_g but IEEE rounding
    # can land at n_g−ulp, and bare floor would lose a row (e.g. n=6,
    # p=0.35). The epsilon never overshoots: quotas stay ≤ n_g.
    quotas = {g: int(math.floor(n_out * p + 1e-9))
              for g, p in proportions.items()}
    quota_map = F.create_map(
        *[F.lit(x) for gq in quotas.items() for x in gq])
    w = Window.partitionBy(group_col).orderBy(hash_expr(id_col), F.col(id_col))
    return (
        df.where(F.col(group_col).isin(list(quotas)))
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= quota_map[F.col(group_col)])
        .drop("__rk")
    )


def temperature_proportions(
    counts: dict[str, int], tau: float
) -> dict[str, float]:
    """Temperature-scaled mixture targets: p_g ∝ n_g^tau — the standard
    multilingual/data-recipe rebalance (tau=1 keeps natural proportions,
    tau→0 approaches uniform, intermediate values upsample the tail's
    SHARE without fabricating rows). Pure driver math over group counts."""
    if tau < 0:
        raise ValueError("tau must be >= 0")
    w = {g: float(n) ** tau for g, n in counts.items() if n > 0}
    if not w:
        raise ValueError("no non-empty groups")
    total = sum(w.values())
    return {g: v / total for g, v in w.items()}


def temperature_sample(
    df: DataFrame, group_col: str, id_col: str, tau: float
) -> DataFrame:
    """Downsample to the temperature-tau mixture: one tiny groupBy count
    to the driver for the targets, then the deterministic
    ``mixture_sample`` machinery (hash-order prefixes, one shuffle).
    tau=1 is a no-op by construction; smaller tau trims dominant groups
    until shares match n_g^tau / Σ n^tau."""
    counts = {r[0]: r[1] for r in df.groupBy(group_col).count().collect()}
    return mixture_sample(df, group_col, id_col,
                          temperature_proportions(counts, tau))
