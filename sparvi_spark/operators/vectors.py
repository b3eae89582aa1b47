"""Vector-column utilities: normalization, PCA training/projection.

Embedding pipelines routinely center/normalize vectors and reduce
dimensionality before indexing (PQ/IVF train better on decorrelated
inputs). The heavy step — the d x d Gram matrix — is the textbook
distributed shape: each Arrow batch contributes X^T X via one numpy
matmul (mapInPandas; this is the legitimate pandas-UDF case, a dense
BLAS kernel per batch, not per-row Python), the per-batch matrices
fold with an element-wise sum, and only the d x d matrix (KBs) reaches
the driver for the eigendecomposition. Projection is then a map-only
literal-matrix expression, the same inline-the-trained-state pattern as
the IVF/PQ search paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def l2_normalize_expr(vec_col: str) -> Column:
    """Unit-norm copy of a float-array column (zero vectors pass through)."""
    norm = (f"sqrt(aggregate(zip_with({vec_col}, {vec_col}, "
            f"(x, y) -> cast(x as double) * y), cast(0 as double), "
            f"(acc, v) -> acc + v))")
    return F.expr(
        f"case when {norm} = 0.0 then transform({vec_col}, x -> cast(x as double)) "
        f"else transform({vec_col}, x -> cast(x as double) / {norm}) end")


def gram_matrix(df: DataFrame, vec_col: str = "embedding"):
    """(count, mean vector, covariance matrix) of a vector column as numpy
    arrays — the KB-sized training statistics.

    Plan: one mapInPandas pass emits per-batch (n, sum, flattened X^T X);
    a posexplode + groupBy folds them element-wise (shuffle carries
    d + d^2 rows per batch, not data); the driver assembles covariance
    = E[xx^T] - mean mean^T from the single folded row set.
    """
    import numpy as np

    def batch_stats(batches):
        import pandas as pd

        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype="float64")
            if mat.size == 0:
                continue
            yield pd.DataFrame({
                "n": [int(mat.shape[0])],
                "s": [mat.sum(axis=0).tolist()],
                "g": [(mat.T @ mat).ravel().tolist()],
            })

    parts = df.select(vec_col).where(F.col(vec_col).isNotNull()).mapInPandas(
        batch_stats, "n long, s array<double>, g array<double>")
    folded = (
        parts.select(
            "n",
            F.posexplode(
                F.concat(F.col("s"), F.col("g"))).alias("i", "v"))
        .groupBy("i").agg(F.sum("v").alias("v"),
                          F.sum(F.when(F.col("i") == 0, F.col("n"))
                                .otherwise(0)).alias("__n"))
    )
    rows = folded.collect()
    total_n = int(sum(r["__n"] for r in rows))
    if total_n == 0:
        raise ValueError("gram_matrix: no vectors")
    flat = {r["i"]: r["v"] for r in rows}
    d = int(round((-1 + (1 + 4 * len(flat)) ** 0.5) / 2))  # d + d^2 entries
    s = np.array([flat[i] for i in range(d)])
    g = np.array([flat[d + i] for i in range(d * d)]).reshape(d, d)
    mean = s / total_n
    cov = g / total_n - np.outer(mean, mean)
    return total_n, mean, cov


def pca_train(df: DataFrame, k: int, vec_col: str = "embedding"):
    """Top-k principal components -> (mean, components) as plain lists
    (components[j] is the j-th unit eigenvector, descending eigenvalue;
    sign fixed so the largest-magnitude entry is positive — deterministic
    across LAPACK builds)."""
    import numpy as np

    _n, mean, cov = gram_matrix(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for j in order:
        v = vecs[:, j]
        if abs(v.min()) > abs(v.max()):
            v = -v
        comps.append([float(x) for x in v])
    return [float(x) for x in mean], comps


def pca_project_expr(
    vec_col: str, mean: list[float], components: list[list[float]],
    round_to: int | None = None,
) -> Column:
    """array<double> of PCA coordinates — a map-only projection with the
    trained mean/components inlined as array literals (fold per component,
    same compact-literal pattern as the PQ distance tables)."""
    from sparvi_spark.operators.similarity import _f

    mean_lit = "array(" + ", ".join(_f(x) for x in mean) + ")"
    comp_lits = ", ".join(
        "array(" + ", ".join(_f(x) for x in c) + ")" for c in components)
    centered = (f"zip_with({vec_col}, {mean_lit}, "
                f"(x, m) -> cast(x as double) - m)")
    proj = (f"transform(array({comp_lits}), c -> "
            f"aggregate(zip_with({centered}, c, (x, w) -> x * w), "
            f"cast(0 as double), (acc, v) -> acc + v))")
    if round_to is not None:
        proj = f"transform({proj}, x -> round(x, {round_to}))"
    return F.expr(proj)


def pca_project(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pca array<double>) for every row — zero shuffle."""
    return df.select(
        F.col(id_col),
        pca_project_expr(vec_col, mean, components).alias("pca"))


__all__ = ["l2_normalize_expr", "gram_matrix", "pca_train",
           "pca_project_expr", "pca_project"]
