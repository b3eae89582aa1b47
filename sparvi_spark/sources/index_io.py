"""ANN index persistence: encode once, serve many.

An IVF-PQ index is two artifacts with opposite scale profiles: the
ENCODED ROWS (vec_id, cell, codes — byte-scale per vector, the 100 TB
side, written as cell-partitioned parquet so a search's nprobe cells
prune at the scan) and the MODEL (coarse centroids + PQ codebooks —
kilobytes, written as one JSON sidecar through the Hadoop FS so the same
roots Spark writes work: local, HDFS, s3a, gs). Searching a saved index
is then a cold-start read + ``ivfpq_topk`` with zero retraining — the
serve path of the similarity family.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparvi_spark.sources.writers import read_text_file, write_text_file


def save_ivfpq_index(
    df: DataFrame,
    path: str,
    centroids,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Encode ``df`` with the trained model and persist both halves:
    ``path/`` = cell-partitioned parquet of (id, codes) rows;
    ``path.model.json`` = centroids + codebooks sidecar. Returns a
    manifest dict {n_vectors, n_cells, m}. Cell partitioning means an
    ``nprobe``-cell search reads nprobe directories, not the corpus.
    """
    from sparvi_spark.operators.similarity import ivfpq_encode

    # the encoder canonicalizes the id column to 'vec_id'; the original
    # name rides in the sidecar and load_ivfpq_index restores it
    codes = ivfpq_encode(df, centroids, codebooks,
                         id_col=id_col, vec_col=vec_col)
    (codes.repartition("cell").sortWithinPartitions("cell", "vec_id")
     .write.mode("overwrite").partitionBy("cell").parquet(path))
    spark = df.sparkSession
    write_text_file(
        spark, f"{path}.model.json",
        json.dumps({
            # centroids are (bucket, vector) pairs (kmeans_train shape)
            "centroids": [[int(b), [float(x) for x in vec]]
                          for b, vec in centroids],
            "codebooks": [[[float(x) for x in c] for c in book]
                          for book in codebooks],
            # provenance: which source column produced the canonical
            # 'vec_id' ids stored in the codes parquet
            "id_col": id_col,
        }))
    try:
        stats = spark.read.parquet(path).groupBy().agg(
            F.expr("count(1)"), F.expr("count(distinct cell)")).first()
        n_vec, n_cells = int(stats[0] or 0), int(stats[1] or 0)
    except Exception:
        # zero-row input: partitionBy writes only _SUCCESS, nothing to
        # infer a schema from — an empty index, not an error
        n_vec, n_cells = 0, 0
    return {"n_vectors": n_vec, "n_cells": n_cells, "m": len(codebooks)}


def load_ivfpq_index(
    spark: SparkSession,
    path: str,
) -> tuple[DataFrame, list, list]:
    """-> (codes_df, centroids, codebooks) ready for ``ivfpq_topk``.
    The codes frame is lazy (nothing scans until a search runs); only
    the kilobyte model sidecar is read eagerly."""
    model = json.loads(read_text_file(spark, f"{path}.model.json"))
    cents = [(int(b), vec) for b, vec in model["centroids"]]
    # the codes frame keeps the canonical 'vec_id' column ivfpq_topk
    # expects on the index side; the sidecar's "id_col" records which
    # SOURCE column those ids came from (provenance for mapping results
    # back to the original table)
    return spark.read.parquet(path), cents, model["codebooks"]
