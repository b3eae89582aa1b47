"""Corpus snapshot diffing: what changed between two versions of a
document collection — the data-level sibling of the schema diff
(operators/schema_diff.py mirrors the reference's structure tracking,
core/schema/detector.py; this tracks CONTENT the same way). A curation
pipeline re-run is only trustworthy when you can say exactly which
documents it added, dropped, or rewrote.

Spark-first shape: both sides project to (id, xxhash64(text)) — 8-byte
rows — before the ONE full-outer equi-join on id, so the wide exchange
never carries document text. Output is one row per differing doc plus
an aggregated summary; unchanged docs survive only as a count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document changes old -> new: (id, status) with status in
    {added, removed, modified} — unchanged docs emit no row (at corpus
    scale they are almost everything; see ``corpus_diff_summary`` for
    their count).

    ``modified`` compares xxhash64 of the text (NULL text hashes to a
    distinct marker so NULL->'' counts as a modification; a 64-bit
    collision can only MISS a modification, expected n/2^64).
    """
    def keyed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("__id"),
            F.when(F.col(text_col).isNull(), F.lit(-1))
            .otherwise(F.xxhash64(F.col(text_col))).alias(f"__h_{side}"),
            F.lit(1).alias(f"__in_{side}"))

    j = keyed(old, "old").join(keyed(new, "new"), "__id", "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(F.col("__h_old") != F.col("__h_new"), "modified"))
    return (j.withColumn("status", status)
            .where(F.col("status").isNotNull())
            .select(F.col("__id").alias(id_col), "status"))


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per status — (status, n_docs) over {added, removed,
    modified, unchanged} — always all four rows, zeros included, so
    trend consumers get a fixed schema. Same single-join plan as
    ``corpus_diff`` with the count folded in (unchanged is counted here
    rather than materialized per doc)."""
    def keyed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("__id"),
            F.when(F.col(text_col).isNull(), F.lit(-1))
            .otherwise(F.xxhash64(F.col(text_col))).alias(f"__h_{side}"),
            F.lit(1).alias(f"__in_{side}"))

    j = keyed(old, "old").join(keyed(new, "new"), "__id", "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(F.col("__h_old") != F.col("__h_new"), "modified")
        .otherwise("unchanged"))
    counts = j.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).alias("n_docs"))
    spine = old.sparkSession.createDataFrame(
        [("added",), ("removed",), ("modified",), ("unchanged",)],
        "status string")
    return (spine.join(counts, "status", "left")
            .select("status",
                    F.coalesce("n_docs", F.lit(0)).alias("n_docs")))
