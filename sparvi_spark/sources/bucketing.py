"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of fact-to-fact joins is the shuffle. Writing
both sides bucketed (and sorted) by the join key pins rows to buckets at
WRITE time; a later equi-join on that key reads matching buckets pairwise —
no Exchange in the plan (asserted in tests). This is the standing answer to
"the same big join runs every day": pay the partitioning once.

Spark-native bucketing (saveAsTable into the session catalog) — no Hive
metastore required. Bucket counts should match on both sides (or be
multiples, with spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally bucket-sorted) catalog table.

    Overwrite also clears a stale warehouse location: with the in-memory
    session catalog, a previous process's table files survive while the
    catalog entry does not, and saveAsTable refuses the orphan directory.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        import os
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = os.path.join(wh, table_name.split(".")[-1].lower())
        if os.path.exists(loc):
            shutil.rmtree(loc)
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket specs Spark plans a SortMergeJoin whose inputs
    read buckets directly — zero Exchange nodes on either side.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
