"""Schema-diff operators S1-S8 (SURVEY.md §2.D), Spark-first.

The reference diffs two JSON schema snapshots with Python set ops
(backend/core/metadata/schema_change_detector.py:185-421); we represent a
snapshot as two small DataFrames (tables+columns, primary keys) and diff via
full-outer joins, so the same code scales to catalogs with millions of
columns.

Change rows: (change_type, table_name, column_name, details, important).
Importance (S7, :408-421): table_removed, column_removed,
column_type_changed, primary_key_changed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparvi_spark.testdata import TableSpec

IMPORTANT_CHANGES = (
    "table_removed", "column_removed", "column_type_changed", "primary_key_changed",
)

SNAPSHOT_SCHEMA = (
    "table_name string, column_name string, col_type string, nullable boolean, "
    "pk_ordinal int"
)


def snapshot_from_specs(spark: SparkSession, specs: list[TableSpec]) -> DataFrame:
    """Build a snapshot DataFrame from TableSpecs (S8 baseline bootstrap
    writes this to the snapshots table on first run)."""
    rows = []
    for spec in specs:
        pk_pos = {c: i + 1 for i, c in enumerate(spec.primary_keys)}
        for c in spec.columns:
            rows.append((spec.name, c.name, c.bucket, c.nullable, pk_pos.get(c.name)))
    return spark.createDataFrame(rows, SNAPSHOT_SCHEMA)


def snapshot_from_dataframe(spark: SparkSession, df: DataFrame, table: str,
                            primary_keys: tuple[str, ...] = ()) -> DataFrame:
    from sparvi_spark.operators.profile import type_bucket

    pk_pos = {c: i + 1 for i, c in enumerate(primary_keys)}
    rows = [
        (table, f.name, type_bucket(f.dataType), f.nullable, pk_pos.get(f.name))
        for f in df.schema.fields
    ]
    return spark.createDataFrame(rows, SNAPSHOT_SCHEMA)


def _change(change_type, table, column, details) -> list:
    return [change_type, table, column, details]


def compare_schemas(old: DataFrame, new: DataFrame) -> DataFrame:
    """S1-S7: diff two snapshot DataFrames as ONE union + aggregation.

    Both snapshots are tagged with a side flag and reduced per
    (table, column); every change class falls out of the per-column and
    per-table aggregates. The round-1 formulation chained four full-outer /
    left joins (~8 exchanges); this shape is one keyed shuffle + one
    tiny rollup — on a catalog of millions of columns the diff costs a
    single pass over the union.
    """
    tagged = old.select("*", F.lit(0).alias("__src")).unionAll(
        new.select("*", F.lit(1).alias("__src")))

    def oside(c):  # value of column c on the old side, null if absent
        return F.max(F.when(F.col("__src") == 0, F.col(c)))

    def nside(c):
        return F.max(F.when(F.col("__src") == 1, F.col(c)))

    percol = tagged.groupBy("table_name", "column_name").agg(
        F.count(F.when(F.col("__src") == 0, 1)).alias("o_cnt"),
        F.count(F.when(F.col("__src") == 1, 1)).alias("n_cnt"),
        oside("col_type").alias("o_type"), nside("col_type").alias("n_type"),
        oside("nullable").alias("o_null"), nside("nullable").alias("n_null"),
        oside("pk_ordinal").alias("o_pk"), nside("pk_ordinal").alias("n_pk"),
    )
    # per-table rollup: side presence + name-sorted PK column lists
    # (set-equality semantics, schema_change_detector.py:335-359)
    pertab = percol.groupBy("table_name").agg(
        F.max(F.col("o_cnt") > 0).alias("o_present"),
        F.max(F.col("n_cnt") > 0).alias("n_present"),
        F.concat_ws(",", F.array_sort(F.collect_list(
            F.when(F.col("o_pk").isNotNull(), F.col("column_name"))))).alias("o_pkstr"),
        F.concat_ws(",", F.array_sort(F.collect_list(
            F.when(F.col("n_pk").isNotNull(), F.col("column_name"))))).alias("n_pkstr"),
    )

    table_changes = pertab.where(~F.col("o_present") | ~F.col("n_present")).select(
        F.when(~F.col("o_present"), F.lit("table_added"))
        .otherwise(F.lit("table_removed")).alias("change_type"),
        "table_name",
        F.lit(None).cast("string").alias("column_name"),
        F.lit(None).cast("string").alias("details"),
    )

    common = pertab.where(F.col("o_present") & F.col("n_present"))

    col_changes = percol.join(
        F.broadcast(common.select("table_name")), "table_name"
    ).select(
        F.when(F.col("o_cnt") == 0, F.lit("column_added"))
        .when(F.col("n_cnt") == 0, F.lit("column_removed"))
        .when(F.col("o_type") != F.col("n_type"), F.lit("column_type_changed"))
        .when(F.col("o_null") != F.col("n_null"), F.lit("nullable_changed"))
        .alias("change_type"),
        "table_name",
        "column_name",
        F.when(
            F.col("o_type") != F.col("n_type"),
            F.concat_ws(" -> ", F.col("o_type"), F.col("n_type")),
        ).alias("details"),
    ).where(F.col("change_type").isNotNull())

    pk_changes = common.where(F.col("o_pkstr") != F.col("n_pkstr")).select(
        F.lit("primary_key_changed").alias("change_type"),
        "table_name",
        F.lit(None).cast("string").alias("column_name"),
        F.concat_ws(" -> ", F.col("o_pkstr"), F.col("n_pkstr")).alias("details"),
    )

    changes = table_changes.unionAll(col_changes).unionAll(pk_changes)
    return changes.withColumn(
        "important", F.col("change_type").isin(*IMPORTANT_CHANGES)
    )


def detect_changes(
    previous: DataFrame | None, current: DataFrame
) -> DataFrame | None:
    """S8: first run bootstraps the baseline and reports nothing
    (schema_change_detector.py:40-45)."""
    if previous is None:
        return None
    return compare_schemas(previous, current)
