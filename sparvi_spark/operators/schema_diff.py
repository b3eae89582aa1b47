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
    """S1-S7: full-outer-join diff of two snapshot DataFrames."""
    o = old.alias("o")
    n = new.alias("n")

    o_tables = old.select("table_name").distinct()
    n_tables = new.select("table_name").distinct()
    tbl = o_tables.alias("ot").join(
        n_tables.alias("nt"),
        F.col("ot.table_name") == F.col("nt.table_name"), "full_outer")
    table_changes = tbl.select(
        F.when(F.col("ot.table_name").isNull(), F.lit("table_added"))
        .when(F.col("nt.table_name").isNull(), F.lit("table_removed"))
        .alias("change_type"),
        F.coalesce(F.col("ot.table_name"), F.col("nt.table_name")).alias("table_name"),
        F.lit(None).cast("string").alias("column_name"),
        F.lit(None).cast("string").alias("details"),
    ).where(F.col("change_type").isNotNull())

    common = o_tables.join(n_tables, "table_name")

    cols = (
        o.join(common.alias("c1"), F.col("o.table_name") == F.col("c1.table_name"))
        .select("o.*").alias("oc")
        .join(
            n.join(common.alias("c2"), F.col("n.table_name") == F.col("c2.table_name"))
            .select("n.*").alias("nc"),
            (F.col("oc.table_name") == F.col("nc.table_name"))
            & (F.col("oc.column_name") == F.col("nc.column_name")),
            "full_outer",
        )
    )
    col_changes = cols.select(
        F.when(F.col("oc.column_name").isNull(), F.lit("column_added"))
        .when(F.col("nc.column_name").isNull(), F.lit("column_removed"))
        .when(F.col("oc.col_type") != F.col("nc.col_type"), F.lit("column_type_changed"))
        .when(F.col("oc.nullable") != F.col("nc.nullable"), F.lit("nullable_changed"))
        .alias("change_type"),
        F.coalesce(F.col("oc.table_name"), F.col("nc.table_name")).alias("table_name"),
        F.coalesce(F.col("oc.column_name"), F.col("nc.column_name")).alias("column_name"),
        F.when(
            F.col("oc.col_type") != F.col("nc.col_type"),
            F.concat_ws(" -> ", F.col("oc.col_type"), F.col("nc.col_type")),
        ).alias("details"),
    ).where(F.col("change_type").isNotNull())

    def pk_string(snap: DataFrame) -> DataFrame:
        # set-equality semantics (schema_change_detector.py:335-359) ->
        # compare name-sorted PK column lists
        return (
            snap.where(F.col("pk_ordinal").isNotNull())
            .groupBy("table_name")
            .agg(F.concat_ws(
                ",", F.array_sort(F.collect_list("column_name"))).alias("pk"))
        )

    opk = pk_string(old).alias("opk")
    npk = pk_string(new).alias("npk")
    pk_changes = (
        common.alias("cm")
        .join(opk, F.col("cm.table_name") == F.col("opk.table_name"), "left")
        .join(npk, F.col("cm.table_name") == F.col("npk.table_name"), "left")
        .where(
            ~(F.coalesce(F.col("opk.pk"), F.lit("")) ==
              F.coalesce(F.col("npk.pk"), F.lit("")))
        )
        .select(
            F.lit("primary_key_changed").alias("change_type"),
            F.col("cm.table_name").alias("table_name"),
            F.lit(None).cast("string").alias("column_name"),
            F.concat_ws(" -> ", F.coalesce(F.col("opk.pk"), F.lit("")),
                        F.coalesce(F.col("npk.pk"), F.lit(""))).alias("details"),
        )
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
