"""Driver testdata catalog: loaders + static schema specs.

The testdata tables (TESTDATA.md) are TPC-H-ish parquet files. The schema
specs below are the single source of truth shared by the Spark-side rule
generator AND the DuckDB oracle-SQL generator, so both sides derive their
queries from identical metadata (the reference derives rules from warehouse
introspection; parquet supplies no PK/length metadata, so keys are declared
here — SURVEY.md §1.1).

Type buckets follow the reference's substring bucketing
(reference: backend/core/metadata/collector.py:610-625):
int|float|numeric|decimal|double|real -> numeric; char|text|string -> text;
date|time -> datetime; bool -> boolean; else other.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as nanosecond
# longs (spark.sql.legacy.parquet.nanosAsLong) — convert to microsecond
# timestamps on load (truncation, matching DuckDB's nanos->micros read).
_NANOS_TS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANOS_TS.get(name, ()):
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.floor(F.col(c) / 1000).cast("long")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view (SQL surface / V24)."""
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    bucket: str  # numeric | text | datetime | boolean | other
    nullable: bool = True
    max_length: int | None = None  # declared VARCHAR length (V11)


@dataclass(frozen=True)
class TableSpec:
    name: str
    columns: tuple[ColumnSpec, ...]
    primary_keys: tuple[str, ...] = ()
    foreign_keys: tuple[tuple[str, str, str], ...] = ()  # (col, ref_table, ref_col)
    indexes: tuple[str, ...] = field(default=())

    def column(self, name: str) -> ColumnSpec:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    @property
    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]


def _n(name: str, nullable: bool = False) -> ColumnSpec:
    return ColumnSpec(name, "numeric", nullable)


def _t(name: str, nullable: bool = False, max_length: int | None = None) -> ColumnSpec:
    return ColumnSpec(name, "text", nullable, max_length)


def _d(name: str, nullable: bool = False) -> ColumnSpec:
    return ColumnSpec(name, "datetime", nullable)


SCHEMAS: dict[str, TableSpec] = {
    "region": TableSpec(
        "region",
        ( _n("r_regionkey"), _t("r_name", nullable=True) ),
        primary_keys=("r_regionkey",),
    ),
    "nation": TableSpec(
        "nation",
        ( _n("n_nationkey"), _t("n_name", nullable=True), _n("n_regionkey") ),
        primary_keys=("n_nationkey",),
        foreign_keys=(("n_regionkey", "region", "r_regionkey"),),
    ),
    "customer": TableSpec(
        "customer",
        ( _n("c_custkey"), _t("c_name", nullable=True), _n("c_nationkey"), _n("c_acctbal"), _t("c_mktsegment", nullable=True) ),
        primary_keys=("c_custkey",),
        foreign_keys=(("c_nationkey", "nation", "n_nationkey"),),
    ),
    "supplier": TableSpec(
        "supplier",
        ( _n("s_suppkey"), _t("s_name", nullable=True), _n("s_nationkey"), _n("s_acctbal") ),
        primary_keys=("s_suppkey",),
        foreign_keys=(("s_nationkey", "nation", "n_nationkey"),),
    ),
    "part": TableSpec(
        "part",
        ( _n("p_partkey"), _t("p_name", nullable=True), _t("p_brand", nullable=True), _t("p_type", nullable=True), _n("p_size"), _n("p_retailprice") ),
        primary_keys=("p_partkey",),
    ),
    "orders": TableSpec(
        "orders",
        ( _n("o_orderkey"), _n("o_custkey"), _t("o_orderstatus", nullable=True), _n("o_totalprice"),
          _d("o_orderdate"), _t("o_orderpriority", nullable=True) ),
        primary_keys=("o_orderkey",),
        foreign_keys=(("o_custkey", "customer", "c_custkey"),),
    ),
    "lineitem": TableSpec(
        "lineitem",
        ( _n("l_orderkey"), _n("l_partkey"), _n("l_suppkey"), _n("l_linenumber"),
          _n("l_quantity"), _n("l_extendedprice"), _n("l_discount"), _n("l_tax"),
          _t("l_returnflag", nullable=True), _t("l_linestatus", nullable=True), _d("l_shipdate") ),
        primary_keys=("l_orderkey", "l_linenumber"),
        foreign_keys=(
            ("l_orderkey", "orders", "o_orderkey"),
            ("l_partkey", "part", "p_partkey"),
            ("l_suppkey", "supplier", "s_suppkey"),
        ),
    ),
    "events": TableSpec(
        "events",
        ( _n("event_id"), _d("ts"), _n("user_id"), _t("event_type", nullable=True), _n("value"), _t("props", nullable=True) ),
        primary_keys=("event_id",),
    ),
    "documents": TableSpec(
        "documents",
        ( _n("doc_id"), _t("text", nullable=True), _t("lang", nullable=True), _t("source", nullable=True), _n("n_chars") ),
        primary_keys=("doc_id",),
    ),
    "embeddings": TableSpec(
        "embeddings",
        ( _n("vec_id"), ColumnSpec("embedding", "other"), _n("label") ),
        primary_keys=("vec_id",),
    ),
}
