"""Warehouse dialect layer (sources/dialects): pure-string quirk pins for
the warehouses the sandbox cannot host, plus an end-to-end drive of the
generated subqueries against embedded Derby — the one JDBC engine
available in-process. Reference surface:
backend/core/metadata/connectors.py:31-126,
backend/core/connections/builders.py:26-64."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparvi_spark.sources.dialects import DIALECTS, dialect_for


def test_identifier_quoting_and_folding():
    pg, sf, dby = DIALECTS["postgresql"], DIALECTS["snowflake"], DIALECTS["derby"]
    # standard double quotes, embedded quotes doubled — all engines
    for d in (pg, sf, dby):
        assert d.quote('We"ird') == '"We""ird"'
        assert d.quote("MixedCase") == '"MixedCase"'
    # Postgres folds unquoted identifiers DOWN (SQL-standard-contrary);
    # Snowflake and Derby fold UP — the classic silent-wrong-column trap
    assert pg.fold("MixedCase") == "mixedcase"
    assert sf.fold("MixedCase") == "MIXEDCASE"
    assert dby.fold("MixedCase") == "MIXEDCASE"


def test_row_bounding_and_sampling_syntax():
    assert DIALECTS["postgresql"].limit(10) == "LIMIT 10"
    assert DIALECTS["snowflake"].limit(10) == "LIMIT 10"
    # Derby has no LIMIT at all — standard fetch-first
    assert DIALECTS["derby"].limit(10) == "FETCH FIRST 10 ROWS ONLY"
    # engine-native sampling where it exists; LIMIT fallback where not
    assert DIALECTS["snowflake"].sample_rows(50) == "SAMPLE (50 ROWS)"
    assert DIALECTS["duckdb"].sample_rows(50) == "USING SAMPLE 50 ROWS"
    # Postgres TABLESAMPLE is percentage-only and FROM-attached — the
    # row-bounded API must fall back to LIMIT (sample_rows(1000) as a
    # TABLESAMPLE percent would be a syntax error)
    assert DIALECTS["postgresql"].sample_rows(1000) == "LIMIT 1000"
    assert DIALECTS["derby"].sample_rows(50) == "FETCH FIRST 50 ROWS ONLY"


def test_type_mapping_quirks():
    schema = T.StructType([
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("b", T.BinaryType()),
        T.StructField("n", T.DecimalType(12, 2), nullable=False),
    ])
    pg = DIALECTS["postgresql"].create_table_ddl("Tbl", schema)
    assert '"Tbl"' in pg and "DOUBLE PRECISION" in pg and "BYTEA" in pg
    assert "TEXT" in pg and "NUMERIC(12,2)" in pg and '"n" NUMERIC(12,2) NOT NULL' in pg
    sf = DIALECTS["snowflake"].create_table_ddl("Tbl", schema)
    # Snowflake's plain TIMESTAMP is a session alias — must be explicit
    assert "TIMESTAMP_NTZ" in sf and "NUMBER(12,2)" in sf and "BINARY" in sf
    dby = DIALECTS["derby"].create_table_ddl("Tbl", schema)
    assert "VARCHAR(32672)" in dby and "BLOB" in dby and "DECIMAL(12,2)" in dby


def test_pushdown_subquery_shapes():
    sf = DIALECTS["snowflake"].pushdown_subquery(
        "EVENTS", columns=["Id", "Val"],
        predicates=["\"Val\" > 10", "\"Id\" < 100"], limit=5)
    assert sf == ('(SELECT "Id", "Val" FROM EVENTS '
                  'WHERE ("Val" > 10) AND ("Id" < 100) LIMIT 5) '
                  'AS sparvi_sub')
    dby = DIALECTS["derby"].pushdown_subquery("T", limit=3)
    assert dby == "(SELECT * FROM T FETCH FIRST 3 ROWS ONLY) AS sparvi_sub"
    probe = DIALECTS["postgresql"].bounds_probe_sql("t", "MixedCol")
    assert probe == 'SELECT min("MixedCol") AS mn, max("MixedCol") AS mx FROM t'


def test_dialect_for_unknown_raises():
    with pytest.raises(NotImplementedError, match="no SQL dialect"):
        dialect_for("oracle")


def test_read_table_warehouse_side_pruning_derby(spark):
    """End-to-end: the dialect-rendered derived table runs inside the
    warehouse — columns pruned and rows filtered BEFORE Spark sees them,
    through the same read_table surface every warehouse connector gets.
    Also drives Derby's fetch-first limit syntax for the preview path."""
    from sparvi_spark.sources import read_table
    from sparvi_spark.sources.readers import _jdbc_url

    conn = {"type": "derby", "path": "memory:sparvi_dialects",
            "driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = spark.range(0, 100).selectExpr(
        "id AS k", "cast(id % 7 as int) AS grp", "id * 2.5 AS val")
    (src.write.format("jdbc").option("url", _jdbc_url(conn))
     .option("dbtable", "dial_t").option("driver", conn["driver"])
     .mode("overwrite").save())

    # Spark's JDBC writer QUOTES identifiers, so the table's columns are
    # case-exact lowercase — reading back with the folded-UP spelling
    # ("K") fails on the warehouse side. The dialect layer quotes the
    # requested names verbatim; callers match the creation spelling
    # (dialect.fold only applies to tables created with UNQUOTED DDL).
    df = read_table(spark, conn, "dial_t",
                    columns=["k", "grp"],
                    predicates=['"grp" = 3'])
    rows = df.collect()
    assert set(df.columns) == {"k", "grp"}         # val pruned warehouse-side
    assert len(rows) == 14 and all(r["grp"] == 3 for r in rows)

    # preview shape: bounded fetch through the dialect's limit syntax
    # (Derby rejects LIMIT — this is the clause that actually runs)
    sub = DIALECTS["derby"].pushdown_subquery("dial_t", columns=["k"],
                                              limit=5)
    lim = (spark.read.format("jdbc").option("url", _jdbc_url(conn))
           .option("dbtable", sub).option("driver", conn["driver"]).load())
    assert lim.count() == 5 and set(lim.columns) == {"k"}
