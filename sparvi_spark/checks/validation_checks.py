"""V1-V24 validation checks (SURVEY.md §2.B) — generated-rule suites per
table plus a custom-SQL (V24) passthrough, each paired with a DuckDB oracle
built from the SAME Rule objects (sparvi_spark.operators.validation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparvi_spark.operators.validation import (
    generate_default_rules,
    rules_oracle_sql,
    run_rules,
)
from sparvi_spark.testdata import SCHEMAS, load_table

AS_OF = "2026-01-01 00:00:00"

RULE_TABLES = ["lineitem", "orders", "customer", "part", "events", "documents"]


def _make_rule_check(table: str):
    spec = SCHEMAS[table]
    rules = generate_default_rules(spec, as_of=AS_OF)
    ref_names = {rt for _c, rt, _rc in spec.foreign_keys}
    # FK targets whose ref column is the declared PK need no distinct before
    # the broadcast build (saves a dimension-wide shuffle per FK)
    unique = frozenset(
        rt for c, rt, rc in spec.foreign_keys if SCHEMAS[rt].primary_keys == (rc,))

    def fn(spark: SparkSession, sf_dir: str, _table=table, _rules=rules,
           _refs=tuple(ref_names), _uniq=unique) -> DataFrame:
        df = load_table(spark, _table, sf_dir)
        refs = {rt: load_table(spark, rt, sf_dir) for rt in _refs}
        return run_rules(df, _rules, ref_tables=refs, unique_refs=_uniq)

    return fn, rules_oracle_sql(rules, table)


# V24 custom SQL passthrough: the engine's real SQL surface. A TPC-H-Q1-style
# aggregation issued as raw SQL over registered views (decimal-exact sums).
CUSTOM_SQL = """
SELECT l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
       cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
       cast(sum(cast(l_extendedprice as decimal(18,2)) * cast(1 as decimal(3,2))
            - cast(l_extendedprice as decimal(18,2)) * cast(l_discount as decimal(3,2)))
            as double) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".strip()


def q_custom_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparvi_spark.testdata import register_views

    register_views(spark, sf_dir)
    return spark.sql(CUSTOM_SQL)


# All six per-table rule suites union into ONE recorded check (driver caps
# recorded checks at 50 — checks.__init__.DRIVER_CHECK_CAP); the tag column
# keys each row back to its table. ~100 generated rules, all oracle-graded.
from sparvi_spark.checks import union_check  # noqa: E402

RULE_SUITE = {t: _make_rule_check(t) for t in RULE_TABLES}

CHECKS = {
    "v00_rules_all": union_check(
        [(t, fn, sql) for t, (fn, sql) in RULE_SUITE.items()],
        tag_col="table_name"),
    "v06_custom_sql": (q_custom_sql, CUSTOM_SQL),
}
