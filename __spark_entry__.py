"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: one-pass wide-aggregation numeric profile of
lineitem at sf0.001 (SURVEY.md §2.A P4, one scan for all columns).
``queries()`` / ``oracle_sql()`` — the paired check suite from
``sparvi_spark.checks`` (one entry per implemented operator family).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from sparvi_spark.checks import collect_all_checks  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sparvi_spark.checks.profile_checks import q_numeric_stats

    return q_numeric_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in collect_all_checks().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql
        for name, (_fn, sql) in collect_all_checks().items()
        if sql is not None
    }
