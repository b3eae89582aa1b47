"""Paired Spark-vs-DuckDB correctness checks.

Each module exposes ``CHECKS: dict[str, tuple[spark_fn, oracle_sql | None]]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is an
ANSI-SQL string DuckDB runs over the same parquet tables (driver contract in
__spark_entry__.py). Column names/aliases are identical on both sides;
every float output is rounded identically; sums feeding means go through
DECIMAL so float summation order cannot diverge between engines.
"""

from __future__ import annotations


def collect_all_checks() -> dict:
    from sparvi_spark.checks import (
        anomaly_checks,
        pipeline_checks,
        profile_checks,
        schema_checks,
        trend_checks,
        validation_checks,
    )

    out: dict = {}
    for mod in (profile_checks, validation_checks, anomaly_checks,
                trend_checks, schema_checks, pipeline_checks):
        overlap = set(out) & set(mod.CHECKS)
        if overlap:
            raise ValueError(f"duplicate check names: {overlap}")
        out.update(mod.CHECKS)
    return out
