"""Dirty-data fixture detections (FIXTURES.md §1, mirroring the reference's
backend/scripts/generate_test_data.py:20-37 employees table): the profiler
and validators must find each seeded defect."""

import pytest
from pyspark.sql import functions as F

from sparvi_spark.operators.profile import profile_table
from sparvi_spark.operators.validation import (
    Rule,
    generate_default_rules,
    run_rules,
)
from sparvi_spark.testdata import ColumnSpec, TableSpec

EMPLOYEES_SPEC = TableSpec(
    "employees",
    (
        ColumnSpec("id", "numeric", nullable=False),
        ColumnSpec("name", "text", nullable=False),
        ColumnSpec("department", "text", nullable=True),
        ColumnSpec("salary", "numeric", nullable=True),
        ColumnSpec("hire_date", "datetime", nullable=False),
        ColumnSpec("email", "text", nullable=True),
    ),
    primary_keys=("id",),
)


@pytest.fixture(scope="module")
def employees(spark):
    """100 rows; nulls at salary rows 5-10 and department rows 15-18; one
    500000 salary outlier at row 25; one malformed email at row 50
    (generate_test_data.py:30-34)."""
    import datetime as dt

    rows = []
    for i in range(1, 101):
        salary = None if 5 <= i <= 10 else (500000.0 if i == 25 else 70000.0 + (i % 7) * 1000)
        dept = None if 15 <= i <= 18 else ["Sales", "Marketing", "Engineering", "HR", "Finance"][i % 5]
        email = "badformat" if i == 50 else f"employee{i}@example.com"
        rows.append((i, f"Employee {i}", dept, salary,
                     dt.datetime(2015, 1, 1) + dt.timedelta(weeks=i), email))
    return spark.createDataFrame(
        rows, "id int, name string, department string, salary double, "
              "hire_date timestamp, email string")


def test_profile_finds_seeded_defects(employees):
    p = profile_table(employees, "employees", as_of="2026-01-01 00:00:00")
    assert p["row_count"] == 100
    assert p["completeness"]["salary"]["nulls"] == 6
    assert p["completeness"]["department"]["null_percentage"] == 4.0
    assert p["summary_statistics"]["salary"]["max"] == 500000.0
    assert p["distinct_counts"]["id"] == 100
    # the outlier inflates stddev far beyond the clean spread
    assert p["summary_statistics"]["salary"]["stddev"] > 40000


def test_default_rules_flag_defects(employees):
    rules = generate_default_rules(EMPLOYEES_SPEC, as_of="2026-01-01 00:00:00")
    res = {r["rule_name"]: r for r in run_rules(employees, rules).collect()}

    assert res["check_employees_not_empty"]["is_valid"]
    assert res["check_name_not_null"]["is_valid"]
    # email format rule catches exactly the one malformed value
    email = res["check_email_valid_email"]
    assert email["actual_value"] == 1.0 and not email["is_valid"]
    # salary outlier rule: one value beyond 3 sample stddev
    outlier = res["check_salary_outliers"]
    assert outlier["actual_value"] == 1.0 and outlier["is_valid"]  # < 5 allowed
    # PK uniqueness passes
    assert res["check_employees_pk_unique"]["is_valid"]


def test_custom_symbolic_operator_rules(employees):
    rules = [
        Rule("sym_ge", "salary rows", ">=", 90, "agg", agg_expr="count(salary)"),
        Rule("sym_ne", "dept nulls", "!=", 0, "agg",
             agg_expr="count(case when department is null then 1 end)"),
        Rule("between_rows", "rowcount in range", "between", [50, 150], "agg",
             agg_expr="count(*)"),
    ]
    res = {r["rule_name"]: r for r in run_rules(employees, rules).collect()}
    assert res["sym_ge"]["is_valid"]      # 94 >= 90
    assert res["sym_ne"]["is_valid"]      # 4 != 0
    assert res["between_rows"]["is_valid"]
