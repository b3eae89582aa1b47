"""Schedule/due-job resolution and engine event publication."""

import pytest
from pyspark.sql import functions as F

from sparvi_spark.automation import ScheduleConfig, due_jobs, is_due


def test_daily_schedule_due_once_per_day():
    cfg = ScheduleConfig("profile", "orders", frequency="daily", at_hour=2)
    assert is_due(cfg, None, "2026-01-02 03:00:00")                      # never ran
    assert is_due(cfg, "2026-01-01 02:00:01", "2026-01-02 03:00:00")     # new day
    assert not is_due(cfg, "2026-01-02 02:00:01", "2026-01-02 03:00:00") # already ran
    assert not is_due(cfg, "2026-01-01 02:00:01", "2026-01-02 01:00:00") # before hour


def test_weekly_and_interval():
    wk = ScheduleConfig("metadata", "t", frequency="weekly", at_hour=2, weekday=0)
    # 2026-01-05 is a Monday
    assert is_due(wk, "2026-01-01 02:00:01", "2026-01-05 02:30:00")
    assert not is_due(wk, "2026-01-05 02:10:00", "2026-01-06 09:00:00")
    iv = ScheduleConfig("anomaly", "t", frequency="interval", interval_hours=6)
    assert is_due(iv, "2026-01-01 00:00:00", "2026-01-01 06:00:00")
    assert not is_due(iv, "2026-01-01 00:00:00", "2026-01-01 05:59:59")


def test_due_jobs_dedup_and_running_skip():
    cfgs = [
        ScheduleConfig("profile", "orders"),
        ScheduleConfig("profile", "orders", at_hour=3),    # same job_key -> dedup
        ScheduleConfig("profile", "lineitem"),
        ScheduleConfig("validation", "orders", enabled=False),
    ]
    due = due_jobs(cfgs, {}, "2026-01-01 04:00:00", running={"profile:lineitem"})
    assert [c.job_key for c in due] == ["profile:orders"]


def test_engine_publishes_failure_and_change_events(spark, tmp_path):
    from sparvi_spark.engine import Engine
    from sparvi_spark.operators.validation import Rule
    from sparvi_spark.testdata import load_table
    from tests.conftest import SF_DIR

    eng = Engine(spark, str(tmp_path / "wh"))
    df = load_table(spark, "documents", SF_DIR)
    rules = [Rule("will_fail", "impossible rowcount", "less_than", 0, "agg",
                  agg_expr="count(*)")]
    eng.run_validations(df, "documents", rules, run_at="2026-01-01 00:00:00")
    eng.track_schema(df, "documents", as_of="2026-01-01 00:00:00")
    eng.track_schema(df.drop("lang"), "documents", as_of="2026-01-02 00:00:00")
    events = {r["event_type"]: r for r in eng.state.read("engine_events").collect()}
    assert events["validation_failure"]["details"] == "will_fail"
    assert "column_removed" in events["schema_change"]["details"]


def test_is_due_catches_up_missed_slots():
    """Review-fix pin: a daily/weekly job whose orchestrator was down over
    its slot is due IMMEDIATELY, not after the next at_hour comes around."""
    from sparvi_spark.automation import ScheduleConfig, is_due

    daily = ScheduleConfig("profile", "t", frequency="daily", at_hour=2)
    # last ran 3 days ago at 02:00; it is 01:00 now (before today's slot):
    # the 08-12/08-13 slots were missed -> due now
    assert is_due(daily, "2026-08-11 02:00:05", "2026-08-14 01:00:00")
    # ran at yesterday's slot, before today's slot -> NOT due yet
    assert not is_due(daily, "2026-08-13 02:00:05", "2026-08-14 01:00:00")
    # ran at today's slot -> not due
    assert not is_due(daily, "2026-08-14 02:00:01", "2026-08-14 03:00:00")

    weekly = ScheduleConfig("profile", "t", frequency="weekly",
                            at_hour=2, weekday=0)  # Mondays 02:00
    # 2026-08-10 is a Monday; now is Monday 01:00 with last run 8 days ago
    assert is_due(weekly, "2026-08-02 02:00:05", "2026-08-10 01:00:00")
    assert not is_due(weekly, "2026-08-03 02:00:05", "2026-08-10 01:00:00")
