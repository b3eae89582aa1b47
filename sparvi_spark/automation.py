"""Automation: schedules, due-job resolution, and engine events.

The reference runs a 60s scheduler loop with daily/weekly schedule configs,
job dedup, and event publication on failures/changes
(core/automation/simplified_scheduler.py:108-131, schedule_manager.py:
191-242, job_deduplication.py, events.py:10-24). In a Spark engine the loop
belongs to whatever orchestrator invokes us (cron/Airflow); this module
keeps the PURE parts — which jobs are due at time T, job-key dedup, and the
event records the engine appends when something noteworthy happens.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

EVENT_TYPES = (  # events.py:10-24 / metadata/events.py:9-16
    "validation_failure",
    "schema_change",
    "anomaly_detected",
    "profile_completed",
    "collection_completed",
)


@dataclass(frozen=True)
class ScheduleConfig:
    """One automation schedule (schedule_manager.py:191-242 shape)."""

    job_type: str                 # profile | validation | metadata | anomaly
    table_name: str
    frequency: str = "daily"      # daily | weekly | interval
    at_hour: int = 2              # UTC hour for daily/weekly
    weekday: int = 0              # 0=Monday, for weekly
    interval_hours: float = 24.0  # for frequency=interval
    enabled: bool = True

    @property
    def job_key(self) -> str:
        """Dedup key (job_deduplication.py): one live job per (type, table)."""
        return f"{self.job_type}:{self.table_name}"


def _parse(ts: str) -> _dt.datetime:
    return _dt.datetime.strptime(ts, "%Y-%m-%d %H:%M:%S")


def is_due(cfg: ScheduleConfig, last_run: str | None, now: str) -> bool:
    """Whether cfg should run at ``now`` given its last completed run."""
    if not cfg.enabled:
        return False
    t = _parse(now)
    if last_run is None:
        return True
    last = _parse(last_run)
    if cfg.frequency == "interval":
        return (t - last).total_seconds() >= cfg.interval_hours * 3600
    if cfg.frequency == "daily":
        scheduled = t.replace(hour=cfg.at_hour, minute=0, second=0)
        if t < scheduled:
            # before today's slot: the job is still due if it MISSED the
            # previous slot (orchestrator downtime must catch up now, not
            # wait until at_hour comes around again)
            scheduled -= _dt.timedelta(days=1)
        return last < scheduled
    if cfg.frequency == "weekly":
        days_back = (t.weekday() - cfg.weekday) % 7
        scheduled = (t - _dt.timedelta(days=days_back)).replace(
            hour=cfg.at_hour, minute=0, second=0)
        if t < scheduled:
            scheduled -= _dt.timedelta(days=7)
        return last < scheduled
    raise ValueError(f"unknown frequency {cfg.frequency!r}")


def due_jobs(
    configs: list[ScheduleConfig],
    last_runs: dict[str, str],
    now: str,
    running: set[str] = frozenset(),
) -> list[ScheduleConfig]:
    """Due, deduplicated job list (one per job_key, running keys skipped)."""
    out: dict[str, ScheduleConfig] = {}
    for cfg in configs:
        key = cfg.job_key
        if key in running or key in out:
            continue
        if is_due(cfg, last_runs.get(key), now):
            out[key] = cfg
    return list(out.values())
