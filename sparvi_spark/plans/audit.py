"""Physical-plan audit — the engine's own "is this the plan you'd want?"
check, mechanized.

Every scale rule this repo follows (filters reach the scan, projections
prune columns, no per-row Python in hot paths, codegen spans wide, shuffle
count minimal) is visible in the executed plan string; this module parses
those signals into a dict so tests can ASSERT plan quality instead of
eyeballing `.explain()` output, and operators can be gated on regressions
("this query must stay exchange-free").

Heuristic by design: it reads the formatted plan, not the internal tree —
good enough for assertions, zero JVM-version coupling beyond the plan
vocabulary.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_PYTHON_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas", "PythonMapInArrow")


def plan_audit(df: DataFrame) -> dict:
    """Audit a DataFrame's EXECUTED plan -> summary dict.

    Keys:
    - n_exchanges: shuffle boundaries (Exchange nodes; ReusedExchange and
      broadcast exchanges counted separately).
    - n_broadcasts / n_reused_exchanges
    - python_nodes: per-row/batched Python evaluation nodes present (the
      slow path — empty for pure-JVM plans; mapInPandas shows up here by
      design, it IS a Python stage).
    - wholestage_codegen: True if any WholeStageCodegen span exists.
    - scans: per file scan — format, pushed filters, read-schema columns
      (column pruning evidence).
    - has_cartesian: CartesianProduct / BroadcastNestedLoopJoin present.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = []
    for line in plan.splitlines():
        m = re.search(r"FileScan (\w+)", line)
        if not m:
            continue
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", line)
        cols = [c.split(":")[0] for c in schema.group(1).split(",")
                if c.strip()] if schema else []
        # pushed-filter entries like EqualTo(l_orderkey,7) contain commas;
        # split on "), " boundaries so each predicate stays whole
        plist = []
        if pushed and pushed.group(1).strip():
            plist = [f if f.endswith(")") else f + ")"
                     for f in pushed.group(1).split("), ")]
        scans.append({
            "format": m.group(1),
            "pushed_filters": plist,
            "read_columns": cols,
        })
    shuffle_exchanges = len(re.findall(r"\bExchange (?:hash|range|Single)",
                                       plan))
    return {
        "n_exchanges": shuffle_exchanges,
        "n_broadcasts": plan.count("BroadcastExchange"),
        "n_reused_exchanges": plan.count("ReusedExchange"),
        "python_nodes": sorted({n for n in _PYTHON_NODES if n in plan}),
        "wholestage_codegen": "WholeStageCodegen" in plan,
        "scans": scans,
        "has_cartesian": ("CartesianProduct" in plan
                          or "BroadcastNestedLoopJoin" in plan),
    }


def assert_plan(df: DataFrame, *, max_exchanges: int | None = None,
                no_python: bool = False, no_cartesian: bool = False,
                pushed_filter_on: str | None = None) -> dict:
    """Assert plan-quality invariants; returns the audit for chaining.
    Raises AssertionError with the offending plan signal named."""
    a = plan_audit(df)
    if max_exchanges is not None and a["n_exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan has {a['n_exchanges']} shuffle exchanges "
            f"(max {max_exchanges})")
    if no_python and a["python_nodes"]:
        raise AssertionError(f"Python eval nodes in plan: {a['python_nodes']}")
    if no_cartesian and a["has_cartesian"]:
        raise AssertionError("cartesian/nested-loop join in plan")
    if pushed_filter_on is not None:
        hit = any(pushed_filter_on in f for s in a["scans"]
                  for f in s["pushed_filters"])
        if not hit:
            raise AssertionError(
                f"no pushed filter mentioning {pushed_filter_on!r}; "
                f"scans: {a['scans']}")
    return a


__all__ = ["plan_audit", "assert_plan"]
