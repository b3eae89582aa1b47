"""Spark wall-clock on the SAME 50 oracle queries the driver grades —
the Spark side of the operative-baseline comparison (see
scripts/baseline_duckdb.py for the DuckDB side and SCALING.md for the
recorded numbers). Protocol mirrors the DuckDB script: warm inputs,
best-of-2 per query (run 1 warms the plan, the min is steady-state),
one JSON line in bench.py's shape.

Usage:  python scripts/suite_spark.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    from sparvi_spark.checks import collect_all_checks
    from sparvi_spark.session import get_spark
    from sparvi_spark.testdata import load_table

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("suite_spark")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    for t in TABLES:
        load_table(spark, t, SF_DIR).count()
    print(f"# input warm: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    timings: dict[str, float] = {}
    for name, (fn, _sql) in sorted(collect_all_checks().items()):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).toPandas()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "oracle_suite_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
