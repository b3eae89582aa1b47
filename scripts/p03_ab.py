"""Interleaved A/B for p03_distinct_counts candidates (r13 VERDICT #4).

Current shape (r12): 11 per-column two-level aggregation subtrees in one
UNION ALL statement — each subtree scans/aggregates ONE column, so the
union schedules 11 independent stage chains (22 exchanges-ish of tiny
data, 11 partial-agg passes over the cached table).

Candidate (r13 "type groups"): one subtree per SPARK TYPE GROUP — the
group's columns melt through a codegen'd ``stack`` keyed by an INT
column index (the p01/x24 fixed-width-key lesson), so the first-level
hash key is (int, native value), then a second level groups by idx
alone. Distinct semantics per column are unchanged (same native-type
equality), values attach to names via CASE after aggregation.

NOT retried (recorded r12 negative result): the single wide
count(distinct c1..c11) aggregate — Spark plans it as a 16x Expand.

Usage: python scripts/p03_ab.py [--sf 0.1] [--reps 8]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from snapshot_checks import frame_key  # noqa: E402


def grouped_sql(spark, sf_dir: str) -> str:
    from sparvi_spark.checks import table_views
    from sparvi_spark.checks.profile_checks import LINEITEM_ALL
    from sparvi_spark.testdata import load_table

    v = table_views(spark, sf_dir, ["lineitem"])["lineitem"]
    dtypes = dict(load_table(spark, "lineitem", sf_dir).dtypes)
    groups: dict[str, list[tuple[int, str]]] = {}
    for i, c in enumerate(LINEITEM_ALL):
        groups.setdefault(dtypes[c], []).append((i, c))
    parts = []
    for t, cols in groups.items():
        stack_args = ", ".join(f"{i}, `{c}`" for i, c in cols)
        parts.append(
            f"SELECT idx, "
            f"count(case when val is not null then 1 end) AS distinct_cnt, "
            f"coalesce(sum(case when val is not null then cnt end), "
            f"cast(0 as bigint)) AS nonnull_cnt "
            f"FROM (SELECT idx, val, count(1) AS cnt FROM "
            f"(SELECT stack({len(cols)}, {stack_args}) AS (idx, val) "
            f"FROM {v}) GROUP BY idx, val) GROUP BY idx")
    inner = " UNION ALL ".join(parts)
    name_case = ("case " + " ".join(
        f"when idx = {i} then '{c}'"
        for i, c in enumerate(LINEITEM_ALL)) + " end")
    return (
        f"SELECT {name_case} AS column_name, distinct_cnt, "
        f"round(distinct_cnt * cast(100 as double) / nonnull_cnt, 6) "
        f"AS distinct_pct, "
        f"distinct_cnt = nonnull_cnt AS is_unique FROM ({inner})")


def main() -> int:
    args = sys.argv[1:]
    opt = {"--sf": "0.1", "--reps": "8"}
    i = 0
    while i < len(args):
        opt[args[i]] = args[i + 1]
        i += 2
    reps = int(opt["--reps"])
    sf_dir = f"/root/testdata/sf{opt['--sf']}"

    from sparvi_spark.checks.profile_checks import q_distinct_counts
    from sparvi_spark.session import get_spark
    from sparvi_spark.testdata import load_table

    spark = get_spark("p03_ab")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, "lineitem", sf_dir).count()

    def build_cur():
        return q_distinct_counts(spark, sf_dir)

    def build_grp():
        return spark.sql(grouped_sql(spark, sf_dir))

    a = build_cur().toPandas()
    b = build_grp().toPandas()
    assert sorted(a.columns) == sorted(b.columns), "columns"
    assert list(a[sorted(a.columns)].dtypes.astype(str)) == \
        list(b[sorted(b.columns)].dtypes.astype(str)), "dtypes"
    assert frame_key(a) == frame_key(b), "PARITY FAILED"
    print(f"# parity OK ({len(a)} rows)")

    times: dict[str, list[float]] = {"current": [], "grouped": []}
    for _ in range(reps):
        for name, fn in (("current", build_cur), ("grouped", build_grp)):
            t0 = time.perf_counter()
            fn().toPandas()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"p03 {name}: best {min(ts):.3f}s "
              f"median {statistics.median(ts):.3f}s  all "
              + " ".join(f"{t:.2f}" for t in ts))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
