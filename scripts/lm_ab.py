"""Interleaved A/B of ``self_lm_score`` physical shapes (r13 VERDICT #1).

Two workloads:

- ``real``: the x28/x27 shape — documents table at --sf, tokens_col path
  (the declared queries' exact call). Parity between lanes is asserted on
  the normalized row multiset every rep.
- ``skew``: a synthetic corpus where ONE context token ("the") owns
  --skew of all tokens (so ~that share of bigrams have it as w1) — the
  100 TB hazard VERDICT r12 item 1 names. --docs scales corpus size.

Timing discipline: interleaved fresh builds (window, agg, window, agg,
...) in one process, warm tables, noop-style toPandas action, best +
median of --reps draws per lane.

Usage: python scripts/lm_ab.py real [--sf 0.1] [--reps 8]
       python scripts/lm_ab.py skew [--docs 20000] [--skew 0.10] [--reps 6]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from snapshot_checks import frame_key  # noqa: E402

TABLES = ["documents"]


def synth_skew_docs(spark, n_docs: int, skew: float):
    """n_docs docs x 50 tokens; each token is 'the' with prob ~skew,
    else one of 50k uniform words — deterministic in (doc_id, pos)."""
    thr = int(skew * 1000)
    return spark.range(n_docs).selectExpr(
        "id AS doc_id",
        "array_join(transform(sequence(0, 49), i -> "
        f"case when pmod(xxhash64(concat(cast(id as string), '_', "
        f"cast(i as string))), 1000) < {thr} then 'the' "
        "else concat('w', pmod(xxhash64(concat('v', cast(id as string), "
        "'_', cast(i as string))), 50000)) end), ' ') AS text")


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "real"
    args = sys.argv[2:]
    opt = {"--sf": "0.1", "--reps": "8", "--docs": "20000", "--skew": "0.10"}
    i = 0
    while i < len(args):
        opt[args[i]] = args[i + 1]
        i += 2
    reps = int(opt["--reps"])

    from sparvi_spark.operators.dedup import tokens_expr
    from sparvi_spark.operators.lm import self_lm_score
    from sparvi_spark.session import get_spark
    from sparvi_spark.testdata import load_table

    spark = get_spark("lm_ab")
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "real":
        sf_dir = f"/root/testdata/sf{opt['--sf']}"
        load_table(spark, "documents", sf_dir).count()  # warm cache

        def build(shape):
            docs = load_table(spark, "documents", sf_dir)
            tk = docs.selectExpr(
                "doc_id", f"{tokens_expr('text')} AS __tk")
            return self_lm_score(tk, tokens_col="__tk", shape=shape)
    else:
        n_docs = int(opt["--docs"])
        skew = float(opt["--skew"])
        base = synth_skew_docs(spark, n_docs, skew).localCheckpoint()
        n_the = base.selectExpr(
            "size(filter(split(text, ' '), w -> w = 'the')) AS k").agg(
            {"k": "sum"}).collect()[0][0]
        print(f"# skew corpus: {n_docs} docs, 'the' tokens = {n_the} "
              f"({n_the / (n_docs * 50):.1%} of all tokens)")

        def build(shape):
            return self_lm_score(base, shape=shape)

    # parity once: identical normalized multiset between lanes
    a = build("window").toPandas()
    b = build("agg").toPandas()
    assert sorted(a.columns) == sorted(b.columns), "column mismatch"
    assert frame_key(a) == frame_key(b), "LANE PARITY FAILED"
    print(f"# lane parity OK ({len(a)} rows)")

    times: dict[str, list[float]] = {"window": [], "agg": []}
    for _ in range(reps):
        for shape in ("window", "agg"):
            t0 = time.perf_counter()
            build(shape).toPandas()
            times[shape].append(time.perf_counter() - t0)
    for shape, ts in times.items():
        print(f"{mode} {shape}: best {min(ts):.3f}s "
              f"median {statistics.median(ts):.3f}s  all "
              + " ".join(f"{t:.2f}" for t in ts))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
