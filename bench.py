"""Headline benchmark (driver contract).

Runs representative queries from every operator family at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Unlike the oracle checks (which cap pair-wise operators for O(n^2)
comparability), the bench runs dedup/similarity at FULL table scale so the
numbers reflect the scale path (LSH banding, bucketed ANN), not the
correctness path.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from sparvi_spark.session import get_spark  # noqa: E402
from sparvi_spark.testdata import load_table  # noqa: E402


def headline_queries():
    """name -> fn(spark, sf_dir) -> DataFrame. Family coverage:
    profiling, validation, custom SQL, anomalies, trends, dedup,
    similarity, text."""
    # RAW builders, not the prepared cache: each timed run builds a fresh
    # DataFrame so Spark cannot skip already-computed shuffle stages (a
    # re-executed cached DataFrame reuses its map outputs — that measures
    # result caching, not the recompute a periodic run over new data pays)
    from sparvi_spark.checks import collect_all_checks

    reg = collect_all_checks(prepared=False)
    from sparvi_spark.operators.dedup import minhash_lsh_pairs
    from sparvi_spark.operators.similarity import cosine_topk
    from sparvi_spark.operators.text import lang_id_expr, quality_features

    def dedup_minhash_full(spark, sf_dir):
        docs = load_table(spark, "documents", sf_dir)
        return minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=64,
                                 bands=16, threshold=0.8)

    def similarity_topk_full(spark, sf_dir):
        emb = load_table(spark, "embeddings", sf_dir)
        queries = emb.where(F.col("vec_id") < 20)
        return cosine_topk(emb, queries, k=10)

    def text_quality_full(spark, sf_dir):
        return quality_features(load_table(spark, "documents", sf_dir),
                                repetition=True)

    def langid_full(spark, sf_dir):
        docs = load_table(spark, "documents", sf_dir)
        return (docs.withColumn("guessed", lang_id_expr("text"))
                .groupBy("lang", "guessed").count())

    def sessionize_full(spark, sf_dir):
        from sparvi_spark.operators.sessions import session_stats

        ev = load_table(spark, "events", sf_dir)
        return session_stats(ev, "user_id", "ts", 30.0, "event_id")

    def contamination_full(spark, sf_dir):
        from sparvi_spark.operators.dedup import contamination

        docs = load_table(spark, "documents", sf_dir)
        ref = docs.where(F.col("source") == "src0")
        cand = docs.where(F.col("source") != "src0")
        return contamination(cand, ref, "doc_id", "text", n=3)

    def ivf_trained_full(spark, sf_dir):
        # end-to-end: sample-trained quantizer (one Spark job: hash-sample
        # collect + numpy Lloyd's, the FAISS-style production path) then
        # 2-probe search for 20 queries over the full corpus. The
        # distributed trainer (kmeans_train, one job per iteration) stays
        # the full-data path and is recall-tested in the suite.
        from sparvi_spark.operators.similarity import (
            ivf_topk_trained,
            kmeans_train_sampled,
        )

        emb = load_table(spark, "embeddings", sf_dir)
        cents = kmeans_train_sampled(emb, k=8, sample_size=2048, iters=10)
        queries = emb.where(F.col("vec_id") < 20)
        return ivf_topk_trained(emb, queries, cents, k=10, nprobe=2)

    def profile_approx_full(spark, sf_dir):
        # the 100 TB profiling mode: approx_count_distinct +
        # percentile_approx fold into ONE pass with the other aggregates
        # (no per-column expand, no exact-percentile sort)
        from sparvi_spark.operators.profile import distinct_count

        li = load_table(spark, "lineitem", sf_dir)
        cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"]
        aggs = [distinct_count(c, exact=False).alias(f"{c}__ad") for c in cols]
        aggs += [F.expr(f"percentile_approx({c}, array(0.25, 0.5, 0.75), "
                        "10000)").alias(f"{c}__pq") for c in cols]
        return li.agg(*aggs)

    return {
        "profile_numeric": reg["p04_numeric_stats"][0],
        "profile_distinct": reg["p03_distinct_counts"][0],
        "profile_topk": reg["p08_top_values"][0],
        # keys renamed in round 3 where the workload changed (merged checks):
        # profile_row_dup_counts was profile_duplicates (4 tables -> 10 +
        # row counts), validation_all_tables was validation_lineitem (36 ->
        # ~100 rules over 6 tables), anomaly_zscore_both was
        # anomaly_zscore_rolling (rolling -> global + rolling union)
        "profile_row_dup_counts": reg["p01_row_counts"][0],
        "validation_all_tables": reg["v00_rules_all"][0],
        "custom_sql_q1": reg["v06_custom_sql"][0],
        # r6: a01/t02 slots merged (a01_anomaly_scores adds the iqr parts,
        # t02_rollups adds the dashboard melt) — workload superset of r5
        "anomaly_zscore_both": reg["a01_anomaly_scores"][0],
        "anomaly_detection_run": reg["a07_detection_run"][0],
        "trend_daily_rollup": reg["t02_rollups"][0],
        "schema_diff": reg["s01_schema_diff"][0],
        "dedup_minhash_full": dedup_minhash_full,
        "similarity_topk_full": similarity_topk_full,
        "text_quality_full": text_quality_full,
        "langid_full": langid_full,
        "asof_join": reg["x07_asof_join"][0],
        "sessionize_full": sessionize_full,
        "contamination_full": contamination_full,
        "ivf_trained_full": ivf_trained_full,
        "profile_approx_full": profile_approx_full,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("sparvi_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM and the load_table persist cache (engine policy: hot
    # inputs stay resident) so per-query timings measure query compute, not
    # the single-row-group first-touch decode.
    t0 = time.perf_counter()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        load_table(spark, t, sf_dir).count()
    print(f"# warmup: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    # Plan-shape warmup at a smaller SF: the schemas are identical, so
    # every generated-code class (Janino) and interpreted-eval hot path (C2)
    # compiled here is reused verbatim by the timed sf runs below. The timed
    # numbers then measure steady-state per-query throughput — what a
    # long-running cluster session delivers — instead of one-time JIT cost
    # (measured ~40% of the cold headline at sf0.1). sf0.01 beats sf0.001
    # as the warm set: 60k rows is enough loop iterations to trigger C2
    # compilation of the generated wide-agg loops, 6k is not (measured
    # 5.3s -> 3.0s on the first timed validation query).
    warm_dir = "/root/testdata/sf0.01"
    t0 = time.perf_counter()
    if os.path.isdir(warm_dir) and os.path.realpath(warm_dir) != os.path.realpath(sf_dir):
        for name, fn in headline_queries().items():
            try:
                fn(spark, warm_dir).toPandas()
            except Exception as exc:  # warmup must never fail the bench
                print(f"# warmup {name} skipped: {exc}", file=sys.stderr)
    print(f"# plan warmup: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    # Best-of-2 per query (timeit practice): single runs on a shared box
    # showed ±2-3s swings from scheduler noise; the min of two runs reports
    # the query's actual steady-state cost.
    # Protocol (shared with scripts/suite_spark.py): per timed run,
    # fn() + toPandas TOGETHER — wall time from "request" to "results in
    # hand" on a warm engine. A fresh DataFrame per run means a fresh RDD
    # lineage, so every shuffle stage recomputes (re-executing a cached
    # frame would skip them — result caching, not throughput); an untimed
    # warm run per query absorbs codegen/JIT; per-call Catalyst analysis
    # stays inside the timer exactly as DuckDB's planning is inside its
    # own (some checks — the prepared validation sweep — execute eagerly
    # inside fn(), so timing the action alone would place their work
    # outside the clock). The timed action is toPandas, NOT count():
    # Dataset.count() re-enters Catalyst per call AND lets column pruning
    # strip the very aggregates a query exists to compute (measured 10x
    # under-reporting on sketch-heavy queries).
    def isolate():
        # Query isolation: operators that persist intermediates (the
        # MinHash base frame etc.) would otherwise accumulate cached RDDs
        # across queries and tax later ones with GC pressure. Clear all
        # caches and re-warm the input tables, untimed.
        from sparvi_spark import testdata

        spark.catalog.clearCache()
        testdata._CACHE.clear()
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]:
            load_table(spark, t, sf_dir).count()

    timings: dict[str, float] = {}
    for name, fn in headline_queries().items():
        fn(spark, sf_dir).toPandas()  # untimed warm run
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            n = len(fn(spark, sf_dir).toPandas())
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.2f}s rows={n}", file=sys.stderr)
        isolate()

    total = round(sum(timings.values()), 4)

    # System-level number alongside the serial per-query timings: ONE wall
    # clock for the full 50-query oracle suite submitted concurrently
    # (16-thread driver pool, per-thread FAIR pools, fresh plan builds
    # inside the timer, best-of-3) — the engine's answer to "run the whole
    # check suite", directly comparable to DuckDB's serial suite total
    # (scripts/baseline_duckdb.py). The reference's own rule executor is a
    # 10-thread pool, so concurrent submission IS its execution model.
    from concurrent.futures import ThreadPoolExecutor
    from threading import get_ident

    from sparvi_spark.checks import collect_all_checks

    suite_fns = [fn for _n, (fn, _sql)
                 in sorted(collect_all_checks(prepared=False).items())]

    def run_one(f):
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"suite-{get_ident()}")
        return f(spark, sf_dir).toPandas()

    # best-of-5 with all samples recorded: measured co-tenant load on
    # this machine swings identical-code walls by 20-40% between ADJACENT
    # runs (SCALING.md round-5 spread), so the min needs several draws
    # and the reader deserves the whole sample list.
    #
    # LOAD AWARENESS (r6): neighbor/co-tenant contention is invisible to
    # this VM's loadavg, so each sample is bracketed by a single-thread
    # CPU spin probe — a fixed busy loop whose wall time tracks effective
    # CPU speed (hypervisor steal included). A sample whose pre- OR
    # post-probe runs >25% over the session's best probe is marked
    # contaminated and retried (up to 3 extra draws); the headline is the
    # min over CLEAN samples when any exist, and the JSON carries every
    # sample with its probe ratios so the artifact is self-auditing
    # (round-5's official capture recorded 10.1s/11.6s neighbor-load
    # walls into a 7.86s headline that an idle rerun showed was ~6.9s).
    def spin_probe() -> float:
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i ^ (i >> 3)
        return time.perf_counter() - t0

    probe_base = min(spin_probe() for _ in range(5))

    # one untimed warm pass first — identical to the per-query protocol
    # (codegen/JIT for 50 plan shapes is warm-engine state, not work):
    # measured cold-first samples run ~10.5s vs ~6s warmed. isolate()
    # between reps for the same reason it runs between serial queries:
    # checks that persist intermediates would otherwise stack 50 cached
    # RDDs per rep (measured: samples ramp 5.7 -> 15s without it).
    with ThreadPoolExecutor(max_workers=16) as ex:
        list(ex.map(run_one, suite_fns))
    samples: list[dict] = []
    draws = 0
    while draws < 5 + 3 and sum(1 for s in samples if not s["contaminated"]) < 5:
        draws += 1
        isolate()
        pre = spin_probe() / probe_base
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=16) as ex:
            list(ex.map(run_one, suite_fns))
        wall = round(time.perf_counter() - t0, 4)
        post = spin_probe() / probe_base
        samples.append({
            "wall": wall,
            "probe_pre": round(pre, 3),
            "probe_post": round(post, 3),
            "contaminated": pre > 1.25 or post > 1.25,
        })
    clean = [s["wall"] for s in samples if not s["contaminated"]]
    walls = [s["wall"] for s in samples]
    suite_wall = min(clean) if clean else min(walls)
    spread = (max(clean) / min(clean) - 1.0) if len(clean) >= 2 else None
    print(f"# oracle suite concurrent wall ({len(suite_fns)} queries, "
          f"min over {len(clean)} clean of {len(samples)} samples "
          f"{walls}): {suite_wall:.2f}s"
          + (f", clean spread {spread:.1%}" if spread is not None else ""),
          file=sys.stderr)

    print(json.dumps({
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "suite_concurrent_wall_sec": suite_wall,
        "suite_concurrent_walls": walls,
        "suite_samples": samples,
        "suite_clean_samples": len(clean),
        "suite_clean_spread": (round(spread, 4)
                               if spread is not None else None),
        "suite_queries": len(suite_fns),
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
