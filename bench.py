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
        # r6 merged the underlying check workloads (a01_anomaly_scores
        # absorbed the global+rolling IQR parts, t02_rollups the dashboard
        # melt); r7 renames the keys so round-over-round diffs can't
        # compare unlike workloads under a stable name (the JSON also
        # carries workload_version — bump it whenever a headline key's
        # underlying query changes shape).
        "anomaly_scores_4way": reg["a01_anomaly_scores"][0],
        "anomaly_detection_run": reg["a07_detection_run"][0],
        "trend_rollups": reg["t02_rollups"][0],
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
    # LOAD AWARENESS (r6, tightened r7): neighbor/co-tenant contention is
    # invisible to this VM's loadavg, so each sample is bracketed by a
    # PARALLEL CPU probe. r6's single-thread pure-Python spin could not
    # see multi-core / memory-bandwidth contention (it recorded 5/5
    # samples "clean" with a 76% spread); the r7 probe runs 16 numpy
    # matmul workers — numpy releases the GIL, so the workers genuinely
    # occupy 16 cores, the same parallelism the suite submits at, and the
    # wall tracks effective MULTI-core speed including hypervisor steal.
    # probe_base is a RUNNING MIN over every probe taken (initial AND
    # per-sample), and contamination flags are recomputed against the
    # final base after all draws — a session that starts loaded can no
    # longer label its own contaminated samples clean. Threshold 25%
    # against the best probe, up to 5 retry
    # draws; the headline is the min over CLEAN samples when any exist,
    # and the JSON carries every sample with its probe ratios so the
    # artifact is self-auditing.
    #
    # Probe implementation notes: ufunc chains, NOT matmul — numpy's
    # matmul dispatches to BLAS which may spawn its own thread pool
    # under each of the 16 workers (oversubscription made a matmul
    # probe swing 1.0-3.3x against itself); ufuncs release the GIL and
    # burn exactly one core per worker. Each probe point is a BEST-OF-3
    # (JVM background threads — GC, shuffle cleaners — spike briefly
    # right after a suite run; the min sees through one-off spikes),
    # taken after a short settle pause for the same reason.
    import numpy as np

    _probe_arr = np.random.default_rng(7).random(1_000_000)

    def spin_probe() -> float:
        def burn(_):
            return float(np.sqrt(_probe_arr * _probe_arr + 1.0).sum())

        def once() -> float:
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=16) as pex:
                list(pex.map(burn, range(16)))
            return time.perf_counter() - t0

        time.sleep(0.2)  # settle: let post-suite JVM threads idle down
        return min(once() for _ in range(3))

    def read_steal() -> tuple[int, int]:
        # Hypervisor steal ticks from /proc/stat (field 8 of the "cpu"
        # line). On this Firecracker guest the host intermittently takes
        # 30%+ of CPU capacity (r11 observed 455k steal vs 970k user
        # ticks after one test-suite run) — invisible to loadavg inside
        # the VM. The numpy probe already FLAGS the slowdown; bracketing
        # each sample with steal deltas records WHY it was flagged, so a
        # contaminated artifact is self-explaining. Returns (steal_ticks,
        # total_ticks); (0, 0) off-Linux.
        try:
            with open("/proc/stat") as f:
                vals = [int(x) for x in f.readline().split()[1:]]
            # fields: user nice system idle iowait irq softirq steal
            # guest guest_nice — guest/guest_nice are ALREADY included
            # in user/nice, so summing all ten would double-count them
            # and understate the steal fraction on guest-hosting boxes
            return (vals[7] if len(vals) > 7 else 0), sum(vals[:8])
        except Exception:
            return 0, 0

    probes_taken: list[float] = [spin_probe() for _ in range(3)]
    probe_base = min(probes_taken)

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

    def _n_clean() -> int:
        # against the CURRENT base; final flags recomputed below
        return sum(1 for s in samples
                   if s["_pre"] <= probe_base * 1.25
                   and s["_post"] <= probe_base * 1.25)

    # 5 target + up to 7 retry draws (was 5): the r11 box's steal waves
    # last minutes — two extra ~35s draws buy a real chance of riding
    # one out, for ~70s worst-case added runtime
    while draws < 5 + 7 and _n_clean() < 5:
        draws += 1
        isolate()
        st0 = read_steal()
        pre = spin_probe()
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=16) as ex:
            list(ex.map(run_one, suite_fns))
        wall = round(time.perf_counter() - t0, 4)
        post = spin_probe()
        st1 = read_steal()
        steal_pct = round((st1[0] - st0[0]) / max(1, st1[1] - st0[1]), 4)
        probes_taken += [pre, post]
        probe_base = min(probes_taken)
        samples.append({"wall": wall, "_pre": pre, "_post": post,
                        "steal_pct": steal_pct})
    # flags against the final running-min base: every sample's ratios are
    # comparable, including ones drawn before the best probe was seen
    for s in samples:
        s["probe_pre"] = round(s.pop("_pre") / probe_base, 3)
        s["probe_post"] = round(s.pop("_post") / probe_base, 3)
        s["contaminated"] = (s["probe_pre"] > 1.25
                             or s["probe_post"] > 1.25)
    clean = [s["wall"] for s in samples if not s["contaminated"]]
    walls = [s["wall"] for s in samples]
    suite_wall = min(clean) if clean else min(walls)
    spread = (max(clean) / min(clean) - 1.0) if len(clean) >= 2 else None
    print(f"# oracle suite concurrent wall ({len(suite_fns)} queries, "
          f"min over {len(clean)} clean of {len(samples)} samples "
          f"{walls}): {suite_wall:.2f}s"
          + (f", clean spread {spread:.1%}" if spread is not None else ""),
          file=sys.stderr)

    # Per-query serial Spark pass (r9): one fresh-build best-of-2 number
    # per oracle query — paired with the DuckDB per-query times below
    # into a ratio table, so the artifact itself shows which baseline
    # residuals are real Spark compute and which are the flat ~0.1-0.3s
    # per-action scheduling floor (that decomposition previously lived
    # only in SCALING.md prose). Same protocol as the headline queries:
    # untimed warm run, fn()+toPandas inside the timer, isolate between.
    def serial_pass(prev: dict[str, float] | None) -> tuple[
            dict[str, float], float]:
        out: dict[str, float] = {}
        st0 = read_steal()
        for name, (fn, _sql) in sorted(
                collect_all_checks(prepared=False).items()):
            fn(spark, sf_dir).toPandas()  # untimed warm run
            best = float("inf") if prev is None else prev[name]
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 4)
            isolate()
        st1 = read_steal()
        return out, round((st1[0] - st0[0]) / max(1, st1[1] - st0[1]), 4)

    # one steal number over the whole serial pass: unlike the suite
    # samples it has no per-sample retry, so a steal wave inflates the
    # recorded total silently (observed 12.9s -> 19.9s between adjacent
    # runs on identical code) — the artifact must say whether the pass
    # was hit, and a hit pass gets ONE full retry (per-query min across
    # passes, each number still a fresh-build best-of-2)
    spark_serial, serial_steal_pct = serial_pass(None)
    serial_steal_pcts = [serial_steal_pct]
    if serial_steal_pct > 0.005:
        print(f"# serial pass saw {serial_steal_pct:.2%} steal — "
              f"retrying once", file=sys.stderr)
        spark_serial, retry_steal = serial_pass(spark_serial)
        serial_steal_pcts.append(retry_steal)
        # per-query numbers are mins across BOTH passes, so the honest
        # summary figure is the MAX of the passes' steal fractions (any
        # retained timing may have been drawn during the worse pass);
        # both figures are disclosed in spark_serial_steal_pcts
        serial_steal_pct = max(serial_steal_pcts)
    spark_serial_total = round(sum(spark_serial.values()), 4)
    print(f"# spark serial total ({len(spark_serial)} queries): "
          f"{spark_serial_total:.2f}s (steal "
          f"{', '.join(f'{s:.2%}' for s in serial_steal_pcts)})",
          file=sys.stderr)

    # NOTE (r8): a "prepared-plan wall" field was added and then REMOVED
    # here — re-executing the same DataFrame objects reuses shuffle map
    # outputs from the warm run and places eagerly-executing checks (the
    # prepared validation sweep, the percentile refine) entirely outside
    # the timer, so it under-measured execution exactly the way the
    # protocol comments above warn about. The build-vs-execution
    # decomposition lives in SCALING.md round-8, labeled as the
    # optimistic re-execution lower bound it is.

    # Operative-baseline disclosure (r6 verdict): time DuckDB serially on
    # the IDENTICAL oracle queries in the same process, same warm inputs,
    # so the artifact self-contains the ratio headline. Two DuckDB-
    # pathological queries are broken out — x27_doc_scores (per-token
    # element_at over a 4096-dim literal weight list) and x04_langid —
    # which dominate DuckDB's serial total; ratio_excl_outliers divides
    # the SAME Spark wall by the baseline without them, so the headline
    # can't silently rest on the oracle's weak spots. Best-of-2 per query
    # (the per-query protocol above).
    _BASELINE_OUTLIERS = ("x27_doc_scores", "x04_langid")
    duckdb_total = duckdb_excl = ratio_all = ratio_excl = None
    duckdb_probes = per_query_ratio = None
    try:
        import duckdb

        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        # the baseline pass gets the same contamination bracketing as the
        # Spark samples (a loaded draw inflates DuckDB and flatters the
        # ratio); one retry, and the probe ratios ride in the JSON either
        # way so the artifact shows how clean its own baseline was
        ddb: dict[str, float] = {}
        ddb_pre = ddb_post = None
        for _attempt in range(2):
            pre = spin_probe()
            run: dict[str, float] = {}
            for name, (_fn, sql) in sorted(collect_all_checks().items()):
                if sql is None:
                    continue
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    con.execute(sql).fetchall()
                    best = min(best, time.perf_counter() - t0)
                run[name] = best
            post = spin_probe()
            probes_taken += [pre, post]
            probe_base = min(probes_taken)
            if (not ddb) or sum(run.values()) < sum(ddb.values()):
                ddb, ddb_pre, ddb_post = run, pre, post
            if pre <= probe_base * 1.25 and post <= probe_base * 1.25:
                break
        duckdb_probes = {"pre": round(ddb_pre / probe_base, 3),
                         "post": round(ddb_post / probe_base, 3)}
        duckdb_total = round(sum(ddb.values()), 4)
        duckdb_excl = round(sum(v for k, v in ddb.items()
                                if k not in _BASELINE_OUTLIERS), 4)
        ratio_all = round(suite_wall / duckdb_total, 4)
        ratio_excl = round(suite_wall / duckdb_excl, 4)
        per_query_ratio = {
            k: {"spark": spark_serial.get(k), "duckdb": round(v, 4),
                "ratio": (round(spark_serial[k] / v, 2)
                          if spark_serial.get(k) and v > 0 else None)}
            for k, v in sorted(ddb.items())}
        print(f"# duckdb serial total ({len(ddb)} queries): "
              f"{duckdb_total:.2f}s (excl {list(_BASELINE_OUTLIERS)}: "
              f"{duckdb_excl:.2f}s) -> wall ratio {ratio_all:.2f}x "
              f"(excl outliers {ratio_excl:.2f}x), probes {duckdb_probes}",
              file=sys.stderr)
    except Exception as exc:  # baseline disclosure must never fail bench
        print(f"# duckdb baseline skipped: {exc}", file=sys.stderr)

    # ARTIFACT CONTRACT (r10, learned the hard way in r9): the driver
    # captures only the TAIL (~2,000 chars observed) of stdout and parses
    # the last JSON line. BENCH_r09 recorded `parsed: null` because the
    # per-query ratio table grew this line to ~5.5 KB and the head —
    # headline_total, every ratio field — fell off the capture window.
    # Rule: the stdout line stays < ~1,900 chars; bulky per-query detail
    # (ratio table, raw samples, serial timings) goes to BENCH_DETAIL.json
    # next to this script, referenced by path from the headline line.
    # env-overridable so judge/builder re-runs don't clobber the driver's
    # recorded per-round detail (r11: it had to be restored from a
    # snapshot). The driver runs bench.py with no env -> default path
    # unchanged; local diagnostic runs set SPARK_GRAFT_BENCH_DETAIL.
    detail_name = os.environ.get("SPARK_GRAFT_BENCH_DETAIL",
                                 "BENCH_DETAIL.json")
    detail_path = str(Path(__file__).resolve().parent / detail_name)
    with open(detail_path, "w") as f:
        json.dump({
            "per_query_ratio": per_query_ratio,
            "suite_samples": samples,
            "spark_serial": spark_serial,
            "queries_serial_headline": timings,
            "duckdb_probes": duckdb_probes,
            "sf": sf,
        }, f, indent=1)
    headline_line = json.dumps({
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "workload_version": 7,
        "queries": timings,
        "suite_concurrent_wall_sec": suite_wall,
        "suite_concurrent_walls": walls,
        "suite_clean_samples": len(clean),
        "suite_clean_spread": (round(spread, 4)
                               if spread is not None else None),
        "suite_steal_pct_max": max(
            (s.get("steal_pct", 0.0) for s in samples), default=0.0),
        "suite_queries": len(suite_fns),
        "spark_serial_total": spark_serial_total,
        "spark_serial_steal_pct": serial_steal_pct,
        "spark_serial_steal_pcts": serial_steal_pcts,
        "duckdb_total": duckdb_total,
        "duckdb_total_excl_outliers": duckdb_excl,
        "duckdb_outliers": list(_BASELINE_OUTLIERS),
        "ratio_all": ratio_all,
        "ratio_excl_outliers": ratio_excl,
        "detail_file": detail_name,
        "sf": sf,
    })
    if len(headline_line) > 1900:  # contract guard: trim queries first
        print(f"# WARNING: headline line {len(headline_line)} chars "
              "exceeds the 1,900-char driver capture budget; trimming "
              "per-query timings to the detail file", file=sys.stderr)
        obj = json.loads(headline_line)
        obj["queries"] = {"see": detail_name}
        headline_line = json.dumps(obj)
    print(f"# headline line: {len(headline_line)} chars", file=sys.stderr)
    print(headline_line)
    spark.stop()


if __name__ == "__main__":
    main()
