"""Salted joins and incremental profiling."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from sparvi_spark.testdata import load_table


def test_salted_join_matches_plain_join(spark):
    from sparvi_spark.operators.joins import salted_join

    li = load_table(spark, "lineitem", SF_DIR).select("l_orderkey", "l_quantity")
    orders = load_table(spark, "orders", SF_DIR).select("o_orderkey", "o_totalprice") \
        .withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(orders, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2).alias("s"),
    ).collect()[0]
    salted = salted_join(li, orders, "l_orderkey", salt=8).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2).alias("s"),
    ).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])

    left = salted_join(li, orders.where(F.col("o_totalprice") > 1e9),
                       "l_orderkey", salt=4, how="left")
    assert left.count() == li.count()  # left rows preserved w/o matches
    with pytest.raises(ValueError):
        salted_join(li, orders, "l_orderkey", how="full")


def test_incremental_profile_matches_full(spark):
    from sparvi_spark.operators.incremental import (
        incremental_profile,
        partition_stats,
        rollup_profile,
    )

    ev = load_table(spark, "events", SF_DIR).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd"))
    cols = ["value", "user_id"]

    # bootstrap over all partitions
    state, prof = incremental_profile(ev, "day", cols)
    full = {r["column_name"]: r for r in prof.collect()}

    # recompute only two partitions; merged state must equal the bootstrap
    days = [r["day"] for r in ev.select("day").distinct().limit(2).collect()]
    state2, prof2 = incremental_profile(ev, "day", cols, state=state,
                                        changed_partitions=days)
    incr = {r["column_name"]: r for r in prof2.collect()}
    for c in cols:
        for k in ("cnt", "nulls", "min_val", "max_val", "avg_val", "stddev_val"):
            assert full[c][k] == incr[c][k], (c, k)

    # direct-equivalence: rollup over per-partition stats == one-pass stats
    direct = {r["column_name"]: r for r in
              rollup_profile(partition_stats(ev, "day", cols)).collect()}
    agg = ev.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("nulls"),
        F.min("value").alias("mn"), F.max("value").alias("mx"),
    ).collect()[0]
    assert direct["value"]["cnt"] == agg["cnt"]
    assert direct["value"]["nulls"] == agg["nulls"]
    assert direct["value"]["min_val"] == agg["mn"]
    assert direct["value"]["max_val"] == agg["mx"]


def test_asof_join_semantics(spark):
    from sparvi_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")],
        "k int, ts int, tag string").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "tag")
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 50, 300.0)],
        "k int, ts int, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v")
    got = {r["tag"]: r["right_v"] for r in
           asof_join(left, right, by="k", ts_col="ts").collect()}
    assert got == {"a": 100.0, "b": 200.0, "c": None, "d": None}

    # inclusive <= and tolerance
    got2 = {r["tag"]: r["right_v"] for r in
            asof_join(left, right, by="k", ts_col="ts",
                      tolerance_seconds=3).collect()}
    assert got2 == {"a": 100.0, "b": None, "c": None, "d": None}


def test_incremental_time_rollup_matches_full(spark):
    """Folding the events table in three arbitrary batches must produce the
    exact same (bucket, key) rollup as one full-scan aggregation, regardless
    of batch split or arrival order (decimal-exact partials)."""
    from pyspark.sql import functions as F

    from sparvi_spark.functions import time_bucket
    from sparvi_spark.operators.trends import incremental_time_rollup
    from sparvi_spark.testdata import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, "events", SF_DIR)
    w = 6 * 3600

    full = (ev.groupBy(time_bucket("ts", w).alias("bucket"),
                       F.col("event_type").alias("key"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(28,8)"))
                 .cast("decimal(38,8)").alias("sum_dec")))

    state = None
    # three uneven batches, deliberately out of time order
    batches = [ev.where(F.col("event_id") % 3 == 2),
               ev.where(F.col("event_id") % 3 == 0),
               ev.where(F.col("event_id") % 3 == 1)]
    for b in batches:
        state = incremental_time_rollup(state, b, "ts", "event_type",
                                        "value", w)

    got = {(r["bucket"], r["key"]): (r["n"], r["sum_dec"])
           for r in state.collect()}
    expect = {(r["bucket"], r["key"]): (r["n"], r["sum_dec"])
              for r in full.collect()}
    assert got == expect


def test_quantile_sketch_accuracy_and_merge(spark):
    """Log-binned quantile sketch: (1) bucket ids invert exactly through
    bucket_bounds; (2) quantile estimates stay inside the constructive
    relative-error bound (2^(1/16)-1 ~ 4.4% at sub_bits=4) against exact
    percentiles; (3) merging per-partition sketches is bit-identical to
    sketching in one pass — the mergeability contract that makes the
    incremental path correct."""
    from sparvi_spark.operators.incremental import (
        bucket_bounds,
        log_bucket_expr,
        merge_quantile_sketches,
        partition_quantile_sketch,
        sketch_quantiles,
    )
    from sparvi_spark.testdata import load_table

    # bucket/bounds inversion on hand values incl. negatives and zero
    vals = [0.0, 1.0, 1.5, 2.0, 100.25, -3.75, 1e-6, -1e6]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select("v", log_bucket_expr("v", 4).alias("b")).collect()
    for r in rows:
        lo, hi = bucket_bounds(r["b"], 4)
        if r["v"] == 0.0:
            assert r["b"] == 0
        else:
            assert lo <= r["v"] <= hi, (r["v"], r["b"], lo, hi)

    li = load_table(spark, "lineitem", "/root/testdata/sf0.01")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    sk = partition_quantile_sketch(li, "l_returnflag", cols, sub_bits=4)
    approx = sketch_quantiles(sk, (0.25, 0.5, 0.75), sub_bits=4) \
        .toPandas().set_index("column_name")
    bound = 2 ** (1 / 16) - 1
    for c in cols:
        exact = li.selectExpr(
            f"percentile({c}, array(0.25, 0.5, 0.75)) q").first()[0]
        for i, p in enumerate(("p25", "p50", "p75")):
            rel = abs(approx.loc[c, p] - exact[i]) / abs(exact[i])
            assert rel <= bound, (c, p, rel)

    h1 = partition_quantile_sketch(
        li.where("l_returnflag = 'A'"), "l_returnflag", cols)
    h2 = partition_quantile_sketch(
        li.where("l_returnflag <> 'A'"), "l_returnflag", cols)
    merged = sketch_quantiles(merge_quantile_sketches(h1, h2)) \
        .toPandas().sort_values("column_name").reset_index(drop=True)
    whole = sketch_quantiles(sk) \
        .toPandas().sort_values("column_name").reset_index(drop=True)
    assert merged.equals(whole)


def test_distinct_sketch_accuracy_and_merge(spark):
    """HLL register sketch: estimates within ~3x the standard error
    (1.04/sqrt(4096) ~ 1.6%) of exact distincts, exact on small
    cardinalities (linear-counting range), and merging per-partition
    sketches is bit-identical to one-pass sketching — distinct counts now
    fold across incremental refreshes like sums do."""
    from sparvi_spark.operators.incremental import (
        merge_distinct_sketches,
        partition_distinct_sketch,
        sketch_distinct,
    )
    from sparvi_spark.testdata import load_table

    li = load_table(spark, "lineitem", "/root/testdata/sf0.01")
    cols = ["l_orderkey", "l_partkey", "l_quantity"]
    sk = partition_distinct_sketch(li, "l_returnflag", cols)
    est = {r["column_name"]: r["distinct_est"]
           for r in sketch_distinct(sk).collect()}
    for c in cols:
        exact = li.select(c).distinct().count()
        assert abs(est[c] - exact) <= max(3, 0.05 * exact), (c, est[c], exact)
    assert est["l_quantity"] == 50  # small range -> linear counting, exact

    h1 = partition_distinct_sketch(
        li.where("l_returnflag = 'A'"), "l_returnflag", cols)
    h2 = partition_distinct_sketch(
        li.where("l_returnflag <> 'A'"), "l_returnflag", cols)
    merged = sketch_distinct(merge_distinct_sketches(h1, h2)) \
        .toPandas().sort_values("column_name").reset_index(drop=True)
    whole = sketch_distinct(sk) \
        .toPandas().sort_values("column_name").reset_index(drop=True)
    assert merged.equals(whole)


def test_incremental_profile_full_round_trip(spark):
    """Full incremental profile: bootstrap over part of the table, then a
    refresh of the remaining partitions — the folded profile (exact stats
    + sketch quantiles + sketch distincts) is identical to bootstrapping
    over everything at once."""
    from sparvi_spark.operators.incremental import incremental_profile_full
    from sparvi_spark.testdata import load_table

    li = load_table(spark, "lineitem", "/root/testdata/sf0.01")
    cols = ["l_quantity", "l_extendedprice"]

    states, _ = incremental_profile_full(
        li.where("l_returnflag = 'A'"), "l_returnflag", cols)
    states, prof_inc = incremental_profile_full(
        li, "l_returnflag", cols, states=states,
        changed_partitions=[r["l_returnflag"] for r in
                            li.select("l_returnflag").distinct().collect()
                            if r["l_returnflag"] != "A"])
    _, prof_all = incremental_profile_full(li, "l_returnflag", cols)

    a = prof_inc.toPandas().sort_values("column_name").reset_index(drop=True)
    b = prof_all.toPandas().sort_values("column_name").reset_index(drop=True)
    assert a.equals(b)

    row = a.set_index("column_name").loc["l_quantity"]
    assert row["cnt"] == li.count()
    assert row["distinct_est"] == 50
    assert row["min_val"] == 1.0


def test_review_fixes_asof_nulls_and_negative_keys(spark):
    """Regression pins: (1) asof_join returns the MATCHED right row's NULL
    value instead of forward-filling a stale older value across it (DuckDB
    ASOF semantics), and multi-column values always come from one row;
    (2) hash sampling maps negative keys into [0, 2^32) — previously every
    negative-id row was kept regardless of the sampling percent."""
    import datetime as dt

    from sparvi_spark.operators.joins import asof_join
    from sparvi_spark.operators.sampling import hash_expr, hash_sample

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    right = spark.createDataFrame(
        [("k", t(10), 5.0, 100.0), ("k", t(20), None, 200.0)],
        "k string, ts timestamp, a double, b double")
    left = spark.createDataFrame(
        [("k", t(25)), ("k", t(15))], "k string, ts timestamp")
    got = {r["ts"].second: (r["right_a"], r["right_b"]) for r in
           asof_join(left, right, by="k", value_cols=["a", "b"]).collect()}
    assert got[25] == (None, 200.0)  # matched ts=20 row intact, no mixing
    assert got[15] == (5.0, 100.0)

    ids = spark.createDataFrame(
        [(i,) for i in range(-500, 500)], "id bigint")
    hashes = ids.select(hash_expr("id").alias("h"))
    assert hashes.where("h < 0").count() == 0
    kept = hash_sample(ids, "id", 10).count()
    assert kept < 350, kept  # ~10% expected; the bug kept all 500 negatives


def test_topk_sketch_exact_and_incremental(spark):
    """The mergeable top-K family: exact vs profile.top_values when each
    partition's kept set covers its distincts, and a partition refresh
    merges to the same answer as a from-scratch sketch."""
    from pyspark.sql import functions as F

    from sparvi_spark.operators.incremental import (
        merge_topk_sketches,
        partition_topk_sketch,
        sketch_topk,
    )
    from sparvi_spark.operators.profile import top_values

    rows = [(p, f"v{i % 7}", f"w{i % 3}")
            for p in ("a", "b", "c") for i in range(40)]
    df = spark.createDataFrame(rows, "part string, c1 string, c2 string")

    sk = partition_topk_sketch(df, "part", ["c1", "c2"], k=5, oversample=2)
    got = {(r["column_name"], r["value"]): (r["cnt"], r["rank"])
           for r in sketch_topk(sk, k=5).collect()}
    exact = {(r["column_name"], r["value"]):
             (r["cnt"], i % 5 + 1)
             for i, r in enumerate(top_values(df, ["c1", "c2"], k=5)
                                   .orderBy("column_name", "rn" if False else
                                            F.desc("cnt"), "value").collect())}
    # compare counts per (column, value) — ranks follow the same tiebreak
    assert {k_: v[0] for k_, v in got.items()} == \
           {k_: v[0] for k_, v in exact.items()}

    # refresh partition 'b' with different data; merged == from-scratch
    df2 = df.where("part <> 'b'").unionByName(
        spark.createDataFrame([("b", "v9", "w9")] * 11 + [("b", "v1", "w0")],
                              "part string, c1 string, c2 string"))
    fresh_b = partition_topk_sketch(
        df2.where("part = 'b'"), "part", ["c1", "c2"], k=5, oversample=2)
    merged = merge_topk_sketches(sk, fresh_b)
    scratch = partition_topk_sketch(df2, "part", ["c1", "c2"], k=5,
                                    oversample=2)
    a = sorted(map(tuple, sketch_topk(merged, k=6).collect()))
    b = sorted(map(tuple, sketch_topk(scratch, k=6).collect()))
    assert a == b
    top_c1 = [r for r in a if r[0] == "c1"]
    assert any(v == "v9" and c == 11 for _, v, c, _r in top_c1)


def test_topk_sketch_null_partition_and_lower_bound(spark):
    """NULL partitions key on the sentinel, and truncation only ever
    UNDER-counts (the TPUT lower-bound property)."""
    from sparvi_spark.operators.incremental import (
        NULL_PARTITION,
        partition_topk_sketch,
        sketch_topk,
    )

    rows = [(None, "x")] * 5 + [("a", "x")] * 3 + \
           [("a", f"y{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "part string, c string")
    sk = partition_topk_sketch(df, "part", ["c"], k=1, oversample=1)
    assert sk.where(
        sk["partition_value"] == NULL_PARTITION).count() == 1
    got = {r["value"]: r["cnt"] for r in sketch_topk(sk, k=3).collect()}
    exact = {r["c"]: r["cnt"] for r in
             df.groupBy("c").agg(F.count("*").alias("cnt")).collect()}
    for v, cnt in got.items():
        assert cnt <= exact[v]
    assert got["x"] == 8  # kept in both partitions -> exact here
