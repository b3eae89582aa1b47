"""Streaming monitors: batch parity via memory sink + processAllAvailable."""

import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from sparvi_spark.streaming import (
    events_stream,
    freshness,
    windowed_counts,
    windowed_quality,
)
from sparvi_spark.testdata import load_table


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Split the events table into several parquet drop files."""
    d = tmp_path_factory.mktemp("events_stream")
    events = load_table(spark, "events", SF_DIR)
    events.repartition(4).write.mode("overwrite").parquet(str(d / "drops"))
    yield str(d / "drops")
    shutil.rmtree(d, ignore_errors=True)


def _run(stream_df, name, mode="append"):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(mode).start())
    q.processAllAvailable()
    q.stop()
    return name


def test_windowed_counts_match_batch(spark, stream_dir):
    s = events_stream(spark, stream_dir)
    _run(windowed_counts(s, window="1 day", watermark="0 seconds"), "wc")
    got = {(r["window_start"], r["event_type"]): r["row_count"]
           for r in spark.sql("select * from wc").collect()}
    batch = load_table(spark, "events", SF_DIR)
    expect = {(r["d"], r["event_type"]): r["cnt"] for r in
              batch.groupBy(F.date_trunc("day", "ts").alias("d"), "event_type")
              .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # watermark closes all but the newest windows; every emitted row must
    # match its batch counterpart and cover most of the data
    assert got and all(expect[k] == v for k, v in got.items())
    assert len(got) >= len(expect) - len({k[1] for k in expect})


def test_windowed_quality_match_batch(spark, stream_dir):
    s = events_stream(spark, stream_dir)
    _run(windowed_quality(s, window="1 day", watermark="0 seconds"), "wq")
    rows = spark.sql("select * from wq").collect()
    assert rows
    batch = (load_table(spark, "events", SF_DIR)
             .groupBy(F.date_trunc("day", "ts").alias("d"))
             .agg(F.count(F.lit(1)).alias("row_count"),
                  F.count(F.when(F.col("value") < 0, 1)).alias("neg")))
    expect = {r["d"]: (r["row_count"], r["neg"]) for r in batch.collect()}
    for r in rows:
        assert expect[r["window_start"]][0] == r["row_count"]
        assert expect[r["window_start"]][1] == r["negative_count"]


def test_freshness_complete_mode(spark, stream_dir):
    s = events_stream(spark, stream_dir)
    _run(freshness(s), "fr", mode="complete")
    got = {r["event_type"]: r["max_ts"] for r in spark.sql("select * from fr").collect()}
    expect = {r["event_type"]: r["m"] for r in
              load_table(spark, "events", SF_DIR)
              .groupBy("event_type").agg(F.max("ts").alias("m")).collect()}
    assert got == expect


def test_stateful_running_metrics(spark, stream_dir):
    from sparvi_spark.streaming.stateful import running_metrics

    s = events_stream(spark, stream_dir, max_files_per_trigger=1)
    _run(running_metrics(s), "rm", mode="append")
    rows = spark.sql("select * from rm").collect()
    assert rows
    # the last emitted row per key is the converged running state
    final = {}
    for r in rows:
        final[r["event_type"]] = r
    batch = (load_table(spark, "events", SF_DIR).groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.count(F.when(F.col("value").isNull(), 1)).alias("nulls"),
                  F.max("value").alias("mx")))
    expect = {r["event_type"]: r for r in batch.collect()}
    assert set(final) == set(expect)
    for k, r in final.items():
        assert r["row_count"] == expect[k]["n"]
        assert r["null_count"] == expect[k]["nulls"]
        assert r["max_value"] == expect[k]["mx"]


@pytest.mark.parametrize("method,sens", [("zscore", 3.0), ("cusum", 2.0)])
def test_streaming_detection_matches_batch(spark, stream_dir, tmp_path,
                                           method, sens):
    from sparvi_spark.operators.anomalies import detect_anomalies
    from sparvi_spark.streaming import streaming_detection

    cfg = {"detection_method": method, "sensitivity": sens,
           "min_data_points": 3}
    metrics_path = str(tmp_path / "metrics")
    batches = []
    q = streaming_detection(
        events_stream(spark, stream_dir), metrics_path, config=cfg,
        window="1 day", on_anomalies=lambda df, bid: batches.append((bid, df.collect())),
    )
    q.processAllAvailable()
    q.stop()

    nonempty = [rows for _, rows in sorted(batches) if rows]
    assert nonempty, "expected at least one detection pass"
    got = {(r["metric_name"], r["ts"]): round(r["score"], 9)
           for r in nonempty[-1]}

    # batch replay of the same pipeline over the emitted metrics store
    store = (spark.read.parquet(metrics_path)
             .groupBy("metric_name", "ts")
             .agg(F.max("value").alias("value")))
    expect = {(r["metric_name"], r["ts"]): round(r["score"], 9)
              for r in detect_anomalies(store, ["metric_name"], config=cfg).collect()}
    assert expect, "fixture should yield at least one anomaly"
    assert got == expect


def test_watermark_drops_late_events(spark, tmp_path):
    """True late-data semantics: an event older than the watermark arriving
    in a later microbatch is EXCLUDED from its (already closing) window.

    Drop 1 sets max event time to 13:00; with a 1-hour watermark delay the
    [10:00, 11:00) window closes at watermark 12:00 during drop 2's batch,
    so drop 2's late 10:15 event must not be counted."""
    import time

    d = str(tmp_path / "drops")

    def drop(rows):
        df = spark.createDataFrame(
            [(i, ts, 1, "click", 1.0, None) for i, ts in enumerate(rows)],
            "event_id bigint, ts string, user_id bigint, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("append").parquet(d)
        time.sleep(0.05)  # distinct file mtimes -> deterministic drop order

    drop(["2024-01-01 10:00:00", "2024-01-01 10:20:00",
          "2024-01-01 13:00:00"])
    s = events_stream(spark, d, max_files_per_trigger=1)
    q = (windowed_counts(s, window="1 hour", watermark="1 hour")
         .writeStream.format("memory").queryName("late").outputMode("append")
         .start())
    q.processAllAvailable()
    # late arrival for the 10:00 window + a fresh event to advance batches
    drop(["2024-01-01 10:15:00", "2024-01-01 14:00:00"])
    q.processAllAvailable()
    q.stop()

    got = {r["window_start"].strftime("%H:%M"): r["row_count"]
           for r in spark.sql("select * from late").collect()}
    # the 10:00 window emitted exactly once, WITHOUT the late event
    assert got.get("10:00") == 2


def test_streaming_sessions_match_batch(spark, stream_dir):
    from sparvi_spark.operators.sessions import sessionize
    from sparvi_spark.streaming import streaming_sessions

    s = events_stream(spark, stream_dir)
    _run(streaming_sessions(s, gap="30 minutes", watermark="0 seconds"), "ss")
    got = {(r["user_id"], r["session_start"]): (r["n_events"], r["last_ts"])
           for r in spark.sql("select * from ss").collect()}
    assert got

    # batch replay: same gap rule via the lag+running-sum sessionizer
    ev = load_table(spark, "events", SF_DIR)
    batch = (sessionize(ev, "user_id", "ts", 30.0, "event_id")
             .groupBy("user_id", "session_no")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.min("ts").alias("start"), F.max("ts").alias("end")))
    expect = {(r["user_id"], r["start"]): (r["n"], r["end"])
              for r in batch.collect()}
    # watermark may hold back each user's newest session; every emitted
    # closed session must match the batch result exactly
    assert all(expect.get(k) == v for k, v in got.items())
    n_users = ev.select("user_id").distinct().count()
    assert len(got) >= len(expect) - n_users


def test_streaming_dedup_exact_and_fingerprint(spark, tmp_path):
    """Streaming dedup: only first occurrences pass; the kept key set
    matches batch dedup over the same drops; fingerprint mode also drops
    docs whose SimHash coincides (identical token multiset here)."""
    import datetime as dt

    from sparvi_spark.streaming.dedup import (
        streaming_dedup_exact,
        streaming_dedup_fingerprint,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows1 = [(1, t0, "alpha beta gamma"),
             (2, t0 + dt.timedelta(minutes=1), "delta epsilon zeta"),
             (3, t0 + dt.timedelta(minutes=2), "alpha beta gamma")]
    rows2 = [(4, t0 + dt.timedelta(minutes=3), "delta epsilon zeta"),
             (5, t0 + dt.timedelta(minutes=4), "unique new text here"),
             (6, t0 + dt.timedelta(minutes=5), "alpha beta gamma")]
    ddl = "doc_id int, ts timestamp, text string"
    d = tmp_path / "drops"
    spark.createDataFrame(rows1, ddl).coalesce(1).write.mode("overwrite") \
        .parquet(str(d))
    spark.createDataFrame(rows2, ddl).coalesce(1).write.mode("append") \
        .parquet(str(d))

    stream = (spark.readStream.schema(ddl)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (streaming_dedup_exact(stream, ["text"], watermark="1 hour")
         .writeStream.format("memory").queryName("sde")
         .outputMode("append").start())
    q.processAllAvailable(); q.stop()
    kept = {r["text"] for r in spark.sql("select * from sde").collect()}
    assert kept == {"alpha beta gamma", "delta epsilon zeta",
                    "unique new text here"}
    # exactly one row per distinct content — repeats in later batches drop
    assert spark.sql("select count(*) c from sde").first()["c"] == 3

    stream2 = (spark.readStream.schema(ddl)
               .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q2 = (streaming_dedup_fingerprint(stream2, "text", watermark="1 hour")
          .writeStream.format("memory").queryName("sdf")
          .outputMode("append").start())
    q2.processAllAvailable(); q2.stop()
    assert spark.sql("select count(*) c from sdf").first()["c"] == 3


def test_streaming_quality_filter_matches_batch(spark, tmp_path):
    """The Gopher-rule quality filter is a stateless projection, so it
    composes with a stream unchanged: flags emitted per microbatch equal
    the batch run over the same drops — continuous ingest gating."""
    import datetime as dt

    from sparvi_spark.operators.text import quality_filter

    t0 = dt.datetime(2026, 1, 1)
    long_ok = " ".join(
        ["the quick brown fox jumps over a lazy dog near the old barn"] * 3)
    rows = [(1, t0, long_ok), (2, t0, "tiny"), (3, t0, "### ### ###"),
            (4, t0, long_ok + " indeed")]
    d = tmp_path / "drops"
    ddl = "doc_id int, ts timestamp, text string"
    spark.createDataFrame(rows[:2], ddl).coalesce(1) \
        .write.mode("overwrite").parquet(str(d))
    spark.createDataFrame(rows[2:], ddl).coalesce(1) \
        .write.mode("append").parquet(str(d))

    stream = (spark.readStream.schema(ddl)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (quality_filter(stream, "text", "doc_id", min_words=10)
         .writeStream.format("memory").queryName("sqf")
         .outputMode("append").start())
    q.processAllAvailable(); q.stop()
    got = {r["doc_id"]: (r["keep"], r["n_failed"]) for r in
           spark.sql("select * from sqf").collect()}
    batch = {r["doc_id"]: (r["keep"], r["n_failed"]) for r in
             quality_filter(spark.createDataFrame(rows, ddl), "text",
                            "doc_id", min_words=10).collect()}
    assert got == batch and len(got) == 4
    assert got[2][0] is False and got[1][0] in (True, False)


def test_kafka_payload_seam_and_source_dispatch(spark, tmp_path):
    """The Kafka seam, broker-free: parse_event_payload recovers typed
    event rows from the standard Kafka record shape on a BATCH frame, and
    stream_source dispatches files/kafka/unknown correctly."""
    import datetime as dt
    import json as _json

    from sparvi_spark.streaming.monitor import (
        parse_event_payload,
        stream_source,
    )

    events = [
        {"event_id": 1, "ts": "2026-01-01 00:00:00", "user_id": 7,
         "event_type": "click", "value": 1.5, "props": None},
        {"event_id": 2, "ts": "2026-01-01 01:00:00", "user_id": 8,
         "event_type": "view", "value": None, "props": "{\"k\": 1}"},
    ]
    kafka_shaped = spark.createDataFrame(
        [(None, bytearray(_json.dumps(e).encode()), "t", 0, i,
          dt.datetime(2026, 1, 1, 2, 0, 0))
         for i, e in enumerate(events)],
        "key binary, value binary, topic string, partition int, "
        "offset bigint, timestamp timestamp")
    rows = {r["event_id"]: r
            for r in parse_event_payload(kafka_shaped).collect()}
    assert rows[1]["event_type"] == "click" and rows[1]["value"] == 1.5
    assert rows[1]["ts"] == dt.datetime(2026, 1, 1, 0, 0, 0)
    assert rows[2]["value"] is None and rows[2]["props"] == '{"k": 1}'
    assert rows[1]["kafka_ts"] == dt.datetime(2026, 1, 1, 2, 0, 0)

    # dispatcher: files path builds a streaming frame with events schema
    import pyarrow as pa
    import pyarrow.parquet as pq

    drop = tmp_path / "drops"
    drop.mkdir()
    pq.write_table(pa.table({
        "event_id": [1], "ts": [dt.datetime(2026, 1, 1)], "user_id": [1],
        "event_type": ["click"], "value": [1.0], "props": [None]}),
        str(drop / "a.parquet"))
    st = stream_source(spark, {"type": "files", "path": str(drop)})
    assert st.isStreaming and "event_type" in st.columns

    with pytest.raises(NotImplementedError):
        stream_source(spark, {"type": "pulsar"})


def test_streaming_incremental_profile_matches_batch(spark, tmp_path):
    """Continuous profiling: drops stream in, each microbatch folds an
    incremental round, and the final profile equals a from-scratch batch
    profile over everything ingested."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparvi_spark.engine import Engine
    from sparvi_spark.operators.incremental import incremental_profile_full
    from sparvi_spark.streaming.profile import streaming_incremental_profile

    drop = tmp_path / "in"
    drop.mkdir()
    table_path = str(tmp_path / "acc")
    engine = Engine(spark, str(tmp_path / "wh"))

    def write_drop(name, parts, vals):
        pq.write_table(pa.table({"part": parts, "v": vals}),
                       str(drop / name))

    write_drop("b1.parquet", ["a"] * 3 + ["b"] * 2,
               [1.0, 2.0, 3.0, 10.0, 20.0])

    stream = (spark.readStream.schema("part string, v double")
              .option("maxFilesPerTrigger", 1).parquet(str(drop)))
    seen = []
    q = streaming_incremental_profile(
        stream, engine, "st", table_path, "part", ["v"],
        on_profile=lambda df, bid: seen.append(bid))
    try:
        q.processAllAvailable()
        write_drop("b2.parquet", ["b", "c"], [30.0, 7.0])
        q.processAllAvailable()
    finally:
        q.stop()

    assert seen  # profiles were produced
    accumulated = spark.read.parquet(table_path)
    got = engine.run_incremental_profile(accumulated, "st", "part", ["v"]) \
        .toPandas().sort_values("column_name").reset_index(drop=True)
    _, scratch = incremental_profile_full(accumulated, "part", ["v"])
    expect = scratch.toPandas().sort_values("column_name") \
        .reset_index(drop=True)
    assert got.equals(expect)
    assert got.iloc[0]["cnt"] == 7 and got.iloc[0]["max_val"] == 30.0
    # the engine recorded incremental rounds, not full re-scans
    events = engine.state.read("engine_events").where(
        F.col("event_type") == "incremental_profile")
    assert events.count() >= 2


def test_streaming_drift_monitor_alerts_on_shift(spark, tmp_path):
    """Continuous drift: an in-distribution microbatch stays quiet, a
    shifted one raises the distribution_drift event within its batch;
    tiny batches are skipped entirely."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from sparvi_spark.engine import Engine
    from sparvi_spark.streaming.drift import streaming_drift_monitor

    engine = Engine(spark, str(tmp_path / "wh"))
    rng = random.Random(5)
    base_vals = [rng.gauss(100, 10) for _ in range(400)]
    base = spark.createDataFrame([(v,) for v in base_vals], "x double")
    engine.save_drift_baseline(base, "feed", ["x"], bins=10,
                               as_of="2026-01-01 00:00:00")

    drop = tmp_path / "in"
    drop.mkdir()

    def write_drop(name, vals):
        pq.write_table(pa.table({"x": vals}), str(drop / name))

    write_drop("b1.parquet", base_vals[:200])            # in-distribution
    stream = (spark.readStream.schema("x double")
              .option("maxFilesPerTrigger", 1).parquet(str(drop)))
    seen = []
    q = streaming_drift_monitor(
        stream, engine, "feed", min_rows=50,
        on_drift=lambda df, bid: seen.append(
            {r["column_name"]: r["psi"] for r in df.collect()}))
    try:
        q.processAllAvailable()
        assert len(seen) == 1 and seen[0]["x"] < 0.05
        assert engine.state.read("engine_events").where(
            F.col("event_type") == "distribution_drift").count() == 0

        write_drop("b2.parquet", [v + 40 for v in base_vals[200:]])  # shifted
        write_drop("b3.parquet", base_vals[:10])          # below min_rows
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(seen) == 2  # the 10-row batch was skipped
    assert seen[1]["x"] > 0.2
    assert engine.state.read("engine_events").where(
        F.col("event_type") == "distribution_drift").count() == 1


def test_streaming_corpus_intake_matches_batch_dedup(spark, tmp_path):
    """Corpus intake stream: per-microbatch near-dedup against signature
    state admits the same survivor set one batch call would (duplicates
    arriving after their originals), and cross-batch dups are caught
    from state alone."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparvi_spark.engine import Engine
    from sparvi_spark.streaming.corpus import streaming_corpus_intake

    base = ("the quick brown fox jumps over the lazy dog near the old "
            "barn by the quiet river where tall green reeds sway")
    other = ("compilers parse source text into syntax trees then emit "
             "bytecode for a stack machine with constant folding passes")
    drop = tmp_path / "in"
    drop.mkdir()
    corpus_path = str(tmp_path / "corpus")
    engine = Engine(spark, str(tmp_path / "wh"))

    def write_drop(name, rows):
        ids, texts = zip(*rows)
        pq.write_table(pa.table({"doc_id": list(ids), "text": list(texts)}),
                       str(drop / name))

    # batch 1: original + in-batch near-dup + distinct
    write_drop("b1.parquet", [(1, base), (2, base + " tail"), (3, other)])
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(str(drop)))
    summaries = []
    q = streaming_corpus_intake(
        stream, engine, "sc", corpus_path,
        on_batch=lambda s, bid: summaries.append(s))
    try:
        q.processAllAvailable()
        # batch 2: near-dup of ADMITTED doc 1 (caught via state, the
        # text of batch 1 is never reread) + one fresh doc
        write_drop("b2.parquet", [(10, base + " edited end"),
                                  (11, "fresh sailing prose across a cold "
                                       "sea under grey skies and gulls")])
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = sorted(r["doc_id"]
                      for r in spark.read.parquet(corpus_path).collect())
    assert admitted == [1, 3, 11]
    assert summaries[0]["n_in_batch_dups"] == 1
    assert summaries[1]["n_vs_corpus_dups"] == 1
    # equivalence: one batch call over everything admits the same set
    all_docs = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (3, other),
         (10, base + " edited end"),
         (11, "fresh sailing prose across a cold sea under grey skies "
              "and gulls")], "doc_id long, text string")
    eng2 = Engine(spark, str(tmp_path / "wh2"))
    s = eng2.dedup_corpus_incremental(all_docs, "sc")
    assert sorted(r["doc_id"] for r in s["kept"].collect()) == admitted


def test_streaming_corpus_intake_survives_hostile_microbatch(spark, tmp_path):
    """A microbatch carrying NULL / empty / one-word / two-word documents
    must not kill the stream: the gram pipelines drop short docs instead
    of throwing (round-9 fix — sequence(1, 0) descends, so the old bound
    crashed slice(toks, 0, n) on any 1..n-1-token doc, which in a
    foreachBatch intake takes down the whole QUERY, not one row). The
    short/NULL docs are never shingled, so near-dedup must pass them
    through to the corpus untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparvi_spark.engine import Engine
    from sparvi_spark.streaming.corpus import streaming_corpus_intake

    base = ("the quick brown fox jumps over the lazy dog near the old "
            "barn by the quiet river where tall green reeds sway")
    drop = tmp_path / "in"
    drop.mkdir()
    corpus_path = str(tmp_path / "corpus")
    engine = Engine(spark, str(tmp_path / "wh"))
    pq.write_table(
        pa.table({"doc_id": [1, 2, 3, 4, 5, 6],
                  "text": [base, base + " tail", None, "", "one",
                           "two words"]}),
        str(drop / "b1.parquet"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(str(drop)))
    summaries = []
    q = streaming_corpus_intake(
        stream, engine, "hostile", corpus_path,
        on_batch=lambda s, bid: summaries.append(s))
    try:
        q.processAllAvailable()
        assert q.exception() is None  # the stream survived
    finally:
        q.stop()
    admitted = sorted(r["doc_id"]
                      for r in spark.read.parquet(corpus_path).collect())
    # near-dup 2 dropped; unshingleable docs admitted untouched
    assert admitted == [1, 3, 4, 5, 6]
    assert summaries and summaries[0]["n_in_batch_dups"] == 1


def test_streaming_vocab_monitor_alerts_on_token_shift(spark, tmp_path):
    """Continuous vocabulary drift: an in-distribution microbatch stays
    quiet, a token-mix-shifted one (same NUMERIC shape — different
    words) raises the vocab_drift event within its batch; tiny batches
    are skipped. With the baseline top_k covering the whole reference
    vocabulary, the engine's truncated TVD equals the exact operator
    (drift.vocab_tvd) on the same pair of corpora."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from sparvi_spark.engine import Engine
    from sparvi_spark.operators.drift import vocab_tvd
    from sparvi_spark.streaming.vocab import streaming_vocab_monitor

    engine = Engine(spark, str(tmp_path / "wh"))
    ref_docs = [(i, "the quick brown fox jumps over the lazy dog again")
                for i in range(60)]
    ref = spark.createDataFrame(ref_docs, "doc_id int, text string")
    engine.save_vocab_baseline(ref, "crawl", top_k=100,
                               as_of="2026-01-01 00:00:00")

    drop = tmp_path / "in"
    drop.mkdir()

    def write_drop(name, rows):
        ids, texts = zip(*rows)
        pq.write_table(pa.table({"doc_id": list(ids),
                                 "text": list(texts)}), str(drop / name))

    write_drop("b1.parquet", ref_docs[:30])  # in-distribution
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(str(drop)))
    seen = []
    q = streaming_vocab_monitor(
        stream, engine, "crawl", min_docs=20,
        on_drift=lambda df, bid: seen.append(df.collect()[0]))
    try:
        q.processAllAvailable()
        assert len(seen) == 1 and seen[0]["tvd"] == 0.0  # identical mix
        assert seen[0]["oov_frac"] == 0.0
        assert engine.state.read("engine_events").where(
            F.col("event_type") == "vocab_drift").count() == 0

        shifted = [(100 + i, "acheter maintenant des pilules pas cher "
                             "offre limitee cliquez ici")
                   for i in range(30)]
        write_drop("b2.parquet", shifted)                  # spam shift
        write_drop("b3.parquet", ref_docs[:5])             # below min_docs
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(seen) == 2  # b3 skipped
    assert seen[1]["tvd"] > 0.5 and seen[1]["oov_frac"] > 0.9
    assert engine.state.read("engine_events").where(
        F.col("event_type") == "vocab_drift").count() == 1
    # truncation-free coherence: engine TVD == the exact operator's
    sh = spark.createDataFrame(shifted, "doc_id int, text string")
    exact = vocab_tvd(ref, sh).collect()[0]["tvd"]
    assert abs(seen[1]["tvd"] - exact) < 1e-9
    # vocab_tvd scalar landed in metric history for the trend machinery
    hist = engine.state.read("historical_metrics").where(
        "metric_name = 'vocab_tvd'").count()
    assert hist == 2
