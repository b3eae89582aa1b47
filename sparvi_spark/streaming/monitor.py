"""Streaming monitors over an events-shaped stream.

Batch parity: each operator's semantics match a batch groupBy over the same
data (the tests assert exactly that via processAllAvailable + memory sink),
so the streaming path is a drop-in continuous version of the reference's
polled metrics (core/analytics/historical_metrics.py) — rows arrive, windows
close at the watermark, and the sink receives the same rows the batch
equivalent would compute.

Scale notes: all aggregations are keyed by (window, event_type) — state size
is O(active windows × event types), independent of row volume; the watermark
bounds "active". No Python UDFs on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

EVENTS_DDL = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")


def events_stream(spark: SparkSession, path: str,
                  schema: str = EVENTS_DDL,
                  max_files_per_trigger: int = 4,
                  nanos_ts: bool = False) -> DataFrame:
    """File-source stream over a directory of parquet drops.

    ``maxFilesPerTrigger`` bounds per-microbatch work (backpressure).
    ``nanos_ts=True`` reads the driver testdata's TIMESTAMP(NANOS) column
    (a nanosecond long under spark.sql.legacy.parquet.nanosAsLong) and
    normalizes it, mirroring testdata.load_table.
    """
    if nanos_ts:
        schema = schema.replace("ts timestamp", "ts bigint")
    df = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", max_files_per_trigger)
          .parquet(path))
    if isinstance(df.schema["ts"].dataType, LongType):
        # integer `div`, not floor(x / 1000): nanos epochs exceed double's
        # 2^53 exact range (same fix as testdata.load_table)
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def parse_event_payload(df: DataFrame, schema: str = EVENTS_DDL,
                        value_col: str = "value") -> DataFrame:
    """Kafka-record frame -> events frame: JSON in ``value`` parsed against
    ``schema`` (JVM-side from_json — no UDF), Kafka's own ingest timestamp
    kept as ``kafka_ts`` for lag monitoring.

    Pure DataFrame logic over the standard Kafka source shape (key/value
    binary, topic, partition, offset, timestamp), so it is testable on a
    BATCH frame of the same shape without a broker — the seam the
    streaming source swap runs through.
    """
    parsed = df.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("e"),
        F.col("timestamp").alias("kafka_ts"))
    return parsed.select("e.*", "kafka_ts")


def kafka_stream(spark: SparkSession, bootstrap_servers: str, topic: str,
                 schema: str = EVENTS_DDL,
                 starting_offsets: str = "latest",
                 max_offsets_per_trigger: int | None = None) -> DataFrame:
    """Kafka source -> parsed events stream (the config swap SCALING.md
    promises: same downstream operators, different readStream source).

    Requires the spark-sql-kafka package on the classpath (not bundled in
    this container — the reader raises on load() without it; the payload
    parsing seam is covered broker-free by ``parse_event_payload``).
    ``maxOffsetsPerTrigger`` is the Kafka-side backpressure bound, the
    analogue of the file source's maxFilesPerTrigger.
    """
    reader = (spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("subscribe", topic)
              .option("startingOffsets", starting_offsets))
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger",
                               str(max_offsets_per_trigger))
    return parse_event_payload(reader.load(), schema)


def stream_source(spark: SparkSession, conf: dict) -> DataFrame:
    """Uniform stream entry point (mirrors sources.read_table for batch):
    ``{"type": "files", "path": dir}`` or ``{"type": "kafka",
    "bootstrap_servers": ..., "topic": ...}`` — downstream operators
    (windowed_counts/quality, freshness, dedup, detect) are source-
    agnostic."""
    ctype = conf["type"].lower()
    if ctype == "files":
        return events_stream(
            spark, conf["path"], schema=conf.get("schema", EVENTS_DDL),
            max_files_per_trigger=conf.get("max_files_per_trigger", 4),
            nanos_ts=conf.get("nanos_ts", False))
    if ctype == "kafka":
        return kafka_stream(
            spark, conf["bootstrap_servers"], conf["topic"],
            schema=conf.get("schema", EVENTS_DDL),
            starting_offsets=conf.get("starting_offsets", "latest"),
            max_offsets_per_trigger=conf.get("max_offsets_per_trigger"))
    raise NotImplementedError(f"stream source type {ctype!r}")


def windowed_counts(stream: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours",
                    ts_col: str = "ts", key_col: str = "event_type") -> DataFrame:
    """Tumbling-window row counts per key — the streaming form of the
    dashboard daily counts (T6, app.py:5659-5845)."""
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
            .agg(F.count(F.lit(1)).alias("row_count"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    key_col, "row_count"))


def windowed_quality(stream: DataFrame, window: str = "1 hour",
                     watermark: str = "2 hours",
                     ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Windowed quality metrics: nulls, negatives, min/max/avg of ``value``
    — the profiler's P2/P4 semantics applied per event-time window."""
    v = F.col(value_col)
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("w"))
            .agg(F.count(F.lit(1)).alias("row_count"),
                 F.count(F.when(v.isNull(), 1)).alias("null_count"),
                 F.count(F.when(v < 0, 1)).alias("negative_count"),
                 F.min(v).alias("min_value"),
                 F.max(v).alias("max_value"),
                 F.avg(v).alias("avg_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "row_count", "null_count", "negative_count",
                    "min_value", "max_value", "avg_value"))


def freshness(stream: DataFrame, ts_col: str = "ts",
              key_col: str = "event_type") -> DataFrame:
    """P10 freshness, continuously: newest event time per key. Run with
    outputMode("complete") — state is one row per key."""
    return stream.groupBy(key_col).agg(F.max(ts_col).alias("max_ts"))
