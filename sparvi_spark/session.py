"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same configs are what we would set on a
1000-executor cluster (AQE on, skew-join handling, sensible shuffle
partitioning). Nothing here is local-mode-specific except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sparvi_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Honors SPARK_GRAFT_CPUS for local parallelism (driver contract). On a
    real cluster the master/resource configs come from spark-submit; all
    SQL-level configs below apply unchanged.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime coalescing, skew-join splitting, dynamic join strategy.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce post-shuffle partitions to the 64MB advisory size instead
        # of maximizing parallelism: small shuffles collapse to few tasks
        # (scheduling overhead dominates them), while at 100TB the advisory
        # size keeps partitions executor-memory-sized either way. This is
        # Spark's own recommended setting for busy clusters.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic timestamps across engines (oracle parity).
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas_udf / toPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Driver testdata writes TIMESTAMP(NANOS) parquet (events.ts); Spark
        # reads them as nanosecond longs, converted back in testdata.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The profiler/validator fuse 40-80 aggregates into one pass; the
        # default maxFields=100 pushes those plans out of whole-stage
        # codegen into interpreted eval (measured 1.6x on the fused
        # validation pass A at sf0.1).
        .config("spark.sql.codegen.maxFields", "500")
        # InferFiltersFromGenerate derives a `size(e) > 0 AND
        # isnotnull(e)` filter below every explode and pushes it through
        # the staging projections, SUBSTITUTING the generator input back
        # into the predicate — for the shingle/bigram pipelines that
        # re-materializes the whole interpreted gram build inside the
        # Filter (CodegenFallback, no CSE with the Project's copy) and,
        # worse, splices the token split back inside the transform
        # lambda, restoring the O(tokens²)-per-doc re-split the staged
        # projections exist to avoid. Measured on the 100× corpus:
        # candidate shingle explode 47.2s -> 8.2s with the rule off.
        # Every generator input in this engine is either a cheap column
        # or explicitly pre-filtered (the gram builders drop <n-token
        # docs by token count), so the rule's empty-row pruning buys
        # nothing here. Results are identical — the filter it removes is
        # redundant by construction.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
        # PySpark 4 captures a Python call-site string on EVERY DataFrame
        # API call for error enrichment (errors/utils.py _with_origin);
        # profiling showed ~1.5s of pure driver-side overhead building one
        # wide validation plan. We build thousands of Columns per run.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # FAIR scheduler: concurrent submitters (the engine's check sweeps
        # mirror the reference's 10-thread rule executor) each set their
        # own spark.scheduler.pool and share executor slots fairly instead
        # of queueing behind one long job. Single-caller behavior is
        # unchanged — jobs without a pool land in the default FIFO pool.
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
        # Session-catalog warehouse for bucketed tables (sources/bucketing).
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/sparvi_warehouse"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
