"""Input connectors (SURVEY.md §2.F).

The reference's only implemented connector is SQLAlchemy-over-Snowflake
(core/metadata/connectors.py:31-126) with a factory that rejects everything
else (connector_factory.py:45-66). In Spark the connector surface is the
DataSource API: every warehouse the reference targets (Snowflake, Postgres,
Redshift, DuckDB files) is reachable through ``jdbc``, and file lakes
through native parquet/csv/json readers — all with predicate pushdown and
column pruning handled by the source.

``read_table`` is the uniform entry point: a connection dict + table name ->
DataFrame. Partitioned JDBC reads (partition_column/num_partitions) are the
scale path — without them a JDBC read is a single task.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _jdbc_url(conn: dict[str, Any]) -> str:
    """Build a JDBC URL from the reference's connection-detail shape
    (core/connections/builders.py:26-64: type + account/host/db/schema)."""
    ctype = conn["type"].lower()
    if ctype == "postgresql":
        return (f"jdbc:postgresql://{conn['host']}:{conn.get('port', 5432)}/"
                f"{conn['database']}")
    if ctype == "snowflake":
        # carry database/schema/warehouse context into the URL — without
        # them every unqualified table read fails with "object does not
        # exist" (the reference's builder sets the same fields)
        params = "&".join(
            f"{url_k}={conn[k]}" for k, url_k in
            (("database", "db"), ("schema", "schema"),
             ("warehouse", "warehouse"), ("role", "role"))
            if conn.get(k))
        base = f"jdbc:snowflake://{conn['account']}.snowflakecomputing.com/"
        return base + (f"?{params}" if params else "")
    if ctype == "duckdb":
        return f"jdbc:duckdb:{conn.get('path', ':memory:')}"
    if ctype == "derby":
        # embedded Derby (ships with Spark's Hive support) — the in-process
        # JDBC backend the integration tests drive the full JDBC path with
        return f"jdbc:derby:{conn.get('path', 'memory:sparvi')};create=true"
    raise NotImplementedError(f"connection type {ctype!r}")


def read_table(
    spark: SparkSession,
    conn: dict[str, Any],
    table: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    columns: list[str] | None = None,
    predicates: list[str] | None = None,
) -> DataFrame:
    """Read one monitored table as a DataFrame.

    conn["type"]: ``parquet`` | ``orc`` | ``csv`` | ``json`` (path-based
    lakes; conn["path"] is the directory) or ``postgresql`` | ``snowflake``
    | ``duckdb`` (JDBC). For JDBC, pass partition_column + bounds to
    parallelize the read across executors; defaults would funnel the whole
    table through one task.

    ``columns``/``predicates`` prune and filter INSIDE the warehouse
    via a dialect-rendered derived table (sources/dialects):
    columns are case-exact quoted per the warehouse's folding rules,
    predicates are caller-authored warehouse-SQL fragments AND-ed
    together (same trust level as V24 custom-SQL rules). Spark's own
    JDBC pushdown covers simple Catalyst filters; this path covers
    expressions it cannot push and previews that must never scan.
    ``columns`` also prunes file sources (Spark pushes the projection to
    the scan); ``predicates`` are warehouse-dialect strings and raise on
    file sources — use ``.where()`` with Spark SQL there instead.
    """
    ctype = conn["type"].lower()
    if ctype in ("parquet", "orc", "csv", "json"):
        path = f"{conn['path']}/{table}.{ctype}"
        reader = spark.read
        if ctype == "csv":
            reader = reader.option("header", "true").option("inferSchema", "true")
        df = getattr(reader, ctype)(path)
        if columns:
            df = df.select(*columns)
        if predicates:
            # predicates are documented as warehouse-SQL fragments (quoted
            # identifiers like '"grp" = 3'); Spark SQL parses double quotes
            # as STRING LITERALS, so applying them here would silently
            # filter out every row rather than erroring — refuse instead
            # and make the caller use Spark-dialect .where() on the result
            raise ValueError(
                "read_table: predicates are warehouse-SQL fragments and "
                f"only apply to JDBC sources, not {ctype!r} files; filter "
                "the returned DataFrame with Spark-SQL .where() instead")
        return df
    dbtable = table
    drop_partition_col = False
    if columns or predicates:
        from sparvi_spark.sources.dialects import dialect_for

        if columns and partition_column is not None \
                and partition_column not in columns:
            # the partitioned JDBC read appends stride predicates on
            # partition_column to every task's query; pruning it out of
            # the derived table would make the warehouse reject every
            # task at load time — read it, drop it after
            columns = [*columns, partition_column]
            drop_partition_col = True
        dbtable = dialect_for(ctype).pushdown_subquery(
            table, columns=columns, predicates=predicates)
    reader = (
        spark.read.format("jdbc")
        .option("url", _jdbc_url(conn))
        .option("dbtable", dbtable)
    )
    for k in ("user", "password", "driver"):
        if k in conn:
            reader = reader.option(k, conn[k])
    if partition_column is not None:
        user_upper = upper_bound is not None
        if lower_bound is None or upper_bound is None:
            # derive real bounds with one tiny JDBC round trip: bounds
            # define the STRIDE (rows outside them still load, funneled
            # into the edge partitions), so a silent default like
            # [0, 1e6) on a table with ids to 1e9 puts 99.9% of the rows
            # through one task — the exact straggler partitioning exists
            # to prevent
            # quote the column through Spark's own JDBC dialect: the JDBC
            # writer creates columns quoted (case-preserved), so a raw
            # `min(col)` would be case-folded by the warehouse and miss
            url = _jdbc_url(conn)
            qcol = (spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects
                    .get(url).quoteIdentifier(partition_column))
            probe = (spark.read.format("jdbc")
                     .option("url", url)
                     .option("dbtable",
                             f"(SELECT min({qcol}) AS mn, "
                             f"max({qcol}) AS mx "
                             f"FROM {table}) AS b"))
            for k in ("user", "password", "driver"):
                if k in conn:
                    probe = probe.option(k, conn[k])
            bounds_df = probe.load()
            row = bounds_df.first()
            vals = {c.lower(): row[c] for c in bounds_df.columns}
            if lower_bound is None:
                lower_bound = vals["mn"]
            if upper_bound is None:
                upper_bound = vals["mx"]
        if lower_bound is None or upper_bound is None:
            # empty table: min/max probe returned NULL — a partitioned read
            # with NULL bounds raises in the JDBC source, and there is
            # nothing to parallelize anyway, so fall back to a plain read
            df = reader.load()
            return df.drop(partition_column) if drop_partition_col else df
        if not user_upper and isinstance(upper_bound, int) \
                and not isinstance(upper_bound, bool):
            # upperBound is EXCLUSIVE for the last stride boundary in the
            # Spark JDBC source; widen probed integral max so the max row
            # doesn't land alone in the unbounded edge partition. Date/
            # timestamp/decimal bounds (also valid partitionColumn types)
            # and explicitly user-passed bounds go through verbatim.
            upper_bound = upper_bound + 1
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", num_partitions or 8)
                  .option("lowerBound", lower_bound)
                  .option("upperBound", upper_bound))
    df = reader.load()
    return df.drop(partition_column) if drop_partition_col else df


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    text_col: str = "text",
    id_col: str | None = None,
) -> DataFrame:
    """Raw-corpus ingestion: a directory/glob of ``.jsonl`` or plain-text
    files -> (doc_id, text, source_file) — the entry point of the
    dedup/quality/contamination pipeline for corpora that arrive as dumps
    rather than tables.

    - ``jsonl``: one JSON object per line (``spark.read.json`` line mode);
      ``text_col`` names the text field, ``id_col`` (when the dump carries
      one) is used verbatim as doc_id.
    - ``text``: one document per LINE (the crawl-dump shape).

    Without a supplied id, doc_id = xxhash64(source_file, text) —
    deterministic across runs, partitionings, and cluster sizes (unlike
    ``monotonically_increasing_id``, which depends on partition layout).
    Byte-identical lines within one file would share that id, so they are
    collapsed on read (they are exact duplicates; every downstream dedup
    would drop them anyway, and id uniqueness is what joins rely on).

    Scale: both readers are splittable line sources — a 100 TB dump fans
    out across executors at maxPartitionBytes granularity; the id
    projection and the within-file dedup (one shuffle on the 8-byte id)
    are the only added cost.
    """
    from pyspark.sql import functions as F

    fmt = fmt.lower()
    if fmt == "jsonl":
        raw = spark.read.json(path)
        if text_col not in raw.columns:
            raise ValueError(
                f"read_corpus: field {text_col!r} not in {sorted(raw.columns)}")
        text = F.col(text_col).cast("string")
    elif fmt == "text":
        raw = spark.read.text(path)
        text = F.col("value")
    else:
        raise NotImplementedError(f"corpus format {fmt!r}")
    out = raw.select(
        text.alias("text"),
        F.input_file_name().alias("source_file"),
    )
    if id_col is not None and fmt == "jsonl":
        # verbatim, as documented: a cast('long') would NULL every
        # string/UUID id and silently collapse all downstream joins —
        # every consumer takes id_col generically, so the dump's own
        # type (string or numeric) flows through unchanged
        ids = raw.select(F.col(id_col).alias("doc_id"),
                         text.alias("text"),
                         F.input_file_name().alias("source_file"))
        return ids.select("doc_id", "text", "source_file")
    return (out.dropDuplicates(["source_file", "text"])
            .select(F.xxhash64("source_file", "text").alias("doc_id"),
                    "text", "source_file"))
