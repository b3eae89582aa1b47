"""Z-order clustered layout: multi-column data skipping at write time.

Partitioning prunes on ONE directory column; parquet min/max row-group
stats prune on whatever the file happens to be sorted by — which is one
column at best. Z-ordering interleaves the bits of several columns into a
single sort key, so sorting by it gives every participating column a
locally-narrow value range per file: a filter on ANY of the z-columns
skips most files via footer stats. This is the standard layout answer to
"we filter this 100 TB table by user AND by time AND by amount" — one
clustered rewrite serves all three predicates.

All column expressions: per-column linear rank from a one-row min/max
stats pass (strings rank by xxhash64 — equality pruning only), bit
interleave via a fold. The write is repartitionByRange + sortWithinFiles
on the key, so file boundaries follow z-ranges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _rank_expr(col: str, dt: T.DataType, mn, mx, bits: int) -> str:
    """SQL for an integer rank in [0, 2^bits) — monotonic for orderable
    types (linear min/max scaling), hash-derived for strings."""
    top = (1 << bits) - 1
    if isinstance(dt, T.StringType):
        return f"pmod(xxhash64({col}), {1 << bits})"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        import datetime as _dt

        def _epoch(v):
            if isinstance(v, _dt.datetime):
                # collected naive in the UTC-pinned session -> label as UTC
                return v.replace(tzinfo=_dt.timezone.utc).timestamp() \
                    if v.tzinfo is None else v.timestamp()
            return float(
                _dt.datetime(v.year, v.month, v.day,
                             tzinfo=_dt.timezone.utc).timestamp())

        col = f"cast(cast({col} as timestamp) as double)"
        mn, mx = _epoch(mn), _epoch(mx)
    else:
        col = f"cast({col} as double)"
        mn, mx = float(mn), float(mx)
    if mx <= mn:
        return "0L"
    return (f"cast(least(floor(({col} - {mn!r}) / {(mx - mn)!r} * {top + 1}), "
            f"{top}) as bigint)")


def zorder_key_expr(
    df: DataFrame, cols: list[str], bits: int = 12
) -> Column:
    """Interleaved-bit z-value over ``cols`` as one projection.

    Runs ONE tiny min/max aggregate (driver-side row, like the trained-
    centroid pattern) to scale each orderable column into [0, 2^bits);
    the interleave is a fold over bit positions: bit b of column i lands
    at position b*n_cols+i. n_cols*bits must fit a long (<= 63).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"zorder: {n} cols x {bits} bits exceeds a long")
    fields = {f.name: f.dataType for f in df.schema.fields}
    stats = df.agg(*[e for c in cols for e in (
        F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}"))]).first()
    ranks = [
        _rank_expr(c, fields[c], stats[f"mn_{c}"], stats[f"mx_{c}"], bits)
        for c in cols
    ]
    parts = []
    for i, r in enumerate(ranks):
        parts.append(
            f"aggregate(sequence(0, {bits - 1}), 0L, (acc, b) -> "
            f"acc | shiftleft(shiftright(({r}), b) & 1L, b * {n} + {i}))")
    return F.expr(" | ".join(f"({p})" for p in parts))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    target_files: int = 8,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Rewrite a table clustered by the z-order of ``cols``.

    repartitionByRange on the z-key makes file boundaries follow z-ranges
    (each output file covers a compact block of the multi-column space);
    sortWithinPartitions orders rows inside each file so row-group stats
    are tight too. Periodic rewrite job, same cadence class as
    ``compact_table``.
    """
    z = zorder_key_expr(df, cols, bits=bits)
    out = (df.withColumn("__z", z)
           .repartitionByRange(target_files, "__z")
           .sortWithinPartitions("__z")
           .drop("__z"))
    getattr(out.write.mode(mode), fmt)(path)


def file_column_spans(spark, path: str, cols: list[str], fmt: str = "parquet"):
    """Per-file (min, max) of each column — the footer-stat view a reader's
    pruning sees. Diagnostic for layout quality: tight spans = good
    skipping."""
    df = getattr(spark.read, fmt)(path).withColumn(
        "__file", F.input_file_name())
    return df.groupBy("__file").agg(*[
        e for c in cols for e in (
            F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}"))])


__all__ = ["zorder_key_expr", "write_zordered", "file_column_spans"]
