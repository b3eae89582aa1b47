"""Profiling operators P1-P14 (SURVEY.md §2.A), Spark-first.

The reference batches all per-column aggregates of a type class into one
SELECT per class (reference: backend/app.py:3291-3857). We go further and
fuse ALL type classes into ONE ``df.agg`` pass — a single scan, no shuffle
(partial aggregation map-side, final merge on one reducer row). Top-K (P8)
and exact duplicate count (P9) each need a shuffle and run as separate jobs.

Scale notes (100 TB):
- ``exact=False`` switches COUNT(DISTINCT) -> approx_count_distinct and
  exact percentiles -> percentile_approx, turning the multi-expand exact
  distinct plan into a single-pass sketch plan.
- No driver-side collect until the final one-row aggregate / top-K rows
  (bounded by k * n_columns).
- All heavy expressions are built-in Column functions => whole-stage codegen.

Oracle-determinism notes: sums feeding averages/stddev go through DECIMAL so
cross-engine (Spark vs DuckDB) float summation order cannot change results;
stddev is computed from exact decimal Σx / Σx² then a deterministic double
formula (see SURVEY.md §7 "hard parts" 1-2).
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# type bucketing (reference: backend/core/metadata/collector.py:610-625)
# ---------------------------------------------------------------------------

def type_bucket(dt: T.DataType) -> str:
    if isinstance(dt, T.NumericType):
        return "numeric"
    if isinstance(dt, T.StringType):
        return "text"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "datetime"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    return "other"


def bucket_columns(df: DataFrame) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {"numeric": [], "text": [], "datetime": [], "boolean": [], "other": []}
    for f in df.schema.fields:
        out[type_bucket(f.dataType)].append(f.name)
    return out


# ---------------------------------------------------------------------------
# expression builders (shared by the one-pass profiler and the paired checks)
# ---------------------------------------------------------------------------

DEC = "decimal(28,8)"


def null_count(c: str) -> Column:
    # SUM(CASE WHEN c IS NULL THEN 1 ELSE 0 END)  (app.py:3379-3404)
    # coalesce: SUM over an EMPTY table is NULL; an empty table has 0 nulls
    return F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0)) \
        .alias(f"{c}__nulls")


def distinct_count(c: str, exact: bool = True) -> Column:
    expr = F.countDistinct(F.col(c)) if exact else F.approx_count_distinct(F.col(c))
    return expr.alias(f"{c}__distinct")


def _canonical_slot(dt: T.DataType) -> tuple[str, str]:
    """(slot name, cast type) for the typed melt: injective widenings only
    (int->bigint, float->double); everything else keeps its own slot so
    values of different columns never collide across types. Slot names
    are SANITIZED — decimal(12,2)/char(8)/array<...> simpleStrings carry
    parens/commas/brackets that are not valid identifiers and break the
    generated stack() aliases; the cast TYPE stays verbatim."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "slot_long", "bigint"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "slot_double", "double"
    if isinstance(dt, T.StringType):
        return "slot_string", "string"
    s = dt.simpleString()
    safe = "".join(ch if ch.isalnum() else "_" for ch in s)
    return f"slot_{safe}", s


def distinct_counts_melted(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact per-column distinct + non-null counts for many columns at once
    -> (column_name, distinct_cnt, nonnull_cnt).

    ``df.agg(countDistinct(c1), ..., countDistinct(cN))`` plans an Expand
    that clones every row N+1 times at FULL row width and hash-aggregates on
    an N+1-column key (measured 2.6s on 11 x 600k rows). This melt keeps the
    same two-exchange shape but each melted row carries ONE value in a typed
    slot: rows are a fixed few columns wide no matter how many columns are
    profiled, and the first-level group key hashes a couple of scalars. At
    warehouse scale the first exchange carries per-partition-deduped
    (column, value) pairs — bounded by sum of column cardinalities, not
    rows x columns.
    """
    slots: dict[str, str] = {}  # slot name -> cast type
    col_slot: dict[str, tuple[str, str]] = {}
    for f in df.schema.fields:
        if f.name not in cols:
            continue
        slot, cast_t = _canonical_slot(f.dataType)
        slots.setdefault(slot, cast_t)
        col_slot[f.name] = (slot, cast_t)
    slot_names = sorted(slots)

    by_slot: dict[str, list[str]] = {s: [] for s in slot_names}
    for c in cols:
        by_slot[col_slot[c][0]].append(c)

    melts = []
    for slot in slot_names:
        group = by_slot[slot]
        if not group:
            continue
        cast_t = slots[slot]
        stack = ", ".join(f"'{c}', cast(`{c}` as {cast_t})" for c in group)
        proj = [f"stack({len(group)}, {stack}) as (column_name, {slot})"] + [
            f"cast(null as {slots[s]}) as {s}" for s in slot_names if s != slot
        ]
        melts.append(df.selectExpr(*proj).select("column_name", *slot_names))
    melted = melts[0]
    for m in melts[1:]:
        melted = melted.unionAll(m)

    nonnull = " or ".join(f"{s} is not null" for s in slot_names)
    return (melted.groupBy("column_name", *slot_names)
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .groupBy("column_name")
            .agg(F.count(F.when(F.expr(nonnull), 1)).alias("distinct_cnt"),
                 F.sum(F.when(F.expr(nonnull), F.col("__cnt"))
                       .otherwise(F.lit(0))).alias("nonnull_cnt")))


def exact_percentiles(
    df: DataFrame,
    cols: list[str],
    ps: tuple[float, ...] = (0.25, 0.5, 0.75),
    round_to: int = 6,
    strategy: str = "bucketed",
) -> DataFrame:
    """Exact linear-interpolation percentiles for many numeric columns at
    once -> (column_name, p25, p50, p75, ...) — P5 (app.py:3416-3421
    MEDIAN/quartiles semantics; identical math to Spark's ``percentile``
    aggregate: position = p*(n-1), value = (hi_idx-pos)*lo + (pos-lo_idx)*hi).

    Naive ``percentile(c, array(...))`` over the RAW rows buffers a
    value->count OpenHashMap per partition per column and merges all of
    them on one reducer — measured 4-7s on 4 x 600k-row columns (the merge
    is single-threaded and proportional to partials x distinct values).
    Both strategies here first melt the columns into (column_name, value)
    rows and dedup to (column, value, cnt) with map-side partial
    aggregation — O(sum of column cardinalities) from there on — then
    assign every value its sorted position (cumulative count) and pick
    each quantile's two interpolation neighbors with conditional
    aggregates. They differ in how the cumulative count is produced:

    - ``bucketed`` (default): fully distributed two-phase prefix sum —
      bucket values by a linear key, cumulative-sum inside (column,
      bucket) tasks in parallel, shift by broadcast per-bucket offsets.
      No single task ever holds a whole column; bucket skew affects
      balance, never correctness.
    - ``ordered``: one running-sum window per column (PARTITION BY column
      ORDER BY v) — a shorter chain (~9 vs ~18 stages, 2 vs 3 jobs) but
      ONE sort task per column, so a high-cardinality column serializes
      on one core (measured 2x slower than bucketed on a 583k-distinct
      column at sf0.1). Right when profiling many low-cardinality
      columns where chain latency dominates.

    Scale note: at 100 TB the profiler's ``exact=False`` mode
    (percentile_approx sketches, one pass, mergeable) is the intended
    path; this operator is the oracle-parity / final-verification path.
    """
    # Plan-build note: expressions are SQL TEXT parsed JVM-side in a few
    # selectExpr/expr calls — the Column-object form of this plan cost ~690
    # py4j round trips (~0.2 s, GIL-serialized) per build (see anomalies.py
    # module docstring for the measurement; the resolved plan is identical).
    from sparvi_spark.functions import values_df

    stack = ", ".join(f"'{c}', cast(`{c}` as double)" for c in cols)
    melted = (
        df.selectExpr(f"stack({len(cols)}, {stack}) as (column_name, v)")
        .where("v is not null")
    )
    counts = melted.groupBy("column_name", "v").agg(
        F.expr("count(1)").alias("cnt"))
    # One zero-weight sentinel row per REQUESTED column, unioned into the
    # counts frame: a column with no non-null values vanishes in the melt
    # and would otherwise be missing from the output entirely (callers
    # iterate expected columns). cnt=0 + v=NULL is inert everywhere
    # downstream — adds 0 to every cumulative sum, is ignored by min/max,
    # and produces NULL markers — but guarantees the final groupBy emits a
    # row per column. Cheaper than the alternative (a right-join onto a
    # literal frame): no broadcast job, no join stage.
    # values_df (r13): as a union leg, a parallelize-backed sentinel adds
    # an RDD scan stage to the plan; a VALUES literal is a LocalRelation
    sentinels = values_df(
        df.sparkSession, [(c, None, 0) for c in cols],
        "column_name string, v double, cnt bigint")
    counts = counts.unionAll(sentinels)
    if strategy == "ordered":
        # One running-sum window per column over the DEDUPED counts: the
        # groupBy collapses the sort volume to the column's cardinality,
        # and the running ROWS frame streams (O(1) frame memory; the
        # partition buffer is Spark's spillable window array). One sort
        # task per column — columns parallelize, a single 10^9-distinct
        # column would serialize and belongs on `bucketed`.
        totals = (counts.groupBy("column_name")
                  .agg(F.expr("sum(cnt)").alias("n")))
        cum = (counts.join(F.broadcast(totals), "column_name")
               .selectExpr(
                   "*",
                   "sum(cnt) OVER (PARTITION BY column_name ORDER BY v "
                   "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                   "AS cum"))
    else:
        # Two-phase distributed prefix sum — bucket values by a key that
        # is (weakly) MONOTONE in v, run the cumulative sum inside each
        # (column, bucket) in parallel, then shift each bucket by the
        # total of the buckets before it (a per-bucket aggregate,
        # broadcast back). The key is floor(asinh(v) * 8): asinh is
        # strictly monotone over all reals (sign-symmetric log-compress,
        # no min/max statistics needed — which saves the stats aggregate
        # + broadcast join a linear (v-mn)/(mx-mn) key requires), spans
        # ~±5.7k buckets over the full double range with ~37 buckets per
        # decade-ish of spread. NaN (sorts LAST in Spark) maps to a
        # sentinel top bucket; NULL (the zero-weight sentinel rows) to
        # bucket 0 where its cnt=0 is inert. Bucket skew affects
        # BALANCE, never correctness. Per-column totals ride along in
        # the offsets frame (sum over the whole column partition) — one
        # broadcast carries off + n both.
        bkey = ("coalesce(cast(floor(nanvl(asinh(v) * 8, "
                "cast(1.0e18 as double))) as bigint), 0)")
        bucketed = counts.selectExpr("*", f"{bkey} AS b")
        loc = bucketed.selectExpr(
            "*",
            "sum(cnt) OVER (PARTITION BY column_name, b ORDER BY v) AS lcum")
        offs = (
            bucketed.groupBy("column_name", "b")
            .agg(F.expr("sum(cnt)").alias("bsum"))
            .selectExpr(
                "column_name", "b",
                "sum(bsum) OVER (PARTITION BY column_name ORDER BY b) - bsum "
                "AS off",
                "sum(bsum) OVER (PARTITION BY column_name) AS n")
        )
        cum = (loc.join(F.broadcast(offs), ["column_name", "b"])
               .selectExpr("*", "off + lcum AS cum"))
    # A row (v, cnt, cum) covers sorted positions [cum-cnt, cum); quantile p
    # needs positions floor(p*(n-1)) and ceil(p*(n-1)).
    marker_cols, aggs, out = [], [], []
    for i, p in enumerate(ps):
        pos = f"(cast({float(p)!r} as double) * cast(n - 1 as double))"
        covers = lambda idx: f"(cum - cnt <= {idx} and {idx} < cum)"  # noqa: E731
        marker_cols += [
            f"case when {covers(f'floor({pos})')} then v end AS __lo{i}",
            f"case when {covers(f'ceil({pos})')} then v end AS __hi{i}",
            f"{pos} AS __pos{i}",
        ]
        aggs += [F.expr(f"max(__lo{i})").alias(f"__lov{i}"),
                 F.expr(f"max(__hi{i})").alias(f"__hiv{i}"),
                 F.expr(f"max(__pos{i})").alias(f"__p{i}")]
        interp = (f"case when ceil(__p{i}) = floor(__p{i}) then __lov{i} "
                  f"else (ceil(__p{i}) - __p{i}) * __lov{i} "
                  f"+ (__p{i} - floor(__p{i})) * __hiv{i} end")
        out.append(f"round({interp}, {round_to}) AS p{int(p * 100)}")
    pre = cum.selectExpr("*", *marker_cols)
    return (pre.groupBy("column_name").agg(*aggs)
            .selectExpr("column_name", *out))


# Pass-1 bracket cache (r9): the approx-probe row keyed by (session,
# SEMANTIC plan hash, cols, ps, accuracy). Same policy as load_table's
# persist cache and the prepared validation sweep (_PREPARED in
# validation_checks): inputs are immutable for the life of a session, so
# the probe brackets — a per-(table, column) property of the data — are
# computed once and every later profile run pays only the single pass-2
# action. Soundness beyond the policy: the window route is SELF-CHECKING
# (uncovered ranks reroute to the fully-exact bucketed plan), so a stale
# bracket can only cost a fallback, never a wrong window answer.
# SPARK_GRAFT_NO_CACHE=1 disables it like every other session cache.
_BRACKET_CACHE: dict = {}


def exact_percentiles_refine(
    df: DataFrame,
    cols: list[str],
    ps: tuple[float, ...] = (0.25, 0.5, 0.75),
    round_to: int = 6,
    accuracy: int = 2_000,
    tie_shortcut: bool = True,
    window_budget: int = 1_000_000,
    bracket_cache: bool = True,
) -> DataFrame:
    """EXACT percentiles via sketch-then-refine — same output contract as
    ``exact_percentiles`` (identical interpolation math, HALF_UP rounding),
    at most two WIDE single-row aggregation passes instead of a melt + full
    distinct-value prefix sum (melting N cols multiplies the scanned rows
    N× before any aggregation).

    Both passes run over a NARROW projection (just the requested columns,
    cast once): the profiler's cached input holds the whole table row, and
    decoding 16 columns to aggregate 4 measured 0.72s vs 0.46s for the
    projected plan at sf0.1 — column pruning through the cache is the
    single biggest lever here.

    Pass 1 computes, per column in one row: count and ``percentile_approx``
    brackets at probe points p±4/accuracy (GK rank error ≤ n/accuracy) —
    the shuffle carries partial sketches only. (The sketch forces the whole
    aggregate into ObjectHashAggregate — interpreted, no codegen — so every
    extra expression here costs per-row time; min/max/NaN-count and
    approx_count_distinct variants each measured ~+0.15s at sf0.1 and were
    dropped.) Each (column, quantile) then routes:

    - TIE SHORTCUT: when both probes return the SAME finite value v, the
      exact quantile IS v — the lo probe's rank is ≤ n(p-3ε) and the hi
      probe's ≥ n(p+3ε) (ε=1/accuracy), values are sorted, so one
      duplicate run of v covers every rank in between, including both
      interpolation neighbors at floor/ceil(p·(n-1)). Zero pass-2 work.
      Guarded by: neither probe clamped (p±4ε inside [0,1] — a clamped
      probe's rank window no longer brackets the target) and 3n·ε ≥ 2
      (the slack must cover floor/ceil and the p·n vs p·(n-1) drift).
      Low-cardinality columns — most of a TPC-H-ish profile — resolve
      every quantile here because their duplicate runs (n/distinct rows)
      dwarf the ±4ε probe gap, so an all-low-card table is ONE action.
    - WINDOW: pass 2 classifies every row, per unresolved (column,
      quantile), into below-window / ==lo endpoint / ==hi endpoint /
      strictly-inside, via ONE ``inline`` explode over per-entry structs
      feeding ONE distributed groupBy(entry, class, value) count — a
      fully codegen'd hash aggregate whose group count is bounded by
      entries × (3 + distinct-in-window) (≤ 8n/accuracy inside values
      per entry by the bracket construction; endpoints may be duplicate
      runs of ANY length but ride back as one count row each). The
      driver walks each entry's tiny histogram to the exact neighbors
      and interpolates. An earlier formulation aggregated a
      ``collect_list`` of in-window values per entry: the
      TypedImperativeAggregate forced the whole pass into interpreted
      ObjectHashAggregate and buffered every in-window value in ONE
      aggregation buffer — measured 0.45s vs 0.15s for the grouped plan
      at sf0.1, and an executor OOM hazard at 10¹¹ rows. Unlike the tie
      shortcut this path is SELF-CHECKING: if the window fails to cover
      the needed ranks (tiny n, clamped probes at p=0/1) the column
      falls back to the fully distributed bucketed plan, so no guard
      can be wrong, only slow.
    - BUDGET GUARD: the in-window histogram is distributed on the
      executors, but the DRIVER still collects ≤ 8n/accuracy rows per
      entry — at 10¹¹–10¹² rows that is 10⁸–10⁹ rows to one process.
      Any column whose expected window 8n/accuracy exceeds
      ``window_budget`` (default 10⁶ values — a few-second, few-MB
      collect) is routed to the fully distributed bucketed plan BEFORE
      pass 2 runs, computed from pass 1's exact count. Tie-shortcut
      answers stay free at any n.

    At 100 TB this is the right exact-quantile shape: at most two
    single-scan passes with map-side partials, O(cols·ps·n/accuracy)
    intermediate values, no full-cardinality shuffle. ``tie_shortcut=
    False`` forces every quantile through the self-checking window path
    (used by the routing-parity test). Reference semantics: P5
    app.py:3416-3421 (MEDIAN/quartiles).
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from sparvi_spark.functions import values_df

    spark = df.sparkSession
    eps = 1.0 / accuracy
    lo_p = {p: max(0.0, p - 4 * eps) for p in ps}
    hi_p = {p: min(1.0, p + 4 * eps) for p in ps}
    probes = sorted(set(lo_p.values()) | set(hi_p.values()))
    probe_arr = ", ".join(repr(q) for q in probes)
    pidx = {q: i for i, q in enumerate(probes)}

    import os

    ndf = df.selectExpr(*[f"cast(`{c}` as double) as `{c}`" for c in cols])
    # pass-1 memo (module doc above _BRACKET_CACHE): key on the SEMANTIC
    # hash of the input's analyzed plan, so two builds of the same query
    # over the same source share brackets while different frames never
    # collide. One profile run per session pays pass 1; later runs go
    # straight to the single pass-2 action.
    cache_key = p1 = None
    if bracket_cache and os.environ.get("SPARK_GRAFT_NO_CACHE") != "1":
        try:
            sem = df._jdf.queryExecution().analyzed().semanticHash()
            cache_key = (id(spark._jsparkSession), sem, tuple(cols),
                         tuple(ps), accuracy)
            p1 = _BRACKET_CACHE.get(cache_key)
        except Exception:
            cache_key = None
    if p1 is None:
        p1 = ndf.selectExpr(
            *[f"count(`{c}`) as `{c}__n`" for c in cols],
            *[f"percentile_approx(`{c}`, array({probe_arr}), "
              f"{accuracy}) as `{c}__br`" for c in cols]).collect()[0]
        if cache_key is not None:
            _BRACKET_CACHE[cache_key] = p1

    def _round(x: float) -> float:
        # Decimal(repr(x)), not Decimal(x): Spark's round() rounds the
        # SHORTEST decimal repr (BigDecimal.valueOf) — Decimal(x)'s
        # full binary expansion puts boundary values (…25 at the cut
        # digit) on the other side of HALF_UP. NaN/±inf pass through
        # unchanged, matching Spark's round() (the bucketed fallback
        # rounds in SQL, so the routes must agree on non-finite output).
        if not math.isfinite(x):
            return x
        q = Decimal(1).scaleb(-round_to)
        return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

    # per-(column, quantile) routing
    vals: dict[tuple[str, int], float] = {}   # tie answers
    win: list[tuple[str, int, int, float, float]] = []  # (c, j, n, lo, hi)
    fallback_cols: list[str] = []
    for c in cols:
        n = int(p1[f"{c}__n"])
        if n == 0:
            continue  # surfaces as a NULL-quantile row below
        br = p1[f"{c}__br"]
        if br is None:
            fallback_cols.append(c)
            continue
        for j, p in enumerate(ps):
            wlo, whi = float(br[pidx[lo_p[p]]]), float(br[pidx[hi_p[p]]])
            if not (math.isfinite(wlo) and math.isfinite(whi)):
                # a non-finite bracket (NaN/inf near a probed quantile)
                # cannot be spliced into SQL text and breaks the rank
                # walk; the bucketed plan handles NaN via its sentinel
                fallback_cols.append(c)
                break
            if (tie_shortcut and wlo == whi
                    and p - 4 * eps >= 0.0 and p + 4 * eps <= 1.0
                    and 3 * n * eps >= 2.0):
                vals[(c, j)] = _round(wlo)
            elif 8 * n > window_budget * accuracy:
                # window would exceed the single-buffer budget (see
                # BUDGET GUARD above) — distributed bucketed plan instead
                fallback_cols.append(c)
                break
            else:
                win.append((c, j, n, wlo, whi))

    live = [(c, j, n, wlo, whi) for c, j, n, wlo, whi in win
            if c not in fallback_cols]
    structs = []
    for i, (c, _j, _n, wlo, whi) in enumerate(live):
        v = f"`{c}`"
        # case order encodes strictness: 'b' strictly below, endpoint
        # runs 'l'/'h' as single count rows, 'i' strictly inside (the
        # >wlo is implied once the first two branches fail); values
        # outside the window — and NULL/NaN, whose comparisons are all
        # false — fall to a NULL class and are filtered before the agg
        structs.append(
            f"named_struct('e', {i}, 'g', case "
            f"when {v} < {wlo!r} then 'b' when {v} = {wlo!r} then 'l' "
            f"when {v} = {whi!r} then 'h' when {v} < {whi!r} then 'i' "
            f"end, 'v', case when {v} > {wlo!r} and {v} < {whi!r} "
            f"then {v} end)")

    if live:
        hist_rows = (ndf.selectExpr(
            f"inline(array({', '.join(structs)}))")
            .where("g is not null")
            .groupBy("e", "g", "v").agg(F.count(F.lit(1)).alias("cnt"))
            .collect())
        by_entry: dict[int, dict] = {
            i: {"b": 0, "l": 0, "h": 0, "i": []} for i in range(len(live))}
        for r in hist_rows:
            slot = by_entry[r["e"]]
            if r["g"] == "i":
                slot["i"].append((float(r["v"]), int(r["cnt"])))
            else:
                slot[r["g"]] = int(r["cnt"])
        for i, (c, j, n, wlo, whi) in enumerate(live):
            p = ps[j]
            slot = by_entry[i]
            below = slot["b"]
            hist = [(wlo, slot["l"])]
            hist.extend(sorted(slot["i"]))
            if whi != wlo:
                hist.append((whi, slot["h"]))
            pos = float(p) * float(n - 1)
            k_lo, k_hi = math.floor(pos), math.ceil(pos)
            lo_v = hi_v = None
            cum = below
            for v, cnt in hist:
                if cum <= k_lo < cum + cnt:
                    lo_v = v
                if cum <= k_hi < cum + cnt:
                    hi_v = v
                cum += cnt
            if lo_v is None or hi_v is None:
                fallback_cols.append(c)  # window missed the ranks
                continue
            val = lo_v if k_lo == k_hi else (
                (k_hi - pos) * lo_v + (pos - k_lo) * hi_v)
            vals[(c, j)] = _round(val)

    results: dict[str, list] = {}
    for c in cols:
        if c in fallback_cols or int(p1[f"{c}__n"]) == 0:
            continue
        out = [vals.get((c, j)) for j in range(len(ps))]
        if any(x is None for x in out):  # partial resolution — be exact
            fallback_cols.append(c)
        else:
            results[c] = out
    # all-NULL columns surface with NULL quantiles (same contract as the
    # bucketed sentinel path); genuinely uncovered windows rerun through
    # the fully-exact bucketed plan
    if fallback_cols:
        exact_rows = exact_percentiles(
            df, sorted(set(fallback_cols)), ps=ps,
            round_to=round_to).collect()
        for r in exact_rows:
            results[r["column_name"]] = [r[f"p{int(p * 100)}"] for p in ps]
    out_rows = [tuple([c] + (results.get(c) or [None] * len(ps)))
                for c in cols]
    schema = ("column_name string, "
              + ", ".join(f"p{int(p * 100)} double" for p in ps))
    # values_df: the returned frame is the check's RESULT — an RDD-backed
    # local frame costs a real job per downstream action (r13; see
    # functions.values_df), a VALUES literal folds driver-side
    return values_df(spark, out_rows, schema)


def numeric_exprs(c: str, exact: bool = True) -> list[Column]:
    """Per-column numeric aggregate expressions, in two lanes.

    ``exact=True`` (oracle-parity): sums route through DECIMAL so the
    totals are order-independent and replay bit-for-bit in a SQL oracle.
    Sum of squares via decimal(19,4) x decimal(18,4) — exact scale-8
    product up to |value| < 10^15 (the same widening the check-side
    _num_agg_exprs documents; dec*dec at (28,8) overflows the product's
    decimal(38,6) for |value| >= ~1e16). Beyond the bound the TRY
    arithmetic yields NULL per row instead of an ANSI crash, and the
    overflow counter lets profile_table report stddev as honestly
    unknown (None) rather than a silently-wrong partial sum.

    ``exact=False`` (the 100 TB lane): sums accumulate in DOUBLE.
    Spark's decimal aggregation buffer above Long-backed precision 18 is
    BigDecimal-per-row — measured on a 60M-row lineitem (r11 sweep):
    sum(decimal(28,8)) 6.0s vs sum(double) 0.47s for the same three
    columns, a ~13x/core cliff that turned the whole fused profile pass
    18x slower than DuckDB (whose decimal sums are native int128) at
    100x. Double sums under Spark's partial-aggregation tree accumulate
    per-partition then merge — pairwise-summation-like error, ~1e-10
    relative on random data, and the same accuracy class as DuckDB's own
    SUM(double). The profile document rounds avg to 6dp / stddev to 4dp,
    so the sketch-mode outputs agree with the exact lane in practice
    (pinned by test); the decimal lane stays the parity default.

    NON-FINITE VALUES (r11): NaN/±Inf are EXCLUDED from cnt/min/max/
    sum/sumsq in both lanes and surfaced as ``{c}__nonfinite``
    (summary key ``non_finite_count``). Before this, the lanes silently
    DIVERGED on poisoned input: the decimal casts null NaN/Inf out of
    the sum but count(col) kept them in the denominator (avg over
    [1, NaN, Inf, 2] reported 0.75 — a plausible, wrong number), while
    the double lane propagated NaN into every stat. Finite-only stats
    + an explicit count is the only honest shape; sign counts keep
    their ordering semantics (±Inf IS positive/negative, NaN neither).
    """
    col = F.col(c)
    d_sql = f"cast(`{c}` as double)"
    fin_sql = (f"(case when isnan({d_sql}) or "
               f"abs({d_sql}) = cast('Infinity' as double) "
               f"then null else `{c}` end)")
    fin = F.expr(fin_sql)
    nonfinite = F.count(F.when(
        F.expr(f"isnan({d_sql}) or "
               f"abs({d_sql}) = cast('Infinity' as double)"), 1)
    ).alias(f"{c}__nonfinite")
    if not exact:
        d = fin.cast("double")
        return [
            F.count(fin).alias(f"{c}__cnt"),
            F.min(fin).cast("double").alias(f"{c}__min"),
            F.max(fin).cast("double").alias(f"{c}__max"),
            F.sum(d).alias(f"{c}__sum_dec"),
            F.sum(d * d).alias(f"{c}__sumsq_dec"),
            F.lit(0).alias(f"{c}__sq_ovfl"),
            nonfinite,
            F.count(F.when(col == 0, 1)).alias(f"{c}__zeros"),
            F.count(F.when(col < 0, 1)).alias(f"{c}__negatives"),
            # Spark ORDERS NaN above every double (NaN > 0 is true), unlike
            # IEEE comparison — exclude it so NaN is signed neither way
            F.count(F.when((col > 0) & ~F.expr(f"isnan({d_sql})"), 1))
            .alias(f"{c}__positives"),
        ]
    dec = fin.cast(DEC)
    sq = (f"try_multiply(try_cast({fin_sql} as decimal(19,4)), "
          f"try_cast({fin_sql} as decimal(18,4)))")
    return [
        F.count(fin).alias(f"{c}__cnt"),
        F.min(fin).cast("double").alias(f"{c}__min"),
        F.max(fin).cast("double").alias(f"{c}__max"),
        F.sum(dec).alias(f"{c}__sum_dec"),
        F.sum(F.expr(sq)).cast("decimal(38,8)").alias(f"{c}__sumsq_dec"),
        F.count(F.when(fin.isNotNull() & F.expr(sq).isNull(), 1))
        .alias(f"{c}__sq_ovfl"),
        nonfinite,
        F.count(F.when(col == 0, 1)).alias(f"{c}__zeros"),
        F.count(F.when(col < 0, 1)).alias(f"{c}__negatives"),
        # Spark ORDERS NaN above every double (NaN > 0 is true), unlike
        # IEEE comparison — exclude it so NaN is signed neither way
        F.count(F.when((col > 0) & ~F.expr(f"isnan({d_sql})"), 1))
        .alias(f"{c}__positives"),
    ]


def datetime_exprs(c: str, as_of: str) -> list[Column]:
    col = F.col(c)
    ref = F.lit(as_of).cast("timestamp")
    return [
        F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss").alias(f"{c}__min_ts"),
        F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss").alias(f"{c}__max_ts"),
        F.count(F.when(col > ref, 1)).alias(f"{c}__future"),
        F.count(F.when(col <= ref, 1)).alias(f"{c}__past"),
    ]


def text_exprs(c: str) -> list[Column]:
    ln = F.length(F.col(c))
    return [
        F.count(F.col(c)).alias(f"{c}__cnt"),
        F.min(ln).cast("long").alias(f"{c}__min_len"),
        F.max(ln).cast("long").alias(f"{c}__max_len"),
        F.sum(ln.cast("long")).alias(f"{c}__sum_len"),
        F.count(F.when(F.col(c) == "", 1)).alias(f"{c}__empties"),
    ]


def _safe_div(num: Column, den: Column) -> Column:
    return F.when(den > 0, num / den)


def derived_avg(sum_dec: Column, cnt: Column) -> Column:
    """Deterministic cross-engine mean: exact decimal sum -> double -> divide."""
    return F.round(_safe_div(sum_dec.cast("double"), cnt), 6)


def derived_stddev_samp(sum_dec: Column, sumsq_dec: Column, cnt: Column) -> Column:
    """Sample stddev from exact decimal Σx, Σx² (deterministic cross-engine).

    stddev² = (Σx² − (Σx)²/n) / (n−1); guard n>1 (sample stddev of a
    single row is undefined -> NULL, and the unguarded division crashes
    under ANSI) and clamp negatives from float cancellation. SQL STDDEV
    in the reference is *sample* stddev (SURVEY §7.1).
    """
    sx = sum_dec.cast("double")
    sxx = sumsq_dec.cast("double")
    var = (sxx - (sx * sx) / cnt) / (cnt - F.lit(1))
    return F.when(cnt > 1, F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 4))


# ---------------------------------------------------------------------------
# P8 top-K frequent values — melt + single window (one shuffle for all cols)
# ---------------------------------------------------------------------------

def top_values(df: DataFrame, columns: Iterable[str], k: int = 10) -> DataFrame:
    """Top-k most frequent values per column with deterministic tie-break.

    Reference runs one GROUP BY query per column (app.py:3620-3677); we melt
    all requested columns via ``stack`` and use ONE groupBy + ONE window —
    a single shuffle regardless of column count. Ties break by value ASC
    (SURVEY §7.5: ORDER BY count DESC alone is nondeterministic).

    Output: (column_name, value: string, cnt, pct) with pct of table rows.
    """
    cols = list(columns)
    # the table total rides as a broadcast one-row aggregate instead of an
    # eager df.count(): building the frame costs no job, and the whole
    # top-K (total + counts + window) executes as ONE action
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    stack_expr = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    melted = df.select(
        F.expr(f"stack({len(cols)}, {stack_expr}) as (column_name, value)")
    ).where(F.col("value").isNotNull())
    counted = melted.groupBy("column_name", "value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("column_name").orderBy(F.desc("cnt"), F.asc("value"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .crossJoin(F.broadcast(total))
        .withColumn("pct", F.round(F.col("cnt") * 100.0 / F.col("__total"), 4))
        .select("column_name", "value", "cnt", "pct")
    )


def duplicate_count(df: DataFrame, exact: bool = False) -> int:
    """P9 full-row duplicate count (profile key ``duplicate_count``,
    reference consumption: core/storage/supabase_manager.py:250).

    Default (hash) mode projects every row to ``xxhash64(struct(*))`` FIRST
    and counts distinct hashes in one aggregate — the shuffle carries an
    8-byte hash + partial counts instead of full-width rows (at 100 TB the
    full-row dedup exchange is the single biggest shuffle in the profiler;
    SCALING.md prescribes exactly this projection). A 64-bit collision
    undercounts distincts by 1 (expected collisions ≈ n²/2⁶⁵ — ~0.003 rows
    at a billion rows); ``exact=True`` keeps the full-row
    ``dropDuplicates`` path for oracle-parity / audit runs.
    """
    if exact:
        return df.count() - df.dropDuplicates().count()
    # interleave literal position markers: xxhash64 SKIPS null inputs (the
    # running hash passes through), so without markers (NULL,'a') and
    # ('a',NULL) hash identically — the always-present marker keeps each
    # column's contribution position-distinct
    parts: list[Column] = []
    for i, c in enumerate(df.columns):
        parts.append(F.lit(i))
        parts.append(F.col(c))
    r = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct(F.xxhash64(*parts)).alias("__d"),
    ).collect()[0]
    return r["__n"] - r["__d"]


# ---------------------------------------------------------------------------
# the one-pass profiler -> profile document (SURVEY §1.3 contract)
# ---------------------------------------------------------------------------

def profile_table(
    df: DataFrame,
    table_name: str,
    previous_profile: dict | None = None,
    exact: bool | None = None,
    top_k: int = 10,
    top_k_max_columns: int = 10,
    top_k_distinct_cap: int = 1000,
    as_of: str | _dt.datetime | None = None,
) -> dict:
    """Compute the full profile document in 3 jobs (1 scan + top-K + dupes).

    Mirrors the output contract of the reference's ``profile_table``
    (consumption sites: backend/routes/profiles.py:75-78,
    backend/core/storage/supabase_manager.py:249-257,
    sparvi-frontend TableProfile.js:58-70). ``exact=False`` is the 100 TB
    mode (sketch distinct counts, hash-projection dup count);
    ``exact=None`` (the default) resolves from the engine-wide scale
    mode (``sparvi_spark.config``): exact in parity mode, sketches at
    scale.
    """
    from sparvi_spark.config import resolve_exact

    exact = resolve_exact(exact)
    if as_of is None:
        as_of = _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    buckets = bucket_columns(df)
    all_cols = [f.name for f in df.schema.fields]
    simple_cols = [c for c in all_cols if type_bucket(df.schema[c].dataType) != "other"]

    exprs: list[Column] = [F.count(F.lit(1)).alias("__row_count")]
    for c in simple_cols:
        exprs.append(null_count(c))
        exprs.append(distinct_count(c, exact=exact))
    for c in buckets["numeric"]:
        exprs.extend(numeric_exprs(c, exact=exact))
    for c in buckets["datetime"]:
        exprs.extend(datetime_exprs(c, str(as_of)))
    for c in buckets["text"]:
        exprs.extend(text_exprs(c))

    row = df.agg(*exprs).collect()[0].asDict()
    n = row["__row_count"]

    completeness, null_fractions, distinct_counts, summary = {}, {}, {}, {}
    for c in simple_cols:
        nulls = row[f"{c}__nulls"]
        dist = row[f"{c}__distinct"]
        nonnull = n - nulls
        completeness[c] = {
            "nulls": nulls,
            "null_percentage": round(nulls * 100.0 / n, 4) if n else 0.0,
            "distinct_count": dist,
            "distinct_percentage": round(dist * 100.0 / nonnull, 4) if nonnull else 0.0,
        }
        null_fractions[c] = (nulls / n) if n else 0.0
        distinct_counts[c] = dist

    for c in buckets["numeric"]:
        cnt, sd, ssd = row[f"{c}__cnt"], row[f"{c}__sum_dec"], row[f"{c}__sumsq_dec"]
        # The double scale lane has no per-row overflow counter (its
        # __sq_ovfl is a literal 0): |value| >= ~1.34e154 squares to
        # +Inf and the sums come back Inf/NaN. Honest-None at read time
        # covers BOTH lanes — same contract as the decimal lane's
        # try_multiply counter, detected on the aggregate instead.
        import math as _math
        if sd is not None and not _math.isfinite(float(sd)):
            sd = None
        if ssd is not None and not _math.isfinite(float(ssd)):
            ssd = None
        avg = None
        std = None
        if cnt and sd is not None:
            avg = round(float(sd) / cnt, 6)
            if cnt > 1 and ssd is not None and not row[f"{c}__sq_ovfl"]:
                var = (float(ssd) - float(sd) ** 2 / cnt) / (cnt - 1)
                std = round(max(var, 0.0) ** 0.5, 4)
        summary[c] = {
            "min": row[f"{c}__min"], "max": row[f"{c}__max"],
            "avg": avg, "sum": float(sd) if sd is not None else None, "stddev": std,
            "zero_count": row[f"{c}__zeros"], "negative_count": row[f"{c}__negatives"],
            "positive_count": row[f"{c}__positives"],
            "non_finite_count": row[f"{c}__nonfinite"],
        }
    for c in buckets["datetime"]:
        summary[c] = {
            "min": row[f"{c}__min_ts"], "max": row[f"{c}__max_ts"],
            "future_count": row[f"{c}__future"], "past_count": row[f"{c}__past"],
        }
    for c in buckets["text"]:
        cnt = row[f"{c}__cnt"]
        summary[c] = {
            "min_length": row[f"{c}__min_len"], "max_length": row[f"{c}__max_len"],
            "avg_length": round(row[f"{c}__sum_len"] / cnt, 4)
            if cnt and row[f"{c}__sum_len"] is not None else None,
            "empty_count": row[f"{c}__empties"],
        }

    # P8: only low-cardinality columns, capped (app.py:3636-3645 policy).
    tv_cols = [
        c for c in simple_cols
        if distinct_counts.get(c, 0) < top_k_distinct_cap
        and type_bucket(df.schema[c].dataType) in ("text", "numeric")
    ][:top_k_max_columns]
    top_vals: dict[str, list[dict]] = {c: [] for c in tv_cols}
    if tv_cols and n:
        for r in top_values(df, tv_cols, k=top_k).collect():
            top_vals[r["column_name"]].append(
                {"value": r["value"][:100], "count": r["cnt"], "percentage": r["pct"]}
            )

    # exact mode keeps the full-row dedup (oracle-parity); approx mode uses
    # the 8-byte hash projection — cheap enough to always compute
    dup = duplicate_count(df, exact=exact)

    profile = {
        "table": table_name,
        "table_name": table_name,
        "timestamp": str(as_of),
        # which collection mode produced this document (the reference
        # stamps its collection depth the same way) — consumers comparing
        # documents across runs can tell sketch counts from exact ones
        "profile_mode": "exact" if exact else "approx",
        "row_count": n,
        "duplicate_count": dup,
        "column_count": len(all_cols),
        "columns": all_cols,
        "column_types": {f.name: f.dataType.simpleString() for f in df.schema.fields},
        "completeness": completeness,
        "null_fractions": null_fractions,
        "distinct_counts": distinct_counts,
        "summary_statistics": summary,
        "distribution_data": top_vals,
        "top_values": top_vals,
        "validation_results": [],
    }
    if previous_profile is not None:
        prev_n = previous_profile.get("row_count") or 0
        profile["row_count_change"] = n - prev_n
    return profile


def correlation_matrix(
    df: DataFrame, cols: list[str], round_to: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns, ONE scan ->
    (col_a, col_b, n_pairs, pearson) for every unordered pair.

    Pairwise-complete semantics: each pair's sums run over rows where BOTH
    columns are non-null (`when` guards inside the aggregates), so one
    sparse column doesn't poison the whole matrix. All sums go through
    DECIMAL (the profiler's cross-engine determinism rule) and the final
    r = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)) folds in one
    deterministic double expression. k columns = k(k−1)/2 pairs × 6
    aggregates fused into the single pass — scan-bound at any scale, no
    shuffle beyond the one-row aggregate. Zero-variance columns -> NULL.

    Beyond the reference's per-column statistics (SURVEY §2.A ends at
    single-column moments); standard profiling for feature/training data.
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    exprs: list[Column] = []
    for i, (a, b) in enumerate(pairs):
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        xa = F.when(both, F.col(a).cast(DEC))
        xb = F.when(both, F.col(b).cast(DEC))
        sq = lambda c: (f"try_multiply(try_cast(`{c}` as decimal(19,4)), "  # noqa: E731
                        f"try_cast(`{c}` as decimal(18,4)))")
        xy = (f"case when `{a}` is not null and `{b}` is not null then "
              f"try_multiply(try_cast(`{a}` as decimal(19,4)), "
              f"try_cast(`{b}` as decimal(18,4))) end")
        exprs += [
            F.count(F.when(both, 1)).alias(f"n_{i}"),
            F.sum(xa).alias(f"sx_{i}"),
            F.sum(xb).alias(f"sy_{i}"),
            F.sum(F.expr(xy)).cast("decimal(38,8)").alias(f"sxy_{i}"),
            F.sum(F.when(both, F.expr(sq(a)))).cast("decimal(38,8)")
            .alias(f"sxx_{i}"),
            F.sum(F.when(both, F.expr(sq(b)))).cast("decimal(38,8)")
            .alias(f"syy_{i}"),
        ]
    wide = df.agg(*exprs)
    tuples = []
    for i, (a, b) in enumerate(pairs):
        n = f"cast(n_{i} as double)"
        sx, sy = f"cast(sx_{i} as double)", f"cast(sy_{i} as double)"
        sxy = f"cast(sxy_{i} as double)"
        sxx, syy = f"cast(sxx_{i} as double)", f"cast(syy_{i} as double)"
        denom = (f"sqrt(({n} * {sxx} - {sx} * {sx}) "
                 f"* ({n} * {syy} - {sy} * {sy}))")
        r = (f"case when n_{i} > 1 and {denom} > 0 then "
             f"round(({n} * {sxy} - {sx} * {sy}) / {denom}, {round_to}) end")
        tuples.append(f"'{a}', '{b}', n_{i}, {r}")
    return wide.selectExpr(
        f"stack({len(pairs)}, {', '.join(tuples)}) "
        f"as (col_a, col_b, n_pairs, pearson)")


# ---------------------------------------------------------------------------
# P13 table health score (collector.py:661-687)
# ---------------------------------------------------------------------------

def health_score(
    row_count: int, n_columns: int, n_nullable: int, has_primary_key: bool
) -> int:
    score = 100
    if not has_primary_key:
        score -= 20
    if row_count == 0:
        score -= 30
    if n_columns and n_nullable / n_columns > 0.8:
        score -= 15
    if n_columns > 50:
        score -= 10
    return max(score, 0)


# ---------------------------------------------------------------------------
# Semi-structured extension (beyond the reference, which handles flat
# scalars only — SURVEY §1.1): profile fields inside a JSON string column.
# ---------------------------------------------------------------------------

def json_field_stats(
    df: DataFrame,
    json_col: str,
    fields: list[str],
    group_by: str | None = None,
) -> DataFrame:
    """Per-field stats extracted from a JSON string column, one pass.

    Each field contributes extract-count + numeric min/max/decimal-sum (the
    same exact-stat style as the scalar profiler). Extraction is JVM-side
    ``get_json_object`` — no UDFs, so the whole profile stays in one
    codegen'd aggregation even over deeply nested payloads.
    """
    exprs: list[Column] = [F.count(F.lit(1)).alias("row_count")]
    for f_ in fields:
        v = F.get_json_object(F.col(json_col), f"$.{f_}")
        num = v.cast("double")
        exprs += [
            F.count(v).alias(f"{f_}__present"),
            F.min(num).alias(f"{f_}__min"),
            F.max(num).alias(f"{f_}__max"),
            F.sum(num.cast("decimal(28,8)")).cast("double").alias(f"{f_}__sum"),
        ]
    grouped = df.groupBy(group_by) if group_by else df.groupBy()
    return grouped.agg(*exprs)


# ---------------------------------------------------------------------------
# Equal-width histogram — fills the profile document's `distribution_data`
# key (SURVEY §1.3; the reference computes distributions warehouse-side and
# stores them opaquely). Two scans: one tiny min/max agg broadcast back
# over the data, then one groupBy(bin) — the classic Spark shape.
# ---------------------------------------------------------------------------

def numeric_histogram(df: DataFrame, col: str, bins: int = 20) -> DataFrame:
    """Equal-width histogram: (bin, lo, hi, cnt), bins fixed-width over
    [min, max], the max value clamped into the last bin.

    Bin arithmetic stays in double precision with one canonical expression
    order — (v - mn) / ((mx - mn) / bins) — so any engine repeating the
    same IEEE ops bins identically (oracle-portable). Nulls are excluded.
    """
    stats = df.agg(
        F.min(F.col(col).cast("double")).alias("__mn"),
        F.max(F.col(col).cast("double")).alias("__mx"),
    )
    width = (F.col("__mx") - F.col("__mn")) / bins
    v = F.col(col).cast("double")
    bin_ = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
        F.least(F.floor((v - F.col("__mn")) / width), F.lit(bins - 1)))
    return (
        df.where(F.col(col).isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(bin_.cast("long").alias("bin"), "__mn", "__mx")
        .groupBy("bin", "__mn", "__mx")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bin",
            F.round(F.col("__mn") + F.col("bin") * width, 6).alias("lo"),
            F.round(F.col("__mn") + (F.col("bin") + 1) * width, 6).alias("hi"),
            "cnt",
        )
    )
