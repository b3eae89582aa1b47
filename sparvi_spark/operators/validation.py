"""Validation engine V1-V24 (SURVEY.md §2.B), Spark-first.

A rule is ``{name, description, query, operator, expected_value}``
(reference: backend/routes/validations.py:228,756-762). The reference runs
one warehouse scan per rule (ThreadPool of 10); we compile all scalar
aggregate rules for a table into ONE ``df.agg`` pass, batch all categorical-
dominance rules through one melted groupBy, share a single stats pass for
every 3σ-outlier rule, and run referential checks as broadcast anti-joins —
per table: 1 scan + 1 outlier pass + a few key-level shuffles, regardless of
rule count.

Heuristic rule generation ports the exact name-pattern lists of
backend/core/validations/default_validations.py:101,147-150,166-169,
184-187,311,328-331,347-350 (V1-V20). Evaluation semantics port
backend/core/validations/supabase_validation_manager.py:342-373, accepting
both word and symbolic operator spellings (frontend ValidationRuleEditor.js).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparvi_spark.testdata import TableSpec

DEFAULT_AS_OF = "2026-01-01 00:00:00"

# Name-pattern lists (default_validations.py — cited per family above).
UNIQUE_NAME_PATTERNS = ["id", "code", "number", "uuid", "guid", "key", "hash", "identifier"]
NEGATIVE_ALLOWED_PATTERNS = ["balance", "difference", "delta", "change", "temperature",
                             "coordinate", "adjustment", "net", "profit_loss", "margin"]
NON_ZERO_PATTERNS = ["price", "amount", "total", "cost", "rate", "fee", "tax",
                     "revenue", "salary", "income", "expense"]
PAST_DATE_PATTERNS = ["birth", "created", "start", "registered", "joined", "purchase",
                      "transaction", "order", "payment", "issued", "shipped", "received"]
END_DATE_PATTERNS = ["end", "finish", "completed", "closed", "expiry", "expiration"]
IMPORTANT_COLUMN_PATTERNS = ["name", "description", "address", "city", "state", "country",
                             "postal", "zip", "email", "phone", "status", "type",
                             "category", "price", "cost", "amount"]
CATEGORICAL_COLUMN_PATTERNS = ["status", "type", "category", "level", "tier", "class",
                               "grade", "priority", "severity", "state", "region",
                               "stage", "gender"]
REF_TABLE_PATTERNS = ["ref", "type", "status", "category", "lookup"]
LARGE_TABLE_PATTERNS = ["fact", "transaction", "event", "log", "history", "audit", "detail"]
MEDIUM_TABLE_PATTERNS = ["order", "customer", "user", "account", "product", "item"]


def outlier_threshold(table_name: str) -> int:
    """default_validations.py:428-444."""
    t = table_name.lower()
    if any(p in t for p in LARGE_TABLE_PATTERNS):
        return 50
    if any(p in t for p in MEDIUM_TABLE_PATTERNS):
        return 20
    return 5


@dataclass
class Rule:
    """One validation rule with a kind tag driving batched compilation."""

    name: str
    description: str
    operator: str
    expected_value: Any
    kind: str  # agg | group_dup | dominance | outlier | ref_integrity | sql
    agg_expr: str | None = None     # dialect-common aggregate fragment (kind=agg)
    keys: tuple[str, ...] = ()      # kind=group_dup
    not_null_key: bool = False      # kind=group_dup: pre-filter NULL keys
    column: str | None = None       # kind=dominance / outlier
    ref_table: str | None = None    # kind=ref_integrity
    ref_column: str | None = None
    sql: str | None = None          # kind=sql (V24 custom scalar SQL)


# ---------------------------------------------------------------------------
# operator normalization + scalar evaluation (manager:342-373 + symbolic)
# ---------------------------------------------------------------------------

_SYMBOLIC = {"=": "equals", "==": "equals", "!=": "not_equals", "<>": "not_equals",
             ">": "greater_than", "<": "less_than",
             ">=": "greater_or_equal", "<=": "less_or_equal"}


def normalize_operator(op: str) -> str:
    return _SYMBOLIC.get(op.strip(), op.strip())


def evaluate_rule(operator: str, actual_value: Any, expected_value: Any) -> bool:
    """Scalar evaluation with the reference's coercion semantics.

    None -> False; equals compares numerically when both numeric else by
    string; ordering operators coerce with float(); between is inclusive
    [min,max]; any coercion error -> False.
    """
    if actual_value is None:
        return False
    op = normalize_operator(operator)
    try:
        if op == "equals":
            if isinstance(actual_value, (int, float)) and isinstance(expected_value, (int, float)):
                return actual_value == expected_value
            return str(actual_value) == str(expected_value)
        if op == "not_equals":
            if isinstance(actual_value, (int, float)) and isinstance(expected_value, (int, float)):
                return actual_value != expected_value
            return str(actual_value) != str(expected_value)
        if op == "greater_than":
            return float(actual_value) > float(expected_value)
        if op == "less_than":
            return float(actual_value) < float(expected_value)
        if op == "greater_or_equal":
            return float(actual_value) >= float(expected_value)
        if op == "less_or_equal":
            return float(actual_value) <= float(expected_value)
        if op == "between":
            if isinstance(expected_value, (list, tuple)) and len(expected_value) == 2:
                return float(expected_value[0]) <= float(actual_value) <= float(expected_value[1])
            return False
        return False
    except (ValueError, TypeError):
        return False


def _expected_bounds(rule: Rule) -> tuple[float, float]:
    """Numeric (lo, hi) bounds for the compiled SQL CASE. The distributed
    executor only evaluates numeric comparisons (every generated V1-V20
    rule is numeric); a clear error here beats the bare float() crash —
    string-equality rules belong on the row-level ``evaluate_rule`` path.
    """
    try:
        if normalize_operator(rule.operator) == "between":
            if (not isinstance(rule.expected_value, (list, tuple))
                    or len(rule.expected_value) != 2):
                raise ValueError("between needs a (lo, hi) pair")
            return float(rule.expected_value[0]), float(rule.expected_value[1])
        v = float(rule.expected_value)
        return v, v
    except (ValueError, TypeError) as exc:
        raise ValueError(
            f"rule {rule.name!r}: run_rules compiles NUMERIC expected "
            f"values into SQL; got {rule.expected_value!r} for operator "
            f"{rule.operator!r} (use evaluate_rule for string equality)"
        ) from exc


# SQL CASE mirroring evaluate_rule for numeric actuals — dialect-common text.
IS_VALID_CASE = (
    "case when actual_value is null then false "
    "when operator = 'equals' then actual_value = expected_lo "
    "when operator = 'not_equals' then actual_value <> expected_lo "
    "when operator = 'greater_than' then actual_value > expected_lo "
    "when operator = 'less_than' then actual_value < expected_lo "
    "when operator = 'greater_or_equal' then actual_value >= expected_lo "
    "when operator = 'less_or_equal' then actual_value <= expected_lo "
    "when operator = 'between' then actual_value >= expected_lo "
    "and actual_value <= expected_hi else false end"
)


# ---------------------------------------------------------------------------
# V1-V20 default rule generation from a TableSpec
# ---------------------------------------------------------------------------

def _is_numeric(bucket: str) -> bool:
    return bucket == "numeric"


def guess_start_date_column(end_col: str, spec: TableSpec) -> str | None:
    """default_validations.py:391-425 heuristic."""
    term_map = {"end": "start", "finish": "start", "completed": "created",
                "closed": "opened", "expiry": "issue", "expiration": "issue"}
    low = end_col.lower()
    found = next((t for t in term_map if t in low), None)
    if found:
        candidate = low.replace(found, term_map[found])
        for c in spec.columns:
            if c.name.lower() == candidate:
                return c.name
    start_ind = ["start", "created", "opened", "issue", "begin"]
    date_ind = ["date", "time", "timestamp", "dt"]
    for c in spec.columns:
        n = c.name.lower()
        if any(s in n for s in start_ind) and any(d in n for d in date_ind):
            return c.name
    return None


def spec_from_dataframe(
    df,
    table_name: str,
    primary_keys: tuple[str, ...] = (),
    foreign_keys: tuple[tuple[str, str, str], ...] = (),
) -> TableSpec:
    """Derive a TableSpec from a DataFrame's schema so default rules can be
    generated for ANY table, not just the declared testdata catalog — the
    reference's path from warehouse introspection to rule generation
    (collector.py:74-99 -> default_validations.py). Keys are caller-supplied
    (parquet carries no PK/FK metadata — SURVEY §1.1)."""
    import re

    from sparvi_spark.operators.profile import type_bucket
    from sparvi_spark.testdata import ColumnSpec

    # rule generation interpolates column names into SQL text; reject
    # names that would misparse rather than emit broken expressions
    bad = [f.name for f in df.schema.fields
           if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", f.name)]
    if bad:
        raise ValueError(
            f"column names {bad} are not simple identifiers; rename them "
            "(e.g. withColumnRenamed) before generating default rules")
    cols = tuple(
        ColumnSpec(f.name, type_bucket(f.dataType), f.nullable)
        for f in df.schema.fields
    )
    return TableSpec(table_name, cols, primary_keys=tuple(primary_keys),
                     foreign_keys=tuple(foreign_keys))


def generate_default_rules(spec: TableSpec, as_of: str = DEFAULT_AS_OF) -> list[Rule]:
    t = spec.name
    pks = set(spec.primary_keys)
    fks = {c for c, _rt, _rc in spec.foreign_keys}
    rules: list[Rule] = []

    # V1 table not empty
    rules.append(Rule(f"check_{t}_not_empty", f"Ensure {t} has at least one row",
                      "greater_than", 0, "agg", agg_expr="count(*)"))
    # V2 PK uniqueness
    if spec.primary_keys:
        rules.append(Rule(f"check_{t}_pk_unique",
                          f"Ensure primary key ({', '.join(spec.primary_keys)}) has no duplicates",
                          "equals", 0, "group_dup", keys=tuple(spec.primary_keys)))
    # V4 name-pattern uniqueness (non-PK, non-FK)
    for c in spec.columns:
        if c.name in pks or c.name in fks:
            continue
        if any(p in c.name.lower() for p in UNIQUE_NAME_PATTERNS):
            rules.append(Rule(f"check_{c.name}_unique", f"Check that {c.name} values are unique",
                              "equals", 0, "group_dup", keys=(c.name,), not_null_key=True))
    # V5 not-null for non-nullable non-PK columns
    for c in spec.columns:
        if not c.nullable and c.name not in pks:
            rules.append(Rule(f"check_{c.name}_not_null", f"Ensure {c.name} has no NULLs",
                              "equals", 0, "agg",
                              agg_expr=f"count(case when {c.name} is null then 1 end)"))
    # V6 no negatives unless name allows
    for c in spec.columns:
        if _is_numeric(c.bucket) and not any(p in c.name.lower() for p in NEGATIVE_ALLOWED_PATTERNS):
            rules.append(Rule(f"check_{c.name}_positive", f"Ensure {c.name} has no negatives",
                              "equals", 0, "agg",
                              agg_expr=f"count(case when {c.name} < 0 then 1 end)"))
    # V7 no zeros for money-like names
    for c in spec.columns:
        if _is_numeric(c.bucket) and any(p in c.name.lower() for p in NON_ZERO_PATTERNS):
            rules.append(Rule(f"check_{c.name}_not_zero", f"Ensure {c.name} has no zeros",
                              "equals", 0, "agg",
                              agg_expr=f"count(case when {c.name} = 0 then 1 end)"))
    # V8/V9/V10 date rules
    for c in spec.columns:
        if c.bucket != "datetime":
            continue
        if any(p in c.name.lower() for p in PAST_DATE_PATTERNS):
            rules.append(Rule(f"check_{c.name}_not_future", f"Ensure {c.name} has no future dates",
                              "equals", 0, "agg",
                              agg_expr=f"count(case when {c.name} > timestamp '{as_of}' then 1 end)"))
        rules.append(Rule(f"check_{c.name}_reasonable_past",
                          f"Ensure {c.name} has no pre-1970 dates", "equals", 0, "agg",
                          agg_expr=f"count(case when {c.name} < timestamp '1970-01-01 00:00:00' then 1 end)"))
        if any(p in c.name.lower() for p in END_DATE_PATTERNS):
            start = guess_start_date_column(c.name, spec)
            if start and start != c.name:
                rules.append(Rule(f"check_{c.name}_end_date_order",
                                  f"Ensure {c.name} occurs after {start}", "equals", 0, "agg",
                                  agg_expr=(f"count(case when {c.name} is not null and {start} "
                                            f"is not null and {c.name} < {start} then 1 end)")))
    # V11/V12/V13/V14/V15 string rules
    for c in spec.columns:
        if c.bucket != "text":
            continue
        if c.max_length is not None:
            rules.append(Rule(f"check_{c.name}_max_length",
                              f"Ensure {c.name} fits declared length {c.max_length}",
                              "equals", 0, "agg",
                              agg_expr=f"count(case when length({c.name}) > {c.max_length} then 1 end)"))
        if not c.nullable:
            rules.append(Rule(f"check_{c.name}_not_empty_string",
                              f"Ensure {c.name} has no empty strings", "equals", 0, "agg",
                              agg_expr=f"count(case when {c.name} = '' then 1 end)"))
        low = c.name.lower()
        if "email" in low:
            rules.append(Rule(f"check_{c.name}_valid_email", f"Ensure {c.name} looks like email",
                              "equals", 0, "agg",
                              agg_expr=(f"count(case when {c.name} is not null and "
                                        f"{c.name} not like '%@%.%' then 1 end)")))
        if "phone" in low or "mobile" in low:
            # SIMILAR TO '(\+)?[0-9][0-9 ()-]+' is implicitly anchored ->
            # anchored rlike translation (SURVEY §7.7). `[+]` instead of `\+`
            # because Spark SQL literals eat backslashes and DuckDB doesn't.
            rules.append(Rule(f"check_{c.name}_valid_phone", f"Ensure {c.name} looks like phone",
                              "equals", 0, "agg",
                              agg_expr=(f"count(case when {c.name} is not null and not "
                                        f"regexp_like({c.name}, '^([+])?[0-9][0-9 ()-]+$') "
                                        f"then 1 end)")))
        if "zip" in low or "postal" in low:
            rules.append(Rule(f"check_{c.name}_valid_postal", f"Ensure {c.name} length >= 3",
                              "equals", 0, "agg",
                              agg_expr=(f"count(case when {c.name} is not null and "
                                        f"length(trim({c.name})) < 3 then 1 end)")))
    # V16 3σ outliers per numeric column
    for c in spec.columns:
        if _is_numeric(c.bucket):
            rules.append(Rule(f"check_{c.name}_outliers",
                              f"Extreme outliers in {c.name} (>3 sample stddev)",
                              "less_than", outlier_threshold(t), "outlier", column=c.name))
    # V17 reference-table size
    if any(p in t.lower() for p in REF_TABLE_PATTERNS):
        rules.append(Rule(f"check_{t}_ref_table_size", f"Reference table {t} is small",
                          "less_than", 1000, "agg", agg_expr="count(*)"))
    # V18 null-rate threshold for important nullable columns
    for c in spec.columns:
        if c.name in pks or not c.nullable:
            continue
        if any(p in c.name.lower() for p in IMPORTANT_COLUMN_PATTERNS):
            rules.append(Rule(f"check_{c.name}_null_rate", f"{c.name} null rate below 25%",
                              "less_than", 25.0, "agg",
                              agg_expr=(f"count(case when {c.name} is null then 1 end) "
                                        f"* cast(100 as double) / nullif(count(*), 0)")))
    # V19 categorical dominance
    for c in spec.columns:
        if c.bucket == "text" and any(p in c.name.lower() for p in CATEGORICAL_COLUMN_PATTERNS):
            rules.append(Rule(f"check_{c.name}_distribution",
                              f"No value of {c.name} exceeds 95% share",
                              "equals", 0, "dominance", column=c.name))
    # V20 FK distinct breadth. The reference emits COUNT(DISTINCT fk)=1
    # (default_validations.py:373-386); we compile the equivalent
    # `count>0 AND min=max` (true iff exactly one distinct non-null value):
    # a COUNT(DISTINCT) here forces Spark's expand+gid plan, replicating the
    # whole fact table once per distinct aggregate before the shuffle.
    for c, _rt, _rc in spec.foreign_keys:
        rules.append(Rule(f"check_{c}_ref_distribution", f"{c} references >1 distinct value",
                          "equals", 0, "agg",
                          agg_expr=(f"case when count({c}) > 0 and min({c}) = max({c}) "
                                    f"then 1 else 0 end")))
    # V21 referential integrity per declared FK
    for c, rt, rc in spec.foreign_keys:
        rules.append(Rule(f"check_{c}_ref_integrity", f"{t}.{c} -> {rt}.{rc} has no orphans",
                          "equals", 0, "ref_integrity", column=c, ref_table=rt, ref_column=rc))
    return rules


def row_growth_rule(table_name: str) -> Rule:
    """V3 row growth >20% vs previous count (evaluated against metrics store)."""
    return Rule(f"check_{table_name}_row_growth",
                f"Detect >20% change in {table_name} row count", "equals", 0, "agg",
                agg_expr="count(*)")


def evaluate_row_growth(current: int, previous: int | None) -> int:
    """default_validations.py:71-97 CASE semantics -> 0 ok / 1 anomalous."""
    if previous is None:
        return 0
    return 1 if abs(current - previous) > previous * 0.2 else 0


def row_growth_rule_vs(table_name: str, previous: int) -> Rule:
    """V3 with the previous count inlined as a literal: compiles into the
    fused pass-A aggregate like any scalar rule (the reference's generated
    CTE compares against its own metrics store, default_validations.py:71-97;
    here the engine fetches the prior row_count scalar and bakes it in, so
    evaluation needs no second table)."""
    prev = int(previous)
    return Rule(f"check_{table_name}_row_growth",
                f"Detect >20% change in {table_name} row count",
                "equals", 0, "agg",
                agg_expr=(f"case when abs(count(*) - {prev}) > {prev} * 0.2 "
                          f"then 1 else 0 end"))


# ---------------------------------------------------------------------------
# compilation: rules -> batched Spark jobs -> long results DataFrame
# ---------------------------------------------------------------------------

_STATS_SX = ("cast(sum(cast({c} as decimal(28,8))) as double)")
# Squares via decimal(19,4) x decimal(18,4): Spark product precision is
# exactly 19+18+1 = 38 (no precision-loss scale adjustment), DuckDB's is 37 —
# both keep scale 8 exactly, so engines agree bit-for-bit. Both operands
# round the value at scale 4, and |value| < 10^14 fits either operand
# (the previous decimal(12,4) overflowed-to-NULL at |value| >= 10^8).
_STATS_SXX = ("cast(sum(cast({c} as decimal(19,4)) "
              "* cast({c} as decimal(18,4))) as double)")


def run_rules(
    df: DataFrame,
    rules: list[Rule],
    ref_tables: dict[str, DataFrame] | None = None,
    spark: SparkSession | None = None,
    unique_refs: frozenset[str] | set[str] = frozenset(),
) -> DataFrame:
    """Execute rules against ``df`` -> DataFrame
    (rule_name, operator, expected_lo, expected_hi, actual_value, is_valid).

    Exactly TWO full-table passes regardless of rule count (plus one keyed
    shuffle per uniqueness rule and one melted groupBy for dominance rules):

    - pass A (one scan): every scalar-aggregate rule, the sum/sumsq/count
      stats feeding each 3σ-outlier rule, and the total row count — one wide
      ``df.agg``, unpivoted to (rule_name, actual_value) rows via ``stack``.
    - pass B (one scan): every outlier count (bounds attached as a broadcast
      cross-join of pass A's one-row stats, same IEEE double op order as the
      oracle SQL) and every FK orphan count, the dims attached as broadcast
      left joins — N referential checks cost one probe pass, not N anti-join
      scans.

    The whole result is ONE lazy DataFrame — no driver-side collect between
    passes — so pass A, pass B, uniqueness and dominance stages schedule
    concurrently in a single job. Pass A's one-row result feeds three
    subtrees (stack unpivot, outlier bounds, dominance total) whose
    projections differ, so ReusedExchange cannot dedup them; it is
    persisted so the wide aggregation scan runs exactly once.
    """
    spark = spark or df.sparkSession
    ref_tables = ref_tables or {}
    pieces: list[DataFrame] = []

    # Per-rule metadata (operator, expected bounds) is inlined as literals
    # into each piece's projection instead of joined from a driver-built
    # DataFrame: one less stage, no Python->JVM LocalRelation per run.
    def _meta(r: Rule) -> str:
        lo, hi = _expected_bounds(r)
        return (f"'{_q(normalize_operator(r.operator))}', "
                f"cast({lo!r} as double), cast({hi!r} as double)")

    _META_COLS = "(rule_name, operator, expected_lo, expected_hi, actual_value)"

    agg_rules = [r for r in rules if r.kind == "agg"]
    out_rules = [r for r in rules if r.kind == "outlier"]
    ref_rules = [r for r in rules if r.kind == "ref_integrity"]
    dup_rules = [r for r in rules if r.kind == "group_dup"]
    dom_rules = [r for r in rules if r.kind == "dominance"]
    sql_rules = [r for r in rules if r.kind == "sql"]

    # ---- pass A: fused scalar aggregates + outlier stats + total ----------
    agg_a = None
    exprs_a = [
        F.expr(r.agg_expr).cast("double").alias(f"a{i}")
        for i, r in enumerate(agg_rules)
    ]
    for r in out_rules:
        c = r.column
        exprs_a += [
            F.expr(f"count({c})").alias(f"__{c}_n"),
            F.expr(_STATS_SX.format(c=c)).alias(f"__{c}_sx"),
            F.expr(_STATS_SXX.format(c=c)).alias(f"__{c}_sxx"),
        ]
    multi_use = (bool(agg_rules) + bool(out_rules)) > 1
    if exprs_a:
        agg_a = df.agg(*exprs_a)
        if multi_use:
            # One row; persisted because its consumers project different
            # columns (no ReusedExchange) — without this the full-table
            # wide aggregation runs once per consumer. Never explicitly
            # unpersisted: the returned (lazy) result still references it,
            # and the cached payload is ONE row per call — repeated calls
            # in a long session accumulate only entry metadata, evicted
            # LRU under memory pressure. Callers cycling thousands of
            # suites per session can spark.catalog.clearCache() between
            # sweeps (the engine's prepared path reuses plans instead).
            agg_a = agg_a.persist()
    if agg_rules:
        stack_a = ", ".join(f"'{_q(r.name)}', {_meta(r)}, a{i}"
                            for i, r in enumerate(agg_rules))
        pieces.append(agg_a.select(F.expr(
            f"stack({len(agg_rules)}, {stack_a}) as {_META_COLS}")))

    # ---- pass B: fused outlier counts + FK orphan counts ------------------
    if out_rules or ref_rules:
        d = df
        exprs_b = []
        for j, r in enumerate(ref_rules):
            ref = ref_tables[r.ref_table].select(F.col(r.ref_column).alias(f"__rk{j}"))
            # distinct guards against row multiplication under duplicate ref
            # keys; when the ref column is a declared PK (unique_refs) the
            # guard is skipped — at warehouse scale that saves a full shuffle
            # of the dimension before the broadcast build.
            if r.ref_table not in unique_refs:
                ref = ref.distinct()
            d = d.join(F.broadcast(ref), F.col(r.column) == F.col(f"__rk{j}"), "left")
            exprs_b.append(
                F.count(F.when(F.col(r.column).isNotNull()
                               & F.col(f"__rk{j}").isNull(), 1))
                .cast("double").alias(f"r{j}"))
        if out_rules:
            # Bounds from pass A's one-row stats, attached as a broadcast
            # cross-join: same IEEE op order as the oracle SQL (avg = sx/n;
            # std = sqrt(greatest((sxx - sx*sx/n)/(n-1), 0)); bound avg±3σ;
            # n<=1 or all-null column -> NULL bound -> NULL predicate -> 0).
            bound_exprs = []
            for i, r in enumerate(out_rules):
                c = r.column
                avg = f"(__{c}_sx / __{c}_n)"
                std = (f"(case when __{c}_n > 1 then sqrt(greatest("
                       f"(__{c}_sxx - (__{c}_sx*__{c}_sx)/__{c}_n)/(__{c}_n - 1), "
                       f"cast(0 as double))) end)")
                bound_exprs += [F.expr(f"{avg} + 3 * {std}").alias(f"__hi{i}"),
                                F.expr(f"{avg} - 3 * {std}").alias(f"__lo{i}")]
            d = d.join(F.broadcast(agg_a.select(*bound_exprs)))
            for i, r in enumerate(out_rules):
                c = r.column
                cond = (F.col(c) > F.col(f"__hi{i}")) | (F.col(c) < F.col(f"__lo{i}"))
                exprs_b.append(F.count(F.when(cond, 1)).cast("double").alias(f"o{i}"))
        stack_b = ", ".join(
            [f"'{_q(r.name)}', {_meta(r)}, r{j}" for j, r in enumerate(ref_rules)]
            + [f"'{_q(r.name)}', {_meta(r)}, o{i}" for i, r in enumerate(out_rules)])
        n_b = len(ref_rules) + len(out_rules)
        pieces.append(d.agg(*exprs_b).select(F.expr(
            f"stack({n_b}, {stack_b}) as {_META_COLS}")))

    pieces += _dup_pieces(df, dup_rules)
    dom = _dominance_piece(spark, df, dom_rules)
    if dom is not None:
        pieces.append(dom)
    pieces += _sql_pieces(spark, sql_rules)

    if not pieces:
        # empty rule list (or only unrecognized kinds): an empty result
        # frame, not an IndexError — callers treat "no rows" as "no rules"
        sess = spark or df.sparkSession
        return sess.createDataFrame(
            [], "rule_name string, operator string, expected_lo double, "
                "expected_hi double, actual_value double, is_valid boolean")
    result = pieces[0]
    for p in pieces[1:]:
        result = result.unionAll(p)
    return (result.withColumn("is_valid", F.expr(IS_VALID_CASE))
            .select("rule_name", "operator", "expected_lo", "expected_hi",
                    "actual_value", "is_valid"))


def _dup_pieces(df: DataFrame, dup_rules: list[Rule]) -> list[DataFrame]:
    pieces = []
    for r in dup_rules:
        d = df
        if r.not_null_key:
            d = d.na.drop(subset=list(r.keys))
        lo, hi = _expected_bounds(r)
        pieces.append(
            d.groupBy(*r.keys).agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") > 1)
            .agg(F.count(F.lit(1)).cast("double").alias("actual_value"))
            .selectExpr(
                f"'{_q(r.name)}' as rule_name",
                f"'{_q(normalize_operator(r.operator))}' as operator",
                f"cast({lo!r} as double) as expected_lo",
                f"cast({hi!r} as double) as expected_hi",
                "actual_value"))
    return pieces


def _dominance_piece(
    spark: SparkSession, df: DataFrame, dom_rules: list[Rule]
) -> DataFrame | None:
    if not dom_rules:
        return None
    # ONE aggregation, no joins: melt (nulls kept so sum(cnt) = total
    # table rows, the reference's pct denominator), group to per-column
    # (value, cnt) lists — dominance columns are categorical by the name
    # heuristic, so cardinality is bounded — and count values whose share
    # exceeds 95% with an array expression. A sentinel row per column
    # (unioned map-side, no extra stage) keeps a result row per rule even
    # on an empty table; its cnt is subtracted from the total.
    cols = [r.column for r in dom_rules]
    # _q-escape the stack labels like col_arr/_case do: an unescaped quote
    # in a hand-built rule's column name would break the SQL (or mismatch
    # the escaped sentinel labels)
    stack_expr = ", ".join(f"'{_q(c)}', cast(`{c}` as string)" for c in cols)
    melted = df.select(F.expr(
        f"stack({len(cols)}, {stack_expr}) as (column_name, value)"))
    col_arr = ", ".join(f"'{_q(c)}'" for c in cols)
    sentinel = spark.range(1).selectExpr(
        f"explode(array({col_arr})) as column_name",
        "cast(null as string) as value",
    ).select("column_name", "value")

    def _case(pick) -> str:
        return ("case " + " ".join(
            f"when column_name = '{_q(r.column)}' then {pick(r)}"
            for r in dom_rules) + " end")

    return (
        melted.unionAll(sentinel)
        .groupBy("column_name", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("column_name")
        .agg(
            (F.sum("cnt") - 1).alias("__tot"),
            F.collect_list(
                F.when(F.col("value").isNotNull(),
                       F.col("cnt"))).alias("__cnts"))
        .select(
            F.expr(_case(lambda r: f"'{_q(r.name)}'")).alias("rule_name"),
            F.expr(_case(lambda r: f"'{_q(normalize_operator(r.operator))}'")
                   ).alias("operator"),
            F.expr(_case(lambda r: f"cast({_expected_bounds(r)[0]!r} as double)")
                   ).alias("expected_lo"),
            F.expr(_case(lambda r: f"cast({_expected_bounds(r)[1]!r} as double)")
                   ).alias("expected_hi"),
            F.expr("cast(size(filter(__cnts, "
                   "c -> c * 100.0 / __tot > 95.0)) as double)"
                   ).alias("actual_value")))


def _sql_pieces(spark: SparkSession, sql_rules: list[Rule]) -> list[DataFrame]:
    pieces = []
    for r in sql_rules:
        res = spark.sql(r.sql)
        first_col = res.columns[0]
        lo, hi = _expected_bounds(r)
        # first() over limit(1), NOT limit(1).select(...): a custom query
        # returning ZERO rows must still surface as one (rule, NULL) row —
        # IS_VALID_CASE then marks it invalid — instead of silently
        # vanishing from the report as if the rule never ran
        pieces.append(res.limit(1).agg(
            F.first(F.col(first_col).cast("double")).alias("__v")).select(
            F.lit(r.name).alias("rule_name"),
            F.lit(normalize_operator(r.operator)).alias("operator"),
            F.lit(lo).cast("double").alias("expected_lo"),
            F.lit(hi).cast("double").alias("expected_hi"),
            F.col("__v").alias("actual_value")))
    return pieces


class PreparedRulesMulti:
    """Rule suites for MANY tables compiled once, executed per run with
    CONCURRENT jobs — the engine's scheduled-validation execution mode.

    Why not N ``run_rules`` calls unioned into one lazy DataFrame: a
    multi-table rule suite is dozens of small independent stages, and one
    action schedules them with enough serialization that per-stage latency
    dominates (measured 5.6s for ~25 stages at sf0.1 where the summed
    compute is <1s). Instead every piece is its own SMALL action, and
    ``run()`` submits them all from a driver thread pool — the same fan-out
    the reference runs with its 10-thread rule executor
    (routes/validations.py:786-789), but per table-pass, not per rule.

    Every piece is a STATIC plan (no data-dependent literals): pass B reads
    its outlier bounds from a broadcast of its own stats subtree — the
    exact ``run_rules`` formulation, so values are bit-identical — which
    means frames analyze/codegen once at prepare time and repeated ``run()``
    calls are pure execution (prepared-statement semantics; Catalyst
    planning at ~0.2s/plan dominates sub-second queries, DuckDB-style
    engines plan in µs). Per table the pieces are: one pass-A scalar agg,
    one pass-B agg (FK orphan counts via broadcast left joins + 3σ outlier
    counts), each uniqueness groupBy, one dominance melt, each custom-SQL
    scalar.

    Scalars come back to the driver (a few hundred doubles — the reference
    materializes every rule result too, manager:442-483) and re-emit as one
    local relation; ``is_valid`` is evaluated by the same SQL CASE the
    single-table path and the oracle use. Full-table scans and shuffles all
    stay distributed; at cluster scale concurrent actions are exactly how a
    scheduler-bound many-small-queries workload keeps executors saturated
    (spark.scheduler.mode=FAIR on a shared cluster).
    """

    def __init__(
        self,
        inputs: list[tuple[str, DataFrame, list["Rule"],
                           dict[str, DataFrame] | None,
                           frozenset[str] | set[str]]],
        tag_col: str = "table_name",
        max_concurrency: int = 16,
        spark: SparkSession | None = None,
    ):
        if not inputs and spark is None:
            raise ValueError(
                "PreparedRulesMulti: empty inputs — pass spark= to prepare "
                "an empty suite (run() then returns an empty relation)")
        self.spark = spark if spark is not None else inputs[0][1].sparkSession
        self.tag_col = tag_col
        self.max_concurrency = max_concurrency
        # (tname, rules_in_row_order | None, frame): rules present -> ONE
        # row unpacked by position (pass A / pass B aggs); None -> rows
        # carry (rule_name, operator, expected_lo/hi, actual_value).
        self.jobs: list[tuple[str, list[Rule] | None, DataFrame]] = []
        for tname, df, rules, ref_tables, unique_refs in inputs:
            groups = {
                "agg": [r for r in rules if r.kind == "agg"],
                "outlier": [r for r in rules if r.kind == "outlier"],
                "ref": [r for r in rules if r.kind == "ref_integrity"],
                "dup": [r for r in rules if r.kind == "group_dup"],
                "dom": [r for r in rules if r.kind == "dominance"],
                "sql": [r for r in rules if r.kind == "sql"],
            }
            ref_tables = ref_tables or {}
            unique_refs = frozenset(unique_refs or ())
            if groups["agg"]:
                self.jobs.append((tname, groups["agg"], df.agg(*[
                    F.expr(r.agg_expr).cast("double").alias(f"a{i}")
                    for i, r in enumerate(groups["agg"])])))
            out_rules, ref_rules = groups["outlier"], groups["ref"]
            if out_rules or ref_rules:
                d = df
                exprs_b = []
                for j, r in enumerate(ref_rules):
                    ref = ref_tables[r.ref_table].select(
                        F.col(r.ref_column).alias(f"__rk{j}"))
                    if r.ref_table not in unique_refs:
                        ref = ref.distinct()
                    d = d.join(F.broadcast(ref),
                               F.col(r.column) == F.col(f"__rk{j}"), "left")
                    exprs_b.append(
                        F.count(F.when(F.col(r.column).isNotNull()
                                       & F.col(f"__rk{j}").isNull(), 1))
                        .cast("double").alias(f"r{j}"))
                if out_rules:
                    # Bounds from the stats subtree via broadcast cross-join
                    # (same IEEE op order as run_rules and the oracle SQL).
                    # Not persisted: the only consumer is this piece, and a
                    # static plan keeps prepare-once semantics.
                    stat_exprs = []
                    for r in out_rules:
                        c = r.column
                        stat_exprs += [
                            F.expr(f"count({c})").alias(f"__{c}_n"),
                            F.expr(_STATS_SX.format(c=c)).alias(f"__{c}_sx"),
                            F.expr(_STATS_SXX.format(c=c)).alias(f"__{c}_sxx"),
                        ]
                    bound_exprs = []
                    for i, r in enumerate(out_rules):
                        c = r.column
                        avg = f"(__{c}_sx / __{c}_n)"
                        std = (f"(case when __{c}_n > 1 then sqrt(greatest("
                               f"(__{c}_sxx - (__{c}_sx*__{c}_sx)/__{c}_n)"
                               f"/(__{c}_n - 1), cast(0 as double))) end)")
                        bound_exprs += [
                            F.expr(f"{avg} + 3 * {std}").alias(f"__hi{i}"),
                            F.expr(f"{avg} - 3 * {std}").alias(f"__lo{i}")]
                    d = d.join(F.broadcast(
                        df.agg(*stat_exprs).select(*bound_exprs)))
                    for i, r in enumerate(out_rules):
                        c = r.column
                        cond = ((F.col(c) > F.col(f"__hi{i}"))
                                | (F.col(c) < F.col(f"__lo{i}")))
                        exprs_b.append(F.count(F.when(cond, 1))
                                       .cast("double").alias(f"o{i}"))
                self.jobs.append(
                    (tname, ref_rules + out_rules, d.agg(*exprs_b)))
            for piece in _dup_pieces(df, groups["dup"]):
                self.jobs.append((tname, None, piece))
            dom = _dominance_piece(self.spark, df, groups["dom"])
            if dom is not None:
                self.jobs.append((tname, None, dom))
            for piece in _sql_pieces(self.spark, groups["sql"]):
                self.jobs.append((tname, None, piece))

    def run(self) -> DataFrame:
        """Collect every piece concurrently; assemble the result relation
        (tag_col, rule_name, operator, expected_lo, expected_hi,
        actual_value, is_valid)."""
        return collect_rule_jobs(self.spark, self.jobs, self.tag_col,
                                 self.max_concurrency)


def collect_rule_jobs(
    spark: SparkSession,
    jobs: list[tuple[str, list["Rule"] | None, DataFrame]],
    tag_col: str = "table_name",
    max_concurrency: int = 16,
) -> DataFrame:
    """Concurrently collect prepared rule-piece frames (possibly spanning
    several ``PreparedRulesMulti`` instances on sibling sessions) and
    assemble one result relation. Jobs on sibling ``newSession()``s plan and
    execute without contending on the parent's session state; the result
    relation is built on ``spark``."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql.types import (DoubleType, StringType, StructField,
                                   StructType)

    rows: list[tuple] = []
    with ThreadPoolExecutor(max_concurrency) as pool:
        for (tname, piece_rules, _df), res in zip(
                jobs, pool.map(lambda j: j[2].collect(), jobs)):
            if piece_rules is not None:  # one positional row
                for r, v in zip(piece_rules, res[0]):
                    lo, hi = _expected_bounds(r)
                    rows.append((tname, r.name,
                                 normalize_operator(r.operator),
                                 float(lo), float(hi), v))
            else:
                for rec in res:
                    rows.append((tname, rec["rule_name"],
                                 rec["operator"], rec["expected_lo"],
                                 rec["expected_hi"], rec["actual_value"]))

    if not rows:
        schema = StructType([
            StructField(tag_col, StringType()),
            StructField("rule_name", StringType()),
            StructField("operator", StringType()),
            StructField("expected_lo", DoubleType()),
            StructField("expected_hi", DoubleType()),
            StructField("actual_value", DoubleType()),
        ])
        return (spark.createDataFrame([], schema)
                .withColumn("is_valid", F.expr(IS_VALID_CASE))
                .select(tag_col, "rule_name", "operator", "expected_lo",
                        "expected_hi", "actual_value", "is_valid"))

    # One VALUES statement instead of an RDD-backed local frame (r13):
    # parallelize()-based local relations execute a real Spark job per
    # downstream action (Python->JVM row ship + task), ~0.15s of the
    # v00 run; a VALUES literal is a LocalRelation the driver folds.
    # is_valid stays the SAME SQL CASE text, so verdicts are
    # bit-identical to run_rules and the oracle.
    def _d(v) -> str:
        if v is None:
            return "cast(null as double)"
        v = float(v)
        if v != v:
            return "cast('NaN' as double)"
        if v in (float("inf"), float("-inf")):
            return f"cast('{'-' if v < 0 else ''}Infinity' as double)"
        return f"cast({v!r} as double)"  # repr: shortest roundtrip

    vals = ", ".join(
        f"('{_q(t)}', '{_q(rn)}', '{_q(op)}', {_d(lo)}, {_d(hi)}, {_d(av)})"
        for t, rn, op, lo, hi, av in rows)
    return spark.sql(
        f"SELECT `{tag_col}`, rule_name, operator, expected_lo, "
        f"expected_hi, actual_value, {IS_VALID_CASE} AS is_valid "
        f"FROM (VALUES {vals}) AS t(`{tag_col}`, rule_name, operator, "
        f"expected_lo, expected_hi, actual_value)")


def run_rules_multi(
    inputs: list[tuple[str, DataFrame, list["Rule"],
                       dict[str, DataFrame] | None,
                       frozenset[str] | set[str]]],
    tag_col: str = "table_name",
    max_concurrency: int = 16,
) -> DataFrame:
    """One-shot ``PreparedRulesMulti(...).run()`` (see class docstring)."""
    return PreparedRulesMulti(inputs, tag_col, max_concurrency).run()


def _q(s: str) -> str:
    return s.replace("'", "''")


def run_validations(
    df: DataFrame,
    rules: list[Rule],
    ref_tables: dict[str, DataFrame] | None = None,
    run_at: str | None = None,
) -> list[dict]:
    """Materialize rule results as the reference's result records
    (supabase_validation_manager.py:442-483 shape)."""
    ts = run_at or _dt.datetime.now(_dt.timezone.utc).isoformat()
    by_name = {r.name: r for r in rules}
    out = []
    for row in run_rules(df, rules, ref_tables).collect():
        r = by_name[row["rule_name"]]
        out.append({
            "rule_name": r.name,
            "description": r.description,
            "operator": r.operator,
            "expected_value": r.expected_value,
            "actual_value": row["actual_value"],
            "is_valid": bool(row["is_valid"]) if row["is_valid"] is not None else False,
            "run_at": ts,
        })
    return out


# ---------------------------------------------------------------------------
# DuckDB oracle SQL generation from the same Rule objects
# ---------------------------------------------------------------------------

def rule_oracle_scalar(rule: Rule, table: str) -> str:
    """Scalar SELECT computing the rule's actual value in DuckDB."""
    if rule.kind == "agg":
        # regexp_like (Spark) -> regexp_matches (DuckDB); fragments are
        # otherwise dialect-common.
        frag = rule.agg_expr.replace("regexp_like(", "regexp_matches(")
        return f"SELECT cast({frag} as double) FROM {table}"
    if rule.kind == "group_dup":
        keys = ", ".join(rule.keys)
        where = ""
        if rule.not_null_key:
            where = "WHERE " + " AND ".join(f"{k} IS NOT NULL" for k in rule.keys)
        return (f"SELECT cast(count(*) as double) FROM (SELECT {keys} FROM {table} "
                f"{where} GROUP BY {keys} HAVING count(*) > 1) g")
    if rule.kind == "dominance":
        c = rule.column
        return (f"SELECT cast(count(*) as double) FROM ("
                f"SELECT {c}, count(*) * cast(100 as double) / "
                f"nullif((SELECT count(*) FROM {table}), 0) AS pct "
                f"FROM {table} WHERE {c} IS NOT NULL GROUP BY {c}) v WHERE pct > 95.0")
    if rule.kind == "outlier":
        c = rule.column
        sx = _STATS_SX.format(c=c)
        sxx = _STATS_SXX.format(c=c)
        return (
            f"SELECT cast(count(case when {c} > __avg + 3 * __std or "
            f"{c} < __avg - 3 * __std then 1 end) as double) FROM {table}, "
            f"(SELECT __sx / __n AS __avg, case when __n > 1 then "
            f"sqrt(greatest((__sxx - (__sx*__sx)/__n)/(__n - 1), 0.0)) end AS __std "
            f"FROM (SELECT count({c}) AS __n, {sx} AS __sx, {sxx} AS __sxx "
            f"FROM {table}) s) b"
        )
    if rule.kind == "ref_integrity":
        return (f"SELECT cast(count(*) as double) FROM {table} t LEFT JOIN "
                f"(SELECT DISTINCT {rule.ref_column} AS __rk FROM {rule.ref_table}) r "
                f"ON t.{rule.column} = r.__rk "
                f"WHERE t.{rule.column} IS NOT NULL AND r.__rk IS NULL")
    if rule.kind == "sql":
        return rule.sql
    raise ValueError(rule.kind)


def rules_oracle_sql(rules: list[Rule], table: str) -> str:
    """Full oracle: (rule_name, operator, expected_lo/hi, actual, is_valid)."""
    parts = []
    for r in rules:
        lo, hi = _expected_bounds(r)
        parts.append(
            f"SELECT '{_q(r.name)}' AS rule_name, "
            f"'{normalize_operator(r.operator)}' AS operator, "
            f"cast({lo} as double) AS expected_lo, cast({hi} as double) AS expected_hi, "
            f"({rule_oracle_scalar(r, table)}) AS actual_value"
        )
    inner = " UNION ALL ".join(parts)
    return (f"SELECT rule_name, operator, expected_lo, expected_hi, actual_value, "
            f"{IS_VALID_CASE} AS is_valid FROM ({inner}) rules_eval")
