"""Warehouse SQL dialect quirks (SURVEY.md §2.F).

The reference's connector layer is SQLAlchemy-over-Snowflake with the
dialect's quirks baked into one code path (reference:
backend/core/metadata/connectors.py:31-126,
backend/core/connections/builders.py:26-64). Spark reaches every
warehouse through the JDBC source, but the pieces Spark does NOT own
differ per warehouse and fail *silently* when wrong:

- **Identifier case-folding.** Unquoted identifiers fold UP in
  Snowflake/Derby and DOWN in Postgres. A probe query built with a raw
  mixed-case column name "works" on both — against different columns.
  Everything here quotes (with embedded-quote doubling), and
  ``unquoted_fold`` records what the engine would have done so callers
  can match names coming back from metadata queries.
- **Row-bounding syntax.** Postgres/Snowflake/DuckDB take ``LIMIT n``;
  Derby (and the SQL standard) want ``FETCH FIRST n ROWS ONLY``. The
  reference's preview/sample endpoints (P14) need this per warehouse.
- **Bounded sampling.** Snowflake has ``SAMPLE (n ROWS)``; DuckDB
  ``USING SAMPLE n ROWS``; engines without a row-count sample clause
  (Postgres's TABLESAMPLE is percentage-only and FROM-attached) fall
  back to the LIMIT form so placement stays uniform (after the body).
- **Spark-type -> warehouse-DDL mapping** for metadata/result
  writebacks: ``double`` is DOUBLE PRECISION in Postgres but DOUBLE in
  Snowflake/Derby; ``string`` is TEXT / VARCHAR / VARCHAR(32672);
  ``binary`` is BYTEA / BINARY / BLOB; ``timestamp`` is TIMESTAMP_NTZ
  in Snowflake (its plain TIMESTAMP is session-aliased).

Everything in this module is pure string construction — unit-testable
with no live warehouse (the sandbox has none) — and the generated
subqueries are exercised end-to-end against embedded Derby, the one
JDBC engine available in-process (tests/test_dialects.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass(frozen=True)
class Dialect:
    """One warehouse's SQL surface, as far as the engine needs it."""

    name: str
    # what the engine does to UNQUOTED identifiers ("upper" | "lower").
    # Postgres folds down (SQL-standard-contrary), most others fold up.
    unquoted_fold: str
    # row-bounding clause appended after the query body
    limit_tpl: str = "LIMIT {n}"
    # engine-native bounded sample, or None -> fall back to limit_tpl
    sample_tpl: str | None = None
    # derived-table template for the JDBC ``dbtable`` option
    subquery_tpl: str = "({sql}) AS {alias}"
    # Spark simpleString -> warehouse DDL type. decimal(p,s) handled
    # structurally below; anything unmapped passes through uppercased.
    type_map: dict[str, str] = field(default_factory=dict)

    def quote(self, ident: str) -> str:
        """Standard double-quoted identifier, embedded quotes doubled —
        the only spelling that survives every engine's case-folding."""
        return '"' + ident.replace('"', '""') + '"'

    def fold(self, ident: str) -> str:
        """What the engine stores for an identifier created UNQUOTED —
        match against names coming back from metadata queries."""
        return ident.upper() if self.unquoted_fold == "upper" else ident.lower()

    def limit(self, n: int) -> str:
        return self.limit_tpl.format(n=int(n))

    def sample_rows(self, n: int) -> str:
        """Bounded-sample clause (P14 preview / profiling probes); LIMIT
        fallback keeps the query valid on engines without SAMPLE."""
        if self.sample_tpl is not None:
            return self.sample_tpl.format(n=int(n))
        return self.limit(n)

    def ddl_type(self, dt: T.DataType) -> str:
        s = dt.simpleString()
        m = re.fullmatch(r"decimal\((\d+),(\d+)\)", s)
        if m:
            base = self.type_map.get("decimal", "DECIMAL({p},{s})")
            return base.format(p=m.group(1), s=m.group(2))
        return self.type_map.get(s, s.upper())

    def create_table_ddl(self, table: str, schema: T.StructType) -> str:
        """CREATE TABLE for metadata/result writebacks — every
        identifier quoted so the round-trip is case-exact."""
        cols = ", ".join(
            f"{self.quote(f.name)} {self.ddl_type(f.dataType)}"
            f"{'' if f.nullable else ' NOT NULL'}"
            for f in schema.fields)
        return f"CREATE TABLE {self.quote(table)} ({cols})"

    def pushdown_subquery(
        self,
        table: str,
        columns: list[str] | None = None,
        predicates: list[str] | None = None,
        limit: int | None = None,
        alias: str = "sparvi_sub",
    ) -> str:
        """Derived-table string for the JDBC ``dbtable`` option — column
        pruning and filtering INSIDE the warehouse, for engines/queries
        where Spark's own JDBC pushdown can't reach (expressions, or a
        preview that must never scan the table). ``predicates`` are
        warehouse-SQL fragments AND-ed together — caller-authored, same
        trust level as the reference's custom-SQL rules (V24). ``table``
        may itself be schema-qualified; it is passed through verbatim
        (quote parts yourself for case-exact names)."""
        proj = (", ".join(self.quote(c) for c in columns)
                if columns else "*")
        sql = f"SELECT {proj} FROM {table}"
        if predicates:
            sql += " WHERE " + " AND ".join(f"({p})" for p in predicates)
        if limit is not None:
            sql += " " + self.limit(limit)
        return self.subquery_tpl.format(sql=sql, alias=alias)

    def bounds_probe_sql(self, table: str, column: str) -> str:
        """min/max probe for partitioned-read stride derivation (see
        readers.read_table) — quoted so Snowflake/Postgres case-folding
        cannot silently probe a different column."""
        q = self.quote(column)
        return (f"SELECT min({q}) AS mn, max({q}) AS mx FROM {table}")


DIALECTS: dict[str, Dialect] = {
    "postgresql": Dialect(
        name="postgresql",
        unquoted_fold="lower",
        # no sample_tpl: Postgres TABLESAMPLE SYSTEM takes a PERCENTAGE
        # (sample_rows(1000) would be a syntax error, sample_rows(50) a
        # half-table scan) and attaches inside FROM, not after the query
        # body like every other clause here — LIMIT fallback is the only
        # row-bounded form with uniform placement
        type_map={
            "string": "TEXT", "double": "DOUBLE PRECISION",
            "float": "REAL", "int": "INTEGER", "bigint": "BIGINT",
            "smallint": "SMALLINT", "boolean": "BOOLEAN",
            "timestamp": "TIMESTAMP", "date": "DATE", "binary": "BYTEA",
            "decimal": "NUMERIC({p},{s})",
        }),
    "snowflake": Dialect(
        name="snowflake",
        unquoted_fold="upper",
        sample_tpl="SAMPLE ({n} ROWS)",
        type_map={
            "string": "VARCHAR", "double": "DOUBLE", "float": "FLOAT",
            "int": "INTEGER", "bigint": "BIGINT", "smallint": "SMALLINT",
            "boolean": "BOOLEAN",
            # Snowflake's plain TIMESTAMP is a session-parameter ALIAS
            # (defaults to NTZ but can point at LTZ) — write the explicit
            # type or round-trips shift with the session
            "timestamp": "TIMESTAMP_NTZ", "date": "DATE",
            "binary": "BINARY", "decimal": "NUMBER({p},{s})",
        }),
    "derby": Dialect(
        name="derby",
        unquoted_fold="upper",
        # Derby has no LIMIT — standard fetch-first only
        limit_tpl="FETCH FIRST {n} ROWS ONLY",
        type_map={
            "string": "VARCHAR(32672)", "double": "DOUBLE",
            "float": "REAL", "int": "INTEGER", "bigint": "BIGINT",
            "smallint": "SMALLINT", "boolean": "BOOLEAN",
            "timestamp": "TIMESTAMP", "date": "DATE", "binary": "BLOB",
            "decimal": "DECIMAL({p},{s})",
        }),
    "duckdb": Dialect(
        name="duckdb",
        unquoted_fold="lower",
        sample_tpl="USING SAMPLE {n} ROWS",
        type_map={
            "string": "VARCHAR", "double": "DOUBLE", "float": "REAL",
            "int": "INTEGER", "bigint": "BIGINT", "smallint": "SMALLINT",
            "boolean": "BOOLEAN", "timestamp": "TIMESTAMP",
            "date": "DATE", "binary": "BLOB", "decimal": "DECIMAL({p},{s})",
        }),
}


def dialect_for(conn_type: str) -> Dialect:
    """Dialect for a connection-dict ``type`` (readers._jdbc_url names)."""
    d = DIALECTS.get(conn_type.lower())
    if d is None:
        raise NotImplementedError(
            f"no SQL dialect for connection type {conn_type!r}; "
            f"known: {sorted(DIALECTS)}")
    return d
