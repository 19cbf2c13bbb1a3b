"""Compile the DNF filter IR to SQL text, with per-backend dialects.

The reference emits SQL text twice — DataFusion-flavoured for Delta scans
(util.py:145-272: filters_to_sql_predicate / filter_to_sql_expr /
value_to_sql_expr / escape_str_for_sql) and ClickHouse-flavoured for remote
pushdown (clickhouse_table.py:180-238 + util.py:275-299 format_value_for_sql).
One generator with a dialect object covers both here, and the ANSI dialect's
output is directly usable as a Spark ``df.filter(sql)`` string or a JDBC
pushdown subquery WHERE clause.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence

from .filters import Filter, NormalizedFilters


def escape_str_for_sql(value: str) -> str:
    """Escape a string literal by doubling single quotes (ANSI).

    ANSI-family engines (DuckDB, DataFusion) treat backslash as a literal
    character inside ``'...'`` strings, so quote-doubling is complete. NOT
    safe for engines where backslash is an escape character in string
    literals (Spark, ClickHouse, MySQL) — a value ending in a backslash
    would render as ``'...\\''`` where ``\\'`` reads as an escaped quote, so
    the literal doesn't terminate where intended (breaking the statement,
    or worse, splicing attacker-controlled filter text into it). Those
    dialects use :func:`escape_str_backslash_dialect` instead."""
    return value.replace("'", "''")


def escape_str_backslash_dialect(value: str) -> str:
    """Escape for dialects whose string literals treat ``\\`` as an escape
    (Spark, ClickHouse, MySQL): double backslashes FIRST, then double
    quotes (both Spark and ClickHouse accept ``''`` inside literals)."""
    return value.replace("\\", "\\\\").replace("'", "''")


@dataclass(frozen=True)
class SqlDialect:
    """Knobs that differ across SQL backends."""

    name: str = "ansi"
    identifier_quote: str = '"'
    # bool → SQL text ("TRUE"/"FALSE" ANSI; "1"/"0" ClickHouse)
    bool_true: str = "TRUE"
    bool_false: str = "FALSE"
    # array-membership function: fn(column_sql, value_sql) -> expr text
    array_contains: Callable[[str, str], str] = field(
        default=lambda col, val: f"array_contains({col}, {val})"
    )
    typed_date_literals: bool = True  # DATE '...' / TIMESTAMP '...'
    # 'contains' compiles to LIKE '%...%'; %/_ in the VALUE must be escaped
    # or they act as wildcards. ANSI engines need an explicit ESCAPE
    # clause; Spark and ClickHouse already default the LIKE escape char to
    # backslash — and in Spark an appended ESCAPE '\' would itself fail to
    # parse (the lone backslash swallows the closing quote).
    like_escape_clause: bool = True
    # string-literal escaping differs: ANSI doubles quotes only; engines
    # where backslash escapes inside literals must double it too.
    escape_str: Callable[[str], str] = escape_str_for_sql

    def quote_ident(self, name: str) -> str:
        q = self.identifier_quote
        return f"{q}{name.replace(q, q + q)}{q}"

    def format_value(self, value: Any) -> str:
        if value is None:
            return "NULL"
        if isinstance(value, bool):  # before int: bool is an int subclass
            return self.bool_true if value else self.bool_false
        if isinstance(value, (int, float)):
            return repr(value)
        if isinstance(value, str):
            return f"'{self.escape_str(value)}'"
        if isinstance(value, dt.datetime):
            text = value.strftime("%Y-%m-%d %H:%M:%S.%f")
            return f"TIMESTAMP '{text}'" if self.typed_date_literals else f"'{text}'"
        if isinstance(value, dt.date):
            text = value.isoformat()
            return f"DATE '{text}'" if self.typed_date_literals else f"'{text}'"
        if isinstance(value, (list, tuple, set)):
            inner = ", ".join(self.format_value(v) for v in value)
            return f"({inner})"
        raise ValueError(f"Cannot format value for SQL: {value!r}")


ANSI = SqlDialect()
SPARK = SqlDialect(
    name="spark",
    identifier_quote="`",
    like_escape_clause=False,  # backslash is Spark's default LIKE escape
    escape_str=escape_str_backslash_dialect,
)
CLICKHOUSE = SqlDialect(
    name="clickhouse",
    identifier_quote="`",
    bool_true="1",
    bool_false="0",
    array_contains=lambda col, val: f"has({col}, {val})",
    typed_date_literals=False,
    like_escape_clause=False,  # backslash is CH's default LIKE escape
    escape_str=escape_str_backslash_dialect,
)
DUCKDB = SqlDialect(name="duckdb")

_COMPARISON_OPS = {"=", "!=", "<", "<=", ">", ">="}


def filter_to_sql_expr(f: Filter, dialect: SqlDialect = ANSI) -> str:
    """One ``Filter`` → one SQL boolean expression."""
    col = dialect.quote_ident(f.column)
    op = f.operator
    if op in _COMPARISON_OPS:
        if f.value is None and op in ("=", "!="):
            return f"{col} IS NULL" if op == "=" else f"{col} IS NOT NULL"
        return f"{col} {op} {dialect.format_value(f.value)}"
    if op == "in":
        return f"{col} IN {dialect.format_value(tuple(f.value))}"
    if op == "not in":
        return f"{col} NOT IN {dialect.format_value(tuple(f.value))}"
    if op == "contains":
        # Literal-substring semantics (Column.contains parity): escape the
        # LIKE metacharacters inside the value.
        raw = str(f.value)
        pattern = (
            raw.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        )
        escaped = dialect.escape_str(pattern)
        like = f"{col} LIKE '%{escaped}%'"
        if dialect.like_escape_clause:
            like += " ESCAPE '\\'"
        return like
    if op == "includes":
        return dialect.array_contains(col, dialect.format_value(f.value))
    if op == "includes any":
        parts = [dialect.array_contains(col, dialect.format_value(v)) for v in f.value]
        return "(" + " OR ".join(parts) + ")" if parts else "FALSE"
    if op == "includes all":
        parts = [dialect.array_contains(col, dialect.format_value(v)) for v in f.value]
        return "(" + " AND ".join(parts) + ")" if parts else "TRUE"
    raise ValueError(f"Unsupported filter operator: {op!r}")


def filters_to_sql_conjunction(
    conj: Sequence[Filter], dialect: SqlDialect = ANSI
) -> str:
    parts = [filter_to_sql_expr(f, dialect) for f in conj]
    if not parts:
        return "TRUE"
    if len(parts) == 1:
        return parts[0]
    return "(" + " AND ".join(parts) + ")"


def filters_to_sql_predicate(
    filters: NormalizedFilters, dialect: SqlDialect = ANSI
) -> Optional[str]:
    """DNF → one WHERE-clause expression; ``None`` when there is no filter."""
    if not filters:
        return None
    parts = [filters_to_sql_conjunction(c, dialect) for c in filters]
    if len(parts) == 1:
        return parts[0]
    return " OR ".join(parts)


def build_select_query(
    table: str,
    columns: Optional[Sequence[str]] = None,
    filters: Optional[NormalizedFilters] = None,
    dialect: SqlDialect = ANSI,
) -> str:
    """``SELECT cols FROM table [WHERE pred]`` — the pushdown subquery shape
    the reference builds for DataFusion (deltalake_table.py:232-243) and
    ClickHouse (_build_query, clickhouse_table.py:156-239)."""
    select_list = (
        ", ".join(dialect.quote_ident(c) for c in columns) if columns else "*"
    )
    # "db.table" quotes as `db`.`table` — each path segment separately.
    table_sql = ".".join(dialect.quote_ident(p) for p in table.split("."))
    query = f"SELECT {select_list} FROM {table_sql}"
    pred = filters_to_sql_predicate(filters or [], dialect)
    if pred:
        query += f" WHERE {pred}"
    return query
