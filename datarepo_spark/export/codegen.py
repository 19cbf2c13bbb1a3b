"""Per-table "how to query this" snippet generation.

Parity with the reference site's codegen
(static_site/src/lib/codegen.ts:62-109): given an exported table entry,
emit the runnable Python snippet a user pastes to read that table —
catalog import, `Filter` import, the `.table(...)` call with one
equality filter per partition column (or a SQL filter string when the
table supports it), the selected columns, and a `print(df.collect())`
tail. Formatting mirrors the reference exactly: a single parameter
renders inline; multiple parameters go multiline with 4-space indent
and trailing commas, and the filter tuple always keeps a hanging comma
so Python reads it as a tuple of NamedTuples rather than unwrapping a
single Filter.

The reference site generates snippets browser-side after the user picks
partition VALUES; this exporter runs at export time, so partition
values render as typed placeholders (strings quoted, numerics bare)
that the reader replaces.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

_STRING_TYPES = {"str", "string", "varchar", "text"}


def _is_string_partition(type_annotation: Optional[str]) -> bool:
    t = (type_annotation or "").lower()
    # reference annotations ("str"/"string", codegen.ts:47-49) plus the
    # Spark spellings our exporter emits ("StringType()", "varchar(n)")
    return (
        t in _STRING_TYPES
        or t.startswith("stringtype")
        or "char" in t
    )


def _indent(code: str, spaces: int) -> str:
    pad = " " * spaces
    return "\n".join(pad + line for line in code.split("\n"))


def _multiline(args: Sequence[str], open_b: str, close_b: str) -> str:
    body = "\n".join(_indent(a, 4) + "," for a in args)
    return f"{open_b}\n{body}\n{close_b}"


def _params(params: Sequence[str]) -> str:
    if len(params) <= 1:
        return "(" + ", ".join(params) + ")"
    return _multiline(params, "(", ")")


def _partition_value(partition: dict[str, Any]) -> str:
    """The filter value for one partition column: the entry's concrete
    ``value`` if the caller provided one, else a typed placeholder."""
    value = partition.get("value")
    if _is_string_partition(partition.get("type_annotation")):
        return f'"{value if value is not None else "<value>"}"'
    return str(value) if value is not None else "0"


def gen_table_code(
    catalog_name: str,
    database_name: str,
    table: dict[str, Any],
    package_name: Optional[str] = None,
    format_sql_filter: bool = False,
) -> str:
    """The reference's genTableCode (codegen.ts:62-109) as Python."""
    params = [f'"{table["name"]}"']
    partitions = table.get("partitions") or []
    if partitions:
        if format_sql_filter:
            clauses = []
            for p in partitions:
                value = _partition_value(p)
                if _is_string_partition(p.get("type_annotation")):
                    value = "'" + value.strip('"') + "'"
                clauses.append(f"{p['column_name']} = {value}")
            params.append('filters="' + " and ".join(clauses) + '"')
        else:
            filters = [
                f'Filter("{p["column_name"]}", "=", {_partition_value(p)})'
                for p in partitions
            ]
            # hanging comma even for a single filter: without it Python
            # unwraps the tuple into the bare NamedTuple
            params.append(_multiline(filters, "(", ")"))
    selected = table.get("selected_columns")
    if selected is not None:
        params.append(
            "columns=" + _multiline([f'"{c}"' for c in selected], "[", "]")
        )
    lines = [
        f"from {package_name or 'datarepo_catalogs'} import {catalog_name}",
    ]
    if partitions and not format_sql_filter:
        # only the Filter-object form uses the import; the SQL-string
        # and no-partition snippets must not ship dead imports
        lines.append("from datarepo_spark.core import Filter")
    lines += [
        "",
        f'df = {catalog_name}.db("{database_name}").table{_params(params)}',
        "print(df.collect())",
    ]
    return "\n".join(lines).strip()
