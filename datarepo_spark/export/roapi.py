"""ROAPI export: generate read-only-API table configs from a catalog.

Parity target: reference export/roapi.py:14-221 — each catalog table
becomes one ROAPI table entry (name, uri, format-specific io options,
reload interval for delta), so a ROAPI server can serve the same tables
over HTTP/SQL without running Python. Golden-dict tested like the
reference (test/roapi/test_roapi.py:53-87).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Optional

from ..catalog.catalog import Catalog
from ..core.filters import Filter
from ..tables.metadata import TableType

logger = logging.getLogger(__name__)

DEFAULT_DELTA_RELOAD_SECONDS = 60  # reference util.py:24-26


def py_type_to_roapi(py_type: type) -> str:
    """Python filter-value type → ROAPI data type (reference
    export/roapi.py:214-221)."""
    return {
        int: "Int64",
        str: "Utf8",
        bool: "Boolean",
        float: "Float64",
    }[py_type]


@dataclass
class RoapiOptions:
    """Per-table overrides (reference util.py:17-26)."""

    disabled: bool = False
    override_name: Optional[str] = None
    reload_interval_seconds: Optional[int] = None
    extra: dict[str, Any] = field(default_factory=dict)


def table_to_roapi(name: str, table: Any) -> Optional[dict[str, Any]]:
    meta = getattr(table, "table_metadata", None)
    opts: Optional[RoapiOptions] = getattr(meta, "roapi_opts", None)
    if opts is not None and opts.disabled:
        return None
    table_type = getattr(meta, "table_type", None)
    out_name = (opts.override_name if opts else None) or name

    if table_type == TableType.PARQUET.value:
        entry: dict[str, Any] = {
            "name": out_name,
            "uri": table.uri,
            "option": {"format": "parquet", "use_memory_table": False},
        }
        # With docs filters pinning every partition, ROAPI can infer the
        # schema from ONE representative file instead of listing the whole
        # table: emit the reference's partition_columns + schema_from_files
        # fragment shape (reference export/roapi.py:84-128).
        docs_filters = (meta.docs_args or {}).get("filters") or []
        if docs_filters and all(
            isinstance(f, Filter) for f in docs_filters
        ):
            # Exotic docs filters — a value type outside the ROAPI map, or
            # non-equality filters that can't pin a file fragment — must
            # not kill the whole export: fall back to the plain
            # partition_columns entry, like the reference's per-table
            # stderr-and-continue (reference export/roapi.py; r3 verdict
            # item 8).
            try:
                entry["partition_columns"] = [
                    {
                        "name": f.column,
                        # ROAPI treats YYYY-MM-DD partition cols as Date32
                        "data_type": (
                            "Date32"
                            if f.column == "date"
                            else py_type_to_roapi(type(f.value))
                        ),
                    }
                    for f in docs_filters
                ]
                entry["schema_from_files"] = [
                    table.build_file_fragment(list(docs_filters))
                ]
            except (KeyError, ValueError) as exc:
                logger.warning(
                    "ROAPI export: table %r docs filters not expressible "
                    "(%s); falling back to partition_columns", name, exc
                )
                entry.pop("partition_columns", None)
                entry.pop("schema_from_files", None)
                docs_filters = []
        if "partition_columns" not in entry:
            partitions = [
                {"name": p.column, "data_type": p.col_type.simpleString()}
                for p in getattr(table, "partitioning", [])
            ]
            if partitions:
                entry["partition_columns"] = partitions
    elif table_type == TableType.DELTA.value:
        reload_s = (
            opts.reload_interval_seconds
            if opts and opts.reload_interval_seconds is not None
            else DEFAULT_DELTA_RELOAD_SECONDS
        )
        entry = {
            "name": out_name,
            "uri": table.uri,
            "option": {"format": "delta", "use_memory_table": False},
            "reload_interval": {"secs": reload_s, "nanos": 0},
        }
    elif table_type in (TableType.CLICKHOUSE.value, TableType.JDBC.value):
        entry = {
            "name": out_name,
            "uri": table.config.url,
            "option": {"format": "jdbc"},
        }
    else:
        # Function tables have no storage URI → not servable read-only.
        return None
    if opts and opts.extra:
        entry.update(opts.extra)
    return entry


def export_to_roapi_tables(catalog: Catalog) -> list[dict[str, Any]]:
    out = []
    for db_name in catalog.dbs():
        db = catalog.db(db_name)
        for t_name, table in db.tables().items():
            try:
                entry = table_to_roapi(t_name, table)
            except Exception as exc:
                # one broken table must not abort the export of the rest
                # (reference prints to stderr and continues)
                logger.warning(
                    "ROAPI export: skipping table %r: %s", t_name, exc
                )
                continue
            if entry is not None:
                out.append(entry)
    return out
