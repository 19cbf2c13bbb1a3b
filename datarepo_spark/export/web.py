"""Web-catalog export: serialize a Catalog to the reference's data.json
shape (export/web.py:19-150; site types static_site/src/lib/types.ts:1-46).

The JSON is the contract — the reference's precompiled React site renders
whatever matches it, so this exporter emits the same structure: catalogs →
databases → tables, each table with schema columns/partitions, description,
and selected metadata. (The static site itself is an asset copy in the
reference, not engine behavior; any UI consuming the JSON works.)
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

from ..catalog.catalog import Catalog


def table_to_dict(name: str, table: Any) -> dict[str, Any]:
    from ..tables.delta_table import DeltalakeTable

    meta = getattr(table, "table_metadata", None)
    entry: dict[str, Any] = {
        "name": name,
        # reference web.py:41 — Delta tables take a raw SQL predicate
        # string (our filters=str passthrough); the site shows the SQL
        # snippet tab first for them
        "supports_sql_filter": isinstance(table, DeltalakeTable),
        "table_type": getattr(meta, "table_type", "function"),
        "description": getattr(meta, "description", ""),
        "is_deprecated": bool(getattr(meta, "is_deprecated", False)),
        "latency_info": getattr(meta, "latency_info", None),
        "example_notebook": getattr(meta, "example_notebook", None),
        "data_input": getattr(meta, "data_input", None),
    }
    try:
        schema = table.get_schema()
        entry["columns"] = [
            {
                "column": c.column,
                "type": c.type,
                "readonly": c.readonly,
                "filter_only": c.filter_only,
                "has_stats": c.has_stats,
            }
            for c in schema.columns
        ]
        entry["partitions"] = [
            {
                "column_name": p.column_name,
                "type_annotation": p.type_annotation,
            }
            for p in schema.partitions
        ]
    except Exception as exc:  # schema introspection is best-effort
        entry["columns"] = []
        entry["partitions"] = []
        entry["schema_error"] = str(exc)
    return entry


def catalog_to_dict(
    catalog: Catalog, catalog_name: str = "default"
) -> dict[str, Any]:
    from .codegen import gen_table_code

    databases = {}
    for db_name in catalog.dbs():
        db = catalog.db(db_name)
        tables = {
            t_name: table_to_dict(t_name, table)
            for t_name, table in db.tables().items()
        }
        for entry in tables.values():
            # the per-table "how to query this" snippet the reference
            # site codegens browser-side (codegen.ts:62-109) — emitted
            # into data.json so any consumer (incl. our static viewer)
            # can render it without reimplementing the formatting
            entry["code_snippet"] = gen_table_code(
                catalog_name, db_name, entry
            )
            if entry.get("supports_sql_filter") and entry.get("partitions"):
                entry["code_snippet_sql"] = gen_table_code(
                    catalog_name, db_name, entry, format_sql_filter=True
                )
        databases[db_name] = {"name": db_name, "tables": tables}
    return {
        "name": catalog_name,
        "metadata": catalog.metadata,
        "databases": databases,
    }


def export_catalogs(
    catalogs: dict[str, Catalog],
    output_dir: str,
    filename: str = "data.json",
) -> str:
    """Write the full multi-catalog data.json; returns the path."""
    payload = {
        "catalogs": {
            name: catalog_to_dict(cat, name) for name, cat in catalogs.items()
        }
    }
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, filename)
    with open(path, "w", encoding="utf-8") as handle:
        json.dump(payload, handle, indent=2, sort_keys=True, default=str)
    return path


def export_and_generate_site(
    catalogs: dict[str, Catalog], output_dir: str
) -> str:
    """Reference-named entry point (web.py:119-150): emits data.json plus
    a browsable site. The reference copies a precompiled React bundle;
    here the viewer is a from-scratch single-file HTML app
    (export/static_site.py) with the same job — browse catalogs →
    databases → tables, inspect columns/partitions, filter by name.
    Idempotent like the reference: the output dir is recreated."""
    import shutil

    from .static_site import write_index_html

    if os.path.isdir(output_dir):
        shutil.rmtree(output_dir)
    path = export_catalogs(catalogs, output_dir)
    write_index_html(output_dir)
    return path
