"""Catalog definition over the driver-provided testdata star schema.

Analogous to the reference's TPC-H catalog example
(docs/examples/tpch_tables.py) — each table is a ParquetTable; the catalog
groups them into one database. Every table call returns a lazy DataFrame,
so queries compose with full Catalyst pushdown through the catalog layer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..catalog.catalog import Catalog, DictDatabase
from ..core.readconf import apply_parquet_read_compat
from ..tables.parquet_table import ParquetTable

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def testdata_catalog(sf_dir: str) -> Catalog:
    tables = {
        name: ParquetTable(
            name=name,
            uri=os.path.join(sf_dir, f"{name}.parquet"),
            description=f"testdata table {name} at {sf_dir}",
        )
        for name in TABLE_NAMES
    }
    return Catalog({"testdata": DictDatabase(tables)})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shortcut: one testdata table as a DataFrame."""
    apply_parquet_read_compat(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
