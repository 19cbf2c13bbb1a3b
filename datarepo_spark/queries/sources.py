"""Oracle-gated queries for the non-parquet file sources.

Fixture pattern mirrors delta_queries: materialize a CSV and a JSONL
copy of a deterministic ``orders`` subset (projected to types those
formats round-trip exactly — integers, shortest-repr doubles, strings),
read them back through :class:`FileTable` with filters + projection, and
oracle against plain SQL over the SOURCE parquet: the file copies are a
pure function of it.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.filters import Filter
from ..tables.file_table import FileTable
from .registry import load, register

_BUILT: dict[str, dict[str, str]] = {}

_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


def _fixture(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    key = os.path.abspath(sf_dir)
    built = _BUILT.get(key)
    if built and all(os.path.isdir(p) for p in built.values()):
        return built
    base = tempfile.mkdtemp(prefix="datarepo_sources_gate_")
    src = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select(*[f.name for f in _SCHEMA.fields])
    )
    paths = {
        "csv": os.path.join(base, "orders_csv"),
        "json": os.path.join(base, "orders_json"),
        "orc": os.path.join(base, "orders_orc"),
    }
    src.write.mode("overwrite").option("header", "true").csv(paths["csv"])
    src.write.mode("overwrite").json(paths["json"])
    src.write.mode("overwrite").orc(paths["orc"])
    _BUILT[key] = paths
    return paths


@register(
    "source_csv_scan",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey <= 3000 AND o_totalprice > 150000
    """,
    description="CSV source through the table protocol: declared schema "
    "(no double-read inference), DNF filter, projection",
)
def source_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    paths = _fixture(spark, sf_dir)
    t = FileTable("orders_csv", paths["csv"], "csv", schema=_SCHEMA)
    return t(
        filters=[Filter("o_totalprice", ">", 150000.0)],
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
        spark=spark,
    )


@register(
    "source_json_scan",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey <= 3000 AND o_orderstatus = 'O'
    """,
    description="JSON-lines source through the table protocol: filter on "
    "an unprojected column, projection after",
)
def source_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    paths = _fixture(spark, sf_dir)
    t = FileTable("orders_json", paths["json"], "json", schema=_SCHEMA)
    return t(
        filters=[Filter("o_orderstatus", "=", "O")],
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
        spark=spark,
    )


@register(
    "source_orc_scan",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey <= 3000
      AND o_custkey <= 500 AND o_totalprice < 50000
    """,
    description="ORC source through the table protocol: columnar format "
    "with FULL predicate pushdown (stripe-level skipping), DNF filter, "
    "projection — the non-parquet columnar path",
)
def source_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    paths = _fixture(spark, sf_dir)
    t = FileTable("orders_orc", paths["orc"], "orc", schema=_SCHEMA)
    return t(
        filters=[
            Filter("o_custkey", "<=", 500),
            Filter("o_totalprice", "<", 50000.0),
        ],
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
        spark=spark,
    )
