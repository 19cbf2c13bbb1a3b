"""TPC-H catalog-definition example — the datarepo_spark equivalent of
the reference's ``docs/examples/tpch_tables.py`` (a module-reflected
database whose docs site / ROAPI config build straight from the
definitions; reference CI builds its docs site from that file).

Everything here runs against the local testdata parquet
(``/root/testdata/sf0.001`` by default; set ``SPARK_GRAFT_SF_DIR``),
so the example is executable, not pseudocode:

    from examples.tpch_catalog import catalog
    df = catalog.db("tpch").table("part", filters=[Filter("p_size", ">", 40)])

Tables demonstrate the three definition styles the reference's example
shows: a plain ``ParquetTable``, one with docs filters + metadata args,
and an ``@table``-decorated function table (derived/computed view).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from datarepo_spark import (  # noqa: E402
    Catalog,
    Filter,
    ModuleDatabase,
    ParquetTable,
    TableMetadata,
    table,
)
from datarepo_spark.queries.registry import load  # noqa: E402
from datarepo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _uri(name: str) -> str:
    return os.path.join(SF_DIR, f"{name}.parquet")


# -- plain scan table --------------------------------------------------------
region = ParquetTable(name="region", uri=_uri("region"))

nation = ParquetTable(
    name="nation",
    uri=_uri("nation"),
    description="TPC-H nation dimension (25 rows, joins to region).",
)

# -- documented table with docs filters + metadata (the reference's
#    part example, datarepo docs/examples/tpch_tables.py) -------------------
part = ParquetTable(
    name="part",
    uri=_uri("part"),
    docs_filters=[
        Filter("p_size", "=", 40),
        Filter("p_brand", "=", "Brand#13"),
    ],
    description=(
        "Part information from the TPC-H benchmark. Contains details "
        "about parts including name, manufacturer, brand, and retail "
        "price."
    ),
    table_metadata=TableMetadata(
        table_type="parquet",
        description="TPC-H part dimension.",
        data_input="Part catalog data, regenerated per scale factor",
        latency_info="Static benchmark data — no refresh cadence",
    ),
)

orders = ParquetTable(name="orders", uri=_uri("orders"))
lineitem = ParquetTable(name="lineitem", uri=_uri("lineitem"))
customer = ParquetTable(name="customer", uri=_uri("customer"))
supplier = ParquetTable(name="supplier", uri=_uri("supplier"))


# -- function table (derived view), the reference's @table style ------------
@table(
    description="Revenue per order: SUM(extendedprice * (1 - discount)) "
    "grouped by orderkey — the reusable revenue building block of "
    "Q3/Q5/Q10.",
    data_input="Derived from lineitem at query time",
    latency_info="Computed on read (lazy Spark plan)",
)
def order_revenue() -> DataFrame:
    spark = get_spark()
    li = load(spark, SF_DIR, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                ).cast("decimal(38,6)")
            ).cast("double"),
            2,
        ).alias("revenue")
    )


class tpch:
    """Module-style database: reflected by ModuleDatabase exactly like
    the reference's docs examples."""

    region = region
    nation = nation
    part = part
    orders = orders
    lineitem = lineitem
    customer = customer
    supplier = supplier
    order_revenue = order_revenue


catalog = Catalog({"tpch": ModuleDatabase(tpch)})
