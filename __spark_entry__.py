"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full named-query registry
(datarepo_spark/queries/registry.py) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datarepo_spark.queries import registry as _registry  # noqa: E402
from datarepo_spark.queries import extensions as _extensions  # noqa: E402,F401
from datarepo_spark.queries import tpch_extra as _tpch_extra  # noqa: E402,F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q3-style: catalog-scanned parquet, broadcast dim join, group,
    exact-decimal revenue aggregation, top-k.
    """
    return _registry.REGISTRY["q3_shipping_priority"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in _registry.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return {
        name: q.oracle
        for name, q in _registry.REGISTRY.items()
        if q.oracle is not None
    }
