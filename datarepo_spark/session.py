"""SparkSession factory tuned for this engine.

Local defaults target the test harness (local[N], shuffle partitions ≈
cores); on a real cluster every knob here is overridable via ``extra_conf``
or spark-submit conf — the builder only sets what isn't already set.
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

from pyspark.sql import SparkSession

_DEFAULT_CONF = {
    # AQE re-plans at runtime: coalesces small shuffle partitions, switches
    # sort-merge → broadcast when a side turns out small, splits skewed
    # partitions. Essential at 100 TB, harmless at sf0.001.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic oracle comparison: DuckDB timestamps are UTC-naive.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for toPandas / pandas_udf transfer.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.ui.showConsoleProgress": "false",
    # Spark 4 rejects INT64 TIMESTAMP(NANOS) parquet columns outright; read
    # them as raw nanosecond longs instead and convert at the table layer
    # (datarepo_spark.queries.registry.load). Values in testdata are
    # µs-granular, so the µs conversion is lossless.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Un-adjusted parquet timestamps read as LTZ (UTC instants), never NTZ —
    # the engine's cross-engine timestamp contract (core/readconf.py).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def get_spark(
    app_name: str = "datarepo-spark",
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[Mapping[str, str]] = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = SparkSession.builder.appName(app_name).master(master)
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions)
    )
    for k, v in _DEFAULT_CONF.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.ui.enabled", "false")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
