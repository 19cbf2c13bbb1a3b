"""Runtime SQL confs that pin parquet timestamp semantics.

The engine's timestamp contract: a parquet TIMESTAMP column — whether
annotated isAdjustedToUTC or not, µs or ns — always surfaces as Spark
TIMESTAMP (LTZ) whose underlying micros equal the stored value interpreted
as a UTC instant. That is exactly how DuckDB's naive TIMESTAMP behaves in
the oracle, so epoch extraction (`unix_micros`) and window bucketing agree
bit-for-bit across engines and across whatever session timezone the caller
runs under.

Two Spark 4 defaults break that contract, so every read path calls
:func:`apply_parquet_read_compat` before building its reader:

  - ``spark.sql.parquet.inferTimestampNTZ.enabled`` (default true) reads
    un-adjusted parquet timestamps as TIMESTAMP_NTZ, on which epoch
    functions like ``unix_micros`` refuse to resolve.
  - INT64 TIMESTAMP(NANOS) columns are rejected outright unless
    ``spark.sql.legacy.parquet.nanosAsLong`` lets them through as raw
    longs (converted back at the table layer).

Both are runtime-settable SQL confs, so this works on a caller-provided
SparkSession (the correctness driver's, a notebook's) without rebuilding it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_READ_COMPAT = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def apply_parquet_read_compat(spark: SparkSession) -> None:
    """Idempotently pin the parquet-read confs on ``spark``."""
    for key, value in _READ_COMPAT.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A cluster may mark one of these static or removed; the read
            # then proceeds under session defaults rather than failing here.
            pass
