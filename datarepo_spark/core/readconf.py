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

Lifecycle contract: the mutation is deliberately PERSISTENT on the
session. Tables are lazy — the conf must still hold when the returned
DataFrame finally executes, which may be long after the table call — so
a set-and-restore scope around the read would silently break every
deferred collect. Callers who need the Spark 4 defaults back can call
:func:`restore_parquet_read_defaults`.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

logger = logging.getLogger(__name__)

_READ_COMPAT = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}

_SPARK4_DEFAULTS = {
    "spark.sql.legacy.parquet.nanosAsLong": "false",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
}


def apply_parquet_read_compat(spark: SparkSession) -> None:
    """Idempotently pin the parquet-read confs on ``spark`` (persistent
    for the session — see module docstring for why). A conf that cannot
    be set (static/removed on this cluster) is logged: the read then
    proceeds under session defaults, and NTZ/nanos columns may surface
    differently than the engine contract promises."""
    for key, value in _READ_COMPAT.items():
        try:
            spark.conf.set(key, value)
        except Exception as exc:
            logger.warning(
                "Could not set %s=%s (%s); parquet timestamp semantics "
                "may not match the engine contract on this session.",
                key, value, exc,
            )


def restore_parquet_read_defaults(spark: SparkSession) -> None:
    """Put the Spark 4 out-of-the-box values back — for callers embedding
    the engine in a session whose other workloads want NTZ inference.
    Only safe once every datarepo DataFrame has been fully consumed."""
    for key, value in _SPARK4_DEFAULTS.items():
        try:
            spark.conf.set(key, value)
        except Exception as exc:
            logger.warning("Could not restore %s (%s)", key, exc)
