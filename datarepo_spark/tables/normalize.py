"""Schema normalization: missing-column tolerance, casting, column order.

Reference behavior (deltalake_table.py:389-422 _normalize_df, tested
test_deltalake_table.py:170-211): given a declared schema, a frame read
from heterogeneous files must come back with
  - missing columns added as typed NULLs,
  - every column cast to its declared type,
  - columns in declared-schema order (optionally a selected subset).

Spark's ``mergeSchema`` only widens the read schema; it does not reorder or
add absent columns, so normalization is an explicit select. It is a pure
projection — Catalyst collapses it into the scan, so it costs nothing at
any scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_df(
    df: DataFrame,
    schema: T.StructType,
    columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Normalize ``df`` to ``schema`` (order, types, missing→typed NULL)."""
    present = set(df.columns)
    wanted = list(columns) if columns is not None else [f.name for f in schema]
    by_name = {f.name: f for f in schema.fields}
    exprs = []
    for name in wanted:
        field = by_name.get(name)
        if field is None:
            raise ValueError(
                f"Column {name!r} not in declared schema "
                f"(schema has: {[f.name for f in schema.fields]})"
            )
        if name in present:
            exprs.append(F.col(name).cast(field.dataType).alias(name))
        else:
            exprs.append(F.lit(None).cast(field.dataType).alias(name))
    return df.select(*exprs)


def empty_normalized_df(spark: SparkSession, schema: T.StructType) -> DataFrame:
    """Empty frame with the exact declared schema (reference
    _empty_normalized_df, deltalake_table.py:377-386)."""
    return spark.createDataFrame([], schema)
