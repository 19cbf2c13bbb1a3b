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


def _strip_nullability(dt: T.DataType) -> T.DataType:
    """Same type with every nested nullability flag set True — casting is
    about VALUES; a containsNull=false declared element type must not
    make the cast unresolvable against a nullable-element read schema
    (Spark refuses array<int,true> → array<int,false>)."""
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_strip_nullability(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _strip_nullability(dt.keyType),
            _strip_nullability(dt.valueType),
            True,
        )
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _strip_nullability(f.dataType), True)
                for f in dt.fields
            ]
        )
    return dt


def normalize_df(
    df: DataFrame,
    schema: T.StructType,
    columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Normalize ``df`` to ``schema`` (order, types, missing→typed NULL)."""
    present = set(df.columns)
    wanted = list(columns) if columns is not None else [f.name for f in schema]
    by_name = {f.name: f for f in schema.fields}
    read_types = dict(zip(df.schema.names, [f.dataType for f in df.schema]))
    exprs = []
    for name in wanted:
        field = by_name.get(name)
        if field is None:
            raise ValueError(
                f"Column {name!r} not in declared schema "
                f"(schema has: {[f.name for f in schema.fields]})"
            )
        if name in present:
            target = _strip_nullability(field.dataType)
            if _strip_nullability(read_types[name]) == target:
                exprs.append(F.col(name).alias(name))  # no-op cast elided
            else:
                exprs.append(F.col(name).cast(target).alias(name))
        else:
            exprs.append(F.lit(None).cast(field.dataType).alias(name))
    return df.select(*exprs)


def empty_normalized_df(spark: SparkSession, schema: T.StructType) -> DataFrame:
    """Empty frame with the exact declared schema (reference
    _empty_normalized_df, deltalake_table.py:377-386)."""
    return spark.createDataFrame([], schema)
