"""As-of join: for each left row, the latest right row at-or-before its
timestamp (backward) or earliest at-or-after (forward), per key.

The reference exposes this via polars ``join_asof`` (SURVEY.md §2B). Spark
has no native primitive; the scalable construction here is the union-and-
carry-forward trick:

    tag left/right rows, union them, and over a window
    (partitionBy key, orderBy ts with rights sorting before lefts at ties)
    take last(right_payload, ignorenulls=True)

One shuffle on the key, one window sort — O(n log n) per key, no
per-group Python (``pd.merge_asof`` via applyInPandas would materialize
whole groups in pandas), no range-bucket tuning. Ties among right rows at
the same timestamp are resolved arbitrarily, so carry *values that are
functions of the matched timestamp* (or make ts unique) when bit-exact
reproducibility matters.
"""

from __future__ import annotations

from typing import Literal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    payload: Column,
    payload_name: str = "asof_value",
    direction: Literal["backward", "forward"] = "backward",
) -> DataFrame:
    """Append ``payload_name`` (from the right side's ``payload`` expr) to
    every left row: the payload of the right row closest at-or-before
    (backward) / at-or-after (forward) the left row's ``left_on``, within
    the same ``by`` key. Left rows with no match get NULL."""
    left_cols = left.columns
    payload_type = _payload_type(right, payload)
    lefts = left.select(
        "*",
        F.col(left_by).alias("__k"),
        F.col(left_on).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    rights_padded = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        F.col(right_by).alias("__k"),
        F.col(right_on).alias("__ts"),
        F.lit(0).alias("__is_left"),
        payload.alias("__payload"),
    )
    unioned = lefts.unionByName(rights_padded)

    if direction == "backward":
        # Rights sort before lefts at equal ts → an exactly-equal right row
        # is visible (>= semantics); last() carries the newest prior value.
        w = (
            Window.partitionBy("__k")
            .orderBy(F.asc("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.desc("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    filled = unioned.withColumn(
        payload_name, F.last("__payload", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *left_cols, payload_name
    )


def _payload_type(right: DataFrame, payload: Column) -> str:
    return right.select(payload.alias("p")).schema.fields[0].dataType.simpleString()
