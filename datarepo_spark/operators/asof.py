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
    direction: Literal["backward", "forward", "nearest"] = "backward",
    tolerance: float | int | None = None,
) -> DataFrame:
    """Append ``payload_name`` (from the right side's ``payload`` expr) to
    every left row: the payload of the right row closest at-or-before
    (backward) / at-or-after (forward) / closest in either direction
    (nearest; exact distance via epoch micros, ties prefer backward —
    pandas ``merge_asof`` semantics) the left row's ``left_on``, within
    the same ``by`` key. Left rows with no match get NULL.

    ``tolerance`` (pandas ``merge_asof(tolerance=...)`` parity): when
    set, a match farther than ``tolerance`` from the left timestamp is
    treated as NO match (NULL payload). Distances are exact integers —
    the unit is MICROSECONDS for timestamp keys, DAYS for date keys,
    the raw value for numeric keys — so the cut is engine-exact, never
    a float comparison. Zero cost when None; one extra carried column
    and a row-local compare when set."""
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

    if direction == "nearest":
        return _nearest(unioned, left_cols, payload_name, tolerance)
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
    if tolerance is not None:
        dist = _dist_fn(unioned)
        right_ts = F.when(F.col("__is_left") == 0, F.col("__ts"))
        filled = filled.withColumn(
            "__mts", F.last(right_ts, ignorenulls=True).over(w)
        )
        within = (
            F.abs(dist("__ts") - dist("__mts")) <= F.lit(tolerance)
        )
        filled = filled.withColumn(
            payload_name, F.when(within, F.col(payload_name))
        )
    return filled.filter(F.col("__is_left") == 1).select(
        *left_cols, payload_name
    )


def _dist_fn(unioned: DataFrame):
    """Exact integer distance basis for the '__ts' column: epoch micros
    for timestamps, epoch days for dates, the raw value otherwise."""
    ts_type = unioned.schema["__ts"].dataType.typeName()
    if ts_type in ("timestamp", "timestamp_ntz"):
        def dist(c):  # exact integer microseconds
            return F.unix_micros(F.col(c).cast("timestamp"))
    elif ts_type == "date":
        def dist(c):  # exact integer days
            return F.datediff(F.col(c), F.lit("1970-01-01").cast("date"))
    else:
        def dist(c):
            return F.col(c).cast("double")
    return dist


def _nearest(
    unioned: DataFrame,
    left_cols: list,
    payload_name: str,
    tolerance: float | int | None = None,
) -> DataFrame:
    """Nearest-in-either-direction: one exchange on the key, then two
    window sorts (asc carries the backward candidate, desc the forward
    one — the second Window re-sorts but does NOT re-shuffle, the
    hash partitioning is reused), then a row-local pick of the closer
    candidate. Distances are exact integers (epoch micros / days), so
    the tie rule (backward wins, as in pandas merge_asof) is exact.
    ``tolerance``: candidates farther than it are disqualified BEFORE
    the pick (a near forward candidate must win over an over-tolerance
    backward one, matching pandas), NULL when neither qualifies."""
    dist = _dist_fn(unioned)
    right_ts = F.when(F.col("__is_left") == 0, F.col("__ts"))
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__ts"), F.asc("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.desc("__ts"), F.asc("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        unioned.withColumn("__bpay", F.last("__payload", ignorenulls=True).over(wb))
        .withColumn("__bts", F.last(right_ts, ignorenulls=True).over(wb))
        .withColumn("__fpay", F.last("__payload", ignorenulls=True).over(wf))
        .withColumn("__fts", F.last(right_ts, ignorenulls=True).over(wf))
    )
    bdist = dist("__ts") - dist("__bts")
    fdist = dist("__fts") - dist("__ts")
    b_ok = F.col("__bts").isNotNull()
    f_ok = F.col("__fts").isNotNull()
    if tolerance is not None:
        b_ok = b_ok & (bdist <= F.lit(tolerance))
        f_ok = f_ok & (fdist <= F.lit(tolerance))
    pick_backward = b_ok & (~f_ok | (bdist <= fdist))  # tie -> backward
    return (
        filled.filter(F.col("__is_left") == 1)
        .withColumn(
            payload_name,
            F.when(pick_backward, F.col("__bpay"))
            .when(f_ok, F.col("__fpay")),
        )
        .select(*left_cols, payload_name)
    )


def _payload_type(right: DataFrame, payload: Column) -> str:
    return right.select(payload.alias("p")).schema.fields[0].dataType.simpleString()
