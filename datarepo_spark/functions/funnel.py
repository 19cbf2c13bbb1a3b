"""Event-sequence analytics: ordered funnels and cohort retention.

The event-analytics operators every warehouse bolts on (MATCH_RECOGNIZE
/ windowFunnel in ClickHouse, funnels in product-analytics engines),
expressed as plain aggregations so Catalyst plans them and the DuckDB
gate recomputes them exactly.

Funnel shape: stage k's earliest reach time is a conditional min over
events AFTER the user's stage-(k-1) time — k-1 aggregations and joins,
all keyed on the user column, so after the first shuffle every stage
reuses the same partitioning (ensure-requirements elides re-exchanges).
Nothing is ordered globally; there is no per-user sort.

Retention shape: two aggregates (first-activity week per user, distinct
active (user, week)) and one join — cohort size is a GROUP BY, never a
driver loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: Optional[int] = None,
) -> DataFrame:
    """Per user: the earliest timestamp each ordered stage is reached
    (stage k strictly after stage k-1; ``within_seconds`` additionally
    bounds every stage to that horizon after stage 1). Returns
    (user, stage_1_ts .. stage_k_ts, stages_completed); users who never
    reach stage 1 are absent."""
    stages = list(stages)
    if not stages:
        raise ValueError("funnel requires at least one stage")

    current = (
        df.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("stage_1_ts"))
    )
    for i, stage in enumerate(stages[1:], start=2):
        prev_col = f"stage_{i - 1}_ts"
        cond = F.col(ts_col) > F.col(prev_col)
        if within_seconds is not None:
            cond = cond & (
                F.col(ts_col)
                <= F.col("stage_1_ts")
                + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
            )
        nxt = (
            df.filter(F.col(type_col) == stage)
            .join(current, user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"stage_{i}_ts"))
        )
        current = current.join(nxt, user_col, "left")
    completed: Column = F.lit(0)
    for i in range(1, len(stages) + 1):
        completed = completed + F.when(
            F.col(f"stage_{i}_ts").isNotNull(), 1
        ).otherwise(0)
    return current.select(
        user_col,
        *[f"stage_{i}_ts" for i in range(1, len(stages) + 1)],
        completed.cast("int").alias("stages_completed"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_active): how many of each weekly
    signup cohort were active N weeks later — the retention matrix."""
    week = F.date_trunc("week", F.col(ts_col))
    cohorts = df.groupBy(user_col).agg(
        F.min(week).alias("cohort_week")
    )
    activity = df.select(
        F.col(user_col), week.alias("active_week")
    ).distinct()
    # calendar-day difference, not epoch seconds: under a DST-shifting
    # session timezone a week can be 604800±3600 s and the epoch form
    # mis-buckets; day arithmetic is timezone-shape-free and both weeks
    # are Monday-truncated so the difference is an exact multiple of 7
    offset = (
        F.datediff(F.col("active_week"), F.col("cohort_week"))
        / F.lit(7)
    ).cast("int")
    return (
        activity.join(cohorts, user_col)
        .select("cohort_week", offset.alias("week_offset"), user_col)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
    )
