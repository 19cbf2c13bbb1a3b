"""Skew-mitigation utilities for hot keys.

AQE's skew-join splitting (on by default in session.py) handles most join
skew at runtime; these helpers cover the cases AQE can't re-plan:

  salted_agg       two-phase aggregation for a groupBy whose key
                   distribution has a few giant groups (a single reducer
                   would own the hot key's entire partition otherwise)
  salted_broadcast_left
                   replicate-and-salt pattern for joining a skewed fact
                   side against a small-but-not-tiny dim where broadcast
                   is borderline

At 100 TB a single hot key (empty string, null-ish sentinel, viral doc)
can hold a 1000-executor job hostage on one straggler task — salting
bounds any reducer's share of a key at 1/SALT of its rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for decomposable aggregates
    (sum/count/min/max — pass the partial expression in ``aggs``; the
    final phase re-applies sum for sums/counts, min/max for min/max based
    on the alias prefix).

    Phase 1 groups by (keys + random salt) so a hot key spreads over
    ``salt`` reducers; phase 2 merges the ``salt`` partials per key.
    ``aggs`` maps output name → phase-1 aggregate expression, where the
    name must start with sum_/count_/min_/max_ so the merge function is
    known."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    merged = []
    for name in aggs:
        if name.startswith(("sum_", "count_")):
            merged.append(F.sum(name).alias(name))
        elif name.startswith("min_"):
            merged.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            merged.append(F.max(name).alias(name))
        else:
            raise ValueError(
                f"Aggregate {name!r} must be prefixed sum_/count_/min_/max_ "
                "so the merge phase is well-defined (avg: derive from "
                "sum_+count_ after merging)"
            )
    return phase1.groupBy(*keys).agg(*merged)


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    on_fact: str,
    on_dim: str,
    salt: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, explode the dim side
    ``salt``× with matching salts, join on (key, salt). Use when the dim
    is too big to broadcast outright but a hot fact key overwhelms one
    shuffle partition. Result columns = fact ⋈ dim as usual."""
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_fact.join(
        exploded_dim,
        (F.col(on_fact) == F.col(on_dim))
        & (salted_fact["__salt"] == exploded_dim["__salt"]),
    ).drop("__salt")
