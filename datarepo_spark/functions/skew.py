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

Salt determinism: the salt MUST be a deterministic function of row
content, never ``F.rand``. A random salt is re-rolled when a shuffle map
task is retried or speculatively re-executed; if some reducers already
fetched the first attempt's output, re-rolled salts route rows to
different (key, salt) partitions and matches are silently duplicated or
dropped. On a 1000-executor cluster task retry is routine, so a
rand-salt is a correctness defect, not a style issue. We derive the salt
as ``pmod(xxhash64(payload columns), salt)`` — payloads differ within a
hot key, so the spreading is the same, and identical full rows
collapsing to one salt is acceptable (they aggregate/join identically).

Spreading bound caveat: the 1/SALT reducer-share bound holds for keys
whose payloads are (mostly) DISTINCT. A hot key whose rows are exact
payload duplicates (e.g. a viral document ingested N times with
byte-identical content) collapses to ONE salt and is not spread. When
that shape is expected, pass ``salt_cols`` naming a per-row-unique
column (ingest offset, file path + row number, event id) — the salt
then hashes that column and the full 1/SALT bound is restored without
reintroducing nondeterminism.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _content_salt(
    df: DataFrame,
    exclude: Sequence[str],
    salt: int,
    salt_cols: Sequence[str] | None = None,
) -> Column:
    """Deterministic salt in [0, salt): hash of ``salt_cols`` when given
    (caller-designated per-row-unique columns — restores the 1/SALT bound
    even for duplicate-payload hot keys, module docstring), else of every
    column NOT in ``exclude`` (the grouping/join keys). Falling back to
    the full row if everything is excluded keeps the expression total;
    that degenerate case means each distinct key gets one salt, i.e. no
    spreading — the caller has no payload to spread by."""
    if salt_cols:
        cols = list(salt_cols)
    else:
        payload = [c for c in df.columns if c not in set(exclude)]
        cols = payload if payload else list(df.columns)
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt)).cast(
        "int"
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salt: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation for decomposable aggregates
    (sum/count/min/max — pass the partial expression in ``aggs``; the
    final phase re-applies sum for sums/counts, min/max for min/max based
    on the alias prefix).

    Phase 1 groups by (keys + random salt) so a hot key spreads over
    ``salt`` reducers; phase 2 merges the ``salt`` partials per key.
    ``aggs`` maps output name → phase-1 aggregate expression, where the
    name must start with sum_/count_/min_/max_ so the merge function is
    known. The salt is a deterministic content hash (module docstring) —
    safe under task retry/speculation, unlike ``F.rand``. For hot keys
    whose payloads duplicate exactly, pass ``salt_cols`` naming a
    per-row-unique column to restore the 1/SALT spreading bound."""
    salted = df.withColumn(
        "__salt", _content_salt(df, keys, salt, salt_cols)
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
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, explode the dim side
    ``salt``× with matching salts, join on (key, salt). Use when the dim
    is too big to broadcast outright but a hot fact key overwhelms one
    shuffle partition. Result columns = fact ⋈ dim as usual. The salt is
    a deterministic content hash (module docstring) — safe under task
    retry/speculation, unlike ``F.rand``. For hot keys whose payloads
    duplicate exactly, pass ``salt_cols`` naming a per-row-unique fact
    column to restore the 1/SALT spreading bound."""
    salted_fact = fact.withColumn(
        "__salt", _content_salt(fact, [on_fact], salt, salt_cols)
    )
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_fact.join(
        exploded_dim,
        (F.col(on_fact) == F.col(on_dim))
        & (salted_fact["__salt"] == exploded_dim["__salt"]),
    ).drop("__salt")
