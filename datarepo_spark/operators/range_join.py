"""Range join: pair point rows with interval rows containing them —
``start <= point <= end`` (plus optional equi-keys) — without a nested loop.

The reference reaches this through polars ``join_where`` (inequality join,
SURVEY.md §2B "Join — cross / theta"). Spark plans a bare inequality join as
BroadcastNestedLoopJoin / CartesianProduct — O(n×m) row comparisons, which
is the single easiest way to kill a 100 TB job (10^10 × 10^8 candidate
pairs). The scalable construction is range bucketing:

    1. pick a bucket width w;
    2. explode each interval to the buckets it overlaps
       (floor(start/w) .. floor(end/w));
    3. tag each point with its single bucket floor(p/w);
    4. hash-equi-join on (equi_keys…, bucket) — Catalyst plans a normal
       shuffled/broadcast hash join;
    5. re-check the exact predicate as a post-join filter.

Each point lives in exactly one bucket, so a (point, interval) pair meets
at most once — no dedup pass needed. Cost: the interval side grows by its
average span/w (pick w ≈ the median interval length so the blow-up is
~2×), and the join itself is a plain equi-join that shuffles on
(keys, bucket) — skew-handled by AQE, broadcastable when the interval side
is a dim. This is the same strategy Databricks' range-join optimization
applies from a hint; here it is an explicit, engine-independent operator.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    equi_keys: Optional[Sequence[tuple[str, str]]] = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_col <= end_col`` (and, if given, equality on each
    ``(point_side_col, interval_side_col)`` pair in ``equi_keys``).

    ``bucket_width`` must be > 0 and is the tuning knob: interval-side row
    blow-up is ``avg_interval_span / bucket_width + 1``. Columns from both
    inputs are preserved (equi-key columns once, from the point side).
    Only inner joins are supported — outer semantics over an exploded side
    would double-count unmatched rows.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if how != "inner":
        raise ValueError("range_join supports how='inner' only")
    equi = list(equi_keys or [])

    w = F.lit(float(bucket_width))
    ivals = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        _BUCKET, F.floor(F.col(point_col) / w).cast("long")
    )

    cond = pts[_BUCKET] == ivals[_BUCKET]
    for pk, ik in equi:
        cond = cond & (pts[pk] == ivals[ik])
    joined = pts.join(ivals, cond, "inner").filter(
        (ivals[start_col] <= pts[point_col])
        & (pts[point_col] <= ivals[end_col])
    )
    drop = [pts[_BUCKET], ivals[_BUCKET]] + [ivals[ik] for _, ik in equi]
    for c in drop:
        joined = joined.drop(c)
    return joined


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    equi_keys: Optional[Sequence[tuple[str, str]]] = None,
) -> DataFrame:
    """Join interval rows to interval rows that OVERLAP them —
    ``left_start <= right_end AND right_start <= left_end`` (plus optional
    equi-keys) — without a nested loop and without a dedup pass.

    Same bucketing strategy as :func:`range_join`, with one extra trick
    because BOTH sides explode: a pair of overlapping intervals shares
    every bucket in the overlap region, so a naive bucket-equi-join
    emits the pair once per shared bucket. Instead of deduplicating
    (an extra shuffle over the full result), each pair is CLAIMED by
    exactly one bucket — the bucket containing ``max(left_start,
    right_start)``. Overlap implies ``max(start) <= min(end)``, so that
    bucket is inside both intervals' bucket ranges: every overlapping
    pair is emitted exactly once, never deduplicated.

    Cost model: each side grows by ``avg_span / bucket_width + 1``; the
    join is a plain hash equi-join on (keys…, bucket) — AQE-skew-safe,
    broadcastable. Start/end columns must be numeric (cast dates to
    epoch days first). Inner join only, like :func:`range_join`.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    equi = list(equi_keys or [])
    w = F.lit(float(bucket_width))

    lb = left.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / w).cast("long"),
                F.floor(F.col(left_end) / w).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / w).cast("long"),
                F.floor(F.col(right_end) / w).cast("long"),
            )
        ),
    )
    cond = lb[_BUCKET] == rb[_BUCKET]
    for lk, rk in equi:
        cond = cond & (lb[lk] == rb[rk])
    joined = lb.join(rb, cond, "inner").filter(
        # exact overlap predicate
        (lb[left_start] <= rb[right_end])
        & (rb[right_start] <= lb[left_end])
        # pair-uniqueness: only the bucket owning max(start) emits
        & (
            lb[_BUCKET]
            == F.floor(
                F.greatest(lb[left_start], rb[right_start]) / w
            ).cast("long")
        )
    )
    drop = [lb[_BUCKET], rb[_BUCKET]] + [rb[rk] for _, rk in equi]
    for c in drop:
        joined = joined.drop(c)
    return joined


def auto_bucket_width(
    df: DataFrame, start_col: str, end_col: str, floor: float = 1.0
) -> float:
    """Pick a bucket width for :func:`range_join` /
    :func:`interval_overlap_join`: the median interval span (one
    percentile_approx aggregate — a single tiny job whose scalar feeds
    the plan as a literal). Median span ≈ 2× row blow-up on the
    exploded side, the documented sweet spot; ``floor`` guards
    degenerate all-zero-span inputs. The width is a TUNING knob, not a
    correctness input (any positive width yields identical results),
    so the approximate percentile is fine here."""
    row = df.select(
        F.percentile_approx(
            F.col(end_col) - F.col(start_col), 0.5
        ).alias("__m")
    ).head()
    m = row["__m"] if row and row["__m"] is not None else None
    return max(float(m), float(floor)) if m is not None else float(floor)
