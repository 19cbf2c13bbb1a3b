"""Stream-stream and stream-static joins with bounded state.

The missing piece between windowed aggregation and stateful
sessionization: correlating TWO live streams (clicks↔impressions,
requests↔responses, orders↔shipments). Spark buffers both sides in the
state store until a match can be ruled out — unbounded without
watermarks — so the interval join here requires BOTH a watermark on each
side and a time-range join condition; together they give the state store
an eviction horizon (the same construction Flink calls an interval
join and the Structured Streaming docs call a stream-stream join with
event-time constraints).

At 100 TB/day the state bound is the whole story: with watermark W and
interval [lower, upper], each side retains at most (W + interval span)
of events per key — independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join events of two streams on ``key`` where
    ``right_ts ∈ [left_ts + lower, left_ts + upper]``.

    Column hygiene: every right-side column except the join key is
    suffixed ``_r`` so both event payloads survive. Works identically on
    batch DataFrames (watermarks are a no-op there), which is how the
    test gates it: the streamed result must equal the batch join
    bit-for-bit.

    ``how``: 'inner' or 'leftOuter' (outer emits unmatched left rows
    once their watermark window closes — only meaningful on streams)."""
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right
    rw = r.withWatermark(right_ts, watermark) if r.isStreaming else r

    renamed = rw
    for c in rw.columns:
        if c != key:
            renamed = renamed.withColumnRenamed(c, f"{c}_r")
    rts = f"{right_ts}_r"
    # explicit per-side column refs: both sides may derive from the same
    # source (self-join on a split stream), so string refs are ambiguous
    cond = (
        (lw[key] == renamed[key])
        & (
            F.col(rts)
            >= F.col(left_ts) + F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(rts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")
        )
    )
    joined = lw.join(renamed, cond, how)
    return joined.drop(renamed[key]) if how == "inner" else joined


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: the dim side is a batch DataFrame
    re-read per micro-batch and broadcast when small — no state store
    involved (static side is not buffered). The standard
    dimension-lookup shape for a live pipeline."""
    if dim.isStreaming:
        raise ValueError("dim must be a static (batch) DataFrame")
    return stream.join(F.broadcast(dim), on, how)
