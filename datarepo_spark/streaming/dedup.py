"""Streaming deduplication — the live-path twin of the batch dedup family
(`functions/dedup.py`).

An ingestion stream (Kafka redeliveries, at-least-once sources, retried
uploads) duplicates records; exact dedup at 100 TB/day must bound its state
or die. Two tiers:

  - ``dedup_stream(within=...)``: ``dropDuplicatesWithinWatermark`` — keeps
    a key in the state store only until the watermark passes its event time
    plus the delay, so state is O(keys per watermark horizon), not O(all
    keys ever). The right tool when duplicates arrive close together in
    event time (redelivery storms), which is the overwhelmingly common
    case.
  - ``dedup_stream(within=None)``: plain ``dropDuplicates`` — exact across
    the whole stream but state grows forever; only for bounded key spaces.

Content-level dedup (hash of the payload rather than an id) composes by
adding the sha256 key column first, same construction as the batch
``exact_dedup``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    within: Optional[str] = "10 minutes",
) -> DataFrame:
    """Drop duplicate rows by ``key_cols`` from a streaming frame.

    ``within`` is the watermark delay bounding how far apart (in event
    time) two copies of a key can arrive and still be deduplicated — and
    therefore how much state the query holds. ``None`` switches to
    unbounded exact dedup (state never evicted).
    """
    keys = list(key_cols)
    if within is None:
        return stream.dropDuplicates(keys)
    return stream.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
        keys
    )


def dedup_stream_by_content(
    stream: DataFrame,
    content_col: str,
    ts_col: str = "ts",
    within: Optional[str] = "10 minutes",
) -> DataFrame:
    """Exact content dedup on a stream: sha256 the payload, dedup on the
    32-byte digest (the state store holds hashes, never payloads)."""
    hashed = stream.withColumn(
        "__ck", F.sha2(F.col(content_col).cast("string"), 256)
    )
    return dedup_stream(hashed, ["__ck"], ts_col, within).drop("__ck")
