"""Multimodal (image/audio/video) column plumbing.

Design: media travels as an opaque ``binary`` column plus a typed metadata
struct — the standard lakehouse shape (content-addressed blobs inline for
small assets, object-store pointers for large ones). Everything
Spark-side — schema, partitioning, Arrow batch shape, UDF signatures — is
real and tested; only the codec itself is stubbed because this container
has no image/audio libraries.

The decode boundary is `mapInPandas`: per-partition Arrow batches in/out,
so the (future) real decoder amortizes library init per batch and the
pipeline shape is already the one a 1000-executor run needs. Decoders are
pluggable; the deterministic fake lets tests assert end-to-end behavior.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 32

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def documents_as_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-data adapter: wrap a text corpus as binary media rows so the
    multimodal plumbing has real bytes to move (utf-8 payload standing in
    for image bytes; metadata derived deterministically)."""
    content = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col("doc_id").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.length(F.col(text_col)) % 640).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 480).cast("int").alias("height"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(content: bytes) -> "object":
    """Real decoder — requires an imaging library that is not in this
    container. The Spark pipeline never calls it unless a real decoder is
    plugged into :func:`extract_features`."""
    raise NotImplementedError(
        "Image decoding requires an imaging library (e.g. Pillow/opencv); "
        "not available in this environment. Plug a decoder into "
        "extract_features(decoder=...)."
    )


def fake_feature_decoder(content: bytes) -> list[float]:
    """Deterministic stand-in decoder: sha256-seeded byte histogram folded
    to FEATURE_DIM buckets, L1-normalized. Stable across runs/engines, so
    tests can assert values, and shaped like a real embedding."""
    if content is None:
        return [0.0] * FEATURE_DIM
    buckets = [0] * FEATURE_DIM
    for b in content:
        buckets[b % FEATURE_DIM] += 1
    digest = hashlib.sha256(content).digest()
    salt = [d / 255.0 for d in digest[:FEATURE_DIM]]
    total = float(sum(buckets)) or 1.0
    return [buckets[i] / total + salt[i] * 1e-6 for i in range(FEATURE_DIM)]


def extract_features(
    df: DataFrame,
    decoder: Optional[Callable[[bytes], list[float]]] = None,
    batch_limit: int = 1024,
) -> DataFrame:
    """Decode + featurize media via mapInPandas (Arrow-batched).

    The iterator-of-batches shape is the important part: a real decoder
    initializes its library once per partition, processes Arrow batches of
    ``batch_limit`` rows, and never materializes a partition at once —
    exactly the plumbing a 100 TB media crawl needs."""
    decode = decoder or fake_feature_decoder

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "features": [
                            decode(c) for c in chunk["content"]
                        ],
                        "n_bytes": [
                            len(c) if c is not None else 0
                            for c in chunk["content"]
                        ],
                    }
                )

    return df.select("media_id", "content").mapInPandas(
        per_batch, schema=FEATURES_SCHEMA
    )


def frame_sample(
    df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' over opaque media bytes: emit evenly spaced binary
    slices (stand-in for video frame extraction; the slicing/explode
    plumbing — one row in, N typed rows out — is the real part)."""
    frame_idx = F.sequence(
        F.lit(0),
        F.least(
            F.lit(max_frames - 1),
            (F.col("meta.n_bytes") / every_n_bytes).cast("int"),
        ),
    )
    return (
        df.select(
            "media_id",
            F.explode(frame_idx).alias("frame_no"),
            F.col("content"),
        )
        .select(
            "media_id",
            "frame_no",
            F.expr(
                f"substring(content, frame_no * {every_n_bytes} + 1, "
                f"{every_n_bytes})"
            ).alias("frame_bytes"),
        )
    )
