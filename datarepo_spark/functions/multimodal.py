"""Multimodal (image/audio/video) column plumbing.

Design: media travels as an opaque ``binary`` column plus a typed metadata
struct — the standard lakehouse shape (content-addressed blobs inline for
small assets, object-store pointers for large ones). Everything
Spark-side — schema, partitioning, Arrow batch shape, UDF signatures — is
real and tested.

Codecs: this container has no imaging/audio libraries, so the real,
dependency-free decoders here cover the two classic trivially-parseable
containers — binary PPM (P6) images and PCM16 WAV audio — parsed from
bytes with stdlib ``struct`` + numpy. Heavier formats (JPEG/MP4/...)
plug into the same ``extract_features(decoder=...)`` seam.

The decode boundary is `mapInPandas`: per-partition Arrow batches in/out,
so a decoder amortizes library init per batch and the pipeline shape is
already the one a 1000-executor run needs. Decoders are pluggable; the
deterministic fake lets tests assert end-to-end behavior on arbitrary
bytes."""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
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


def documents_as_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Test-data adapter: wrap a text corpus as binary media rows so the
    multimodal plumbing has real bytes to move (utf-8 payload standing in
    for image bytes; metadata derived deterministically)."""
    content = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.length(F.col(text_col)) % 640).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 480).cast("int").alias("height"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


PPM_WIDTH = 8
PPM_HEIGHT = 8


def documents_as_ppm(
    df: DataFrame,
    text_col: str = "text",
    width: int = PPM_WIDTH,
    height: int = PPM_HEIGHT,
    id_col: str = "doc_id",
) -> DataFrame:
    """Test-data adapter producing REAL image bytes: each document
    becomes a valid binary PPM (P6) whose pixel data is the document's
    bytes repeated to ``width*height*3`` — so the decode stage parses an
    actual container format, and an SQL oracle can recompute the pixels
    from the text. Built entirely in Catalyst (string repeat/substring +
    utf-8 encode); callers should gate to single-byte (ASCII) documents
    so char positions equal byte positions."""
    need = width * height * 3
    filler = F.coalesce(F.nullif(F.col(text_col), F.lit("")), F.lit(" "))
    body = F.substring(
        F.repeat(filler, F.ceil(F.lit(need) / F.length(filler)).cast("int")),
        1,
        need,
    )
    header = F.lit(f"P6\n{width} {height}\n255\n")
    content = F.encode(F.concat(header, body), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_ppm(content: bytes) -> dict:
    """Parse a binary PPM (P6) image — magic, whitespace/comment-separated
    width/height/maxval, then raw RGB24 — with no imaging library.
    Returns {width, height, maxval, pixels: (h, w, 3) uint8 ndarray}."""
    import numpy as np

    if content is None or content[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = width * height * 3
    raw = content[pos : pos + need]
    if len(raw) < need:
        raise ValueError(
            f"PPM raster truncated: need {need} bytes, have {len(raw)}"
        )
    pixels = np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3)
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "pixels": pixels,
    }


def ppm_feature_decoder(content: bytes) -> list[float]:
    """Real image features from decoded PPM pixels: per-channel means
    (exact: integer sums / pixel count) plus dimensions. Deterministic
    across engines, so the DuckDB oracle recomputes it bit-for-bit."""
    img = decode_ppm(content)
    flat = img["pixels"].reshape(-1, 3).astype("int64")
    n = flat.shape[0]
    sums = flat.sum(axis=0)
    return [
        float(sums[0]) / n,
        float(sums[1]) / n,
        float(sums[2]) / n,
        float(img["width"]),
        float(img["height"]),
    ]


def encode_wav_pcm16(samples, sample_rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE writer (PCM16 mono) — fixture generator for the
    decode path; stdlib struct only."""
    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = b"RIFF" + _struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + _struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + _struct.pack("<I", len(data)) + data


def decode_wav(content: bytes) -> dict:
    """Parse RIFF/WAVE with PCM16 audio — walks the chunk list, reads
    'fmt ' and 'data'. Returns {sample_rate, n_channels, samples:
    int16 ndarray}."""
    import numpy as np

    if content is None or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (size,) = _struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = _struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _brate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "samples": samples,
    }


def wav_feature_decoder(content: bytes) -> list[float]:
    """Real audio features from decoded PCM16: duration, RMS, peak,
    zero-crossing count."""
    import numpy as np

    wav = decode_wav(content)
    s = wav["samples"].astype("float64")
    n = max(len(s), 1)
    rms = float(np.sqrt((s * s).sum() / n))
    crossings = (
        int((np.signbit(s[1:]) != np.signbit(s[:-1])).sum())
        if len(s) > 1
        else 0
    )
    return [
        len(s) / float(wav["sample_rate"]),
        rms,
        float(np.abs(s).max()) if len(s) else 0.0,
        float(crossings),
    ]


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

    # NOT spread_input-routed (r13 final): media-decode gate frames are
    # O(100) rows, where the extra exchange + 32 Arrow task setups
    # measured a 1.3-2x LOSS in a paired same-session A/B (spread on
    # 0.75 s vs off 0.43 s for the features query; audio 1.84 vs 0.92),
    # while a production media scan is multi-split so the helper
    # no-ops there anyway — the gram/tokenize corpus paths keep it.
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


def _pixels_to_ahash_bits(pixels, grid: int) -> list[int]:
    """aHash bits from a decoded (h, w, 3) uint8 raster: integer luma
    per pixel ((r+g+b)//3), average-pool to ``grid×grid`` cells (integer
    block sums // block size — exact), then bit i = cell_i > floor(mean
    of cells). All-integer, so an SQL oracle recomputes it bit-for-bit.
    Shared by the image and per-video-frame hashers so the two can never
    drift. Returns the grid² bits row-major."""
    if grid < 1 or grid * grid > 64:
        raise ValueError(
            f"grid must satisfy 1 <= grid*grid <= 64 (the signature "
            f"packs into one int64); got grid={grid}"
        )
    px = pixels.astype("int64")
    luma = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
    h, w = luma.shape
    if h % grid or w % grid:
        raise ValueError(
            f"image {w}x{h} not divisible into a {grid}x{grid} grid"
        )
    bh, bw = h // grid, w // grid
    pooled = (
        luma.reshape(grid, bh, grid, bw).sum(axis=(1, 3)) // (bh * bw)
    )
    mean = int(pooled.sum()) // (grid * grid)
    return [int(v > mean) for v in pooled.flatten()]


def average_hash_bits(content: bytes, grid: int = 8) -> list[int]:
    """Perceptual average-hash of a binary PPM — see
    :func:`_pixels_to_ahash_bits` for the (all-integer) construction."""
    return _pixels_to_ahash_bits(decode_ppm(content)["pixels"], grid)


def _bits_to_parts(bits: list[int]) -> tuple[str, int]:
    """(bitstring, signed 64-bit packing with bit i at position i)."""
    if len(bits) > 64:
        raise ValueError(
            f"{len(bits)} bits cannot pack into one int64 signature"
        )
    s = "".join("1" if b else "0" for b in bits)
    val = sum(b << i for i, b in enumerate(bits))
    if val >= 1 << 63:
        val -= 1 << 64
    return s, val


def _signature_hashes(
    df: DataFrame,
    bits_fn: Callable[[bytes], list[int]],
    out_col: str,
    with_bitstring: bool = True,
) -> DataFrame:
    """Shared Arrow-batched signature hasher behind the image/audio
    hashers: (media_id[, <out_col> bitstring], sh long) per media row.
    ``with_bitstring=False`` skips the per-row string build — the
    near-dup pair paths consume only the packed long, and Spark prunes
    mapInPandas INPUT columns, not Python-side output work."""
    fields = [T.StructField("media_id", T.LongType())]
    if with_bitstring:
        fields.append(T.StructField(out_col, T.StringType()))
    fields.append(T.StructField("sh", T.LongType()))
    schema = T.StructType(fields)

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_str, out_sh = [], []
            for c in pdf["content"]:
                s, val = _bits_to_parts(bits_fn(c))
                out_str.append(s)
                out_sh.append(val)
            cols = {"media_id": pdf["media_id"]}
            if with_bitstring:
                cols[out_col] = out_str
            cols["sh"] = out_sh
            yield pd.DataFrame(cols)

    # no spread_input here — see extract_features (r13 final: paired
    # A/B measured the repartition a loss on the O(100)-row gate
    # frames, and it is a no-op on any healthy multi-split media scan)
    return df.select("media_id", "content").mapInPandas(
        per_batch, schema=schema
    )


def image_hashes(
    df: DataFrame, grid: int = 8, with_bitstring: bool = True
) -> DataFrame:
    """(media_id, ahash bitstring, sh long) per media row — the decode
    runs Arrow-batched in mapInPandas; the 8-byte ``sh`` packing feeds
    banded hamming pair generation
    (:func:`~datarepo_spark.functions.dedup.hamming_band_pairs`)."""
    return _signature_hashes(
        df,
        lambda c: average_hash_bits(c, grid),
        "ahash",
        with_bitstring,
    )


def image_near_dup_pairs(
    df: DataFrame, max_hamming: int = 3, grid: int = 8
) -> DataFrame:
    """Image-level near-duplicate pairs: average-hash each media row
    (real decode) and band the 64-bit hashes — pigeonhole-complete for
    hamming ≤ ``max_hamming``, never a cross join. The multimodal twin
    of text SimHash dedup: at 100 TB of media, only the 8-byte hashes
    shuffle; image bytes never leave their scan tasks."""
    from .dedup import hamming_band_pairs

    hashed = image_hashes(df, grid, with_bitstring=False)
    return hamming_band_pairs(
        hashed,
        id_col="media_id",
        sig_col="sh",
        bits=grid * grid,
        max_hamming=max_hamming,
    )


def documents_as_wav(
    df: DataFrame,
    text_col: str = "text",
    sample_rate: int = 16000,
    limit_chars: int = 2000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Test-data adapter producing REAL audio bytes: each document's
    chars become PCM16 samples ((ord(c) - 110) * 256, so text crossing
    'n' crosses zero, clamped to int16 — codepoints ≥ 238 would
    otherwise overflow, wrapping silently on numpy<2 and raising on
    numpy≥2) wrapped in a valid RIFF/WAVE container — the decode stage
    walks an actual chunk list, and an SQL oracle can recompute the
    samples from the text (mirror the clamp: GREATEST(-32768,
    LEAST(32767, …)))."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = []
            for t in pdf[text_col]:
                t = (t or " ")[:limit_chars] or " "
                samples = [
                    max(-32768, min(32767, (ord(c) - 110) * 256))
                    for c in t
                ]
                contents.append(encode_wav_pcm16(samples, sample_rate))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "content": contents}
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    # no spread_input here — see extract_features (r13 final)
    return df.select(id_col, text_col).mapInPandas(
        per_batch, schema=schema
    )


VIDEO_MAGIC = b"PVID"


def documents_as_video(
    df: DataFrame,
    text_col: str = "text",
    n_frames: int = 4,
    width: int = PPM_WIDTH,
    height: int = PPM_HEIGHT,
    id_col: str = "doc_id",
) -> DataFrame:
    """Test-data adapter producing REAL multi-frame video bytes: a
    ``PVID`` container (magic, LE-u32 frame count, LE-u32 frame size)
    holding ``n_frames`` binary PPMs; frame f's raster is the document
    rotated by f characters, so frames differ deterministically and an
    SQL oracle can rebuild every frame. Built entirely in Catalyst.

    The container's fixed ``frame_size`` is in BYTES while frames are
    built from characters, so non-ASCII characters (2+ bytes in utf-8)
    are replaced with ``?`` up front — without this one 'é' would make
    a frame overrun its slot and shift every later frame boundary."""
    need = width * height * 3
    ascii_text = F.regexp_replace(F.col(text_col), r"[^\x00-\x7F]", "?")
    filler = F.coalesce(F.nullif(ascii_text, F.lit("")), F.lit(" "))
    ppm_header = f"P6\n{width} {height}\n255\n"
    frame_size = len(ppm_header) + need

    def frame(f: int) -> Column:
        rot = F.concat(
            F.substring(ascii_text, f + 1, 1 << 30),
            F.substring(ascii_text, 1, f),
        )
        rot = F.coalesce(F.nullif(rot, F.lit("")), filler)
        body = F.substring(
            F.repeat(
                rot, F.ceil(F.lit(need) / F.length(rot)).cast("int")
            ),
            1,
            need,
        )
        return F.encode(F.concat(F.lit(ppm_header), body), "utf-8")

    header = VIDEO_MAGIC + _struct.pack("<II", n_frames, frame_size)
    content = F.concat(
        F.lit(header), *[frame(f) for f in range(n_frames)]
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("video/x-pvid").alias("mime"),
            F.lit(n_frames).cast("int").alias("n_frames"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_video(content: bytes) -> list[dict]:
    """Walk a PVID container: magic, frame count, frame size, then that
    many equal-size binary-PPM frames — each decoded by
    :func:`decode_ppm`. Returns the decoded frames in order."""
    if content is None or content[:4] != VIDEO_MAGIC:
        raise ValueError("not a PVID payload")
    if len(content) < 12:
        raise ValueError("PVID truncated: header needs 12 bytes")
    n_frames, frame_size = _struct.unpack_from("<II", content, 4)
    frames = []
    pos = 12
    for _ in range(n_frames):
        chunk = content[pos : pos + frame_size]
        if len(chunk) < frame_size:
            raise ValueError(
                f"PVID truncated: frame needs {frame_size} bytes, "
                f"have {len(chunk)}"
            )
        frames.append(decode_ppm(chunk))
        pos += frame_size
    return frames


FRAME_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("ahash", T.StringType()),
        T.StructField("sh", T.LongType()),
    ]
)


def video_frame_hashes(df: DataFrame, grid: int = 8) -> DataFrame:
    """(media_id, frame_no, ahash, sh) per decoded frame — the video
    dedup primitive: per-frame perceptual hashes feed either exact
    frame-level joins or :func:`~datarepo_spark.functions.dedup.\
hamming_band_pairs` for near-dup frames; only 8-byte hashes leave the
    decode task, never frames. Frame hashing is the SAME
    :func:`_pixels_to_ahash_bits` the image path uses, so image and
    video hashes stay comparable."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, hashes, shs = [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                for fno, img in enumerate(decode_video(c)):
                    s, val = _bits_to_parts(
                        _pixels_to_ahash_bits(img["pixels"], grid)
                    )
                    ids.append(mid)
                    fnos.append(fno)
                    hashes.append(s)
                    shs.append(val)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_no": fnos,
                    "ahash": hashes,
                    "sh": shs,
                }
            )

    # no spread_input here — see extract_features (r13 final)
    return df.select("media_id", "content").mapInPandas(
        per_batch, schema=FRAME_HASH_SCHEMA
    )


def video_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    min_matched_frames: int = 2,
    grid: int = 8,
) -> DataFrame:
    """Video-level near-duplicate pairs: two videos are near-dups when
    ≥ ``min_matched_frames`` distinct frames of the lower-id video have
    SOME frame of the other within ``max_hamming`` of their perceptual
    hash — re-encodes, trims, and overlays move individual frame hashes
    a few bits, which per-frame banding absorbs, while distinct content
    matches nothing.

    Shape: per-frame hashes (decode task) → banded hamming frame pairs
    on a (video, frame) STRUCT key — so the frame-pair machinery is
    EXACTLY :func:`~datarepo_spark.functions.dedup.hamming_band_pairs`,
    never a cross join — → one aggregate counting distinct matched
    frames per video pair. Only 8-byte hashes and (video, frame) keys
    shuffle; frames never leave the decode task."""
    if min_matched_frames < 1:
        raise ValueError(
            f"min_matched_frames must be >= 1, got {min_matched_frames}"
        )
    from .dedup import hamming_band_pairs

    # STRUCT key, not arithmetic packing: (media_id, frame_no) structs
    # order lexicographically through the pair machinery, so frame
    # pairs come out (lo, hi) by video with zero collision risk —
    # arithmetic packing silently cross-attributed frames once
    # frame_no reached the multiplier, overflowed int64 on large ids,
    # and mis-divided negative (hash-derived) ids.
    fh = video_frame_hashes(df, grid).select(
        F.struct(
            F.col("media_id").alias("v"), F.col("frame_no").alias("f")
        ).alias("fid"),
        "sh",
    )
    frame_pairs = hamming_band_pairs(
        fh,
        id_col="fid",
        sig_col="sh",
        bits=grid * grid,
        max_hamming=max_hamming,
    )
    return (
        frame_pairs.select(
            F.col("id_a.v").alias("id_a"),
            F.col("id_b.v").alias("id_b"),
            F.col("id_a.f").alias("fa"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("fa").alias("matched_frames"))
        .filter(F.col("matched_frames") >= min_matched_frames)
    )


def audio_fingerprint_bits(samples, n_windows: int = 64) -> list[int]:
    """Energy-delta audio fingerprint (a Shazam-lite): split the PCM
    stream into ``n_windows`` integer-bounded windows, sum each
    window's s² energy (exact int64 — |s| ≤ 32768 ⇒ s² ≤ 2³⁰), and emit
    bit w = energy_w > energy_{w−1} (w = 1..n_windows−1, so
    ``n_windows−1`` bits). Time-shifts and re-encodes move a few
    window boundaries → a few bits; distinct audio decorrelates.
    All-integer, so an SQL oracle recomputes it bit-for-bit."""
    if n_windows < 2 or n_windows - 1 > 64:
        raise ValueError(
            f"n_windows must be in [2, 65] (bits pack into one int64); "
            f"got {n_windows}"
        )
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    n = len(s)
    sq = s * s  # |s| <= 32768 => s^2 <= 2^30, exact in int64
    bounds = [(w * n) // n_windows for w in range(n_windows + 1)]
    csum = np.concatenate(([0], np.cumsum(sq)))
    energies = [int(csum[bounds[w + 1]] - csum[bounds[w]]) for w in range(n_windows)]
    return [
        int(energies[w] > energies[w - 1]) for w in range(1, n_windows)
    ]


def audio_hashes(
    df: DataFrame, n_windows: int = 64, with_bitstring: bool = True
) -> DataFrame:
    """(media_id, afp bitstring, sh long) per audio row — decode runs
    Arrow-batched; the packed ``sh`` feeds
    :func:`~datarepo_spark.functions.dedup.hamming_band_pairs`."""
    return _signature_hashes(
        df,
        lambda c: audio_fingerprint_bits(
            decode_wav(c)["samples"], n_windows
        ),
        "afp",
        with_bitstring,
    )


def audio_near_dup_pairs(
    df: DataFrame, max_hamming: int = 3, n_windows: int = 64
) -> DataFrame:
    """Audio near-duplicate pairs: energy-delta fingerprints + banded
    hamming (pigeonhole-complete, never a cross join) — the audio
    member of the multimodal dedup family; only 8-byte fingerprints
    leave the decode task."""
    from .dedup import hamming_band_pairs

    return hamming_band_pairs(
        audio_hashes(df, n_windows, with_bitstring=False),
        id_col="media_id",
        sig_col="sh",
        bits=n_windows - 1,
        max_hamming=max_hamming,
    )


# -- pHash: fixed-point DCT perceptual hash ---------------------------------
#
# Classic pHash thresholds low-frequency DCT coefficients at their median.
# A float DCT is not bit-portable across engines (libm cos differs in the
# last ulp), so the transform here is FIXED-POINT: the cosine basis is
# rounded once to integers at 2^14 scale (the JPEG-style integer-DCT
# trick) and everything after is exact int64 arithmetic — the SQL oracle
# inlines the SAME table and recomputes the hash bit-for-bit.

DCT_SCALE = 1 << 14


def dct_cos_table(n: int = 8) -> list[list[int]]:
    """Integer DCT-II basis: C[u][x] = round(cos(pi*(2x+1)*u/(2n)) * 2^14).
    The ONE definition both the Python hasher and the SQL oracle use."""
    import math

    return [
        [
            round(math.cos(math.pi * (2 * x + 1) * u / (2 * n)) * DCT_SCALE)
            for x in range(n)
        ]
        for u in range(n)
    ]


def phash_bits(content: bytes, n: int = 8) -> list[int]:
    """Perceptual DCT hash of a binary PPM: integer luma raster (n x n),
    fixed-point 2D DCT (C @ L @ C^T, exact int64), drop the DC term,
    threshold the remaining n^2-1 coefficients at their exact median
    (strict >), pad with one 0 bit to n^2. Captures low-frequency
    structure aHash's plain mean-threshold misses (global brightness
    shifts flip aHash bits but barely move AC coefficients)."""
    import numpy as np

    px = decode_ppm(content)["pixels"].astype("int64")
    luma = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
    if luma.shape != (n, n):
        raise ValueError(
            f"phash_bits expects an {n}x{n} raster, got {luma.shape}"
        )
    c = np.asarray(dct_cos_table(n), dtype="int64")
    d = c @ luma @ c.T
    coeffs = d.flatten()[1:]  # row-major; [0] is the DC term
    med = int(np.sort(coeffs)[(len(coeffs) - 1) // 2])
    return [int(v > med) for v in coeffs] + [0]


def phash_hashes(
    df: DataFrame, n: int = 8, with_bitstring: bool = True
) -> DataFrame:
    """(media_id, phash bitstring, sh long) per media row — same
    Arrow-batched shape as :func:`image_hashes`; the packed ``sh``
    feeds banded hamming pair generation."""
    return _signature_hashes(
        df, lambda c: phash_bits(c, n), "phash", with_bitstring
    )


def phash_near_dup_pairs(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-duplicate pairs under the DCT hash — banded hamming,
    pigeonhole-complete, never a cross join (only 8-byte signatures
    shuffle)."""
    from .dedup import hamming_band_pairs

    hashed = phash_hashes(df, with_bitstring=False)
    return hamming_band_pairs(
        hashed, id_col="media_id", sig_col="sh", bits=64,
        max_hamming=max_hamming,
    )
