"""Sequence packing: lay tokenized documents into fixed-size context
windows for LLM training.

The standard pretraining data layout (GPT-style) concatenates the
tokenized corpus and splits it into fixed ``window``-token blocks;
documents may cross block boundaries. A global concatenation is a
serial order — useless at 100 TB — so the corpus is first sharded by a
deterministic key hash and the concat-and-split runs independently
per shard (exactly how distributed training pipelines shard their
tokenized corpus; each shard's packs feed one data-loader stream).

Everything is relational — one shuffle (the per-shard running-sum
window), then a zero-shuffle explode:

  1. ``shard = floor(u * n_shards)`` from the same sha256 variate the
     split/sample operators use (``sampling.hash_fraction``):
     reproducible across engines and cluster sizes, no RNG;
  2. per shard, order by the key column and take the running token sum
     — each document occupies the half-open token interval
     ``[end - n_tokens, end)`` of its shard's virtual concatenation;
  3. the document's interval overlaps packs ``floor(start/window)`` ..
     ``floor((end-1)/window)`` — ``explode(sequence(...))`` emits one
     row per (document, pack) with the token count and offset each
     pack takes.

Zero-token documents occupy no interval and emit no rows (callers
keep them via the quality gate, not the packer). A document longer
than ``window`` simply spans multiple packs — nothing truncates.

Skew note: shards are hash-uniform so the window state per shard is
corpus_tokens / n_shards; size ``n_shards`` so one shard's rows fit an
executor (the same knob as shuffle partitions). The text column is
never carried past the token count — only (key, n_tokens) enters the
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import HASH_BITS, hash_fraction
from .text import WS_TOKEN_RE, token_count


def shard_of(key: Column, n_shards: int, salt: str = "pack") -> Column:
    """Deterministic shard in [0, n_shards) from the sha256 variate."""
    return F.floor(hash_fraction(key, salt) * n_shards).cast("int")


def pack_sequences(
    df: DataFrame,
    key_col: str,
    window: int,
    n_shards: int = 64,
    text_col: str = "text",
    token_col: str | None = None,
    salt: str = "pack",
) -> DataFrame:
    """Assign documents to fixed-``window`` training packs.

    Returns one row per (document, pack) it occupies:
      key_col           the document key
      shard             deterministic shard id
      pack_id           pack index within the shard (0-based)
      n_tokens          the document's whitespace-token count
      tokens_in_pack    how many of its tokens land in this pack
      pack_offset       where they start within the pack

    ``token_col``: use a precomputed token-count column instead of
    tokenizing ``text_col``.
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    key = F.col(key_col)
    toks = (
        F.col(token_col).cast("long")
        if token_col
        else token_count(F.col(text_col), WS_TOKEN_RE).cast("long")
    )
    base = df.select(
        key.alias(key_col),
        shard_of(key, n_shards, salt).alias("shard"),
        toks.alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    w = (
        Window.partitionBy("shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = base.select(
        key_col,
        "shard",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("tok_end"),
    ).withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))

    W = F.lit(int(window)).cast("long")
    first_pack = F.floor(F.col("tok_start") / W)
    last_pack = F.floor((F.col("tok_end") - 1) / W)
    exploded = spans.select(
        key_col,
        "shard",
        "n_tokens",
        "tok_start",
        "tok_end",
        F.explode(F.sequence(first_pack, last_pack)).alias("pack_id"),
    )
    pack_lo = F.col("pack_id") * W
    pack_hi = pack_lo + W
    begin = F.greatest(F.col("tok_start"), pack_lo)
    end = F.least(F.col("tok_end"), pack_hi)
    return exploded.select(
        key_col,
        "shard",
        F.col("pack_id").cast("long").alias("pack_id"),
        "n_tokens",
        (end - begin).cast("long").alias("tokens_in_pack"),
        (begin - pack_lo).cast("long").alias("pack_offset"),
    )


def pack_summary(packed: DataFrame, window: int) -> DataFrame:
    """Per-pack fill statistics from :func:`pack_sequences` output:
    (shard, pack_id, n_docs, tokens, fill_ratio). The final pack of a
    shard is the only one allowed to be under-full — every other pack
    is exactly ``window`` tokens by construction."""
    return packed.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens_in_pack").alias("tokens"),
        (
            F.sum("tokens_in_pack") / F.lit(float(window))
        ).alias("fill_ratio"),
    )


def sql_shard_of(key_expr: str, n_shards: int, salt: str = "pack") -> str:
    """DuckDB equivalent of :func:`shard_of` (oracle construction)."""
    from .sampling import sql_hash_fraction

    return (
        f"CAST(FLOOR({sql_hash_fraction(key_expr, salt)} * {n_shards})"
        f" AS INT)"
    )
