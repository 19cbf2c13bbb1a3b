"""Streaming incremental dedup: admit only corpus-novel documents.

The live-path composition of the persisted dedup index
(:mod:`..functions.dedup_index`) with Structured Streaming: each
micro-batch of incoming documents probes the index, rows near-duplicate
to anything already accepted are dropped, the survivors land in the
curated Delta table AND join the index — so batch N+1 automatically
dedups against batch N's admissions. This is the self-maintaining
ingestion loop every production training-data pipeline runs.

Why foreachBatch rather than a pure streaming join: the MinHash
signature is a per-document aggregate over exploded shingles, which a
continuous streaming plan would have to express as a watermarked
aggregation feeding a stream-static join — legal but stateful and
awkward. Inside foreachBatch the micro-batch is a plain DataFrame, the
probe is the exact batch code path (one plan, already tested), and the
epoch id threads the idempotent-writer ledger through BOTH the curated
sink and the index append, so a crash-replayed epoch is swallowed
everywhere instead of double-admitting.

State: none in the streaming engine (the query is stateless); all
persistence lives in the Delta tables. Exactly-once: write_delta's txn
ledger per (query id, epoch).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def admit_novel_documents(
    batch: DataFrame,
    index_uri: str,
    out_uri: str,
    threshold: float = 0.7,
    epoch_id: Optional[int] = None,
    query_name: str = "incremental-dedup",
) -> int:
    """One micro-batch (or one backfill chunk) of the loop: probe →
    drop near-dups of the indexed corpus → exact-dedup within the batch
    → append survivors to ``out_uri`` and to the index. Returns the
    number of admitted rows. Idempotent per (query_name, epoch_id)."""
    from ..functions.dedup import content_key, dedup_scope
    from ..functions.dedup_index import (
        _load_meta,
        append_to_dedup_index,
        dedup_against_index,
    )
    from ..tables.delta_writer import write_delta

    spark = batch.sparkSession
    meta = _load_meta(index_uri)
    id_col, text_col = meta["id_col"], meta["text_col"]
    # dedup_scope: the probe's internal persists are released when this
    # micro-batch finishes — a long-running stream must not accrete one
    # cache per epoch
    with dedup_scope():
        # estimate-mode probe: the corpus TEXT is never read — the
        # stream only touches the (tiny) bucket + signature tables
        dup_ids = dedup_against_index(
            spark, batch, index_uri, threshold=threshold, verify="estimate"
        ).select(F.col("batch_id").alias(id_col)).distinct()
        survivors = batch.join(dup_ids, id_col, "left_anti")
        # within-batch exact dedup (a batch can carry its own repeats):
        # keep the min id per content key — deterministic under replay
        keyed = survivors.withColumn("__ck", content_key(F.col(text_col)))
        winners = keyed.groupBy("__ck").agg(F.min(id_col).alias(id_col))
        admitted = keyed.join(
            F.broadcast(winners), ["__ck", id_col], "left_semi"
        ).drop("__ck")
        admitted = admitted.persist()  # feeds count + sink + index
        try:
            n = admitted.count()
            txn = (
                {"txn_app_id": query_name, "txn_version": int(epoch_id)}
                if epoch_id is not None
                else {}
            )
            write_delta(
                admitted, out_uri, checkpoint_interval=None, **txn
            )
            if n:
                append_to_dedup_index(
                    spark,
                    admitted,
                    index_uri,
                    **(
                        {
                            "txn_app_id": query_name + "-index",
                            "txn_version": int(epoch_id),
                        }
                        if epoch_id is not None
                        else {}
                    ),
                )
        finally:
            admitted.unpersist()
    return n


def dedup_stream_against_index(
    stream: DataFrame,
    index_uri: str,
    out_uri: str,
    checkpoint_dir: str,
    threshold: float = 0.7,
    query_name: str = "incremental-dedup",
    **trigger_kwargs,
):
    """Run the admission loop as a streaming query (availableNow by
    default); returns the started StreamingQuery."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        admit_novel_documents(
            batch_df,
            index_uri,
            out_uri,
            threshold=threshold,
            epoch_id=epoch_id,
            query_name=query_name,
        )

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if trigger_kwargs:
        writer = writer.trigger(**trigger_kwargs)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
