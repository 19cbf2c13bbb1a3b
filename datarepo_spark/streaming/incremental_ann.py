"""Streaming ANN-index maintenance: continuously-arriving embeddings
append into the persisted IVF(-PQ) index exactly once.

The vector twin of :mod:`.incremental_dedup`: each micro-batch of
(id, embedding) rows assigns against the STORED centroids (no silent
re-clustering), encodes with the stored PQ codebooks when present, and
lands in the cell-partitioned index table — immediately visible to
:func:`~datarepo_spark.functions.ann_index.query_ann_index` through the
ordinary Delta snapshot. The epoch id threads the idempotent-writer
ledger through the Delta append AND stamps the drift-stats sidecar file
deterministically, so a crash-replayed epoch neither duplicates vectors
nor double-counts the statistics `index_health` audits.

Why foreachBatch: the assignment is an Arrow-batched mapInPandas over a
plain DataFrame — inside foreachBatch it is the exact (tested) batch
code path, and the maintenance write needs multi-table-file atomicity
(data + sidecar) that a continuous sink does not offer. The streaming
engine holds no state; all persistence is the index itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def append_stream_to_ann_index(
    stream: DataFrame,
    uri: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_name: str = "ann-index-append",
    **trigger_kwargs,
):
    """Run the append loop as a streaming query (availableNow by
    default); returns the started StreamingQuery. The target index must
    already exist (built by
    :func:`~datarepo_spark.functions.ann_index.build_ann_index` — an
    append cannot invent centroids)."""
    from . import checkpoint_txn_identity
    from ..functions.ann_index import append_to_ann_index

    # the txn app id binds to the CHECKPOINT, which defines epoch
    # numbering — a new stream with a fresh checkpoint restarts epochs
    # at 0, and a bare query_name would classify its batches as
    # replays of the old stream's epochs and silently drop them. The
    # path is normalized so equivalent spellings keep one identity.
    txn_app = checkpoint_txn_identity(query_name, checkpoint_dir)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_ann_index(
            batch_df.sparkSession,
            batch_df,
            uri,
            vec_col=vec_col,
            id_col=id_col,
            txn_app_id=txn_app,
            txn_version=int(epoch_id),
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
