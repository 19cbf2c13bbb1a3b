"""Persisted ANN index: the production layout for similarity search.

Query-time IVF (``similarity_ann_ivf``) re-assigns the whole corpus per
query — fine for a one-off, wrong for a serving path. The production
shape is an INDEX TABLE: the corpus IVF-assigned once and written as a
Delta table **partitioned by cell**, centroids stored beside the log.
A query then resolves its nprobe nearest cells driver-side and reads
ONLY those partition directories — at 100 TB and nlist=4096, a search
touches nprobe/4096 of the data through ordinary partition pruning,
with Delta add.stats skipping inside each cell for any extra
predicate. This is FAISS's IVF layout re-expressed as a lakehouse
table (and what vector-lake systems like LanceDB do structurally).

The index is a normal Delta table: appendable (new vectors assign to
cells with the SAME stored centroids — no silent re-clustering),
vacuumable, time-travelable. Centroids live under ``_ann_index/`` in
the table directory (underscore-prefixed paths are metadata by lake
convention; vacuum ignores them).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.filters import Filter
from .ivf import IVFIndex
from .similarity import knn_brute_force

_CENTROID_REL = os.path.join("_ann_index", "centroids.parquet")


def build_ann_index(
    spark: SparkSession,
    df: DataFrame,
    uri: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    iterations: int = 8,
    sample_size: Optional[int] = 4096,
) -> IVFIndex:
    """Fit IVF centroids (sampled, deterministic), assign the corpus,
    and write the (id, vector, cell) table partitioned by cell.
    Returns the fitted index (also persisted for :func:`load_ann_index`)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..tables.delta_writer import write_delta

    uri = uri.rstrip("/")
    index = IVFIndex.fit(
        df,
        vec_col=vec_col,
        id_col=id_col,
        k=nlist,
        iterations=iterations,
        sample_size=sample_size,
    )
    assigned = index.assign(df, vec_col=vec_col, id_col=id_col, nprobe=1)
    write_delta(
        assigned, uri, partition_by=["cell"], checkpoint_interval=None
    )
    cpath = os.path.join(uri, _CENTROID_REL)
    os.makedirs(os.path.dirname(cpath), exist_ok=True)
    cents = np.asarray(index.centroids, dtype=np.float64)
    pq.write_table(
        pa.table(
            {
                "cell": pa.array(range(len(cents)), pa.int32()),
                "centroid": pa.array(
                    [list(map(float, c)) for c in cents],
                    pa.list_(pa.float64()),
                ),
            }
        ),
        cpath,
    )
    return index


def load_ann_index(uri: str) -> IVFIndex:
    """Rehydrate the stored centroids into an :class:`IVFIndex`."""
    import numpy as np
    import pyarrow.parquet as pq

    table = pq.read_table(os.path.join(uri.rstrip("/"), _CENTROID_REL))
    rows = sorted(
        zip(table["cell"].to_pylist(), table["centroid"].to_pylist())
    )
    return IVFIndex(np.array([c for _, c in rows], dtype=np.float64))


def append_to_ann_index(
    spark: SparkSession,
    df: DataFrame,
    uri: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Add new vectors: assign with the STORED centroids (the index's
    geometry must not drift under appends) and append to the table."""
    from ..tables.delta_writer import write_delta

    index = load_ann_index(uri)
    assigned = index.assign(df, vec_col=vec_col, id_col=id_col, nprobe=1)
    return write_delta(
        assigned, uri, partition_by=["cell"], checkpoint_interval=None
    )


def query_ann_index(
    spark: SparkSession,
    uri: str,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by cosine: resolve the nprobe nearest cells driver-side
    (k × d matmul on the stored centroids), read ONLY those partitions
    through the Delta table's partition pruning, exact re-rank inside."""
    from ..tables.delta_table import DeltalakeTable

    index = load_ann_index(uri)
    cells = index.probe_cells(list(query_vec), nprobe)
    table = DeltalakeTable(os.path.basename(uri.rstrip("/")), uri)
    candidates = table(
        filters=[Filter("cell", "in", cells)], spark=spark
    )
    return knn_brute_force(
        candidates, list(query_vec), k, vec_col, id_col
    )
