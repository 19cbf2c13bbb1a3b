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
_STATS_REL = os.path.join("_ann_index", "cell_stats.parquet")


def _aggregate_cell_stats(assigned_with_sim: DataFrame) -> dict[int, tuple[int, float]]:
    """{cell: (n, sum of (1 - cosine-to-centroid))} — a k-row aggregate;
    the residual mass per cell, computed distributed, collected tiny."""
    rows = (
        assigned_with_sim.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.lit(1.0) - F.col("__sim")).alias("sum_res"),
        )
        .collect()
    )
    return {int(r["cell"]): (int(r["n"]), float(r["sum_res"])) for r in rows}


def _write_cell_stats(uri: str, stats: dict[int, tuple[int, float, int, float]]) -> None:
    """Crash-atomic sidecar update (write + rename): a crash between the
    Delta commit and the stats write leaves the PREVIOUS stats intact
    rather than a torn file. Note: concurrent appenders still
    last-write-win on this sidecar — serialize index appends (they are
    maintenance operations), or the drift audit undercounts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cells = sorted(stats)
    path = os.path.join(uri.rstrip("/"), _STATS_REL)
    tmp = path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "cell": pa.array(cells, pa.int32()),
                "base_n": pa.array([stats[c][0] for c in cells], pa.int64()),
                "base_sum_res": pa.array(
                    [stats[c][1] for c in cells], pa.float64()
                ),
                "app_n": pa.array([stats[c][2] for c in cells], pa.int64()),
                "app_sum_res": pa.array(
                    [stats[c][3] for c in cells], pa.float64()
                ),
            }
        ),
        tmp,
    )
    os.replace(tmp, path)


def _read_cell_stats(uri: str) -> dict[int, tuple[int, float, int, float]]:
    import pyarrow.parquet as pq

    path = os.path.join(uri.rstrip("/"), _STATS_REL)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no cell_stats at {path}; index predates drift accounting — "
            f"rebuild with build_ann_index to enable index_health()"
        )
    t = pq.read_table(path)
    return {
        int(c): (int(bn), float(br), int(an), float(ar))
        for c, bn, br, an, ar in zip(
            t["cell"].to_pylist(),
            t["base_n"].to_pylist(),
            t["base_sum_res"].to_pylist(),
            t["app_n"].to_pylist(),
            t["app_sum_res"].to_pylist(),
        )
    }


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
    Also records per-cell baseline stats (count, residual mass) under
    ``_ann_index/`` so appends can be drift-audited by
    :func:`index_health`. Returns the fitted index (also persisted for
    :func:`load_ann_index`)."""
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
    assigned = index.assign(
        df, vec_col=vec_col, id_col=id_col, nprobe=1, with_sim=True
    ).persist()  # feeds both the staging write and the stats aggregate
    try:
        return _finish_build(
            spark, assigned, uri, index, nlist
        )
    finally:
        assigned.unpersist()


def _finish_build(spark, assigned, uri, index, nlist):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..tables.delta_writer import write_delta

    write_delta(
        assigned.drop("__sim"), uri, partition_by=["cell"],
        checkpoint_interval=None,
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
    base = _aggregate_cell_stats(assigned)
    _write_cell_stats(
        uri,
        {
            c: (n, s, 0, 0.0)
            for c, (n, s) in (
                {cell: base.get(cell, (0, 0.0)) for cell in range(nlist)}
            ).items()
        },
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
    geometry must not drift under appends) and append to the table.
    Per-cell appended counts + residual mass accumulate in the stats
    sidecar so :func:`index_health` can flag silent recall decay."""
    from ..tables.delta_writer import write_delta

    index = load_ann_index(uri)
    assigned = index.assign(
        df, vec_col=vec_col, id_col=id_col, nprobe=1, with_sim=True
    ).persist()  # one assignment pass feeds the write AND the stats
    try:
        version = write_delta(
            assigned.drop("__sim"), uri, partition_by=["cell"],
            checkpoint_interval=None,
        )
        try:
            stats = _read_cell_stats(uri)
        except FileNotFoundError:
            return version  # pre-accounting index: readable, no audit
        batch = _aggregate_cell_stats(assigned)
    finally:
        assigned.unpersist()
    for cell, (n, s) in batch.items():
        bn, br, an, ar = stats.get(cell, (0, 0.0, 0, 0.0))
        stats[cell] = (bn, br, an + n, ar + s)
    _write_cell_stats(uri, stats)
    return version


def index_health(
    uri: str,
    residual_ratio_threshold: float = 1.5,
    appended_fraction_threshold: float = 0.5,
    new_cell_mass_threshold: float = 0.5,
) -> dict:
    """Drift audit of a persisted ANN index — answers "has the appended
    data shifted away from the fitted centroids enough to decay
    recall?" without touching the vectors (reads only the k-row stats
    sidecar maintained by build/append).

    Signals:
    - ``appended_fraction``: share of the corpus assigned with stored
      (not refit) centroids. High → centroids describe a minority.
    - ``residual_ratio``: mean (1 - cosine-to-centroid) of appended
      rows over the baseline's. >1 → new vectors sit systematically
      farther from every centroid (distribution shift).
    - ``max_new_cell_mass``: largest single-cell share of the appended
      mass. ~1 → appends pile into one Voronoi cell (hot partition and
      a useless coarse quantizer for the new data).

    ``rebuild_recommended`` is True when any signal crosses its
    threshold; ``reasons`` names the ones that fired."""
    stats = _read_cell_stats(uri)
    base_n = sum(v[0] for v in stats.values())
    base_res = sum(v[1] for v in stats.values())
    app_n = sum(v[2] for v in stats.values())
    app_res = sum(v[3] for v in stats.values())

    appended_fraction = app_n / max(base_n + app_n, 1)
    base_mean = base_res / base_n if base_n else 0.0
    app_mean = app_res / app_n if app_n else 0.0
    residual_ratio = (
        app_mean / base_mean if base_n and app_n and base_mean > 0 else 1.0
    )
    max_new_cell_mass = (
        max(v[2] for v in stats.values()) / app_n if app_n else 0.0
    )

    reasons = []
    if appended_fraction > appended_fraction_threshold:
        reasons.append(
            f"appended_fraction {appended_fraction:.2f} > "
            f"{appended_fraction_threshold}"
        )
    if residual_ratio > residual_ratio_threshold:
        reasons.append(
            f"residual_ratio {residual_ratio:.2f} > "
            f"{residual_ratio_threshold}"
        )
    if app_n and max_new_cell_mass > new_cell_mass_threshold:
        reasons.append(
            f"max_new_cell_mass {max_new_cell_mass:.2f} > "
            f"{new_cell_mass_threshold}"
        )
    return {
        "base_n": base_n,
        "appended_n": app_n,
        "appended_fraction": round(appended_fraction, 6),
        "base_mean_residual": round(base_mean, 6),
        "appended_mean_residual": round(app_mean, 6),
        "residual_ratio": round(residual_ratio, 6),
        "max_new_cell_mass": round(max_new_cell_mass, 6),
        "rebuild_recommended": bool(reasons),
        "reasons": reasons,
    }


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
