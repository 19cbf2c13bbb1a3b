"""Connected components over an edge list — dedup clustering.

Near-dup detection emits PAIRS; a pipeline needs CLUSTERS (pick one
canonical doc per component, drop the rest). This is connected
components on the duplicate graph, the step Lee et al.'s dedup pipeline
and every production near-dup system run after LSH.

Algorithm: iterative min-label propagation (the relational form of
hash-to-min, cf. Rastogi et al., "Finding Connected Components in
Map-Reduce"). Each round every node adopts the minimum label in its
closed neighborhood; rounds needed = graph diameter ≤ O(log n) for the
clustery graphs dedup produces (components are near-cliques of
duplicates, so 2-3 rounds in practice). Each round is one join + one
aggregation ON THE EDGE LIST — the duplicate graph is ≪ the corpus
(only docs with a near-dup appear), so at 100 TB this loop touches
megabytes-to-gigabytes, never the documents.

The driver-side convergence check (`changed == 0`) is one count per
round on label-pair rows — the standard iterative-algorithm shape
(GraphX/Pregel do the same under the hood); data never collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component) for every node in ``edges``; the component id is
    the minimum node id reachable from it. Deterministic; raises if the
    diameter exceeds ``max_iterations`` (a dedup graph that deep means
    the edge generation is broken, not that more rounds are needed)."""
    # localCheckpoint (not persist): an iterative algorithm's lineage
    # nests one whole plan per round — by round ~10 the planner itself
    # OOMs on the tree. Checkpointing truncates the lineage so every
    # round plans against a materialized leaf. It also severs the (large)
    # edge-GENERATION subtree — from here on no stage re-reads the
    # corpus. (On a cluster, prefer reliable `checkpoint()` for
    # fault-tolerance on long jobs; local[] has no reliable store.)
    sc = edges.sparkSession.sparkContext
    par = max(sc.defaultParallelism, 1)
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .distinct()
        # bound the checkpointed partition count to the cluster's cores:
        # under a 200-shuffle-partition session every round would
        # otherwise run 200 near-empty tasks on a graph of dup pairs
        .coalesce(par)
        .localCheckpoint()
    )
    labels = sym.select(F.col("a").alias("id")).distinct().select(
        "id", F.col("id").alias("component")
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        # carry the previous label through the materialization so the
        # convergence check is a filter-count on the checkpointed rows —
        # not another join back to the old labels
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.col("component").alias("__old"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = updated.filter(
            F.col("component") != F.col("__old")
        ).count()
        labels = updated.drop("__old")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} "
        "iterations — edge generation is likely degenerate"
    )
