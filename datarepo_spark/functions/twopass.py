"""Distributed global order statistics — prefix sum / row_number / NTILE
without a single-partition window.

The problem: ``SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`` with
no PARTITION BY plans as ONE task sorting and scanning the whole input
(Spark warns ``WindowExec: No Partition Defined``). Over a bounded
dimension frame that is fine; over anything data-scaled it is the
classic 100 TB scale-killer — a billion-row sort on a single core while
999 executors idle.

The fix is the textbook two-pass sample-sort scheme (the TeraSort /
parallel-prefix pattern; see also DuckDB's and Flink's parallel window
implementations — public knowledge, no code consulted):

  pass 1  ``repartitionByRange`` on the order key: contiguous,
          count-balanced key ranges, partition id ascending in key
          order (Spark's ``RangePartitioner`` guarantees both).
  local   one windowed pass PER PARTITION (``PARTITION BY __pid``) —
          every task sorts and scans only its own range.
  carry   per-partition totals form a frame of ``num_partitions`` rows
          (bounded: 32-2000, never data-scaled); an exclusive running
          sum over THAT tiny frame yields each partition's carry-in.
          This is the only unpartitioned window in the plan and its
          input is bounded by the partition count, not the data.
  pass 2  broadcast the carries back; global = local + carry.

Correctness requirements (both asserted by the property tests, neither
checkable cheaply at runtime):

* ``order_by`` must be a TOTAL order — it uniquely keys rows. Callers
  therefore operate at CELL grain (one row per distinct key), which is
  also what keeps pass 1's sort linear-in-cells. With ties the running
  sum at intermediate tied rows would be order-dependent in ANY
  engine; at cell grain the question cannot arise.
* The range-partitioned, pid-tagged frame is **persisted** before it
  fans out to the local-window and totals branches.
  ``RangePartitioner`` derives its boundary sample from a
  per-materialization seed, so two independent materializations of the
  same logical exchange could place boundaries differently and the two
  branches would disagree on ``__pid``. Exchange reuse usually
  prevents that, but "usually" is not a correctness argument — the
  persist pins one physical assignment. (The persist is linear,
  distributed, spillable — any exact global order statistic
  materializes comparable state.)

Plan invariant (pinned by tests/test_plans.py): every ``Window`` node
in a two-pass plan mentions ``__pid`` — either as its partition spec
(the local pass) or as the ordering of the bounded carry frame. No
window orders the corpus in one task.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _scoped_persist

OrderSpec = Union[str, Column]

__all__ = [
    "distributed_prefix_sum",
    "distributed_row_number",
    "distributed_ntile",
]


def _order_cols(order_by: Sequence[OrderSpec]) -> list[Column]:
    return [F.col(o) if isinstance(o, str) else o for o in order_by]


def _num_partitions(df: DataFrame, num_partitions: int | None) -> int:
    if num_partitions is not None:
        return max(1, int(num_partitions))
    return max(
        1, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    )


def _range_tagged(
    df: DataFrame, order_by: Sequence[OrderSpec], n: int
) -> DataFrame:
    """Range-partition on the order key and pin the partition ids.

    ``spark_partition_id()`` is evaluated in the post-shuffle stage, so
    the tag IS the range-partition index; the persist pins one boundary
    sample across every downstream branch (module docstring)."""
    tagged = df.repartitionByRange(n, *_order_cols(order_by)).withColumn(
        "__pid", F.spark_partition_id()
    )
    return _scoped_persist(tagged)


def distributed_prefix_sum(
    df: DataFrame,
    order_by: Sequence[OrderSpec],
    value_col: str | Sequence[str],
    *,
    out_col: str | Sequence[str],
    exclusive: bool = False,
    num_partitions: int | None = None,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """``SUM(value_col) OVER ([PARTITION BY partition_by] ORDER BY
    order_by ROWS UNBOUNDED PRECEDING [AND 1 PRECEDING])`` computed in
    two distributed passes.

    Returns ``df``'s columns plus ``out_col`` (same type as the sum of
    ``value_col``; the exclusive form's first row is a typed zero, not
    null — matching ``COALESCE(SUM(..) OVER (.. 1 PRECEDING), 0)``).
    ``partition_by`` + ``order_by`` must uniquely key the rows (cell
    grain).

    ``value_col``/``out_col`` accept parallel sequences: several
    running sums over the SAME order share one shuffle, one persist,
    and one window stage (e.g. a cumulative measure plus a running
    count = rank, the Pareto shape).

    ``partition_by`` is for FEW GIANT groups (a per-group ordinary
    window would hand each group to one task): the range partitioner
    splits on (groups, order), the local pass windows on (groups,
    __pid), and the carry frame holds one row per (group, touched
    range-partition) — <= n_groups + num_partitions - 1 rows, since a
    group's pids are contiguous. With MANY small groups use a plain
    partitioned window instead — every group already fits a task, and
    the carry frame (and its join) would scale with group count; for
    that reason the grouped carry join is AQE-planned, not
    force-broadcast."""
    vals = [value_col] if isinstance(value_col, str) else list(value_col)
    outs = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(vals) != len(outs):
        raise ValueError("value_col and out_col lengths differ")
    grp = list(partition_by) if partition_by else []
    n = _num_partitions(df, num_partitions)
    obs = _order_cols(order_by)
    sums = df.select(
        *[F.sum(v).alias(f"__s{i}") for i, v in enumerate(vals)]
    ).schema
    sum_types = [sums[f"__s{i}"].dataType for i in range(len(vals))]
    zeros = [F.lit(0).cast(t) for t in sum_types]
    tagged = _range_tagged(df, [*grp, *order_by], n)

    end = -1 if exclusive else 0
    w_local = (
        Window.partitionBy(*grp, "__pid")
        .orderBy(*obs)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    local = tagged.select(
        "*",
        *[
            F.coalesce(F.sum(v).over(w_local), z).alias(f"__local{i}")
            for i, (v, z) in enumerate(zip(vals, zeros))
        ],
    )

    # bounded frame: one row per (group x touched range partition) —
    # the carry window is per group over <= n pids by construction
    # (unpartitioned over <= n rows in the ungrouped form). Reads the
    # SAME persisted tag assignment as the local pass (map-side partial
    # aggregation collapses each partition to one row before shuffling).
    totals = tagged.groupBy(*grp, "__pid").agg(
        *[F.sum(v).alias(f"__ptot{i}") for i, v in enumerate(vals)]
    )
    w_carry = (
        Window.partitionBy(*grp)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = totals.select(
        *grp,
        "__pid",
        *[
            F.coalesce(F.sum(f"__ptot{i}").over(w_carry), z).alias(
                f"__carry{i}"
            )
            for i, z in enumerate(zeros)
        ],
    )

    if grp:
        # null-safe equality on the group keys: a null group is a
        # legitimate cell (SQL windows partition null into its own
        # group) and a plain equi-join would silently drop it
        right = carries
        for g in grp:
            right = right.withColumnRenamed(g, f"__r_{g}")
        right = right.withColumnRenamed("__pid", "__r_pid")
        cond = F.col("__pid") == F.col("__r_pid")
        for g in grp:
            cond = cond & F.col(g).eqNullSafe(F.col(f"__r_{g}"))
        out = local.join(right, cond).drop(
            "__r_pid", *[f"__r_{g}" for g in grp]
        )
    else:
        out = local.join(F.broadcast(carries), ["__pid"])
    for i, (o, t) in enumerate(zip(outs, sum_types)):
        out = out.withColumn(
            o,
            (F.col(f"__local{i}") + F.col(f"__carry{i}")).cast(t),
        )
    return out.drop(
        "__pid",
        *[f"__local{i}" for i in range(len(vals))],
        *[f"__carry{i}" for i in range(len(vals))],
    )


def distributed_row_number(
    df: DataFrame,
    order_by: Sequence[OrderSpec],
    *,
    out_col: str = "rn",
    num_partitions: int | None = None,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """``ROW_NUMBER() OVER ([PARTITION BY partition_by] ORDER BY
    order_by)`` (1-based) as the inclusive distributed prefix sum of
    ones. ``partition_by`` + ``order_by`` must be a total order — with
    ties ROW_NUMBER is not well-defined in any engine, so requiring
    uniqueness loses nothing (and when tied rows are interchangeable
    for the downstream output, an output-column tiebreak restores
    determinism — the sample_neyman_allocation lesson)."""
    with_one = df.withColumn("__one", F.lit(1).cast("long"))
    out = distributed_prefix_sum(
        with_one,
        order_by,
        "__one",
        out_col=out_col,
        exclusive=False,
        num_partitions=num_partitions,
        partition_by=partition_by,
    )
    return out.drop("__one")


def distributed_ntile(
    df: DataFrame,
    order_by: Sequence[OrderSpec],
    n_tiles: int,
    *,
    out_col: str,
    num_partitions: int | None = None,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """``NTILE(n) OVER ([PARTITION BY partition_by] ORDER BY
    order_by)`` via the distributed row number and the closed form of
    SQL NTILE: with N rows and k tiles, ``q = N div k``,
    ``r = N mod k``, the first ``r`` tiles hold ``q+1`` rows — row
    ``i`` (0-based) lands in tile ``i div (q+1) + 1`` when
    ``i < r*(q+1)``, else ``r + (i - r*(q+1)) div q + 1``. Exact
    integer arithmetic (SQL ``DIV``), never a global window. In the
    grouped form N is each group's own row count (null-safe group
    join, like the prefix sum's carries)."""
    k = int(n_tiles)
    grp = list(partition_by) if partition_by else []
    rn = distributed_row_number(
        df,
        order_by,
        out_col="__rn",
        num_partitions=num_partitions,
        partition_by=partition_by,
    )
    if grp:
        totals = rn.groupBy(*grp).agg(
            F.count(F.lit(1)).cast("long").alias("__N")
        )
        right = totals
        for g in grp:
            right = right.withColumnRenamed(g, f"__r_{g}")
        cond = None
        for g in grp:
            c = F.col(g).eqNullSafe(F.col(f"__r_{g}"))
            cond = c if cond is None else (cond & c)
        j = rn.join(right, cond).drop(*[f"__r_{g}" for g in grp])
    else:
        total = rn.agg(F.count(F.lit(1)).cast("long").alias("__N"))
        j = rn.crossJoin(F.broadcast(total))
    j = (
        j.withColumn("__i", (F.col("__rn") - 1).cast("long"))
        .withColumn("__q", F.expr(f"__N DIV {k}"))
        .withColumn("__r", F.expr(f"__N % {k}"))
    )
    # q = 0 (N < k) puts every row in the first branch; the DIV-by-zero
    # in the unreached branch folds to null, never evaluated
    tile = (
        F.when(
            F.col("__i") < F.col("__r") * (F.col("__q") + 1),
            F.expr("__i DIV (__q + 1)"),
        ).otherwise(
            F.col("__r") + F.expr("(__i - __r * (__q + 1)) DIV __q")
        )
        + 1
    )
    return (
        j.withColumn(out_col, tile.cast("long"))
        .drop("__rn", "__i", "__q", "__r", "__N")
    )
