"""Incremental view maintenance: a GROUP BY aggregate table kept in
sync with a Delta source by consuming its change feed — never
re-scanning the source.

``IncrementalAggregate`` maintains ``SELECT group_cols, COUNT(*) AS
n_rows, SUM(c) AS sum_c ... GROUP BY group_cols`` as a Delta table.
Each :meth:`advance` polls the source's :class:`DeltaChangeStream`,
folds the batch into per-group DELTAS (inserts count +1, deletes −1 —
COUNT and SUM are the self-maintainable aggregates; MIN/MAX are not
under deletes, which is why they are absent), and applies them with
one MERGE (upsert combined values, including groups that reach zero)
plus one DELETE of ``n_rows = 0`` groups.

Exactly-once across crash/replay without distributed transactions:
- both commits carry a SetTransaction (``app_id`` = the maintenance
  identity, versions ``2v`` and ``2v+1`` for source version ``v``), so
  a replayed MERGE is skipped off the ledger;
- the zero-group DELETE is derived from the DESTINATION's current
  state (``n_rows = 0`` rows), not recomputed from the batch — on
  replay it deletes exactly the rows a crashed run left behind, or
  nothing;
- the stream cursor advances only after both commits land.
Readers may observe a transient ``n_rows = 0`` row between the two
commits — filter or treat as absent (they are deleted in the same
advance call).

At scale this is the standard sketch of materialized-view maintenance
(self-maintainable aggregates over a delta stream): per-advance cost
tracks the CHANGE volume and the affected groups' files (merge_delta
rewrites only those), never the source or view size. Sums accumulate
in DECIMAL(38,6) so repeated incremental application is exactly equal
to a from-scratch recompute — float sums would drift by ordering.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.filters import Filter
from .delta_cdf import CHANGE_TYPE, DeltaChangeStream
from .delta_log import DeltaLog
from .delta_table import DeltalakeTable
from .delta_writer import delete_delta, merge_delta, write_delta


class IncrementalAggregate:
    def __init__(
        self,
        source_uri: str,
        dest_uri: str,
        checkpoint_path: str,
        group_cols: Sequence[str],
        sum_cols: Sequence[str] = (),
    ):
        if not group_cols:
            raise ValueError("group_cols must be non-empty")
        self.source_uri = source_uri.rstrip("/")
        self.dest_uri = dest_uri.rstrip("/")
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.stream = DeltaChangeStream(source_uri, checkpoint_path)
        self.app_id = f"ivm:{self.dest_uri}"

    # -- the maintained schema ------------------------------------------------

    def _with_group_key(self, df: DataFrame) -> DataFrame:
        """Append the surrogate merge key: a sha256 over the group tuple
        with an explicit NULL marker. GROUP BY treats NULL keys as one
        group, but every join in the maintenance path (and merge_delta's
        key match) is null-UNSAFE — merging on the raw group columns
        would append a fresh row for the NULL group on every advance.
        The surrogate is non-null by construction, so all keying is
        exact."""
        parts = []
        for c in self.group_cols:
            v = F.col(c).cast("string")
            # length-prefixed encoding: "v<len>:<value>" / "n:" — no
            # separator can be injected by a value, so distinct tuples
            # can never encode (and hash) identically
            parts.append(
                F.coalesce(
                    F.concat(F.lit("v"), F.length(v), F.lit(":"), v),
                    F.lit("n:"),
                )
            )
        return df.withColumn(
            "__group_key", F.sha2(F.concat(*parts), 256)
        )

    def _delta_frame(self, changes: DataFrame) -> DataFrame:
        sign = F.when(
            F.col(CHANGE_TYPE) == "insert", F.lit(1)
        ).otherwise(F.lit(-1))
        return self._with_group_key(changes).groupBy(
            "__group_key", *self.group_cols
        ).agg(
            F.sum(sign).cast("long").alias("n_rows"),
            *[
                F.sum(F.col(c).cast("decimal(38,6)") * sign)
                .cast("decimal(38,6)")
                .alias(f"sum_{c}")
                for c in self.sum_cols
            ],
        )

    def read(self, spark: SparkSession) -> Optional[DataFrame]:
        """The maintained aggregate (None before the first advance)."""
        if not os.path.isdir(os.path.join(self.dest_uri, "_delta_log")):
            return None
        return (
            DeltalakeTable(
                os.path.basename(self.dest_uri), self.dest_uri
            )(spark=spark)
            .filter(F.col("n_rows") > 0)
            .drop("__group_key")
        )

    # -- maintenance ----------------------------------------------------------

    def advance(
        self, spark: SparkSession, max_versions: Optional[int] = None
    ) -> Optional[int]:
        """Apply the next change batch; returns the source version
        caught up to, or None when already current."""
        batch = self.stream.poll(spark, max_versions=max_versions)
        if batch is None:
            return None
        changes, version = batch
        delta = self._delta_frame(changes)
        exists = os.path.isdir(os.path.join(self.dest_uri, "_delta_log"))

        if not exists:
            write_delta(
                delta.filter(F.col("n_rows") > 0),
                self.dest_uri,
                txn_app_id=self.app_id,
                txn_version=2 * version,
                checkpoint_interval=None,
            )
        else:
            current = DeltalakeTable(
                os.path.basename(self.dest_uri), self.dest_uri
            )(spark=spark)
            if "__group_key" not in current.columns:
                raise ValueError(
                    f"IVM destination {self.dest_uri} predates the "
                    f"surrogate-group-key schema (no __group_key "
                    f"column); rebuild the view (drop the destination "
                    f"table and cursor, then advance from scratch)"
                )
            d = delta.alias("d")
            cur = current.join(
                delta.select("__group_key"), "__group_key",
                "left_semi",
            ).alias("c")
            combined = cur.join(d, "__group_key", "full_outer").select(
                "__group_key",
                *[
                    F.coalesce(F.col(f"d.{g}"), F.col(f"c.{g}")).alias(g)
                    for g in self.group_cols
                ],
                (
                    F.coalesce(F.col("c.n_rows"), F.lit(0))
                    + F.coalesce(F.col("d.n_rows"), F.lit(0))
                ).cast("long").alias("n_rows"),
                *[
                    (
                        F.coalesce(
                            F.col(f"c.sum_{c2}"),
                            F.lit(0).cast("decimal(38,6)"),
                        )
                        + F.coalesce(
                            F.col(f"d.sum_{c2}"),
                            F.lit(0).cast("decimal(38,6)"),
                        )
                    ).cast("decimal(38,6)").alias(f"sum_{c2}")
                    for c2 in self.sum_cols
                ],
            )
            merge_delta(
                spark,
                self.dest_uri,
                combined,
                on=["__group_key"],
                txn_app_id=self.app_id,
                txn_version=2 * version,
            )
            # groups that reached zero: delete by DESTINATION state, so a
            # crash-replay deletes the leftovers or nothing (see module
            # docstring)
            if (
                DeltaLog(self.dest_uri)
                .snapshot()
                .app_transactions.get(self.app_id, -1)
                < 2 * version + 1
            ):
                delete_delta(
                    spark,
                    self.dest_uri,
                    [Filter("n_rows", "=", 0)],
                    txn_app_id=self.app_id,
                    txn_version=2 * version + 1,
                )
        self.stream.ack(version)
        return version
