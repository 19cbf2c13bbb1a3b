"""table_changes: CDF-style incremental reads derived from log replay."""

import pytest
from pyspark.sql import functions as F

from datarepo_spark.core.filters import Filter
from datarepo_spark.tables.delta_cdf import table_changes
from datarepo_spark.tables.delta_writer import (
    compact,
    delete_delta,
    write_delta,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("r"), "id").alias("v")
    )


def _changes(spark, uri, start, end=None):
    rows = table_changes(spark, uri, start, end).collect()
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"]) for r in rows
    )


class TestTableChanges:
    def test_appends_are_inserts(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(_df(spark, 0, 3), uri, checkpoint_interval=None)
        write_delta(_df(spark, 3, 5), uri, checkpoint_interval=None)
        assert _changes(spark, uri, 0) == [
            (0, "insert", 0),
            (0, "insert", 1),
            (0, "insert", 2),
            (1, "insert", 3),
            (1, "insert", 4),
        ]
        # window selects only version 1
        assert _changes(spark, uri, 1) == [
            (1, "insert", 3),
            (1, "insert", 4),
        ]

    def test_dv_delete_emits_only_delta(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(
            _df(spark, 0, 10).coalesce(1).sortWithinPartitions("id"),
            uri, checkpoint_interval=None,
        )
        delete_delta(spark, uri, [Filter("id", "=", 4)])
        delete_delta(spark, uri, [Filter("id", "=", 7)])
        # second delete merges into the first DV; the feed must emit only
        # the NEWLY deleted row at each version
        assert _changes(spark, uri, 1) == [
            (1, "delete", 4),
            (2, "delete", 7),
        ]

    def test_overwrite_is_delete_plus_insert(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(_df(spark, 0, 3), uri, checkpoint_interval=None)
        write_delta(
            _df(spark, 10, 12), uri, mode="overwrite",
            checkpoint_interval=None,
        )
        assert _changes(spark, uri, 1) == [
            (1, "delete", 0),
            (1, "delete", 1),
            (1, "delete", 2),
            (1, "insert", 10),
            (1, "insert", 11),
        ]

    def test_compaction_contributes_nothing(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(_df(spark, 0, 3), uri, checkpoint_interval=None)
        write_delta(_df(spark, 3, 6), uri, checkpoint_interval=None)
        stats = compact(spark, uri)
        assert stats["version"] == 2
        assert _changes(spark, uri, 2) == []

    def test_full_file_delete(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(_df(spark, 0, 5), uri, checkpoint_interval=None)
        write_delta(_df(spark, 5, 8), uri, checkpoint_interval=None)
        delete_delta(spark, uri, [Filter("id", ">=", 5)])
        assert _changes(spark, uri, 2) == [
            (2, "delete", 5),
            (2, "delete", 6),
            (2, "delete", 7),
        ]

    def test_schema_evolution_null_fills(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(_df(spark, 0, 2), uri, checkpoint_interval=None)
        evolved = _df(spark, 2, 4).withColumn(
            "extra", (F.col("id") * 10).cast("long")
        )
        write_delta(
            evolved, uri, schema_mode="merge", checkpoint_interval=None
        )
        rows = {
            r["id"]: r["extra"]
            for r in table_changes(spark, uri, 0).collect()
        }
        assert rows == {0: None, 1: None, 2: 20, 3: 30}

    def test_out_of_range_raises(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(_df(spark, 0, 2), uri, checkpoint_interval=None)
        with pytest.raises(ValueError, match="out of range"):
            table_changes(spark, uri, 5)

    def test_ending_version_bounds_window(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        for lo in (0, 2, 4):
            write_delta(
                _df(spark, lo, lo + 2), uri, checkpoint_interval=None
            )
        got = _changes(spark, uri, 1, end=1)
        assert got == [(1, "insert", 2), (1, "insert", 3)]

    def test_partitioned_table(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        df = spark.range(0, 6).select(
            F.col("id"), (F.col("id") % 2).cast("string").alias("par")
        )
        write_delta(
            df, uri, partition_by=["par"], checkpoint_interval=None
        )
        delete_delta(spark, uri, [Filter("par", "=", "1")])
        got = _changes(spark, uri, 1)
        assert got == [(1, "delete", 1), (1, "delete", 3), (1, "delete", 5)]
