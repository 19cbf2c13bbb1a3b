"""OPTIMIZE ZORDER BY: multi-dimensional clustering must preserve rows
exactly, commit as dataChange:false, and — the point — give add.stats
envelopes that prune on EVERY clustered column, not just a sort leader."""

import json

import pytest
from pyspark.sql import functions as F

from datarepo_spark.core.filters import Filter, normalize_filters
from datarepo_spark.tables.delta_log import DeltaLog
from datarepo_spark.tables.delta_stats import stats_prune
from datarepo_spark.tables.delta_table import DeltalakeTable
from datarepo_spark.tables.delta_writer import write_delta, zorder_by


def _grid(spark, n=32):
    """n×n integer grid — uniform in both dimensions."""
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )


class TestZOrder:
    def test_rows_preserved_datachange_false(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(_grid(spark), uri)
        before = sorted(
            tuple(r) for r in DeltalakeTable("t", uri)(spark=spark).collect()
        )
        res = zorder_by(spark, uri, ["x", "y"], target_files=4)
        assert res["files_added"] == 4
        after_snap = DeltaLog(uri).snapshot()
        assert after_snap.version == res["version"]
        after = sorted(
            tuple(r) for r in DeltalakeTable("t", uri)(spark=spark).collect()
        )
        assert before == after
        # the rewrite commit must be dataChange: false throughout
        import os

        commit = os.path.join(
            uri, "_delta_log", f"{res['version']:020d}.json"
        )
        with open(commit) as fh:
            for line in fh:
                action = json.loads(line)
                body = action.get("add") or action.get("remove")
                if body is None:  # commitInfo etc. carry no dataChange
                    continue
                assert body["dataChange"] is False

    def test_both_dimensions_prune(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(_grid(spark), uri)
        zorder_by(spark, uri, ["x", "y"], target_files=4)
        snap = DeltaLog(uri).snapshot()
        assert len(snap.files) == 4 and all(f.stats for f in snap.files)

        # a quadrant query must hit exactly one file on a uniform grid
        dnf = normalize_filters(
            [Filter("x", "<", 16), Filter("y", "<", 16)]
        )
        assert len(stats_prune(snap.files, dnf, snap.data_schema)) == 1
        # and EACH single-dimension band query prunes at least half
        for col in ("x", "y"):
            dnf1 = normalize_filters([Filter(col, "<", 16)])
            kept = stats_prune(snap.files, dnf1, snap.data_schema)
            assert len(kept) <= 2, f"{col} band kept {len(kept)}/4 files"

    def test_read_results_after_zorder(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(_grid(spark), uri)
        zorder_by(spark, uri, ["x", "y"], target_files=4)
        t = DeltalakeTable("t", uri)
        got = sorted(
            r.payload
            for r in t(
                filters=[Filter("x", "<", 4), Filter("y", "<", 4)],
                spark=spark,
            ).collect()
        )
        expect = sorted(y * 32 + x for x in range(4) for y in range(4))
        assert got == expect

    def test_string_column_clusters(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, chr(ord("a") + i % 26) + f"-{i}") for i in range(520)],
            ["id", "name"],
        )
        write_delta(df, uri)
        zorder_by(spark, uri, ["name"], target_files=4)
        snap = DeltaLog(uri).snapshot()
        dnf = normalize_filters([Filter("name", "<", "c")])
        kept = stats_prune(snap.files, dnf, snap.data_schema)
        assert len(kept) < len(snap.files)
        t = DeltalakeTable("t", uri)
        got = {
            r.name[0]
            for r in t(filters=[Filter("name", "<", "c")], spark=spark).collect()
        }
        assert got == {"a", "b"}

    def test_partitioned_table_keeps_partitioning(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        df = _grid(spark).withColumn(
            "par", F.when(F.col("x") % 2 == 0, "even").otherwise("odd")
        )
        write_delta(df, uri, partition_by=["par"])
        zorder_by(spark, uri, ["y"], target_files=4)
        snap = DeltaLog(uri).snapshot()
        assert snap.partition_columns == ["par"]
        assert all(f.partition_values.get("par") in ("even", "odd")
                   for f in snap.files)
        t = DeltalakeTable("t", uri)
        got = t(
            filters=[Filter("par", "=", "even"), Filter("y", "<", 2)],
            spark=spark,
        )
        assert got.count() == 32  # 16 even x values × 2 y values

    def test_partition_column_rejected(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(
            _grid(spark).withColumn("par", F.lit("a")), uri,
            partition_by=["par"],
        )
        with pytest.raises(ValueError, match="partition columns"):
            zorder_by(spark, uri, ["par"])

    def test_unknown_column_rejected(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(_grid(spark), uri)
        with pytest.raises(ValueError, match="not in table schema"):
            zorder_by(spark, uri, ["zz"])
        with pytest.raises(ValueError, match="1-4 columns"):
            zorder_by(spark, uri, [])

    def test_time_travel_sees_pre_zorder_layout(self, spark, tmp_path):
        uri = str(tmp_path / "t")
        write_delta(_grid(spark), uri)
        res = zorder_by(spark, uri, ["x"], target_files=2)
        t = DeltalakeTable("t", uri)
        assert (
            t(version=0, spark=spark).count()
            == t(version=res["version"], spark=spark).count()
            == 1024
        )
