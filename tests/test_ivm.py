"""Incremental view maintenance: the maintained aggregate must always
equal a from-scratch GROUP BY of the source's current content."""

import json

from pyspark.sql import functions as F

from datarepo_spark.core.filters import Filter
from datarepo_spark.tables.delta_table import DeltalakeTable
from datarepo_spark.tables.delta_writer import delete_delta, write_delta
from datarepo_spark.tables.ivm import IncrementalAggregate


def _src_df(spark, rows):
    return spark.createDataFrame(
        rows, "k long, grp string, x double"
    )


def _recompute(spark, uri):
    src = DeltalakeTable("src", uri)(spark=spark)
    rows = (
        src.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("x").cast("decimal(38,6)")).alias("sum_x"),
        )
        .collect()
    )
    return sorted(
        ((r["grp"] or "", r["grp"] is None), r["n_rows"], str(r["sum_x"]))
        for r in rows
    )


def _view(spark, agg):
    df = agg.read(spark)
    if df is None:
        return []
    return sorted(
        ((r["grp"] or "", r["grp"] is None), r["n_rows"], str(r["sum_x"]))
        for r in df.collect()
    )


def _mk(tmp_path):
    return (
        str(tmp_path / "src"),
        str(tmp_path / "dst"),
        str(tmp_path / "cursor.json"),
    )


class TestIncrementalAggregate:
    def test_tracks_source_through_changes(self, spark, tmp_path):
        src, dst, ckpt = _mk(tmp_path)
        agg = IncrementalAggregate(src, dst, ckpt, ["grp"], ["x"])

        write_delta(
            _src_df(spark, [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 1.0)]),
            src, checkpoint_interval=None,
        )
        assert agg.advance(spark) == 0
        assert _view(spark, agg) == _recompute(spark, src)

        # more appends + a DV delete, applied in ONE advance
        write_delta(
            _src_df(spark, [(4, "b", 2.0), (5, "c", 7.5)]),
            src, checkpoint_interval=None,
        )
        delete_delta(spark, src, [Filter("k", "=", 2)])
        assert agg.advance(spark) == 2
        assert _view(spark, agg) == _recompute(spark, src)
        assert agg.advance(spark) is None  # caught up

    def test_group_vanishes_when_emptied(self, spark, tmp_path):
        src, dst, ckpt = _mk(tmp_path)
        agg = IncrementalAggregate(src, dst, ckpt, ["grp"], ["x"])
        write_delta(
            _src_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
            src, checkpoint_interval=None,
        )
        agg.advance(spark)
        delete_delta(spark, src, [Filter("grp", "=", "b")])
        agg.advance(spark)
        assert _view(spark, agg) == [(("a", False), 1, "1.000000")]
        assert _view(spark, agg) == _recompute(spark, src)

    def test_crash_replay_does_not_double_apply(self, spark, tmp_path):
        src, dst, ckpt = _mk(tmp_path)
        agg = IncrementalAggregate(src, dst, ckpt, ["grp"], ["x"])
        write_delta(
            _src_df(spark, [(1, "a", 10.0)]), src,
            checkpoint_interval=None,
        )
        agg.advance(spark)
        write_delta(
            _src_df(spark, [(2, "a", 5.0)]), src,
            checkpoint_interval=None,
        )
        agg.advance(spark)
        want = _view(spark, agg)

        # simulate a crash BEFORE the cursor ack of version 1: rewind the
        # cursor and re-apply — the SetTransaction ledger must swallow it
        with open(ckpt, "w", encoding="utf-8") as fh:
            json.dump({"last_version": 0}, fh)
        assert agg.advance(spark) == 1
        assert _view(spark, agg) == want
        assert _view(spark, agg) == _recompute(spark, src)

    def test_multiple_groups_and_sums(self, spark, tmp_path):
        src, dst, ckpt = _mk(tmp_path)
        agg = IncrementalAggregate(src, dst, ckpt, ["grp"], ["x"])
        rows = [(i, "abc"[i % 3], float(i)) for i in range(30)]
        write_delta(_src_df(spark, rows), src, checkpoint_interval=None)
        agg.advance(spark)
        delete_delta(spark, src, [Filter("k", "<", 10)])
        write_delta(
            _src_df(spark, [(100, "d", 1.25)]), src,
            checkpoint_interval=None,
        )
        agg.advance(spark)
        assert _view(spark, agg) == _recompute(spark, src)

    def test_null_group_keys_merge_correctly(self, spark, tmp_path):
        """NULL group values must update-in-place across advances, not
        append a fresh NULL row each time (the joins are null-unsafe;
        the surrogate group key makes them exact)."""
        src, dst, ckpt = _mk(tmp_path)
        agg = IncrementalAggregate(src, dst, ckpt, ["grp"], ["x"])
        write_delta(
            _src_df(spark, [(1, None, 5.0), (2, "a", 1.0)]),
            src, checkpoint_interval=None,
        )
        agg.advance(spark)
        write_delta(
            _src_df(spark, [(3, None, 2.0)]), src,
            checkpoint_interval=None,
        )
        agg.advance(spark)
        got = _view(spark, agg)
        assert got == _recompute(spark, src)
        assert sum(1 for (_, isnull), *_ in got if isnull) == 1
        # and deleting one NULL-group row updates, not duplicates
        delete_delta(spark, src, [Filter("k", "=", 1)])
        agg.advance(spark)
        assert _view(spark, agg) == _recompute(spark, src)


    def test_group_key_encoding_not_injectable(self, spark, tmp_path):
        """Values containing the old separator must not collide across
        multi-column group tuples (length-prefixed encoding)."""
        src, dst, ckpt = _mk(tmp_path)
        agg = IncrementalAggregate(
            src, dst, ckpt, ["grp", "grp2"], ["x"]
        )
        rows = [
            (1, "x\u0001v:y", "z", 1.0),
            (2, "x", "y\u0001v:z", 1.0),
        ]
        write_delta(
            spark.createDataFrame(
                rows, "k long, grp string, grp2 string, x double"
            ),
            src, checkpoint_interval=None,
        )
        agg.advance(spark)
        df = agg.read(spark)
        assert df.count() == 2  # two distinct groups, never merged
