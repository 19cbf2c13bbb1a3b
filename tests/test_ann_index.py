"""Persisted ANN index: build → partition-pruned query → append."""

import os

from pyspark.sql import functions as F

from datarepo_spark.functions.ann_index import (
    append_to_ann_index,
    build_ann_index,
    load_ann_index,
    query_ann_index,
)
from datarepo_spark.functions.similarity import knn_brute_force


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _query_vec(spark):
    emb = _emb(spark)
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]


class TestAnnIndex:
    def test_build_query_recall(self, spark, tmp_path):
        uri = str(tmp_path / "idx")
        emb = _emb(spark)
        build_ann_index(
            spark, emb, uri, nlist=8, iterations=4
        )
        qv = _query_vec(spark)
        got = query_ann_index(spark, uri, qv, k=10, nprobe=3)
        rows = {r["vec_id"] for r in got.collect()}
        exact = {
            r["vec_id"]
            for r in knn_brute_force(emb, qv, k=10).collect()
        }
        # same recall contract the query-time IVF is gated on
        assert len(rows & exact) >= 5
        assert 0 in rows  # the query vector itself is in the corpus

    def test_query_prunes_partitions(self, spark, tmp_path):
        uri = str(tmp_path / "idx")
        emb = _emb(spark)
        build_ann_index(spark, emb, uri, nlist=8, iterations=4)
        qv = _query_vec(spark)
        pruned = query_ann_index(spark, uri, qv, k=5, nprobe=2)
        touched = {
            seg
            for f in pruned.inputFiles()
            for seg in f.split("/")
            if seg.startswith("cell=")
        }
        assert len(touched) <= 2  # nprobe partitions only

    def test_append_uses_stored_centroids(self, spark, tmp_path):
        uri = str(tmp_path / "idx")
        emb = _emb(spark)
        base = emb.filter(F.col("vec_id") < 150)
        extra = emb.filter(F.col("vec_id") >= 150)
        index = build_ann_index(spark, base, uri, nlist=8, iterations=4)
        append_to_ann_index(spark, extra, uri)
        # appended rows must sit in the cells the ORIGINAL centroids
        # give them — load and compare a few
        reloaded = load_ann_index(uri)
        assert (index.centroids == reloaded.centroids).all()
        from datarepo_spark.tables.delta_table import DeltalakeTable

        n = DeltalakeTable("idx", uri)(spark=spark).count()
        assert n == emb.count()

    def test_vacuum_keeps_centroids(self, spark, tmp_path):
        from datarepo_spark.tables.delta_writer import vacuum

        uri = str(tmp_path / "idx")
        build_ann_index(spark, _emb(spark), uri, nlist=4, iterations=2)
        removed = vacuum(uri)
        assert not any("_ann_index" in r for r in removed)
        assert os.path.exists(
            os.path.join(uri, "_ann_index", "centroids.parquet")
        )
        # index still functional
        qv = _query_vec(spark)
        assert query_ann_index(spark, uri, qv, k=3, nprobe=2).count() == 3
