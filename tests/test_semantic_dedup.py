"""SemDeDup-style semantic dedup: engineered embedding clusters must
collapse to one survivor each, singletons must all survive, and the
result must cover every input row exactly once."""

import numpy as np
import pytest
from pyspark.sql import types as T

from datarepo_spark.functions.dedup import semantic_dedup

DIM = 16


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def _corpus():
    """3 tight clusters (ids 0-2, 10-13, 20-21) + 4 isolated vectors.
    Within-cluster cosine > 0.999; cross-group cosine < 0.6."""
    rng = np.random.default_rng(7)
    rows = []

    def add_cluster(ids, base):
        for i in ids:
            noisy = _unit(base + rng.normal(0, 0.005, DIM))
            rows.append((i, [float(x) for x in noisy]))

    bases = [
        _unit(rng.normal(0, 1, DIM)),
        _unit(rng.normal(0, 1, DIM)),
        _unit(rng.normal(0, 1, DIM)),
    ]
    add_cluster([0, 1, 2], bases[0])
    add_cluster([10, 11, 12, 13], bases[1])
    add_cluster([20, 21], bases[2])
    for i in (30, 31, 32, 33):
        rows.append((i, [float(x) for x in _unit(rng.normal(0, 1, DIM))]))
    return rows


@pytest.fixture(scope="module")
def emb_df(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    return spark.createDataFrame(_corpus(), schema)


class TestSemanticDedup:
    def test_clusters_collapse_to_min_id(self, emb_df):
        out = {
            r.vec_id: (r.component, r.kept)
            for r in semantic_dedup(
                emb_df, threshold=0.99, k=4, nprobe=2
            ).collect()
        }
        assert len(out) == 13  # one row per input, no dup/loss
        for cluster, head in (((0, 1, 2), 0), ((10, 11, 12, 13), 10),
                              ((20, 21), 20)):
            for i in cluster:
                assert out[i][0] == head, f"{i} -> {out[i]}"
                assert out[i][1] == (i == head)
        for i in (30, 31, 32, 33):
            assert out[i] == (i, True)

    def test_survivor_count(self, emb_df):
        out = semantic_dedup(emb_df, threshold=0.99, k=4, nprobe=2)
        assert out.filter("kept").count() == 3 + 4  # 3 heads + 4 singles

    def test_high_k_multi_probe_recall(self, emb_df):
        """k close to corpus size fragments cells; tight clusters must
        still collapse (identical-direction vectors share an argmax)."""
        out = {
            r.vec_id: r.component
            for r in semantic_dedup(
                emb_df, threshold=0.99, k=8, nprobe=2
            ).collect()
        }
        assert out[2] == 0 and out[13] == 10 and out[21] == 20

    def test_threshold_one_keeps_everything(self, emb_df):
        out = semantic_dedup(emb_df, threshold=1.0000001, k=4)
        assert out.filter("kept").count() == 13
