"""Ranking (TF-IDF / BM25) and weighted/quota sampling semantics."""

import pytest
from pyspark.sql import functions as F

from datarepo_spark.functions.ranking import bm25_search, tfidf_keywords
from datarepo_spark.functions.sampling import (
    group_quota_sample,
    weighted_sample,
)


@pytest.fixture
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "apple banana apple apple", "s0"),
            (1, "banana cherry banana", "s0"),
            (2, "cherry cherry cherry cherry", "s0"),
            (3, "apple unique banana", "s1"),
        ],
        ["doc_id", "text", "source"],
    )


class TestTfIdf:
    def test_rare_terms_outrank_common(self, spark, corpus):
        out = {
            (r.doc_id, r.token): r.score
            for r in tfidf_keywords(corpus, k=2).collect()
        }
        # 'unique' appears in exactly one doc → highest idf for doc 3
        top3 = [
            t for (d, t), s in sorted(
                out.items(), key=lambda kv: -kv[1]
            ) if d == 3
        ]
        assert top3[0] == "unique"

    def test_k_bound_and_tiebreak(self, spark, corpus):
        rows = tfidf_keywords(corpus, k=1).collect()
        per_doc = {r.doc_id for r in rows}
        assert per_doc == {0, 1, 2, 3}
        assert len(rows) == 4  # exactly one per doc


class TestBm25:
    def test_matching_docs_rank_by_tf_and_length(self, spark, corpus):
        got = [r.doc_id for r in bm25_search(
            corpus, ["cherry"], k=10
        ).collect()]
        # doc 2 is cherry-heavy, doc 1 has one cherry, others none
        assert got[0] == 2 and set(got) == {1, 2}

    def test_multi_token_scores_sum(self, spark, corpus):
        got = {r.doc_id: r.score for r in bm25_search(
            corpus, ["apple", "cherry"], k=10
        ).collect()}
        assert set(got) == {0, 1, 2, 3}
        assert got[0] > got[3]  # three apples beat one


class TestWeightedSample:
    def test_heavy_weights_dominate(self, spark):
        # 500 rows: ids < 50 carry weight 1000, the rest weight 1 —
        # the top-50 sample should be nearly all heavy rows
        df = spark.range(500).select(
            F.col("id"),
            F.when(F.col("id") < 50, 1000.0).otherwise(1.0).alias("w"),
        )
        got = {
            r.id
            for r in weighted_sample(df, F.col("w"), 50, "id").collect()
        }
        assert len(got) == 50
        assert len([i for i in got if i < 50]) >= 45

    def test_deterministic_under_repartitioning(self, spark):
        df = spark.range(300).select(
            F.col("id"), (F.col("id") % 7 + 1).cast("double").alias("w")
        )
        a = sorted(
            r.id for r in weighted_sample(df, F.col("w"), 30, "id").collect()
        )
        b = sorted(
            r.id
            for r in weighted_sample(
                df.repartition(17), F.col("w"), 30, "id"
            ).collect()
        )
        assert a == b


class TestGroupQuota:
    def test_caps_each_group(self, spark):
        df = spark.range(100).select(
            F.col("id"), (F.col("id") % 4).alias("g")
        )
        out = group_quota_sample(df, "g", 7, "id")
        counts = {
            r.g: r["count"]
            for r in out.groupBy("g").count().collect()
        }
        assert counts == {0: 7, 1: 7, 2: 7, 3: 7}

    def test_small_groups_pass_through(self, spark):
        df = spark.range(5).select(F.col("id"), F.lit("only").alias("g"))
        assert group_quota_sample(df, "g", 10, "id").count() == 5
