"""Skew utilities: salted two-phase aggregation and salted joins must give
the same answers as their plain counterparts, with the salt spreading the
hot key across reducers."""

import pytest
from pyspark.sql import functions as F

from datarepo_spark.functions.skew import salted_agg, salted_broadcast_left


@pytest.fixture(scope="module")
def skewed(spark):
    # one giant key + a long tail
    hot = [("hot", i) for i in range(5000)]
    tail = [(f"k{i % 50}", i) for i in range(1000)]
    return spark.createDataFrame(hot + tail, ["k", "v"])


class TestSaltedAgg:
    def test_matches_plain_groupby(self, spark, skewed):
        plain = {
            (r.k): (r.sum_v, r.count_v, r.min_v, r.max_v)
            for r in skewed.groupBy("k")
            .agg(
                F.sum("v").alias("sum_v"),
                F.count("v").alias("count_v"),
                F.min("v").alias("min_v"),
                F.max("v").alias("max_v"),
            )
            .collect()
        }
        salted = {
            (r.k): (r.sum_v, r.count_v, r.min_v, r.max_v)
            for r in salted_agg(
                skewed,
                ["k"],
                {
                    "sum_v": F.sum("v"),
                    "count_v": F.count("v"),
                    "min_v": F.min("v"),
                    "max_v": F.max("v"),
                },
                salt=8,
            ).collect()
        }
        assert salted == plain

    def test_rejects_unmergeable_alias(self, spark, skewed):
        with pytest.raises(ValueError, match="sum_/count_/min_/max_"):
            salted_agg(skewed, ["k"], {"avg_v": F.avg("v")}).collect()


class TestSaltDeterminism:
    """The salt must be a deterministic function of row content — a rand
    salt is re-rolled on task retry/speculative re-execution and silently
    duplicates or drops (key, salt) routes mid-shuffle (VERDICT r8 #1)."""

    def test_no_rand_in_plan(self, spark, skewed):
        out = salted_agg(skewed, ["k"], {"sum_v": F.sum("v")}, salt=8)
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "rand(" not in plan.lower()
        dim = spark.createDataFrame([("hot", "HOT")], ["dk", "label"])
        joined = salted_broadcast_left(skewed, dim, "k", "dk", salt=4)
        jplan = joined._jdf.queryExecution().analyzed().toString()
        assert "rand(" not in jplan.lower()

    def test_salt_stable_across_partitionings(self, spark, skewed):
        from datarepo_spark.functions.skew import _content_salt

        def salts(df):
            return sorted(
                (r.k, r.v, r.s)
                for r in df.withColumn(
                    "s", _content_salt(df, ["k"], 8)
                ).collect()
            )

        one = salts(skewed.repartition(1))
        many = salts(skewed.repartition(64))
        assert one == many

    def test_hot_key_spreads_over_salts(self, spark, skewed):
        from datarepo_spark.functions.skew import _content_salt

        distinct = (
            skewed.filter(F.col("k") == "hot")
            .withColumn("s", _content_salt(skewed, ["k"], 8))
            .select("s")
            .distinct()
            .count()
        )
        assert distinct == 8  # 5000 distinct payloads cover all 8 salts


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, skewed):
        dim = spark.createDataFrame(
            [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], ["dk", "label"]
        )
        plain = sorted(
            (r.k, r.v, r.label)
            for r in skewed.join(dim, skewed.k == dim.dk).collect()
        )
        salted = sorted(
            (r.k, r.v, r.label)
            for r in salted_broadcast_left(
                skewed, dim, "k", "dk", salt=4
            ).collect()
        )
        assert salted == plain
