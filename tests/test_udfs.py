"""UDF-tier examples: each must agree with a pandas/python ground truth."""

import math

import pytest
from pyspark.sql import functions as F

from datarepo_spark.functions import udfs as U


class TestPandasUdfTiers:
    def test_scalar_vectorized(self, spark):
        df = spark.createDataFrame([(0.0,), (1.0,), (10.0,)], ["x"])
        out = sorted(
            r.y for r in df.select(U.log1p_vec("x").alias("y")).collect()
        )
        assert out == pytest.approx(
            sorted(math.log1p(v) for v in [0.0, 1.0, 10.0])
        )

    def test_grouped_agg_weighted_mean(self, spark):
        rows = [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 5.0, 2.0)]
        df = spark.createDataFrame(rows, ["k", "v", "w"])
        out = {
            r.k: r.wm
            for r in df.groupBy("k")
            .agg(U.weighted_mean("v", "w").alias("wm"))
            .collect()
        }
        assert out["a"] == pytest.approx((1 * 1 + 3 * 3) / 4)
        assert out["b"] == pytest.approx(5.0)

    def test_apply_in_pandas_zscore(self, spark):
        rows = [("g", float(v)) for v in (1, 2, 3, 4, 5)]
        df = spark.createDataFrame(rows, ["k", "v"])
        out = {
            r.v: r.zscore
            for r in U.zscore_per_group(df, "v", ["k"]).collect()
        }
        import statistics

        mean, std = 3.0, statistics.stdev([1, 2, 3, 4, 5])
        for v in (1, 2, 3, 4, 5):
            assert out[float(v)] == pytest.approx((v - mean) / std)

    def test_udtf_sentence_split(self, spark):
        SentenceSplit = U.sentence_split_udtf()
        spark.udtf.register("sentence_split", SentenceSplit)
        df = spark.createDataFrame(
            [(1, "Hello world. How are you? Fine!")], ["id", "text"]
        )
        df.createOrReplaceTempView("docs_udtf")
        rows = spark.sql(
            """
            SELECT d.id, s.sentence, s.n_words
            FROM docs_udtf d, LATERAL sentence_split(d.text) s
            ORDER BY s.sentence
            """
        ).collect()
        got = [(r.sentence, r.n_words) for r in rows]
        assert got == [
            ("Fine", 1),
            ("Hello world", 2),
            ("How are you", 3),
        ]
