"""Fuzzy edit-distance join: deletion-variant blocking must equal the
brute-force levenshtein filter (FastSS completeness)."""

import itertools

import pytest
from pyspark.sql import functions as F

from datarepo_spark.functions.fuzzy import (
    deletion_variants,
    fuzzy_join_pairs,
)


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[-1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


WORDS = [
    "alpha", "alpa", "alphas", "aleha", "beta", "betta", "bta",
    "gamma", "gama", "gamm", "delta", "dolta", "deltas", "",
    "x", "y", "xy",
]


class TestFuzzyJoin:
    @pytest.mark.parametrize("k", [1, 2])
    def test_equals_brute_force(self, spark, k):
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(WORDS)], ["id", "w"]
        )
        got = sorted(
            (r["id_a"], r["id_b"], r["distance"])
            for r in fuzzy_join_pairs(
                df, "w", "id", max_distance=k
            ).collect()
        )
        want = sorted(
            (i, j, _levenshtein(a, b))
            for (i, a), (j, b) in itertools.combinations(
                enumerate(WORDS), 2
            )
            if _levenshtein(a, b) <= k
        )
        assert got == want

    def test_variants_include_original_and_deletions(self, spark):
        row = (
            spark.range(1)
            .select(deletion_variants(F.lit("abc"), 1).alias("v"))
            .collect()[0]
        )
        assert sorted(row["v"]) == ["ab", "abc", "ac", "bc"]

    def test_k2_variants(self, spark):
        row = (
            spark.range(1)
            .select(deletion_variants(F.lit("abc"), 2).alias("v"))
            .collect()[0]
        )
        assert sorted(row["v"]) == [
            "a", "ab", "abc", "ac", "b", "bc", "c"
        ]

    def test_rejects_bad_params(self, spark):
        df = spark.createDataFrame([(1, "a")], ["id", "w"])
        with pytest.raises(ValueError, match="max_distance"):
            fuzzy_join_pairs(df, "w", "id", max_distance=0)


class TestFuzzyLink:
    def test_cross_frame_equals_brute_force(self, spark):
        from datarepo_spark.functions.fuzzy import fuzzy_link

        lhs = spark.createDataFrame(
            [(i, w) for i, w in enumerate(WORDS)], ["lid", "w"]
        )
        rhs = spark.createDataFrame(
            [(100 + i, w) for i, w in enumerate(
                ["alpha", "betta", "gamma!", "unrelated", "xz", ""]
            )],
            ["rid", "w"],
        )
        got = sorted(
            (r["left_id"], r["right_id"], r["distance"])
            for r in fuzzy_link(
                lhs, rhs, "w", "lid", "rid", max_distance=1
            ).collect()
        )
        want = sorted(
            (i, 100 + j, _levenshtein(a, b))
            for i, a in enumerate(WORDS)
            for j, b in enumerate(
                ["alpha", "betta", "gamma!", "unrelated", "xz", ""]
            )
            if _levenshtein(a, b) <= 1
        )
        assert got == want

    def test_hot_variant_cap(self, spark):
        """The empty-string variant of 1-char keys must not cross-join;
        capped buckets drop, and surviving pairs still verify."""
        from datarepo_spark.functions.fuzzy import fuzzy_link

        lhs = spark.createDataFrame(
            [(i, "a") for i in range(10)] + [(99, "abcde")],
            ["lid", "w"],
        )
        rhs = spark.createDataFrame(
            [(100 + i, "b") for i in range(10)] + [(199, "abcdx")],
            ["rid", "w"],
        )
        out = fuzzy_link(
            lhs, rhs, "w", "lid", "rid", max_bucket_size=5
        ).collect()
        # the '' / single-char variants exceed the cap on both sides and
        # are dropped; the long-key match survives
        assert [(r["left_id"], r["right_id"]) for r in out] == [(99, 199)]
