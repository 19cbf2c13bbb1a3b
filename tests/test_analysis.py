"""Unit tests for the r10 analysis family: interval-overlap join
(vs brute force), pinned exact quantiles (vs numpy), MAD/IQR/RRF
sanity."""

import random

import pytest
from pyspark.sql import functions as F

from datarepo_spark.functions.profile import grouped_exact_quantile
from datarepo_spark.operators.range_join import interval_overlap_join


class TestIntervalOverlapJoin:
    def _random_intervals(self, rng, n, key_space=3, span=40, lo=0, hi=400):
        rows = []
        for i in range(n):
            s = rng.randint(lo, hi)
            rows.append(
                (i, rng.randint(0, key_space - 1), s, s + rng.randint(0, span))
            )
        return rows

    def test_matches_brute_force(self, spark):
        rng = random.Random(10)
        a_rows = self._random_intervals(rng, 60)
        b_rows = self._random_intervals(rng, 80)
        a = spark.createDataFrame(a_rows, ["ida", "ka", "sa", "ea"])
        b = spark.createDataFrame(b_rows, ["idb", "kb", "sb", "eb"])
        got = sorted(
            (r.ida, r.idb)
            for r in interval_overlap_join(
                a, b, "sa", "ea", "sb", "eb",
                bucket_width=16.0, equi_keys=[("ka", "kb")],
            ).collect()
        )
        want = sorted(
            (ia, ib)
            for (ia, ka, sa, ea) in a_rows
            for (ib, kb, sb, eb) in b_rows
            if ka == kb and sa <= eb and sb <= ea
        )
        assert got == want  # equality implies exactly-once (no dups)

    def test_no_equi_keys(self, spark):
        rng = random.Random(11)
        a_rows = self._random_intervals(rng, 25, key_space=1)
        b_rows = self._random_intervals(rng, 25, key_space=1)
        a = spark.createDataFrame(a_rows, ["ida", "ka", "sa", "ea"])
        b = spark.createDataFrame(b_rows, ["idb", "kb", "sb", "eb"])
        got = sorted(
            (r.ida, r.idb)
            for r in interval_overlap_join(
                a, b, "sa", "ea", "sb", "eb", bucket_width=7.0
            ).collect()
        )
        want = sorted(
            (ia, ib)
            for (ia, _, sa, ea) in a_rows
            for (ib, _, sb, eb) in b_rows
            if sa <= eb and sb <= ea
        )
        assert got == want

    def test_zero_length_and_touching_intervals(self, spark):
        # [5,5] overlaps [5,9]; [0,4] touches [4,8] at the endpoint
        a = spark.createDataFrame(
            [(1, 5, 5), (2, 0, 4)], ["ida", "sa", "ea"]
        )
        b = spark.createDataFrame(
            [(1, 5, 9), (2, 4, 8), (3, 10, 12)], ["idb", "sb", "eb"]
        )
        got = sorted(
            (r.ida, r.idb)
            for r in interval_overlap_join(
                a, b, "sa", "ea", "sb", "eb", bucket_width=3.0
            ).collect()
        )
        # (2,1) is NOT a pair: [0,4] ends before [5,9] starts
        assert got == [(1, 1), (1, 2), (2, 2)]

    def test_rejects_bad_width(self, spark):
        a = spark.createDataFrame([(1, 0, 1)], ["i", "s", "e"])
        with pytest.raises(ValueError):
            interval_overlap_join(a, a, "s", "e", "s", "e", 0.0)


class TestGroupedExactQuantile:
    def test_matches_numpy_linear(self, spark):
        import numpy as np

        rng = random.Random(12)
        rows = [
            (g, rng.uniform(-100, 100))
            for g in ("a", "b", "c")
            for _ in range(rng.randint(5, 60))
        ]
        df = spark.createDataFrame(rows, ["g", "v"])
        for q in (0.25, 0.5, 0.75):
            got = {
                r.g: r.quantile
                for r in grouped_exact_quantile(df, ["g"], "v", q).collect()
            }
            for g in ("a", "b", "c"):
                vals = [v for gg, v in rows if gg == g]
                want = float(
                    np.percentile(vals, q * 100, method="linear")
                )
                assert got[g] == pytest.approx(want, rel=1e-12), (g, q)

    def test_single_row_group(self, spark):
        df = spark.createDataFrame([("a", 7.0)], ["g", "v"])
        out = grouped_exact_quantile(df, ["g"], "v", 0.5).collect()
        assert out[0].quantile == 7.0

    def test_exact_rank_no_interpolation(self, spark):
        # 5 rows, q=0.5 -> k=2.0 exactly: result is the middle value
        df = spark.createDataFrame(
            [("a", float(v)) for v in (10, 20, 30, 40, 50)], ["g", "v"]
        )
        out = grouped_exact_quantile(df, ["g"], "v", 0.5).collect()
        assert out[0].quantile == 30.0
