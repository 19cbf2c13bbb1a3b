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


class TestPrefixFilterJaccard:
    def test_matches_brute_force(self, spark):
        rng = random.Random(21)
        vocab = [f"w{i}" for i in range(40)]
        docs = []
        base = rng.sample(vocab, 12)
        for i in range(30):
            if i % 3 == 0:
                # near-dup family: small mutations of the base set
                toks = list(base)
                for _ in range(rng.randint(0, 2)):
                    toks[rng.randrange(len(toks))] = rng.choice(vocab)
            else:
                toks = rng.sample(vocab, rng.randint(3, 15))
            docs.append((i, " ".join(toks)))
        df = spark.createDataFrame(docs, ["doc_id", "text"])

        from datarepo_spark.functions.dedup import (
            prefix_filter_jaccard_pairs,
        )

        for t in (0.5, 0.7, 0.9):
            got = sorted(
                (r.id_a, r.id_b)
                for r in prefix_filter_jaccard_pairs(
                    df, threshold=t
                ).collect()
            )
            sets = {i: set(s.lower().split()) for i, s in docs}
            want = sorted(
                (a, b)
                for a in sets
                for b in sets
                if a < b
                and sets[a] | sets[b]
                and len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= t
            )
            assert got == want, t

    def test_rejects_bad_threshold(self, spark):
        from datarepo_spark.functions.dedup import (
            prefix_filter_jaccard_pairs,
        )

        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            prefix_filter_jaccard_pairs(df, threshold=0.0)


class TestKsDrift:
    def _brute_ks(self, a, b):
        xs = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        best = 0
        for x in xs:
            ca = sum(1 for v in a if v <= x)
            cb = sum(1 for v in b if v <= x)
            best = max(best, abs(ca * nb - cb * na))
        return best, na, nb

    def test_matches_brute_force(self, spark):
        from datarepo_spark.functions.profile import ks_drift

        rng = random.Random(31)
        rows = [("a", rng.gauss(50, 10)) for _ in range(300)] + [
            ("b", rng.gauss(55, 14)) for _ in range(250)
        ] + [("c", 1.0)] * 10  # third group must be ignored
        df = spark.createDataFrame(rows, ["g", "v"])
        out = ks_drift(df, "v", "g", "a", "b", bucket_width=5.0).collect()
        assert len(out) == 1
        r = out[0]
        num, na, nb = self._brute_ks(
            [v for g, v in rows if g == "a"],
            [v for g, v in rows if g == "b"],
        )
        assert (r.n_a, r.n_b, r.ks_num) == (na, nb, num)
        assert r.ks == pytest.approx(num / (na * nb), abs=1e-9)

    def test_identical_distributions_zero(self, spark):
        from datarepo_spark.functions.profile import ks_drift

        rows = [("a", float(v)) for v in range(50)] + [
            ("b", float(v)) for v in range(50)
        ]
        df = spark.createDataFrame(rows, ["g", "v"])
        r = ks_drift(df, "v", "g", "a", "b", bucket_width=7.0).collect()[0]
        assert r.ks_num == 0 and r.ks == 0.0

    def test_duplicate_values_tie_handling(self, spark):
        """Ties across groups at the same value must be absorbed at that
        value's ECDF point (grouped), not split."""
        from datarepo_spark.functions.profile import ks_drift

        rows = [("a", 1.0), ("a", 1.0), ("b", 1.0), ("a", 2.0), ("b", 3.0)]
        df = spark.createDataFrame(rows, ["g", "v"])
        r = ks_drift(df, "v", "g", "a", "b", bucket_width=10.0).collect()[0]
        num, na, nb = self._brute_ks([1.0, 1.0, 2.0], [1.0, 3.0])
        assert (r.n_a, r.n_b, r.ks_num) == (na, nb, num)


class TestBatchKnn:
    def test_matches_numpy(self, spark):
        import numpy as np

        from datarepo_spark.functions.similarity import batch_knn

        rng = np.random.default_rng(7)
        corpus_v = rng.standard_normal((40, 8)).astype("float32")
        query_v = rng.standard_normal((3, 8)).astype("float32")
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(corpus_v)],
            ["vec_id", "embedding"],
        )
        queries = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(query_v)],
            ["query_id", "embedding"],
        )
        got = {
            (r.query_id, r.rank): r.vec_id
            for r in batch_knn(corpus, queries, k=4).collect()
        }
        cn = corpus_v.astype("float64")
        qn = query_v.astype("float64")
        sims = (qn @ cn.T) / (
            np.linalg.norm(qn, axis=1)[:, None]
            * np.linalg.norm(cn, axis=1)[None, :]
        )
        for qi in range(3):
            order = sorted(
                range(40), key=lambda i: (-round(sims[qi, i], 6), i)
            )
            for rank, ci in enumerate(order[:4], start=1):
                assert got[(qi, rank)] == ci, (qi, rank)

    def test_k_rows_per_query(self, spark):
        from datarepo_spark.functions.similarity import batch_knn

        corpus = spark.createDataFrame(
            [(i, [1.0, float(i)]) for i in range(10)],
            ["vec_id", "embedding"],
        )
        queries = spark.createDataFrame(
            [(0, [1.0, 0.5]), (1, [0.5, 1.0])], ["query_id", "embedding"]
        )
        out = batch_knn(corpus, queries, k=3).collect()
        assert len(out) == 6


class TestAutoBucketWidth:
    def test_median_span(self, spark):
        from datarepo_spark.operators.range_join import (
            auto_bucket_width,
            interval_overlap_join,
        )

        df = spark.createDataFrame(
            [(i, 0, s) for i, s in enumerate([2, 4, 6, 8, 100])],
            ["i", "s", "e"],
        )
        w = auto_bucket_width(df, "s", "e")
        assert w == 6.0  # median span
        # width is a tuning knob only — results identical at any width
        b = df.selectExpr("i AS i2", "s AS s2", "e AS e2")
        got_auto = sorted(
            (r.i, r.i2)
            for r in interval_overlap_join(
                df, b, "s", "e", "s2", "e2", w
            ).collect()
        )
        got_one = sorted(
            (r.i, r.i2)
            for r in interval_overlap_join(
                df, b, "s", "e", "s2", "e2", 1.0
            ).collect()
        )
        assert got_auto == got_one

    def test_floor_guard(self, spark):
        from datarepo_spark.operators.range_join import auto_bucket_width

        df = spark.createDataFrame([(1, 5, 5)], ["i", "s", "e"])
        assert auto_bucket_width(df, "s", "e") == 1.0
        empty = df.filter("i > 99")
        assert auto_bucket_width(empty, "s", "e") == 1.0


class TestAsofTolerance:
    def _frames(self, spark, rng, n_left=120, n_right=60):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        left = [
            (i, rng.randint(0, 4),
             base + dt.timedelta(minutes=rng.randint(0, 50000)))
            for i in range(n_left)
        ]
        right = [
            (rng.randint(0, 4),
             base + dt.timedelta(minutes=rng.randint(0, 50000)),
             float(j))
            for j in range(n_right)
        ]
        ldf = spark.createDataFrame(left, ["lid", "k", "ts"])
        rdf = spark.createDataFrame(right, ["k", "ts", "val"])
        return left, right, ldf, rdf

    def _pandas_asof(self, left, right, direction, tol_minutes):
        import pandas as pd

        lp = pd.DataFrame(left, columns=["lid", "k", "ts"]).sort_values("ts")
        rp = pd.DataFrame(right, columns=["k", "ts", "val"]).sort_values("ts")
        m = pd.merge_asof(
            lp, rp, on="ts", by="k", direction=direction,
            tolerance=pd.Timedelta(minutes=tol_minutes),
        )
        return {
            int(r.lid): (None if pd.isna(r.val) else float(r.val))
            for r in m.itertuples()
        }

    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    def test_matches_pandas_merge_asof(self, spark, direction):
        from datarepo_spark.operators.asof import asof_join

        rng = random.Random(41)
        left, right, ldf, rdf = self._frames(spark, rng)
        tol_min = 2000
        got = {
            r.lid: r.asof_value
            for r in asof_join(
                ldf, rdf, "ts", "ts", "k", "k",
                payload=F.col("val"),
                direction=direction,
                tolerance=tol_min * 60 * 1_000_000,
            ).collect()
        }
        want = self._pandas_asof(left, right, direction, tol_min)
        assert got == want, direction

    def test_no_tolerance_unchanged(self, spark):
        """tolerance=None must be byte-identical to the pre-tolerance
        behavior (no extra carried column in the None path)."""
        from datarepo_spark.operators.asof import asof_join

        rng = random.Random(43)
        left, right, ldf, rdf = self._frames(spark, rng, 40, 20)
        base = {
            r.lid: r.asof_value
            for r in asof_join(
                ldf, rdf, "ts", "ts", "k", "k", payload=F.col("val")
            ).collect()
        }
        wide = {
            r.lid: r.asof_value
            for r in asof_join(
                ldf, rdf, "ts", "ts", "k", "k",
                payload=F.col("val"),
                tolerance=10**18,  # wider than any distance
            ).collect()
        }
        assert base == wide


class TestIvfBatchSearch:
    def test_exhaustive_nprobe_equals_exact(self, spark):
        import numpy as np

        from datarepo_spark.functions.ivf import IVFIndex
        from datarepo_spark.functions.similarity import batch_knn

        rng = np.random.default_rng(17)
        vecs = rng.standard_normal((60, 8)).astype("float32")
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            ["vec_id", "embedding"],
        )
        queries = emb.filter("vec_id < 4").selectExpr(
            "vec_id AS query_id", "embedding"
        )
        corpus = emb.filter("vec_id >= 4")
        index = IVFIndex.fit(emb, k=4, iterations=3)
        got = sorted(
            map(tuple, index.batch_search(
                corpus, queries, k=3, nprobe=4
            ).collect())
        )
        exact = sorted(map(tuple, batch_knn(corpus, queries, k=3).collect()))
        assert got == exact

    def test_pruned_nprobe_recall(self, spark):
        """nprobe=2 of 4 cells must still recover most exact top-3
        neighbors (clustered data, so cells are meaningful)."""
        import numpy as np

        from datarepo_spark.functions.ivf import IVFIndex
        from datarepo_spark.functions.similarity import batch_knn

        rng = np.random.default_rng(19)
        centers = rng.standard_normal((4, 8)) * 4
        vecs = np.vstack(
            [c + rng.standard_normal((30, 8)) * 0.4 for c in centers]
        ).astype("float32")
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            ["vec_id", "embedding"],
        )
        queries = emb.filter("vec_id % 30 = 0").selectExpr(
            "vec_id AS query_id", "embedding"
        )
        corpus = emb.filter("vec_id % 30 != 0")
        index = IVFIndex.fit(emb, k=4, iterations=4)
        ann = {
            (r.query_id, r.vec_id)
            for r in index.batch_search(
                corpus, queries, k=3, nprobe=2
            ).collect()
        }
        exact = {
            (r.query_id, r.vec_id)
            for r in batch_knn(corpus, queries, k=3).collect()
        }
        recall = len(ann & exact) / len(exact)
        assert recall >= 0.75, recall
