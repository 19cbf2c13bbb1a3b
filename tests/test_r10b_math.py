"""Pure-math pins for the r10b analysis formulations — no Spark.

Each query's oracle re-spells a classical statistic in a
window/aggregate form chosen for cross-engine exactness; these tests
pin that the re-spelled form equals the textbook definition, so an
oracle bug cannot hide behind 'both engines agree'."""

import math
import random

import numpy as np


def _cusum_recursive(devs):
    s = mx = 0
    for d in devs:
        s = max(0, s + d)
        mx = max(mx, s)
    return mx


def _cusum_prefix(devs):
    # S_t = C_t - min(0, min_{j<=t} C_j); answer = max_t S_t
    c = 0
    run_min = 0
    best = 0
    for d in devs:
        c += d
        run_min = min(run_min, c)
        best = max(best, c - min(0, run_min))
    return best


class TestCusumPrefixIdentity:
    def test_identity_on_random_integer_series(self):
        rng = random.Random(7)
        for _ in range(500):
            n = rng.randint(0, 40)
            devs = [rng.randint(-50, 50) for _ in range(n)]
            assert _cusum_recursive(devs) == _cusum_prefix(devs), devs

    def test_identity_adversarial_shapes(self):
        for devs in (
            [],
            [5],
            [-5],
            [10, -20, 15, -1, -1, 30],
            [1] * 20,
            [-1] * 20,
            [100, -100] * 10,
        ):
            assert _cusum_recursive(devs) == _cusum_prefix(devs), devs


class TestGiniRankForm:
    def test_rank_form_equals_mean_absolute_difference(self):
        # G = sum_ij |x_i - x_j| / (2 n^2 mu)  (textbook)
        #   vs (2*sum i*x_(i) - (n+1)*sum x) / (n*sum x)  (rank form)
        rng = random.Random(11)
        for _ in range(200):
            n = rng.randint(1, 30)
            xs = [rng.randint(1, 1000) for _ in range(n)]
            sx = sum(xs)
            srt = sorted(xs)
            six = sum((i + 1) * x for i, x in enumerate(srt))
            rank_form = (2 * six - (n + 1) * sx) / (n * sx)
            mad = sum(abs(a - b) for a in xs for b in xs)
            textbook = mad / (2 * n * sx)
            assert abs(rank_form - textbook) < 1e-12

    def test_tie_order_invariance(self):
        # swapping ranks among equal values cannot change sum(i*x)
        xs = [5, 5, 5, 2, 2, 9]
        srt = sorted(xs)
        base = sum((i + 1) * x for i, x in enumerate(srt))
        # any stable permutation of equal values yields the same sum
        assert base == sum(
            (i + 1) * x for i, x in enumerate([2, 2, 5, 5, 5, 9])
        )


class TestAcfClosedForm:
    def test_equals_numpy_corrcoef(self):
        rng = np.random.RandomState(3)
        x = rng.randint(10, 200, size=300).astype(np.int64)
        for lag in (1, 7, 24):
            a, b = x[:-lag], x[lag:]
            n = len(a)
            sx, sy = int(a.sum()), int(b.sum())
            sxy = int((a * b).sum())
            sxx = int((a * a).sum())
            syy = int((b * b).sum())
            acf = (n * sxy - sx * sy) / (
                math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
            )
            ref = np.corrcoef(a, b)[0, 1]
            assert abs(acf - ref) < 1e-10


class TestWelchClosedForm:
    def test_equals_two_pass_definition(self):
        rng = np.random.RandomState(5)
        a = rng.randint(1, 5000, size=400).astype(np.int64)
        b = rng.randint(1, 7000, size=300).astype(np.int64)

        def moments(x):
            n = len(x)
            sx, sxx = int(x.sum()), int((x * x).sum())
            m = sx / n
            var = (sxx - sx * sx / n) / (n - 1)
            return n, m, var

        na, ma, va = moments(a)
        nb, mb, vb = moments(b)
        t = (ma - mb) / math.sqrt(va / na + vb / nb)
        df = (va / na + vb / nb) ** 2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
        # reference: direct sample-mean/variance
        ref_va, ref_vb = a.var(ddof=1), b.var(ddof=1)
        ref_t = (a.mean() - b.mean()) / math.sqrt(
            ref_va / na + ref_vb / nb
        )
        assert abs(t - ref_t) < 1e-9
        assert df > min(na, nb) - 1 or df <= na + nb - 2  # Welch bounds


class TestPoissonBootstrapTable:
    def test_cdf_literals_match_math(self):
        from datarepo_spark.queries.analysis import _POISSON1_CDF

        c = 0.0
        for k, lit in _POISSON1_CDF:
            c += math.exp(-1) / math.factorial(k)
            assert abs(lit - round(c, 12)) < 1e-15

    def test_weights_approximate_poisson1(self):
        from datarepo_spark.queries.analysis import _POISSON1_CDF

        # a fine uniform grid pushed through the inverse CDF must
        # reproduce the pmf to grid resolution
        grid = [(i + 0.5) / 100000 for i in range(100000)]
        counts = {}
        for u in grid:
            w = 6
            for k, p in _POISSON1_CDF:
                if u < p:
                    w = k
                    break
            counts[w] = counts.get(w, 0) + 1
        for k in range(4):
            pmf = math.exp(-1) / math.factorial(k)
            assert abs(counts.get(k, 0) / 100000 - pmf) < 1e-4

    def test_interp_positions_are_literals(self):
        from datarepo_spark.queries.analysis import _BOOT_B, _boot_interp

        lo, hi, frac = _boot_interp("", 0.025, _BOOT_B)
        assert (lo, hi) == (0, 1) and abs(frac - 0.975) < 1e-12
        lo, hi, frac = _boot_interp("", 0.975, _BOOT_B)
        assert (lo, hi) == (38, 39) and abs(frac - 0.025) < 1e-9


class TestAucRankSumIdentity:
    def test_equals_naive_pairwise_with_ties(self):
        rng = random.Random(13)
        for _ in range(100):
            n = rng.randint(2, 60)
            v = [rng.randint(1, 12) for _ in range(n)]  # heavy ties
            y = [rng.random() < 0.4 for _ in range(n)]
            if not (any(y) and not all(y)):
                continue
            pos = [a for a, b in zip(v, y) if b]
            neg = [a for a, b in zip(v, y) if not b]
            naive = sum(
                1.0 if p > q else 0.5 if p == q else 0.0
                for p in pos
                for q in neg
            ) / (len(pos) * len(neg))
            # rank-sum form over per-value cells
            from collections import Counter

            cp, ct = Counter(pos), Counter(pos + neg)
            cum = 0
            two_rpos = 0
            for val in sorted(ct):
                two_rpos += cp.get(val, 0) * (2 * cum + ct[val] + 1)
                cum += ct[val]
            npos, nneg = len(pos), len(neg)
            auc = (two_rpos - npos * (npos + 1)) / (2 * npos * nneg)
            assert abs(auc - naive) < 1e-12
