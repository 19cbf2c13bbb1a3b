"""Pure-math pins for the r11 insights formulations — no Spark.

Each query's oracle re-spells a classical statistic in a
window/aggregate form chosen for cross-engine exactness; these tests
pin that the re-spelled form equals the textbook definition (a third,
independent implementation), so an oracle bug cannot hide behind
'both engines agree'."""

import math
import random

import numpy as np


def _midranks(values):
    """Textbook midranks (1-based, ties averaged) — what scipy's
    rankdata(method='average') computes."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and (
            values[order[j + 1]] == values[order[i]]
        ):
            j += 1
        avg = (i + 1 + j + 1) / 2.0
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def _cell_doubled_midranks(values):
    """The query's construction: per distinct value v with count c and
    cum_before rows strictly below, the doubled midrank is
    2*cum_before + c + 1."""
    from collections import Counter

    cnt = Counter(values)
    cum = 0
    r2 = {}
    for v in sorted(cnt):
        r2[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    return [r2[v] for v in values]


class TestSpearmanCellForm:
    def test_doubled_cell_midranks_equal_2x_textbook(self):
        rng = random.Random(13)
        for _ in range(300):
            n = rng.randint(1, 60)
            vals = [rng.randint(0, 8) for _ in range(n)]
            got = _cell_doubled_midranks(vals)
            want = [2 * r for r in _midranks(vals)]
            assert got == [int(w) for w in want], vals

    def test_spearman_equals_pearson_on_midranks(self):
        rng = random.Random(17)
        for _ in range(100):
            n = rng.randint(3, 80)
            x = [rng.randint(0, 10) for _ in range(n)]
            y = [xi * 2 + rng.randint(-3, 3) for xi in x]
            rx = np.array(_cell_doubled_midranks(x), dtype=float)
            ry = np.array(_cell_doubled_midranks(y), dtype=float)
            if np.std(rx) == 0 or np.std(ry) == 0:
                continue
            # the query's integer-sum form
            sn = float(n)
            sx, sy = rx.sum(), ry.sum()
            sxy = (rx * ry).sum()
            sxx, syy = (rx * rx).sum(), (ry * ry).sum()
            rho_query = (sn * sxy - sx * sy) / (
                math.sqrt(sn * sxx - sx * sx)
                * math.sqrt(sn * syy - sy * sy)
            )
            rho_ref = np.corrcoef(
                _midranks(x), _midranks(y)
            )[0, 1]
            assert abs(rho_query - rho_ref) < 1e-12, (x, y)


class TestJensenShannon:
    def _js(self, p, q):
        def term(a, b):
            m = (a + b) / 2
            return a * math.log(a / m) if a > 0 else 0.0

        return 0.5 * sum(
            term(pi, qi) + term(qi, pi) for pi, qi in zip(p, q)
        )

    def test_bounds_and_symmetry(self):
        rng = random.Random(19)
        for _ in range(200):
            k = rng.randint(2, 8)
            p = [rng.random() for _ in range(k)]
            q = [rng.random() for _ in range(k)]
            p = [x / sum(p) for x in p]
            q = [x / sum(q) for x in q]
            js = self._js(p, q)
            assert -1e-12 <= js <= math.log(2) + 1e-12
            assert abs(js - self._js(q, p)) < 1e-12

    def test_zero_iff_equal(self):
        p = [0.2, 0.3, 0.5]
        assert self._js(p, p) == 0.0
        q = [0.5, 0.3, 0.2]
        assert self._js(p, q) > 1e-3

    def test_zero_count_convention_matches_limit(self):
        # 0*ln(0/m) -> 0 is the correct limit; a disjoint pair maxes
        # out at ln 2
        p = [1.0, 0.0]
        q = [0.0, 1.0]
        assert abs(self._js(p, q) - math.log(2)) < 1e-12


class TestPsiSmoothing:
    def _psi(self, nr, nc):
        tr, tc = sum(nr), sum(nc)
        k = len(nr)
        out = 0.0
        for a, b in zip(nr, nc):
            p = (a + 1) / (tr + k)
            q = (b + 1) / (tc + k)
            out += (q - p) * math.log(q / p)
        return out

    def test_identical_counts_give_zero(self):
        assert self._psi([5, 10, 0, 3], [5, 10, 0, 3]) == 0.0

    def test_nonnegative_and_grows_with_shift(self):
        rng = random.Random(23)
        for _ in range(200):
            k = rng.randint(2, 10)
            nr = [rng.randint(0, 50) for _ in range(k)]
            nc = [rng.randint(0, 50) for _ in range(k)]
            assert self._psi(nr, nc) >= -1e-12
        small = self._psi([100, 100], [110, 90])
        big = self._psi([100, 100], [190, 10])
        assert big > small > 0


class TestSweepLineConcurrency:
    def _peak_sweep(self, intervals):
        pts = []
        for s, e in intervals:
            pts.append((s, 1))
            pts.append((e, -1))
        # pinned order: time asc, +1 before -1 (closed intervals)
        pts.sort(key=lambda t: (t[0], -t[1]))
        live = peak = 0
        for _, d in pts:
            live += d
            peak = max(peak, live)
        return peak

    def _peak_brute(self, intervals):
        # peak is achieved at some interval start (closed intervals)
        best = 0
        for s, _ in intervals:
            best = max(
                best,
                sum(1 for a, b in intervals if a <= s <= b),
            )
        return best

    def test_sweep_equals_brute_force(self):
        rng = random.Random(29)
        for _ in range(300):
            n = rng.randint(0, 30)
            iv = []
            for _ in range(n):
                s = rng.randint(0, 50)
                e = s + rng.randint(0, 10)
                iv.append((s, e))
            assert self._peak_sweep(iv) == self._peak_brute(iv), iv

    def test_instant_sessions_count_at_their_instant(self):
        # single-event sessions (start == end) are live at that instant
        iv = [(5, 5), (5, 5), (5, 9)]
        assert self._peak_sweep(iv) == 3


class TestAdamicAdarQuantizedSum:
    def test_quantized_sum_is_order_independent_and_close(self):
        rng = random.Random(31)
        for _ in range(100):
            degs = [rng.randint(2, 10000) for _ in range(rng.randint(1, 50))]
            # the query quantizes each 1/ln(deg) to 9 decimal digits
            # BEFORE summing: integer micro-units sum exactly in any
            # order
            terms = [round(1.0 / math.log(d), 9) for d in degs]
            ints = [int(round(t * 1e9)) for t in terms]
            a = sum(ints)
            shuffled = ints[:]
            rng.shuffle(shuffled)
            assert sum(shuffled) == a
            # and the quantization error vs the float sum is bounded by
            # n * 0.5e-9
            float_sum = sum(1.0 / math.log(d) for d in degs)
            assert abs(a / 1e9 - float_sum) <= len(degs) * 5e-10 + 1e-12


class TestOhlcRowNumberForm:
    def test_rn_form_equals_direct_first_last(self):
        rng = random.Random(37)
        for _ in range(200):
            n = rng.randint(1, 40)
            rows = [
                (rng.randint(0, 10), rng.randint(0, 10**6), rng.random())
                for _ in range(n)
            ]  # (ts, event_id, value); ids may collide across ts — fine
            ordered = sorted(rows, key=lambda r: (r[0], r[1]))
            open_ = ordered[0][2]
            close = ordered[-1][2]
            # the query's spelling: rn==1 / rn==cnt over the same order
            rn = {id(r): i + 1 for i, r in enumerate(ordered)}
            cnt = len(ordered)
            got_open = [r[2] for r in ordered if rn[id(r)] == 1][0]
            got_close = [r[2] for r in ordered if rn[id(r)] == cnt][0]
            assert got_open == open_ and got_close == close


class TestKcorePeel:
    def _peel_rounds(self, edges, k, rounds):
        cur = set(edges)
        out = []
        for _ in range(rounds):
            from collections import Counter

            dc = Counter(c for c, _ in cur)
            ds = Counter(s for _, s in cur)
            cur = {
                (c, s)
                for c, s in cur
                if dc[c] >= k and ds[s] >= k
            }
            out.append(
                (
                    len(cur),
                    len({c for c, _ in cur}),
                    len({s for _, s in cur}),
                )
            )
        return out

    def test_three_rounds_reach_fixpoint_on_small_graphs(self):
        # on graphs this small the peel stabilizes within 3 rounds, so
        # the bounded unrolling equals the true 3-core
        rng = random.Random(41)
        for _ in range(100):
            n = rng.randint(0, 40)
            edges = {
                (rng.randint(0, 8), rng.randint(0, 8)) for _ in range(n)
            }
            r = self._peel_rounds(edges, 3, 5)
            # monotone non-increasing edge counts
            assert all(r[i][0] >= r[i + 1][0] for i in range(4))

    def test_peel_removes_subcore_endpoints(self):
        # a 3x3 biclique is a 3-core; a pendant edge is peeled round 1
        core = {(c, s) for c in (0, 1, 2) for s in (0, 1, 2)}
        edges = core | {(9, 0)}
        r = self._peel_rounds(edges, 3, 3)
        assert r[0] == (9, 3, 3)
        assert r[2] == (9, 3, 3)


class TestFleschSyllables:
    def _vowel_groups(self, word):
        # the query's spelling: collapse [aeiouy]+ runs, count markers
        import re

        collapsed = re.sub(r"[aeiouy]+", "V", word)
        return max(1, collapsed.count("V"))

    def test_known_words(self):
        assert self._vowel_groups("data") == 2
        assert self._vowel_groups("spark") == 1
        assert self._vowel_groups("readability") == 5
        assert self._vowel_groups("rhythm") == 1  # y counts as vowel
        assert self._vowel_groups("xyz") == 1  # min 1 floor
        assert self._vowel_groups("queue") == 1  # 'ueue' is ONE run
        assert self._vowel_groups("syllable") == 3

    def test_group_count_identity(self):
        import re

        rng = random.Random(43)
        letters = "abcdefghijklmnopqrstuvwxyz"
        for _ in range(300):
            w = "".join(
                rng.choice(letters) for _ in range(rng.randint(1, 12))
            )
            groups = len(re.findall(r"[aeiouy]+", w))
            assert self._vowel_groups(w) == max(1, groups)
