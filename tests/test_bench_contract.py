"""The bench stdout contract (VERDICT r13 #1): the ONE JSON line must
always fit the driver's bounded tail capture AND always carry a
per-query map — at 84 headline queries r13's fallback dropped the map
entirely, leaving PERF per_query/geomean/scaling empty. No Spark needed:
pure line-encoding tests."""

import json
import random

import bench


def _line(timings, value=132.2101, steady=89.5934):
    out = {
        "metric": "headline_queries_total",
        "value": value,
        "unit": "sec",
        "sf": 0.1,
        "steady_total": steady,
    }
    return bench.compact_line(out, timings)


def _mk_timings(names):
    """Realistic bench shape (BENCH_DETAIL r13): a long sub-second tail
    with a handful of multi-second heavies."""
    rng = random.Random(14)
    return {
        n: round(
            rng.uniform(0.05, 0.8)
            if i % 4
            else rng.uniform(1.0, 13.0),
            4,
        )
        for i, n in enumerate(names)
    }


class TestCompactLine:
    def test_small_map_full_precision(self):
        timings = {"q1": 1.23456, "q2": 0.4567}
        parsed = json.loads(_line(timings))
        assert parsed["queries"] == {"q1": 1.235, "q2": 0.457}
        assert "queries_truncated" not in parsed

    def test_headline_84_carries_queries(self):
        timings = _mk_timings(bench.HEADLINE)
        line = _line(timings)
        assert len(line) <= bench._LINE_BUDGET
        parsed = json.loads(line)
        assert parsed["queries"], "per-query map must never be empty"
        assert len(parsed["queries"]) >= 50, (
            "the truncated map should still carry the bulk of the "
            f"headline set, got {len(parsed['queries'])}"
        )
        # kept rows are exactly the slowest ones: every kept value >=
        # every dropped value
        dropped = set(timings) - set(parsed["queries"])
        if dropped:
            assert parsed["queries_truncated"] == len(dropped)
            assert min(
                timings[k] for k in parsed["queries"]
            ) >= max(timings[k] for k in dropped)
        # kept totals dominate: the visible rows carry >=95% of the sum
        assert sum(
            timings[k] for k in parsed["queries"]
        ) >= 0.95 * sum(timings.values())

    def test_100_queries_still_fits(self):
        # VERDICT r13 #1: "prove it at 100 queries" — synthetic names at
        # the real registry's length distribution
        names = list(bench.HEADLINE) + [
            f"future_operator_family_row_{i:02d}"
            for i in range(100 - len(bench.HEADLINE))
        ]
        assert len(names) == 100
        timings = _mk_timings(names)
        line = _line(timings)
        assert len(line) <= bench._LINE_BUDGET
        parsed = json.loads(line)
        assert parsed["queries"]
        assert parsed["value"] == 132.2101
        assert parsed["steady_total"] == 89.5934

    def test_single_json_line(self):
        line = _line(_mk_timings(bench.HEADLINE))
        assert "\n" not in line
        json.loads(line)  # must parse standalone
