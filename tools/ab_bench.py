"""Isolated per-query timing for paired A/B comparisons (SCALE.md r13
method): fresh engine session, sf0.001 warmup of the named queries
(JIT/codegen amortization, same as bench.py), then per query
unpersist+clearCache and N consecutive reps, reporting the minimum.

Usage: [REPS=3] [SPARK_GRAFT_SF_DIR=...] python tools/ab_bench.py q1 q2 ...
Prints one JSON line {query: min_sec}. Run back-to-back on two trees
(git worktree) for a paired comparison — absolute numbers from
different host windows are NOT comparable on this sandbox.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from datarepo_spark.session import get_spark  # noqa: E402
from datarepo_spark.queries.registry import REGISTRY  # noqa: E402
from datarepo_spark.queries import (  # noqa: E402,F401
    analysis,
    delta_queries,
    extensions,
    insights,
    physical,
    ranked,
    sources,
    tpch_extra,
)
from datarepo_spark.functions.dedup import unpersist_intermediates  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    reps = int(os.environ.get("REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="datarepo-ab-bench",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        REGISTRY[name].spark_fn(spark, warm_dir).count()
    out: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(reps):
            unpersist_intermediates()
            spark.catalog.clearCache()
            start = time.perf_counter()
            n = REGISTRY[name].spark_fn(spark, sf_dir).count()
            elapsed = round(time.perf_counter() - start, 4)
            assert n >= 0
            best = elapsed if best is None else min(best, elapsed)
        out[name] = best
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
