#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + fetch row count); the
session is warmed once with a trivial job so JVM startup isn't billed to
the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datarepo_spark.session import get_spark  # noqa: E402
from datarepo_spark.queries.registry import REGISTRY  # noqa: E402
from datarepo_spark.queries import extensions  # noqa: E402,F401

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "window_rank_topk_per_group",
    "dedup_distinct_subset",
    "events_tumbling_window",
    "events_sessionize",
    "agg_rollup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="datarepo-spark-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY.get(name)
        if q is None:
            continue
        start = time.perf_counter()
        df = q.spark_fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - start, 4)
        assert n >= 0

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
