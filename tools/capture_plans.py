"""Capture .explain("formatted") for named registry queries into
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence the
judge checks plan claims against).

Usage: python tools/capture_plans.py <tag> <suffix> <query> [<query> ...]
e.g.   python tools/capture_plans.py r13 before graph_pagerank

Notes: building a registry DataFrame can itself run jobs (two-pass
boundary samples, checkpoint-pinned graph iterations, streaming twins),
so the captured plan is the plan of the RETURNED frame — for iterative
queries that is the post-iteration scan, and the interesting shape is
the per-iteration join/agg, which the in-code docstrings cover. For
plain relational queries the capture is the full physical plan."""

from __future__ import annotations

import os
import sys

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
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="datarepo-plan-capture",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
    )
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        unpersist_intermediates()
        spark.catalog.clearCache()
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        n_exchange = text.count("Exchange")
        print(f"{name}: {path} ({n_exchange} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
