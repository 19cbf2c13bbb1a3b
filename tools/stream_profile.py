"""Stage-time the streaming twins (VERDICT r13 #2): run each twin's
stream with the real gate fixture and dump the per-micro-batch
StreamingQueryProgress durationMs decomposition (addBatch / getBatch /
latestOffset / queryPlanning / walCommit / commitOffsets /
triggerExecution) plus stateOperators metrics, so "FLOOR — micro-batch
machinery" becomes a measured claim instead of a hypothesis.

Usage: [SPARK_GRAFT_SF_DIR=...] python tools/stream_profile.py [ewma|sessionize|all]
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


def profile(result, name: str, output_mode: str) -> dict:
    query = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    t0 = time.perf_counter()
    try:
        query.processAllAvailable()
        wall = time.perf_counter() - t0
        progress = [json.loads(p.json) for p in query.recentProgress]
    finally:
        query.stop()
    batches = []
    for p in progress:
        row = {
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows"),
            "durationMs": p.get("durationMs"),
        }
        ops = []
        for so in p.get("stateOperators", []):
            ops.append(
                {
                    k: so.get(k)
                    for k in (
                        "operatorName",
                        "numRowsTotal",
                        "numRowsUpdated",
                        "allUpdatesTimeMs",
                        "commitTimeMs",
                        "numShufflePartitions",
                        "numStateStoreInstances",
                    )
                }
            )
        row["stateOperators"] = ops
        batches.append(row)
    # sum each durationMs key across batches
    total: dict[str, int] = {}
    for b in batches:
        for k, v in (b["durationMs"] or {}).items():
            total[k] = total.get(k, 0) + v
    return {"wall_sec": round(wall, 3), "total_durationMs": total, "batches": batches}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="stream-profile",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from datarepo_spark.queries import sources as S
    from datarepo_spark.streaming.events import (
        read_events_stream,
        session_aggregation,
    )
    from datarepo_spark.streaming.stateful import stateful_ewma

    path = S._sliced_events_fixture(sf_dir)
    reps = int(os.environ.get("REPS", "2"))
    out = {}
    for rep in range(reps):
        with S._stream_shuffle_partitions(spark):
            if which in ("ewma", "all"):
                stream = read_events_stream(
                    spark, path, max_files_per_trigger=1
                )
                r = stateful_ewma(stream, horizon=16, decay=0.8)
                out[f"ewma_rep{rep}"] = profile(
                    r, f"prof_ewma_{rep}", "append"
                )
            if which in ("sessionize", "all"):
                stream = read_events_stream(
                    spark, path, max_files_per_trigger=1
                )
                r = session_aggregation(
                    stream, gap="30 minutes", watermark="36500 days"
                )
                out[f"sessionize_rep{rep}"] = profile(
                    r, f"prof_sess_{rep}", "complete"
                )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
