"""Streaming-admission soak harness (round-7): drives the hardened
incremental-dedup loop end-to-end beyond what the unit tests cover —
many micro-batch epochs with interleaved corpus-dup resends, then a
RESTART with a fresh checkpoint (epochs renumber from 0; the
checkpoint-bound txn identity must keep admissions flowing), then a
content replay through a third checkpoint (already-admitted documents
must be rejected by the INDEX, not the ledger).

Usage: python tools/soak_admission.py  [sf_dir]
Exit code 0 = all assertions green.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from datarepo_spark.functions.dedup_index import build_dedup_index  # noqa: E402
from datarepo_spark.streaming.incremental_dedup import (  # noqa: E402
    dedup_stream_against_index,
)
from datarepo_spark.tables.delta_table import DeltalakeTable  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="soak-admission-")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    corpus = docs.filter("doc_id < 100")
    idx = os.path.join(root, "idx")
    out = os.path.join(root, "curated")
    build_dedup_index(spark, corpus, idx)

    src = os.path.join(root, "incoming")
    os.makedirs(src)
    for i in range(8):
        lo = 100 + i * 40
        batch = docs.filter(f"doc_id >= {lo} AND doc_id < {lo + 40}")
        dups = corpus.limit(5).selectExpr(
            f"doc_id + {10000 + i * 10} AS doc_id",
            "text", "lang", "source", "n_chars",
        )
        batch.unionByName(dups).coalesce(1).write.parquet(
            os.path.join(src, f"f{i}")
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    def _jobs():
        # total scheduler jobs so far — streaming foreachBatch jobs run
        # under a per-stream job group, so group-scoped APIs miss them
        return (
            spark._jsparkSession.sparkContext().statusStore()
            .jobsList(None).size()
        )

    jobs_before = _jobs()
    q = dedup_stream_against_index(
        stream, idx, out,
        checkpoint_dir=os.path.join(root, "ck1"), threshold=0.6,
    )
    q.awaitTermination(300)
    jobs_run = _jobs() - jobs_before
    n1 = DeltalakeTable("c", out)(spark=spark).count()
    print(f"after 8-epoch stream: {n1} admitted")
    # per-micro-batch job budget line: ~27/epoch at r8 (the loop
    # measures the batch once and reuses it for both broadcast gates;
    # the hard regression gate for that reuse is
    # test_dedup_index.py::TestBatchStatsReuse). Watch this number —
    # per-stage count jobs creeping back in shows up here first.
    print(f"scheduler jobs for the 8 epochs: {jobs_run} "
          f"({jobs_run / 8:.1f}/epoch)")
    assert n1 <= 330, "corpus dups leaked into the curated table"

    # fresh checkpoint: epochs renumber from 0 — admissions must land
    src2 = os.path.join(root, "incoming2")
    os.makedirs(src2)
    docs.filter("doc_id >= 450 AND doc_id < 480").coalesce(1).write.parquet(
        os.path.join(src2, "g0")
    )
    q2 = dedup_stream_against_index(
        spark.readStream.schema(docs.schema).parquet(src2 + "/*"),
        idx, out,
        checkpoint_dir=os.path.join(root, "ck2"), threshold=0.6,
    )
    q2.awaitTermination(180)
    n2 = DeltalakeTable("c", out)(spark=spark).count()
    print(f"after fresh-checkpoint restart: {n2}")
    assert n2 > n1, "fresh-checkpoint stream was swallowed as a replay"

    # replaying the same CONTENT through a third checkpoint: the index
    # (not the ledger) must reject every document
    q3 = dedup_stream_against_index(
        spark.readStream.schema(docs.schema).parquet(src2 + "/*"),
        idx, out,
        checkpoint_dir=os.path.join(root, "ck3"), threshold=0.6,
    )
    q3.awaitTermination(180)
    n3 = DeltalakeTable("c", out)(spark=spark).count()
    print(f"after content replay via ck3: {n3}")
    assert n3 == n2, "already-admitted documents were re-admitted"
    print("SOAK: all assertions green")


if __name__ == "__main__":
    main()
