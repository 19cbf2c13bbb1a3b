"""Hardening of the streaming admission loop (r7).

- Txn identity binds to the CHECKPOINT: a restarted stream with a
  fresh checkpoint restarts epochs at 0 and must NOT have its batches
  swallowed as replays of the old stream's epochs.
- Broadcast size gate: batch-derived frames (index probe bucket map,
  within-batch winners) are only broadcast while the batch is
  micro-batch-sized; a backfill chunk above the gate falls back to a
  shuffled join with identical results.
- Borderline exact-verify: estimate-mode probe decisions within ±2σ of
  the threshold are re-checked by exact Jaccard against the curated
  table the loop owns.
- Optional within-batch near-dup pass.
"""

import os

import pytest
from pyspark.sql import functions as F

from datarepo_spark.functions.dedup import (
    jaccard,
    shingles,
    unpersist_intermediates,
)
from datarepo_spark.functions.dedup_index import (
    build_dedup_index,
    dedup_against_index,
)
from datarepo_spark.streaming.incremental_dedup import (
    admit_novel_documents,
    dedup_stream_against_index,
)
from datarepo_spark.tables.delta_table import DeltalakeTable

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill nearby every single morning"
)

NOVEL_A = (
    "a brand new article describing adaptive query execution "
    "and dynamic partition coalescing in painstaking detail"
)
NOVEL_B = (
    "final unique piece on columnar storage layouts and "
    "dictionary encoding tradeoffs for very wide tables"
)


def _corpus(spark):
    rows = [
        (0, BASE),
        (1, "completely different text about spark shuffles and "
            "partition pruning strategies for large scale joins"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _curated_ids(spark, out_uri):
    return {
        r.doc_id
        for r in DeltalakeTable("curated", out_uri)(spark=spark)
        .select("doc_id")
        .collect()
    }


class TestCheckpointBoundTxnIdentity:
    def test_distinct_txn_ids_do_not_cross_swallow(self, spark, tmp_path):
        """Two admission callers with different txn identities against
        the same curated table must not swallow each other's epoch 0 —
        the exact failure a restarted stream with a fresh checkpoint
        (or two streams sharing the default query name) used to hit."""
        index_uri = str(tmp_path / "idx")
        out_uri = str(tmp_path / "curated")
        build_dedup_index(spark, _corpus(spark), index_uri)
        a = spark.createDataFrame([(10, NOVEL_A)], ["doc_id", "text"])
        b = spark.createDataFrame([(20, NOVEL_B)], ["doc_id", "text"])
        n = admit_novel_documents(
            a, index_uri, out_uri, epoch_id=0, txn_app_id="stream-ckpt1"
        )
        assert n == 1
        # a DIFFERENT stream's epoch 0 (fresh checkpoint) must land
        n = admit_novel_documents(
            b, index_uri, out_uri, epoch_id=0, txn_app_id="stream-ckpt2"
        )
        assert n == 1
        assert _curated_ids(spark, out_uri) == {10, 20}
        # a true replay of stream 1's epoch 0 IS swallowed: the count
        # reflects the batch, but neither table gains rows
        admit_novel_documents(
            spark.createDataFrame([(30, "wholly new text about "
                                        "vectorized parquet readers")],
                                  ["doc_id", "text"]),
            index_uri, out_uri, epoch_id=0, txn_app_id="stream-ckpt1",
        )
        assert _curated_ids(spark, out_uri) == {10, 20}
        unpersist_intermediates()

    def test_fresh_checkpoint_stream_not_swallowed(self, spark, tmp_path):
        """End-to-end: stream 1 (checkpoint A) admits; stream 2 with the
        SAME query name but a fresh checkpoint restarts epochs at 0 and
        its novel docs must still be admitted."""
        index_uri = str(tmp_path / "idx")
        out_uri = str(tmp_path / "curated")
        build_dedup_index(spark, _corpus(spark), index_uri)
        schema = "doc_id long, text string"

        src1 = str(tmp_path / "src1")
        os.makedirs(src1)
        spark.createDataFrame([(10, NOVEL_A)], schema).coalesce(
            1
        ).write.parquet(os.path.join(src1, "f1"))
        q = dedup_stream_against_index(
            spark.readStream.schema(schema).parquet(src1 + "/*"),
            index_uri,
            out_uri,
            checkpoint_dir=str(tmp_path / "ckpt1"),
        )
        q.awaitTermination(120)
        assert _curated_ids(spark, out_uri) == {10}

        src2 = str(tmp_path / "src2")
        os.makedirs(src2)
        spark.createDataFrame([(20, NOVEL_B)], schema).coalesce(
            1
        ).write.parquet(os.path.join(src2, "f1"))
        q = dedup_stream_against_index(
            spark.readStream.schema(schema).parquet(src2 + "/*"),
            index_uri,
            out_uri,
            checkpoint_dir=str(tmp_path / "ckpt2"),  # fresh: epoch 0
        )
        q.awaitTermination(120)
        assert _curated_ids(spark, out_uri) == {10, 20}
        unpersist_intermediates()


class TestBroadcastSizeGate:
    def _batch(self, spark):
        return spark.createDataFrame(
            [(100, BASE.replace("morning", "evening")), (101, NOVEL_A)],
            ["doc_id", "text"],
        )

    def test_gate_exceeded_drops_broadcast_hint(self, spark, tmp_path):
        """Above the gate the probe join must not carry a forced
        broadcast (with auto-broadcast disabled the join degrades to a
        shuffle join), and the pairs are identical either way."""
        uri = str(tmp_path / "gate")
        build_dedup_index(spark, _corpus(spark), uri)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            small = dedup_against_index(
                spark, self._batch(spark), uri, threshold=0.5,
                verify="estimate",
            )
            plan_small = (
                small._jdf.queryExecution().executedPlan().toString()
            )
            # the (band, bucket) join against the index specifically —
            # the Delta scan machinery has its own unrelated broadcast
            assert "BroadcastHashJoin [band" in plan_small  # hint honored
            big = dedup_against_index(
                spark, self._batch(spark), uri, threshold=0.5,
                verify="estimate", max_broadcast_rows=0,
            )
            plan_big = big._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin [band" not in plan_big
            assert (
                "SortMergeJoin [band" in plan_big
                or "ShuffledHashJoin [band" in plan_big
            )
            rows = lambda df: {  # noqa: E731
                (r.batch_id, r.corpus_id, r.jaccard) for r in df.collect()
            }
            assert rows(small) == rows(big)
            assert rows(small)  # non-vacuous
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        unpersist_intermediates()

    def test_byte_budget_forces_shuffle_below_row_cap(
        self, spark, tmp_path
    ):
        """A batch of WIDE rows (long string ids) must fall back to the
        shuffled join even though its row count is far below the row
        cap — the byte budget, not the row cap, is the operative bound
        (r7 advice: the row gate under-counted by the band factor and
        ignored id width)."""
        uri = str(tmp_path / "wide")
        wide_id = lambda i: f"doc-{i:04d}-" + "x" * 500  # noqa: E731
        corpus = spark.createDataFrame(
            [
                (wide_id(0), BASE),
                (wide_id(1), "completely different text about spark "
                             "shuffles and partition pruning strategies"),
            ],
            ["doc_id", "text"],
        )
        build_dedup_index(spark, corpus, uri)
        batch = spark.createDataFrame(
            [
                (wide_id(100), BASE.replace("morning", "evening")),
                (wide_id(101), NOVEL_A),
            ],
            ["doc_id", "text"],
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # 2 docs x 16 bands = 32 rows << the 2M row cap, but each
            # row carries a ~508-byte id: a 4 KiB byte budget must drop
            # the hint
            narrow = dedup_against_index(
                spark, batch, uri, threshold=0.5, verify="estimate",
            )
            plan_n = narrow._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin [band" in plan_n
            capped = dedup_against_index(
                spark, batch, uri, threshold=0.5, verify="estimate",
                max_broadcast_bytes=4096,
            )
            plan_c = capped._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin [band" not in plan_c
            rows = lambda df: {  # noqa: E731
                (r.batch_id, r.corpus_id, r.jaccard) for r in df.collect()
            }
            assert rows(narrow) == rows(capped)
            assert rows(narrow)  # non-vacuous
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        unpersist_intermediates()

    def test_admit_large_chunk_same_admissions(self, spark, tmp_path):
        """admit_novel_documents above the gate (max_broadcast_rows=0:
        every broadcast falls back to a shuffled join) admits exactly
        the same ids as the micro-batch path."""
        batch = spark.createDataFrame(
            [
                (100, BASE),              # corpus dup -> dropped
                (101, NOVEL_A),           # novel
                (102, NOVEL_A),           # within-batch exact dup of 101
                (103, NOVEL_B),           # novel
            ],
            ["doc_id", "text"],
        )
        admitted = {}
        for label, gate in (("bcast", 2_000_000), ("shuffle", 0)):
            idx = str(tmp_path / f"idx_{label}")
            out = str(tmp_path / f"out_{label}")
            build_dedup_index(spark, _corpus(spark), idx)
            admit_novel_documents(
                batch, idx, out, epoch_id=0, max_broadcast_rows=gate
            )
            admitted[label] = _curated_ids(spark, out)
        assert admitted["bcast"] == admitted["shuffle"] == {101, 103}
        unpersist_intermediates()


class TestBorderlineExactVerify:
    THRESHOLD = 0.7

    def _find_misclassified(self, spark, tmp_path):
        """Deterministically find a batch doc whose 64-lane signature
        estimate lands on the wrong side of the threshold vs its exact
        Jaccard against an indexed doc, within the ±2σ borderline band
        (σ = √(t(1-t)/64) ≈ 0.057 → band ≈ [0.586, 0.814])."""
        import math

        words = BASE.split()
        variants = []
        vid = 0
        for n_repl in range(2, 12):
            for start in range(0, len(words) - n_repl, 3):
                w = list(words)
                for j in range(n_repl):
                    w[start + j] = f"tok{vid}x{j}"
                variants.append((vid, " ".join(w)))
                vid += 1
        cand = spark.createDataFrame(variants, ["doc_id", "text"])
        uri = str(tmp_path / "searchidx")
        base_df = spark.createDataFrame([(0, BASE)], ["doc_id", "text"])
        build_dedup_index(spark, base_df, uri)
        est = {
            r.batch_id: r.jaccard
            for r in dedup_against_index(
                spark, cand, uri, threshold=0.0, verify="estimate"
            ).collect()
        }
        exact = {
            r.doc_id: r.j
            for r in cand.select(
                "doc_id", shingles(F.col("text")).alias("sh")
            )
            .crossJoin(
                base_df.select(shingles(F.col("text")).alias("sh0"))
            )
            .select(
                "doc_id",
                F.round(jaccard(F.col("sh"), F.col("sh0")), 6).alias("j"),
            )
            .collect()
        }
        t = self.THRESHOLD
        sigma = math.sqrt(t * (1 - t) / 64.0)
        lo, hi = t - 2 * sigma, t + 2 * sigma
        for v, text in variants:
            e = est.get(v)
            if e is None or not (lo <= e < hi):
                continue
            if (e >= t) != (exact[v] >= t):
                return text, exact[v], e
        pytest.fail("no borderline misclassification in search set")

    def _setup_loop(self, spark, root):
        """Index + curated table owned by the loop: the corpus doc is
        admitted THROUGH the loop so its text lives in the curated
        table (the borderline verifier's source)."""
        idx = str(root / "idx")
        out = str(root / "out")
        seed = spark.createDataFrame(
            [(900, "seed document keeping the index non-empty with "
                   "words shared by nothing else here")],
            ["doc_id", "text"],
        )
        build_dedup_index(spark, seed, idx)
        n = admit_novel_documents(
            spark.createDataFrame([(0, BASE)], ["doc_id", "text"]),
            idx, out, threshold=self.THRESHOLD, epoch_id=0,
        )
        assert n == 1
        return idx, out

    def test_borderline_misclassification_corrected(self, spark, tmp_path):
        text, exact_j, est_j = self._find_misclassified(spark, tmp_path)
        truth_is_dup = exact_j >= self.THRESHOLD
        b = spark.createDataFrame([(1, text)], ["doc_id", "text"])

        idx, out = self._setup_loop(spark, tmp_path / "corrected")
        admit_novel_documents(
            b, idx, out, threshold=self.THRESHOLD, epoch_id=1,
            borderline_exact=True,
        )
        assert (1 in _curated_ids(spark, out)) == (not truth_is_dup)

        # estimate-only path makes the opposite (wrong) decision —
        # proving the correction is what fixed it
        idx2, out2 = self._setup_loop(spark, tmp_path / "estonly")
        admit_novel_documents(
            b, idx2, out2, threshold=self.THRESHOLD, epoch_id=1,
            borderline_exact=False,
        )
        assert (1 in _curated_ids(spark, out2)) == truth_is_dup
        unpersist_intermediates()

    def test_epoch_zero_without_curated_table(self, spark, tmp_path):
        """borderline_exact=True before the curated table exists must
        fall back to the estimate decision, not crash."""
        idx = str(tmp_path / "idx")
        out = str(tmp_path / "out")
        build_dedup_index(spark, _corpus(spark), idx)
        n = admit_novel_documents(
            spark.createDataFrame([(5, NOVEL_A)], ["doc_id", "text"]),
            idx, out, epoch_id=0, borderline_exact=True,
        )
        assert n == 1 and _curated_ids(spark, out) == {5}
        unpersist_intermediates()


class TestWithinBatchNearDup:
    def test_flag_drops_intra_batch_near_dups(self, spark, tmp_path):
        near = NOVEL_A.replace("detail", "depth")  # near, not exact
        batch = spark.createDataFrame(
            [(1, NOVEL_A), (2, near), (3, NOVEL_B)], ["doc_id", "text"]
        )
        # default: both near-dups admitted (documented gap)
        idx1 = str(tmp_path / "idx1")
        out1 = str(tmp_path / "out1")
        build_dedup_index(spark, _corpus(spark), idx1)
        admit_novel_documents(batch, idx1, out1, threshold=0.6, epoch_id=0)
        assert _curated_ids(spark, out1) == {1, 2, 3}
        # flag on: min id of the near-dup pair survives
        idx2 = str(tmp_path / "idx2")
        out2 = str(tmp_path / "out2")
        build_dedup_index(spark, _corpus(spark), idx2)
        admit_novel_documents(
            batch, idx2, out2, threshold=0.6, epoch_id=0,
            within_batch_near_dup=True,
        )
        assert _curated_ids(spark, out2) == {1, 3}
        unpersist_intermediates()
