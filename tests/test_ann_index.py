"""Persisted ANN index: build → partition-pruned query → append."""

import os

from pyspark.sql import functions as F

from datarepo_spark.functions.ann_index import (
    append_to_ann_index,
    build_ann_index,
    load_ann_index,
    query_ann_index,
)
from datarepo_spark.functions.similarity import knn_brute_force


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _query_vec(spark):
    emb = _emb(spark)
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]


class TestAnnIndex:
    def test_build_query_recall(self, spark, tmp_path):
        uri = str(tmp_path / "idx")
        emb = _emb(spark)
        build_ann_index(
            spark, emb, uri, nlist=8, iterations=4
        )
        qv = _query_vec(spark)
        got = query_ann_index(spark, uri, qv, k=10, nprobe=3)
        rows = {r["vec_id"] for r in got.collect()}
        exact = {
            r["vec_id"]
            for r in knn_brute_force(emb, qv, k=10).collect()
        }
        # same recall contract the query-time IVF is gated on
        assert len(rows & exact) >= 5
        assert 0 in rows  # the query vector itself is in the corpus

    def test_query_prunes_partitions(self, spark, tmp_path):
        uri = str(tmp_path / "idx")
        emb = _emb(spark)
        build_ann_index(spark, emb, uri, nlist=8, iterations=4)
        qv = _query_vec(spark)
        pruned = query_ann_index(spark, uri, qv, k=5, nprobe=2)
        touched = {
            seg
            for f in pruned.inputFiles()
            for seg in f.split("/")
            if seg.startswith("cell=")
        }
        assert len(touched) <= 2  # nprobe partitions only

    def test_radius_search_recall_and_pruning(self, spark, tmp_path):
        """Range search over the index: exhaustive nprobe reproduces
        brute-force radius EXACTLY; pruned nprobe returns a subset that
        still recovers the high-similarity head and touches only the
        probed partitions."""
        from datarepo_spark.functions.ann_index import (
            query_ann_index_radius,
        )
        from datarepo_spark.functions.similarity import radius_search

        uri = str(tmp_path / "idx")
        emb = _emb(spark)
        build_ann_index(spark, emb, uri, nlist=8, iterations=4)
        qv = _query_vec(spark)
        exact = {
            (r["vec_id"], r["cosine"])
            for r in radius_search(emb, qv, threshold=0.25).collect()
        }
        assert exact  # non-vacuous radius at this threshold
        exhaustive = {
            (r["vec_id"], r["cosine"])
            for r in query_ann_index_radius(
                spark, uri, qv, threshold=0.25, nprobe=8
            ).collect()
        }
        assert exhaustive == exact
        pruned_df = query_ann_index_radius(
            spark, uri, qv, threshold=0.25, nprobe=2
        )
        touched = {
            seg
            for f in pruned_df.inputFiles()
            for seg in f.split("/")
            if seg.startswith("cell=")
        }
        assert len(touched) <= 2  # partition pruning held
        pruned = {(r["vec_id"], r["cosine"]) for r in pruned_df.collect()}
        assert pruned <= exact
        assert 0 in {v for v, _ in pruned}  # probe's own cell is probed

    def test_append_uses_stored_centroids(self, spark, tmp_path):
        uri = str(tmp_path / "idx")
        emb = _emb(spark)
        base = emb.filter(F.col("vec_id") < 150)
        extra = emb.filter(F.col("vec_id") >= 150)
        index = build_ann_index(spark, base, uri, nlist=8, iterations=4)
        append_to_ann_index(spark, extra, uri)
        # appended rows must sit in the cells the ORIGINAL centroids
        # give them — load and compare a few
        reloaded = load_ann_index(uri)
        assert (index.centroids == reloaded.centroids).all()
        from datarepo_spark.tables.delta_table import DeltalakeTable

        n = DeltalakeTable("idx", uri)(spark=spark).count()
        assert n == emb.count()

    def test_vacuum_keeps_centroids(self, spark, tmp_path):
        from datarepo_spark.tables.delta_writer import vacuum

        uri = str(tmp_path / "idx")
        build_ann_index(spark, _emb(spark), uri, nlist=4, iterations=2)
        removed = vacuum(uri)
        assert not any("_ann_index" in r for r in removed)
        assert os.path.exists(
            os.path.join(uri, "_ann_index", "centroids.parquet")
        )
        # index still functional
        qv = _query_vec(spark)
        assert query_ann_index(spark, uri, qv, k=3, nprobe=2).count() == 3


class TestIndexHealth:
    """VERDICT r4 #5: appends assign against stored centroids with no
    drift tracking — recall decays silently. The stats sidecar +
    index_health() make the decay observable."""

    def test_fresh_index_is_healthy(self, spark, tmp_path):
        from datarepo_spark.functions.ann_index import index_health

        uri = str(tmp_path / "idx")
        build_ann_index(spark, _emb(spark), uri, nlist=8, iterations=4)
        h = index_health(uri)
        assert h["appended_n"] == 0
        assert h["rebuild_recommended"] is False
        assert h["base_n"] == _emb(spark).count()

    def test_in_distribution_append_stays_healthy(self, spark, tmp_path):
        from datarepo_spark.functions.ann_index import index_health

        uri = str(tmp_path / "idx")
        emb = _emb(spark)
        head = emb.filter(F.col("vec_id") < 400)
        tail = emb.filter(F.col("vec_id") >= 400)
        build_ann_index(spark, head, uri, nlist=8, iterations=4)
        append_to_ann_index(spark, tail, uri)
        h = index_health(uri)
        assert h["appended_n"] == tail.count()
        # same distribution: residuals comparable, nothing fires
        assert h["residual_ratio"] < 1.5
        assert h["rebuild_recommended"] is False

    def test_shifted_append_fires_health_signal(self, spark, tmp_path):
        """Append a distribution far from every centroid (negated +
        heavily perturbed vectors piled into one direction): the health
        signal must fire while queries stay correct."""
        from datarepo_spark.functions.ann_index import index_health

        uri = str(tmp_path / "idx")
        emb = _emb(spark)
        build_ann_index(spark, emb, uri, nlist=8, iterations=4)

        # a tight cluster along a direction unrelated to the corpus:
        # basis-vector e_7 with tiny deterministic jitter
        dim = len(emb.head()["embedding"])
        shifted = spark.range(10_000, 10_200).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.when(i == 7, 100.0).otherwise(
                    (F.col("id") % 13).cast("double") / 1000.0
                ),
            ).cast("array<float>").alias("embedding"),
        )
        append_to_ann_index(spark, shifted, uri)
        h = index_health(uri)
        assert h["rebuild_recommended"] is True
        assert h["reasons"]
        # the tight cluster lands in (essentially) one cell
        assert h["max_new_cell_mass"] > 0.9

        # queries remain CORRECT even while degraded: the original
        # corpus still answers exactly as before for original queries
        qv = _query_vec(spark)
        got = {
            r["vec_id"]
            for r in query_ann_index(spark, uri, qv, k=10, nprobe=3).collect()
        }
        assert 0 in got

    def test_pre_accounting_index_still_appends(self, spark, tmp_path):
        """An index built before drift accounting (no sidecar) appends
        fine; index_health raises a clear error."""
        import pytest

        from datarepo_spark.functions import ann_index as AI

        uri = str(tmp_path / "idx")
        emb = _emb(spark)
        build_ann_index(spark, emb.filter(F.col("vec_id") < 300), uri,
                        nlist=8, iterations=4)
        import shutil

        shutil.rmtree(os.path.join(uri, AI._STATS_DIR_REL))
        append_to_ann_index(
            spark, emb.filter(F.col("vec_id") >= 300), uri
        )
        with pytest.raises(FileNotFoundError, match="cell_stats"):
            AI.index_health(uri)


class TestAnnIndexPQ:
    """Persisted IVF-PQ (VERDICT r5 #6): PQ codes stored as a column of
    the cell-partitioned index table — a query reads nprobe pruned
    cells × only the 8-byte codes for the ADC scan, raw vectors for the
    top k·refine survivors only."""

    def _build(self, spark, tmp_path):
        uri = str(tmp_path / "idxpq")
        build_ann_index(
            spark, _emb(spark), uri, nlist=8, iterations=4,
            pq_m=8, pq_iterations=4,
        )
        return uri

    def test_build_query_recall(self, spark, tmp_path):
        from datarepo_spark.functions.ann_index import query_ann_index_pq

        uri = self._build(spark, tmp_path)
        qv = _query_vec(spark)
        got = query_ann_index_pq(spark, uri, qv, k=10, nprobe=4, refine=8)
        rows = {r["vec_id"] for r in got.collect()}
        exact = {
            r["vec_id"]
            for r in knn_brute_force(_emb(spark), qv, k=10).collect()
        }
        assert len(rows & exact) >= 5
        assert 0 in rows

    def test_adc_scan_reads_codes_not_vectors(self, spark, tmp_path):
        """Column pruning: the ADC scan's parquet ReadSchema must carry
        codes but NOT the raw embedding — that is the 32× I/O reduction
        the layout exists for. The refine scan (embedding) reads only
        the same pruned cells."""
        from datarepo_spark.functions.ann_index import query_ann_index_pq

        uri = self._build(spark, tmp_path)
        qv = _query_vec(spark)
        got = query_ann_index_pq(spark, uri, qv, k=5, nprobe=2, refine=4)
        plan = got._jdf.queryExecution().executedPlan().toString()
        schemas = [
            seg.split("\n")[0] for seg in plan.split("ReadSchema: ")[1:]
        ]
        code_scans = [s for s in schemas if "codes" in s]
        assert code_scans, plan
        assert all("embedding" not in s for s in code_scans), schemas
        # partition pruning holds for BOTH scans
        touched = {
            seg
            for f in got.inputFiles()
            for seg in f.split("/")
            if seg.startswith("cell=")
        }
        assert len(touched) <= 2

    def test_append_encodes_with_stored_codebooks(self, spark, tmp_path):
        from datarepo_spark.functions.ann_index import (
            load_pq,
            query_ann_index_pq,
        )

        uri = str(tmp_path / "idxpq")
        emb = _emb(spark)
        base = emb.filter(F.col("vec_id") < 300)
        extra = emb.filter(F.col("vec_id") >= 300)
        build_ann_index(
            spark, base, uri, nlist=8, iterations=4, pq_m=8,
            pq_iterations=4,
        )
        books_before = load_pq(uri).codebooks.copy()
        append_to_ann_index(spark, extra, uri)
        assert (load_pq(uri).codebooks == books_before).all()
        from datarepo_spark.tables.delta_table import DeltalakeTable

        table = DeltalakeTable("idxpq", uri)(spark=spark)
        assert table.count() == emb.count()
        assert table.filter(F.col("codes").isNull()).count() == 0
        # appended vectors are findable
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 450).head()["embedding"]
        ]
        got = {
            r["vec_id"]
            for r in query_ann_index_pq(
                spark, uri, qv, k=5, nprobe=4, refine=8
            ).collect()
        }
        assert 450 in got

    def test_non_pq_index_raises(self, spark, tmp_path):
        import pytest

        from datarepo_spark.functions.ann_index import query_ann_index_pq

        uri = str(tmp_path / "plain")
        build_ann_index(spark, _emb(spark), uri, nlist=4, iterations=2)
        with pytest.raises(ValueError, match="no PQ codebooks"):
            query_ann_index_pq(spark, uri, _query_vec(spark), k=3)


class TestConcurrentAppendStats:
    """Log-structured stats sidecar (VERDICT r5 #9): every append writes
    its own immutable file, merged on read — two interleaved appends
    must BOTH be reflected in index_health (the old single-file sidecar
    was last-write-wins)."""

    def test_two_interleaved_appends_both_count(self, spark, tmp_path):
        import os

        from datarepo_spark.functions import ann_index as AI

        uri = str(tmp_path / "concur")
        emb = _emb(spark)
        base = emb.filter(F.col("vec_id") < 300)
        a = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
        b = emb.filter(F.col("vec_id") >= 400)
        build_ann_index(spark, base, uri, nlist=4, iterations=2)
        # interleave: both appenders aggregate their batch stats BEFORE
        # either writes — under read-modify-write the second write would
        # erase the first; log-structured files cannot collide
        index = AI.load_ann_index(uri)
        stats_a = AI._aggregate_cell_stats(
            index.assign(a, vec_col="embedding", id_col="vec_id",
                         nprobe=1, with_sim=True)
        )
        stats_b = AI._aggregate_cell_stats(
            index.assign(b, vec_col="embedding", id_col="vec_id",
                         nprobe=1, with_sim=True)
        )
        AI._write_append_stats(uri, stats_a)
        AI._write_append_stats(uri, stats_b)
        stats_dir = os.path.join(uri, "_ann_index", "stats")
        append_files = [
            n for n in os.listdir(stats_dir) if n.startswith("append-")
        ]
        assert len(append_files) == 2  # two immutable files, no clobber
        health = AI.index_health(uri)
        assert health["appended_n"] == a.count() + b.count()

    def test_append_api_accumulates_across_calls(self, spark, tmp_path):
        from datarepo_spark.functions import ann_index as AI

        uri = str(tmp_path / "accum")
        emb = _emb(spark)
        build_ann_index(
            spark, emb.filter(F.col("vec_id") < 300), uri,
            nlist=4, iterations=2,
        )
        append_to_ann_index(
            spark, emb.filter(
                (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
            ), uri,
        )
        append_to_ann_index(
            spark, emb.filter(F.col("vec_id") >= 400), uri
        )
        health = AI.index_health(uri)
        assert health["base_n"] == 300
        assert health["appended_n"] == emb.count() - 300

    def test_legacy_single_file_layout_still_reads(self, spark, tmp_path):
        """A pre-r6 index (single cell_stats.parquet) keeps working, and
        new-style appends merge on top of its accumulated columns."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from datarepo_spark.functions import ann_index as AI

        uri = str(tmp_path / "legacy")
        os.makedirs(os.path.join(uri, "_ann_index"))
        pq.write_table(
            pa.table(
                {
                    "cell": pa.array([0, 1], pa.int32()),
                    "base_n": pa.array([10, 20], pa.int64()),
                    "base_sum_res": pa.array([1.0, 2.0], pa.float64()),
                    "app_n": pa.array([5, 0], pa.int64()),
                    "app_sum_res": pa.array([0.5, 0.0], pa.float64()),
                }
            ),
            os.path.join(uri, "_ann_index", "cell_stats.parquet"),
        )
        stats = AI._read_cell_stats(uri)
        assert stats[0] == (10, 1.0, 5, 0.5)
        AI._write_append_stats(uri, {0: (3, 0.3)})
        stats = AI._read_cell_stats(uri)
        assert stats[0] == (10, 1.0, 8, 0.8)


class TestOptimizeAnnIndex:
    def test_compaction_shrinks_files_keeps_results(self, spark, tmp_path):
        """Appends land one file set per touched cell; optimize bin-packs
        them, queries return identical rows, pruning still holds."""
        from datarepo_spark.functions.ann_index import (
            optimize_ann_index,
            query_ann_index,
        )
        from datarepo_spark.tables.delta_table import DeltalakeTable

        uri = str(tmp_path / "opt")
        emb = _emb(spark)
        build_ann_index(
            spark, emb.filter(F.col("vec_id") < 200), uri,
            nlist=4, iterations=2,
        )
        for lo in (200, 300, 400):
            append_to_ann_index(
                spark,
                emb.filter(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 100)
                ),
                uri,
            )
        qv = _query_vec(spark)
        before_rows = {
            r.vec_id
            for r in query_ann_index(spark, uri, qv, k=8, nprobe=2).collect()
        }
        n_files_before = len(
            DeltalakeTable("opt", uri)(spark=spark).inputFiles()
        )
        stats = optimize_ann_index(spark, uri)
        assert stats["files_removed"] > stats["files_added"] > 0
        after = DeltalakeTable("opt", uri)(spark=spark)
        assert len(after.inputFiles()) < n_files_before
        after_rows = {
            r.vec_id
            for r in query_ann_index(spark, uri, qv, k=8, nprobe=2).collect()
        }
        assert after_rows == before_rows
        # pruning still holds post-compaction
        probed = query_ann_index(spark, uri, qv, k=8, nprobe=1)
        touched = {
            seg
            for f in probed.inputFiles()
            for seg in f.split("/")
            if seg.startswith("cell=")
        }
        assert len(touched) == 1


class TestTxnValidation:
    def test_half_specified_txn_raises(self, spark, tmp_path):
        import pytest

        from datarepo_spark.functions import ann_index as AI

        uri = str(tmp_path / "halftxn")
        emb = _emb(spark)
        build_ann_index(
            spark, emb.filter(F.col("vec_id") < 100), uri,
            nlist=4, iterations=2,
        )
        with pytest.raises(ValueError, match="together"):
            AI.append_to_ann_index(
                spark, emb.filter(F.col("vec_id") >= 100), uri,
                txn_version=3,
            )


class TestStreamingAppend:
    """Streaming index maintenance: arriving embeddings append into the
    persisted index exactly once per epoch — a replayed epoch neither
    duplicates vectors (txn ledger) nor double-counts drift stats
    (deterministic sidecar stamp)."""

    def test_stream_appends_become_queryable_exactly_once(
        self, spark, tmp_path
    ):
        from datarepo_spark.functions import ann_index as AI
        from datarepo_spark.streaming.incremental_ann import (
            append_stream_to_ann_index,
        )
        from datarepo_spark.tables.delta_table import DeltalakeTable

        uri = str(tmp_path / "sidx")
        emb = _emb(spark)
        base = emb.filter(F.col("vec_id") < 300)
        build_ann_index(spark, base, uri, nlist=4, iterations=2)

        stream_dir = str(tmp_path / "arriving")
        os.makedirs(stream_dir)
        emb.filter(
            (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
        ).coalesce(1).write.parquet(os.path.join(stream_dir, "f1"))
        emb.filter(F.col("vec_id") >= 400).coalesce(1).write.parquet(
            os.path.join(stream_dir, "f2")
        )
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir + "/*")
        )
        q = append_stream_to_ann_index(
            stream, uri, checkpoint_dir=str(tmp_path / "ckpt")
        )
        q.awaitTermination(180)

        table = DeltalakeTable("sidx", uri)(spark=spark)
        assert table.count() == emb.count()
        health = AI.index_health(uri)
        assert health["appended_n"] == emb.count() - 300

        # manual replay of epoch 0 (crash-recovery shape): ledger
        # swallows the rows, the stats stamp overwrites its own file
        import hashlib

        f1 = spark.read.parquet(stream_dir + "/f1")
        txn_app = (
            "ann-index-append-"
            + hashlib.sha256(str(tmp_path / "ckpt").encode()).hexdigest()[:12]
        )
        AI.append_to_ann_index(
            spark, f1, uri, txn_app_id=txn_app, txn_version=0
        )
        assert DeltalakeTable("sidx", uri)(spark=spark).count() == emb.count()
        assert AI.index_health(uri)["appended_n"] == emb.count() - 300
        # appended vectors are findable through the stored geometry
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 450).head()["embedding"]
        ]
        got = {
            r.vec_id
            for r in AI.query_ann_index(spark, uri, qv, k=5, nprobe=3).collect()
        }
        assert 450 in got


class TestReplayStatsRecovery:
    """Crash window between the Delta commit and the stats write: the
    replayed epoch must (re)write the stamped stats file instead of
    returning early and losing the epoch's drift stats forever."""

    def test_replay_restores_missing_stamped_stats(self, spark, tmp_path):
        from datarepo_spark.functions import ann_index as AI

        uri = str(tmp_path / "crash")
        emb = _emb(spark)
        build_ann_index(
            spark, emb.filter(F.col("vec_id") < 300), uri,
            nlist=4, iterations=2,
        )
        batch = emb.filter(F.col("vec_id") >= 300)
        AI.append_to_ann_index(
            spark, batch, uri, txn_app_id="crashy", txn_version=0
        )
        stats_dir = os.path.join(uri, "_ann_index", "stats")
        stamped = os.path.join(
            stats_dir, AI._stamped_stats_name("crashy-0")
        )
        assert os.path.exists(stamped)
        healthy = AI.index_health(uri)["appended_n"]
        assert healthy == batch.count()
        # simulate the crash: commit landed, stats write did not
        os.remove(stamped)
        assert AI.index_health(uri)["appended_n"] == 0
        # replay: ledger swallows the Delta write, stats come back
        AI.append_to_ann_index(
            spark, batch, uri, txn_app_id="crashy", txn_version=0
        )
        assert os.path.exists(stamped)
        assert AI.index_health(uri)["appended_n"] == healthy
        from datarepo_spark.tables.delta_table import DeltalakeTable

        table = DeltalakeTable("crash", uri)(spark=spark)
        assert table.count() == emb.count()  # no duplicate rows


class TestRebuild:
    """index_health flags drift; rebuild_ann_index is the remedy: fresh
    centroids over base + appended rows, swapped in as a new generation
    with a reset stats baseline."""

    def _shifted(self, spark, dim):
        return spark.range(10_000, 10_200).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.when(i == 7, 100.0).otherwise(
                    (F.col("id") % 13).cast("double") / 1000.0
                ),
            ).cast("array<float>").alias("embedding"),
        )

    def test_drift_rebuild_restores_health_and_recall(
        self, spark, tmp_path
    ):
        from datarepo_spark.functions import ann_index as AI
        from datarepo_spark.tables.delta_table import DeltalakeTable

        uri = str(tmp_path / "idx")
        emb = _emb(spark)
        build_ann_index(spark, emb, uri, nlist=8, iterations=4)
        dim = len(emb.head()["embedding"])
        shifted = self._shifted(spark, dim)
        append_to_ann_index(spark, shifted, uri)
        assert AI.index_health(uri)["rebuild_recommended"] is True

        res = AI.rebuild_ann_index(spark, uri)
        assert res["rows"] == emb.count() + shifted.count()
        assert res["nlist"] == 8 and res["previous"] is None

        h = AI.index_health(uri)
        assert h["rebuild_recommended"] is False
        assert h["appended_n"] == 0  # whole corpus is the new baseline
        assert h["base_n"] == res["rows"]
        # no stale generation directories left behind
        assert not [
            p for p in os.listdir(tmp_path)
            if p.startswith("idx.rebuild") or p.startswith("idx.prev")
        ]
        # table rows survived the swap exactly
        assert (
            DeltalakeTable("idx", uri)(spark=spark).count() == res["rows"]
        )
        # recall contract vs brute force on the FULL corpus, for a
        # query from each distribution (original + shifted)
        full = emb.select("vec_id", "embedding").unionByName(shifted)
        for probe_id in (0, 10_050):
            qv = [
                float(x)
                for x in full.filter(F.col("vec_id") == probe_id).head()[
                    "embedding"
                ]
            ]
            got = {
                r["vec_id"]
                for r in query_ann_index(
                    spark, uri, qv, k=10, nprobe=3
                ).collect()
            }
            exact = {
                r["vec_id"]
                for r in knn_brute_force(full, qv, k=10).collect()
            }
            assert len(got & exact) >= 5
            # the shifted cluster is 200 near-identical vectors (top-10
            # is all cosine≈1.0 ties), so require self-recall only for
            # the original-distribution probe
            if probe_id == 0:
                assert probe_id in got

    def test_rebuild_preserves_pq_geometry(self, spark, tmp_path):
        from datarepo_spark.functions import ann_index as AI
        from datarepo_spark.functions.ann_index import (
            load_pq,
            query_ann_index_pq,
        )

        uri = str(tmp_path / "idxpq")
        emb = _emb(spark)
        build_ann_index(
            spark, emb, uri, nlist=8, iterations=4, pq_m=8,
            pq_iterations=4,
        )
        res = AI.rebuild_ann_index(spark, uri, keep_previous=True)
        assert res["pq_m"] == 8
        assert load_pq(uri).codebooks.shape[:2] == (8, 256)
        assert res["previous"] and os.path.isdir(res["previous"])
        qv = _query_vec(spark)
        got = {
            r["vec_id"]
            for r in query_ann_index_pq(
                spark, uri, qv, k=5, nprobe=4, refine=8
            ).collect()
        }
        assert 0 in got

    def test_maybe_rebuild_policy(self, spark, tmp_path):
        from datarepo_spark.functions import ann_index as AI

        uri = str(tmp_path / "pol")
        emb = _emb(spark)
        build_ann_index(spark, emb, uri, nlist=8, iterations=4)
        # healthy: no-op
        out = AI.maybe_rebuild_ann_index(spark, uri)
        assert out["rebuilt"] is False and out["rebuild"] is None
        # drift, then the policy fires and the re-audit is green
        dim = len(emb.head()["embedding"])
        append_to_ann_index(spark, self._shifted(spark, dim), uri)
        out = AI.maybe_rebuild_ann_index(spark, uri)
        assert out["rebuilt"] is True
        assert out["health_before"]["rebuild_recommended"] is True
        assert out["health_after"]["rebuild_recommended"] is False


class TestRebuildLedgerCarry:
    """A rebuilt generation must inherit the SetTransaction ledger —
    otherwise a crash-replayed streaming epoch whose rows the rebuild
    already trained on would land a second time."""

    def test_replayed_epoch_still_swallowed_after_rebuild(
        self, spark, tmp_path
    ):
        from datarepo_spark.functions import ann_index as AI
        from datarepo_spark.tables.delta_table import DeltalakeTable

        uri = str(tmp_path / "carry")
        emb = _emb(spark)
        build_ann_index(
            spark, emb.filter(F.col("vec_id") < 300), uri,
            nlist=4, iterations=2,
        )
        batch = emb.filter(F.col("vec_id") >= 300)
        AI.append_to_ann_index(
            spark, batch, uri, txn_app_id="stream-x", txn_version=5
        )
        n_before = DeltalakeTable("carry", uri)(spark=spark).count()
        AI.rebuild_ann_index(spark, uri)
        # replay of epoch 5 after the rebuild: must be a no-op
        AI.append_to_ann_index(
            spark, batch, uri, txn_app_id="stream-x", txn_version=5
        )
        assert DeltalakeTable("carry", uri)(spark=spark).count() == n_before
        # the NEXT epoch still lands
        nxt = batch.withColumn("vec_id", F.col("vec_id") + 10_000)
        AI.append_to_ann_index(
            spark, nxt, uri, txn_app_id="stream-x", txn_version=6
        )
        assert (
            DeltalakeTable("carry", uri)(spark=spark).count()
            == n_before + batch.count()
        )

    def test_replay_after_rebuild_does_not_backfill_stats(
        self, spark, tmp_path
    ):
        """An epoch the rebuild trained on is part of the new BASE: its
        crash-replay must NOT recompute append-stats against the new
        centroids (that double-counts the rows and pushes index_health
        toward a spurious second rebuild)."""
        from datarepo_spark.functions import ann_index as AI

        uri = str(tmp_path / "genmark")
        emb = _emb(spark)
        build_ann_index(
            spark, emb.filter(F.col("vec_id") < 300), uri,
            nlist=4, iterations=2,
        )
        batch = emb.filter(F.col("vec_id") >= 300)
        AI.append_to_ann_index(
            spark, batch, uri, txn_app_id="gen-app", txn_version=3
        )
        AI.rebuild_ann_index(spark, uri)
        assert AI.index_health(uri)["appended_n"] == 0
        # replay of the pre-rebuild epoch: Delta no-op AND stats no-op
        AI.append_to_ann_index(
            spark, batch, uri, txn_app_id="gen-app", txn_version=3
        )
        stamped = os.path.join(
            uri, "_ann_index", "stats", AI._stamped_stats_name("gen-app-3")
        )
        assert not os.path.exists(stamped)
        h = AI.index_health(uri)
        assert h["appended_n"] == 0 and h["rebuild_recommended"] is False
        # a POST-rebuild epoch's crash-replay still backfills its stats
        nxt = batch.withColumn("vec_id", F.col("vec_id") + 10_000)
        AI.append_to_ann_index(
            spark, nxt, uri, txn_app_id="gen-app", txn_version=4
        )
        stamped4 = os.path.join(
            uri, "_ann_index", "stats", AI._stamped_stats_name("gen-app-4")
        )
        os.remove(stamped4)  # crash between commit and stats write
        AI.append_to_ann_index(
            spark, nxt, uri, txn_app_id="gen-app", txn_version=4
        )
        assert os.path.exists(stamped4)
        assert AI.index_health(uri)["appended_n"] == nxt.count()


class TestRebuildSwapGuards:
    """The generation swap's two enforced guards (lock + version
    re-check) and the in-flight-reader contract across the swap."""

    def test_append_refused_while_rebuild_lock_held(self, spark, tmp_path):
        import pytest

        from datarepo_spark.functions import ann_index as AI

        uri = str(tmp_path / "locked")
        emb = _emb(spark)
        build_ann_index(spark, emb, uri, nlist=4, iterations=2)
        lock = os.path.join(uri, "_ann_index", "rebuild.lock")
        open(lock, "w").close()
        batch = emb.withColumn("vec_id", F.col("vec_id") + 10_000)
        with pytest.raises(RuntimeError, match="being rebuilt"):
            AI.append_to_ann_index(spark, batch, uri)
        os.remove(lock)
        AI.append_to_ann_index(spark, batch, uri)  # lock released: lands

    def test_swap_aborts_if_table_advanced_mid_rebuild(
        self, spark, tmp_path, monkeypatch
    ):
        import pytest

        from datarepo_spark.functions import ann_index as AI
        from datarepo_spark.tables.delta_writer import write_delta

        uri = str(tmp_path / "racy")
        emb = _emb(spark)
        build_ann_index(spark, emb, uri, nlist=4, iterations=2)
        n0 = spark.read.parquet(
            *[
                os.path.join(uri, d)
                for d in os.listdir(uri)
                if d.startswith("cell=")
            ]
        ).count()

        real_build = AI.build_ann_index

        def build_then_racy_commit(*args, **kwargs):
            out = real_build(*args, **kwargs)
            # a writer that predates the lock commits mid-rebuild
            # (low-level append: deliberately bypasses the lock check)
            index = AI.load_ann_index(uri)
            rogue = index.assign(
                emb.withColumn("vec_id", F.col("vec_id") + 50_000).limit(5),
                vec_col="embedding", id_col="vec_id", nprobe=1,
            )
            write_delta(
                rogue, uri, partition_by=["cell"], checkpoint_interval=None
            )
            return out

        monkeypatch.setattr(AI, "build_ann_index", build_then_racy_commit)
        with pytest.raises(RuntimeError, match="advanced during rebuild"):
            AI.rebuild_ann_index(spark, uri)
        # old generation still serves (now including the racy commit),
        # no tmp/prev litter, no lingering lock
        assert not [
            p for p in os.listdir(tmp_path)
            if p.startswith("racy.rebuild") or p.startswith("racy.prev")
        ]
        assert not os.path.exists(
            os.path.join(uri, "_ann_index", "rebuild.lock")
        )
        from datarepo_spark.tables.delta_table import DeltalakeTable

        assert DeltalakeTable("racy", uri)(spark=spark).count() == n0 + 5
        # and a clean retry (no racy writer this time) succeeds
        monkeypatch.setattr(AI, "build_ann_index", real_build)
        res = AI.rebuild_ann_index(spark, uri)
        assert res["rows"] == n0 + 5

    def test_inflight_reader_across_swap(self, spark, tmp_path):
        """A reader holding the OLD generation mid-query while the swap
        happens must either complete or fail cleanly (never a wrong
        answer), and a re-open must see the new generation with the
        recall contract intact."""
        from py4j.protocol import Py4JJavaError

        from datarepo_spark.functions import ann_index as AI

        uri = str(tmp_path / "swap")
        emb = _emb(spark)
        build_ann_index(spark, emb, uri, nlist=8, iterations=4)
        qv = _query_vec(spark)
        # plan the query against the old generation but DO NOT run it
        inflight = query_ann_index(spark, uri, qv, k=10, nprobe=3)
        AI.rebuild_ann_index(spark, uri)
        try:
            rows = {r["vec_id"] for r in inflight.collect()}
            # completed: the answer must be a valid ANN result, not junk
            assert 0 in rows
        except Py4JJavaError:
            pass  # clean failure (old files gone) is within contract
        # re-open sees the new generation and meets the recall contract
        got = {
            r["vec_id"]
            for r in query_ann_index(spark, uri, qv, k=10, nprobe=3).collect()
        }
        exact = {
            r["vec_id"] for r in knn_brute_force(emb, qv, k=10).collect()
        }
        assert len(got & exact) >= 5 and 0 in got

    def test_concurrent_rebuild_lock_message(self, spark, tmp_path):
        import pytest

        from datarepo_spark.functions import ann_index as AI

        uri = str(tmp_path / "dbl")
        build_ann_index(spark, _emb(spark), uri, nlist=4, iterations=2)
        lock = os.path.join(uri, "_ann_index", "rebuild.lock")
        open(lock, "w").close()  # crashed/concurrent rebuild holds it
        with pytest.raises(RuntimeError, match="rebuild lock already"):
            AI.rebuild_ann_index(spark, uri)
        os.remove(lock)
        AI.rebuild_ann_index(spark, uri)  # released: proceeds
