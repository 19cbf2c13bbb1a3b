"""Persisted MinHash-LSH dedup index: a new batch dedups against the
already-indexed corpus without recomputing corpus signatures, in both
exact-Jaccard and signature-estimate verification modes."""

import pytest
from pyspark.sql import functions as F

from datarepo_spark.functions.dedup import (
    jaccard,
    shingles,
    unpersist_intermediates,
)
from datarepo_spark.functions.dedup_index import (
    append_to_dedup_index,
    build_dedup_index,
    dedup_against_index,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill nearby every single morning"
)


def _corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE.replace("lazy", "sleepy")),  # near-dup of 0
        (2, "completely different text about spark shuffles and "
            "partition pruning strategies for large scale joins"),
        (3, "yet another unrelated document mentioning tokenizers "
            "embeddings and deduplication pipelines at scale"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _batch(spark):
    rows = [
        (100, BASE.replace("morning", "evening")),  # near-dup of 0/1
        (101, "a fresh document with no counterpart in the corpus "
              "talking about watermarks and stateful streaming"),
        (102, BASE),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def index_uri(spark, tmp_path):
    uri = str(tmp_path / "dix")
    build_dedup_index(spark, _corpus(spark), uri)
    yield uri
    unpersist_intermediates()


class TestBuildAndProbe:
    def test_exact_mode_matches_bruteforce(self, spark, index_uri):
        got = {
            (r.batch_id, r.corpus_id): r.jaccard
            for r in dedup_against_index(
                spark,
                _batch(spark),
                index_uri,
                threshold=0.5,
                corpus_df=_corpus(spark),
            ).collect()
        }
        # brute force: every (batch, corpus) pair's exact 3-gram Jaccard
        b = _batch(spark).select(
            F.col("doc_id").alias("batch_id"),
            shingles(F.col("text")).alias("sh_q"),
        )
        c = _corpus(spark).select(
            F.col("doc_id").alias("corpus_id"),
            shingles(F.col("text")).alias("sh_i"),
        )
        brute = {
            (r.batch_id, r.corpus_id): r.j
            for r in b.crossJoin(c)
            .select(
                "batch_id",
                "corpus_id",
                F.round(jaccard(F.col("sh_q"), F.col("sh_i")), 6).alias("j"),
            )
            .filter(F.col("j") >= 0.5)
            .collect()
        }
        assert got == brute
        assert (102, 0) in got and got[(102, 0)] == 1.0
        assert (100, 0) in got
        assert all(bid != 101 for bid, _ in got)

    def test_estimate_mode_needs_no_corpus(self, spark, index_uri):
        got = {
            (r.batch_id, r.corpus_id): r.jaccard
            for r in dedup_against_index(
                spark,
                _batch(spark),
                index_uri,
                threshold=0.5,
                verify="estimate",
            ).collect()
        }
        # exact dup: every minhash lane matches -> estimate exactly 1.0
        assert got[(102, 0)] == 1.0
        # near-dup estimate is unbiased with std ~0.06 at 64 lanes
        assert got[(100, 0)] > 0.6
        assert all(bid != 101 for bid, _ in got)

    def test_candidates_never_cross_join(self, spark, index_uri):
        plan = (
            dedup_against_index(
                spark,
                _batch(spark),
                index_uri,
                threshold=0.5,
                verify="estimate",
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestAppend:
    def test_appended_docs_become_findable(self, spark, index_uri):
        extra = spark.createDataFrame(
            [(50, BASE.replace("fox", "wolf"))], ["doc_id", "text"]
        )
        append_to_dedup_index(spark, extra, index_uri)
        full_corpus = _corpus(spark).unionByName(extra)
        got = {
            (r.batch_id, r.corpus_id)
            for r in dedup_against_index(
                spark,
                _batch(spark),
                index_uri,
                threshold=0.5,
                corpus_df=full_corpus,
            ).collect()
        }
        assert (102, 50) in got  # dup of the appended doc found

    def test_append_uses_stored_geometry(self, spark, tmp_path):
        """An index built with non-default geometry must bucket appends
        and probes with the SAME stored params, or collisions vanish."""
        uri = str(tmp_path / "geo")
        build_dedup_index(
            spark, _corpus(spark), uri, n=2, num_hashes=32, bands=8
        )
        append_to_dedup_index(
            spark,
            spark.createDataFrame([(60, BASE)], ["doc_id", "text"]),
            uri,
        )
        got = {
            (r.batch_id, r.corpus_id)
            for r in dedup_against_index(
                spark,
                _batch(spark),
                uri,
                threshold=0.9,
                verify="estimate",
            ).collect()
        }
        assert (102, 0) in got and (102, 60) in got
        unpersist_intermediates()


class TestValidation:
    def test_exact_without_corpus_raises(self, spark, index_uri):
        with pytest.raises(ValueError, match="corpus_df"):
            dedup_against_index(spark, _batch(spark), index_uri)

    def test_bad_verify_raises(self, spark, index_uri):
        with pytest.raises(ValueError, match="verify"):
            dedup_against_index(
                spark, _batch(spark), index_uri, verify="guess",
                corpus_df=_corpus(spark),
            )

    def test_missing_meta_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError, match="dedup-index"):
            dedup_against_index(
                spark,
                _batch(spark),
                str(tmp_path / "nope"),
                verify="estimate",
            )
