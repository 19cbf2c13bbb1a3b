"""Sequence packing: concat-and-split invariants."""

from pyspark.sql import functions as F

from datarepo_spark.functions.packing import (
    pack_sequences,
    pack_summary,
    shard_of,
)

WINDOW = 16


def _corpus(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range(n)))
        for i, n in enumerate([5, 12, 3, 40, 0, 7, 16, 1, 9, 22])
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestPackSequences:
    def test_token_conservation(self, spark):
        """Every document's tokens land somewhere: per-doc sum of
        tokens_in_pack == n_tokens."""
        packed = pack_sequences(
            _corpus(spark), "doc_id", WINDOW, n_shards=2
        )
        per_doc = (
            packed.groupBy("doc_id", "n_tokens")
            .agg(F.sum("tokens_in_pack").alias("placed"))
            .collect()
        )
        assert per_doc
        for r in per_doc:
            assert r["placed"] == r["n_tokens"], r

    def test_all_packs_full_except_last_per_shard(self, spark):
        packed = pack_sequences(
            _corpus(spark), "doc_id", WINDOW, n_shards=2
        )
        fills = {
            (r["shard"], r["pack_id"]): r["tokens"]
            for r in pack_summary(packed, WINDOW).collect()
        }
        last = {}
        for shard, pack in fills:
            last[shard] = max(last.get(shard, -1), pack)
        for (shard, pack), tokens in fills.items():
            if pack == last[shard]:
                assert 0 < tokens <= WINDOW
            else:
                assert tokens == WINDOW, (shard, pack, tokens)

    def test_offsets_in_range(self, spark):
        packed = pack_sequences(
            _corpus(spark), "doc_id", WINDOW, n_shards=2
        ).collect()
        for r in packed:
            assert 0 <= r["pack_offset"] < WINDOW
            assert 0 < r["tokens_in_pack"] <= WINDOW
            assert r["pack_offset"] + r["tokens_in_pack"] <= WINDOW

    def test_zero_token_docs_emit_nothing(self, spark):
        packed = pack_sequences(
            _corpus(spark), "doc_id", WINDOW, n_shards=2
        )
        assert packed.filter(F.col("doc_id") == 4).count() == 0

    def test_long_doc_spans_multiple_packs(self, spark):
        packed = pack_sequences(
            _corpus(spark), "doc_id", WINDOW, n_shards=1
        )
        spans = packed.filter(F.col("doc_id") == 3).count()
        assert spans >= 3  # 40 tokens over 16-token packs

    def test_stable_under_repartition(self, spark):
        df = _corpus(spark)
        a = sorted(
            map(tuple, pack_sequences(df, "doc_id", WINDOW, 4).collect())
        )
        b = sorted(
            map(
                tuple,
                pack_sequences(
                    df.repartition(7), "doc_id", WINDOW, 4
                ).collect(),
            )
        )
        assert a == b

    def test_precomputed_token_col(self, spark):
        df = _corpus(spark).withColumn(
            "ntok", F.regexp_count(F.col("text"), F.lit(r"\S+"))
        )
        via_text = sorted(
            map(tuple, pack_sequences(df, "doc_id", WINDOW, 2).collect())
        )
        via_col = sorted(
            map(
                tuple,
                pack_sequences(
                    df, "doc_id", WINDOW, 2, token_col="ntok"
                ).collect(),
            )
        )
        assert via_text == via_col

    def test_shard_bounds(self, spark):
        df = spark.range(200).select(F.col("id"))
        shards = (
            df.select(shard_of(F.col("id"), 8).alias("s"))
            .agg(F.min("s"), F.max("s"))
            .collect()[0]
        )
        assert shards[0] >= 0 and shards[1] <= 7
