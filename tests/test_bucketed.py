"""Bucketed tables: the write→catalog-read round trip, the table-protocol
surface, and the plan-level contract that makes bucketing matter at scale —
a join keyed on the bucket columns of two co-bucketed tables runs with NO
Exchange (shuffle) at all."""

import pytest
from pyspark.sql import functions as F

from datarepo_spark.core.filters import Filter
from datarepo_spark.tables.bucketed import BucketedTable, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], 4, path=str(base / "o")
    )
    write_bucketed(
        lineitem,
        "b_lineitem",
        ["l_orderkey"],
        4,
        sort_cols=["l_orderkey"],
        path=str(base / "l"),
    )
    yield orders, lineitem
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


class TestBucketedTable:
    def test_round_trip_counts(self, spark, bucketed_pair):
        orders, lineitem = bucketed_pair
        assert spark.table("b_orders").count() == orders.count()
        assert spark.table("b_lineitem").count() == lineitem.count()

    def test_table_protocol_filters_and_projection(self, spark, bucketed_pair):
        orders, _ = bucketed_pair
        t = BucketedTable("orders", "b_orders", ["o_orderkey"], 4)
        got = t(
            filters=[Filter("o_orderstatus", "=", "F")],
            columns=["o_orderkey", "o_orderstatus"],
            spark=spark,
        )
        assert got.columns == ["o_orderkey", "o_orderstatus"]
        expect = orders.filter(F.col("o_orderstatus") == "F").count()
        assert got.count() == expect
        with pytest.raises(ValueError):
            t(filters=[Filter("nope", "=", 1)], spark=spark)

    def test_cobucketed_join_has_no_exchange(self, spark, bucketed_pair):
        """THE scale contract: both sides bucketed on the join key with the
        same bucket count -> SortMergeJoin with zero Exchange nodes. On a
        path-based read of the same files the identical join shuffles both
        sides — asserted as the contrast case."""
        orders, lineitem = bucketed_pair
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = (
                spark.table("b_lineitem")
                .join(
                    spark.table("b_orders"),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                )
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            # No shuffle anywhere below the join: both scans already
            # report HashPartitioning(key, 4).
            join_region = plan[plan.index("SortMergeJoin"):]
            assert "Exchange" not in join_region

            unbucketed = lineitem.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            )
            uplan = unbucketed._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in uplan  # the contrast: path scan shuffles
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)

    def test_bucketed_results_match_unbucketed(self, spark, bucketed_pair):
        orders, lineitem = bucketed_pair
        b = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        u = (
            lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, b.collect())) == sorted(map(tuple, u.collect()))


class TestBucketedExactDedup:
    def test_exact_dedup_on_bucketed_corpus_never_shuffles_text(
        self, spark, sf_dir, tmp_path_factory
    ):
        """The 100 TB exact-dedup layout: corpus bucketed by doc_id. The
        survivor semi-join's fact side then reports HashPartitioning and
        Catalyst elides its exchange — every Exchange left in the plan
        carries hashes/ids, never document text."""
        from datarepo_spark.functions.dedup import exact_dedup

        base = tmp_path_factory.mktemp("bdocs")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        write_bucketed(
            docs, "b_documents", ["doc_id"], 4, path=str(base / "d")
        )
        try:
            bucketed = BucketedTable(
                "docs", "b_documents", ["doc_id"], 4
            )(spark=spark)
            result = exact_dedup(bucketed, "text", "doc_id")
            plain = exact_dedup(docs, "text", "doc_id")
            assert sorted(r.doc_id for r in result.collect()) == sorted(
                r.doc_id for r in plain.collect()
            )
            # formatted explain lists, per Exchange node, exactly what rows
            # flow through it ("Input [n]: [cols]")
            formatted = result._sc._jvm.PythonSQLUtils.explainString(
                result._jdf.queryExecution(), "formatted"
            )
            import re

            blocks = re.findall(
                r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", formatted
            )
            # exactly two exchanges survive — the winners aggregate (__ck)
            # and the tiny id-only winners repartition; the bucketed fact
            # side's was elided, so no exchange ever carries text
            assert blocks, f"expected winner-side exchanges:\n{formatted}"
            for cols in blocks:
                assert "text#" not in cols, cols
            assert len(blocks) <= 2, blocks
        finally:
            spark.sql("DROP TABLE IF EXISTS b_documents")
