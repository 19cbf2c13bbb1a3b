"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full named-query registry
(datarepo_spark/queries/registry.py) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datarepo_spark.queries import registry as _registry  # noqa: E402
from datarepo_spark.queries import extensions as _extensions  # noqa: E402,F401
from datarepo_spark.queries import tpch_extra as _tpch_extra  # noqa: E402,F401
from datarepo_spark.queries import delta_queries as _delta_queries  # noqa: E402,F401
from datarepo_spark.queries import physical as _physical  # noqa: E402,F401
from datarepo_spark.queries import sources as _sources  # noqa: E402,F401

# The driver gates the first N queries() entries (N=50 of the full
# registry — len(REGISTRY) is the authoritative count), so
# ordering is coverage policy: one hard CORRECTNESS row per operator
# family. LLM-pipeline operators and the Delta scan path lead (r01's gap),
# then TPC-H batch 2/3, then one representative of each family already
# proven green in r01. Everything not listed follows in registration
# order — still checked locally by tests/test_oracle_parity.py.
_PRIORITY = [
    # -- LLM-data-pipeline operators -----------------------------------
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
    "text_fingerprint",
    "text_pii_redact",
    "text_chunk_documents",
    "dedup_exact_sha256",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_cluster_components",
    "similarity_knn_brute_force",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "similarity_quantize_int8",
    "multimodal_features",
    "multimodal_frame_sample",
    "pipeline_curate_documents",
    "sample_hash_split",
    "sample_stratified",
    "pipeline_contamination",
    # -- Delta scan path (write → log replay → read) -------------------
    "delta_roundtrip",
    "delta_time_travel",
    # -- physical-layout operators (result-preserving rewrites) --------
    "skew_salted_agg",
    "bucketed_cobucket_join",
    "source_csv_scan",
    "source_json_scan",
    # -- previously no_oracle, now gated -------------------------------
    "agg_approx_distinct",
    # -- TPC-H batches 2/3 ---------------------------------------------
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_priority_counting",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_quantity_revenue",
    "q18_large_volume",
    "q19_disjunctive_predicates",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    # -- remaining r01-unchecked shapes --------------------------------
    "skyline_parts",
    "fn_struct_map",
    # -- the last two registry queries never driver-gated (r02 verdict #2)
    "fn_date_parse_format",
    "agg_having",
    # -- r2-proven rows rotated out of the 50-query window to make room
    "text_sentiment",
    "text_top_tokens",
    # -- one representative per family already green in r01 ------------
    "q1_pricing_summary",
    "q3_shipping_priority",
    "filter_in_contains_dnf",
    "join_asof_backward",
    "join_range_bucketed",
    "agg_grouping_sets",
    "window_range_7d",
    "reshape_pivot",
    "events_sessionize",
    "fn_string_suite",
]


def _ordered_registry() -> dict[str, _registry.Query]:
    ordered: dict[str, _registry.Query] = {}
    for name in _PRIORITY:
        ordered[name] = _registry.REGISTRY[name]
    for name, q in _registry.REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q3-style: catalog-scanned parquet, broadcast dim join, group,
    exact-decimal revenue aggregation, top-k.
    """
    return _registry.REGISTRY["q3_shipping_priority"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in _ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return {
        name: q.oracle
        for name, q in _ordered_registry().items()
        if q.oracle is not None
    }
