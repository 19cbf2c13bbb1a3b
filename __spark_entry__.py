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
    # -- r7 window (VERDICT r6 #1): the 9 r6-born queries that have
    # never held a driver CORRECTNESS row, the two r1 stragglers
    # deliberately deferred from the r6 window, then 39 of the 47
    # queries whose latest gate is r4 (now the oldest cohort). The 8
    # deferred r4 shapes (q4/q12/q13/q14/q16/q19/q22/agg_having —
    # plain join/agg/exists machinery re-proven by in-window siblings)
    # lead the r8 staging list below.
    "multimodal_ahash",
    "multimodal_near_dup",
    "multimodal_video_frame_hashes",
    "multimodal_video_near_dup",
    "multimodal_audio_features",
    "multimodal_audio_near_dup",
    "pipeline_curate_multimodal",
    "dedup_incremental_index",
    "pipeline_token_budget",
    "reshape_posexplode",
    "set_union_distinct",
    # -- r4-cohort refresh (39 of 47) ---------------------------------
    "agg_approx_distinct",
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
    "multimodal_frame_sample",
    "pipeline_curate_documents",
    "sample_hash_split",
    "sample_stratified",
    "pipeline_contamination",
    "skew_salted_agg",
    "bucketed_cobucket_join",
    "source_csv_scan",
    "source_json_scan",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
    "skyline_parts",
    "fn_struct_map",
    "fn_date_parse_format",
]

# r8 rotation staging: the r7-born queries (never driver-gated) and
# the 8 r4-cohort deferrals first, then the r5 cohort by age. After r7
# no query's latest gate is older than r5.
_PRIORITY_R8 = [
    "pipeline_nucleus_topp",
    "profile_winsorized",
    "similarity_kmeans_assign",
    "sample_cluster_split",
    "sample_diverse_cells",
    "pipeline_decontaminate_neardup",
    "pipeline_curriculum_shards",
    "text_boilerplate_fraction",
    "text_novelty_score",
    "pipeline_curate_v3",
    "text_quality_rank",
    "skew_salted_join",
    "agg_mode",
    "sample_kfold",
    "q4_order_priority",
    "q12_priority_counting",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q16_supplier_cnt",
    "q19_disjunctive_predicates",
    "q22_global_sales_opportunity",
    "agg_having",
]

_PRIORITY_R5 = [
    # -- r4/r5-born queries that have never held a driver CORRECTNESS
    # row (r4 verdict #10: rotate them through the 50-query window so
    # every operator family gains a hard driver-gated row) ------------
    "similarity_ann_pq",
    "similarity_ann_ivfpq",
    "similarity_ann_index",
    "dedup_semantic",
    "dedup_duplicate_spans",
    "text_perplexity",
    "classify_nb_language",
    "pipeline_mixture_sample",
    "pipeline_pack_sequences",
    "events_anomaly_zscore",
    "events_sliding_window",
    "text_repetition",
    "text_normalize",
    "join_fuzzy_editdist",
    "join_fuzzy_link",
    "events_funnel",
    "events_retention",
    "events_transition_matrix",
    "dedup_cluster_survivors",
    "pipeline_chunk_dedup",
    "agg_approx_percentile",
    "agg_sketch_rollup",
    "profile_orders",
    # -- Delta write/maintenance surface (r4-born, never gated) -------
    "delta_maintenance_roundtrip",
    "delta_merge_upsert",
    "delta_zorder_skip",
    "delta_dv_read",
    "delta_dv_delete",
    "delta_update_set",
    "delta_table_changes",
    "delta_restore_roundtrip",
    "delta_convert_in_place",
    "delta_shallow_clone",  # r5: metadata-only clone, absolute refs
    "ivm_orders_by_status",
    "ivm_minmax_by_status",  # r5: MIN/MAX re-derivation + derived AVG
    # -- paths CHANGED this round: re-gate with fresh driver rows ------
    "multimodal_features",  # r5: real PPM decode replaced the stub
    "profile_histogram",  # r5-born; frame_sample rotated out (r4-green)
    "delta_roundtrip",  # r5: DV read-path threshold switch
    "delta_time_travel",
    # -- r5-born ranking/mixing/graph operators -------------------------
    "sample_weighted",
    "sample_group_quota",
    "text_tfidf_keywords",
    "text_bm25_search",
    "graph_pagerank",
    "source_orc_scan",
    "text_bigram_perplexity",
    "dedup_lines_c4",
    "pipeline_length_buckets",
    "delta_identity_append",
    # exactly 50 entries total — the driver gates the first 50
    "pipeline_curate_v2",
]


def _ordered_registry() -> dict[str, _registry.Query]:
    ordered: dict[str, _registry.Query] = {}
    for name in _PRIORITY + _PRIORITY_R8 + _PRIORITY_R5:
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
