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
# family per rotation. Everything not listed follows in registration
# order — still checked locally by tests/test_oracle_parity.py.
_PRIORITY = [
    # -- r8 window (VERDICT r7 #1): the 14 r7-born queries that have
    # never held a driver CORRECTNESS row, the 8 r4-cohort deferrals
    # (oldest gates in the registry, last green r4), then 28 of the 50
    # queries whose latest gate is r5 — in registration order (age).
    # After r8: every registry query has held a driver row and none is
    # older than r5; the remaining 22 r5-gated queries lead the r9
    # staging list below.
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
    # -- deferred r4 shapes (latest gate r4 — the oldest cohort) ------
    "q4_order_priority",
    "q12_priority_counting",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q16_supplier_cnt",
    "q19_disjunctive_predicates",
    "q22_global_sales_opportunity",
    "agg_having",
    # -- r5-cohort refresh (28 of 50, by age) --------------------------
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
    "delta_maintenance_roundtrip",
    "delta_merge_upsert",
    "delta_zorder_skip",
    "delta_dv_read",
    # exactly 50 entries total — the driver gates the first 50
    "delta_dv_delete",
]

# r9 rotation staging: the r8-born queries (never driver-gated) first,
# then the 22 r5-gated queries not refreshed in the r8 window (by age);
# the r6 cohort follows in registration order.
_PRIORITY_R9 = [
    "dedup_ngram_containment",
    "text_char_entropy",
    "pipeline_mixture_temperature",
    "profile_correlation",
    "events_debounce",
    "similarity_radius_search",
    "events_sequence_ngrams",
    "agg_weighted_avg",
    "pipeline_temperature_sample",
    "join_asof_forward",
    "profile_skew_kurtosis",
    "dedup_rate_by_source",
    "delta_update_set",
    "delta_table_changes",
    "delta_restore_roundtrip",
    "delta_convert_in_place",
    "delta_shallow_clone",
    "ivm_orders_by_status",
    "ivm_minmax_by_status",
    "multimodal_features",
    "profile_histogram",
    "delta_roundtrip",
    "delta_time_travel",
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
    "pipeline_curate_v2",
]


def _ordered_registry() -> dict[str, _registry.Query]:
    ordered: dict[str, _registry.Query] = {}
    for name in _PRIORITY + _PRIORITY_R9:
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
