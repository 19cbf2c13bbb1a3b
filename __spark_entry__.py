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
    # -- r9 window (VERDICT r8 #2): the 12 r8-born queries that have
    # never held a driver CORRECTNESS row, then the 22 queries whose
    # latest gate is r5 (oldest cohort, registration order), then
    # skew_salted_join re-gated after the deterministic-salt fix
    # (VERDICT r8 #1), then 15 of the 50 r6-gated queries by
    # registration order. After r9: every registry query has held a
    # driver row and none is older than r6; the remaining 35 r6-gated
    # queries lead the r10 staging list below.
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
    # -- r5-cohort stragglers (latest gate r5 — the oldest cohort) ----
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
    # -- re-gate after the deterministic-salt fix (functions/skew.py) --
    "skew_salted_join",
    # -- r6-cohort refresh (15 of 50, registration order) --------------
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "filter_comparisons",
    "filter_in_contains_dnf",
    "filter_not_in",
    "filter_sql_string",
    "join_semi",
    "join_anti",
    "join_outer_full",
    "join_cross",
    "join_theta_inequality",
    # exactly 50 entries total — the driver gates the first 50
    "join_range_bucketed",
]

# r10 rotation staging: the r9-born queries lead (never driver-gated;
# each driver-sim-verified green at sf0.01 when it landed), then the 35
# r6-gated queries not refreshed in the r9 window, in registration
# order.
_PRIORITY_R10 = [
    "events_ewma",
    "events_resample_ffill",
    "join_asof_nearest",
    "profile_entropy_by_source",
    "ivm_join_by_nation",
    "pipeline_shuffle_shards",
    "multimodal_phash",
    "similarity_mmr_rerank",
    "window_distribution_variants",
    "profile_dataset_card",
    "graph_triangle_count",
    "profile_mutual_information",
    "agg_distinct_counts",
    "agg_whole_frame",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_median_quantile",
    "window_rank_topk_per_group",
    "window_lag_lead",
    "window_running_sum",
    "window_rolling_mean",
    "sort_topk",
    "dedup_distinct_subset",
    "set_except",
    "set_intersect",
    "fn_string_suite",
    "fn_date_suite",
    "fn_math_suite",
    "fn_array_suite",
    "fn_json_extract",
    "fn_conditional_null",
    "reshape_explode",
    "reshape_pivot",
    "reshape_unpivot",
    "events_tumbling_window",
    "events_sessionize",
    "join_left",
    "join_asof_backward",
    "window_rank_variants",
    "window_first_last",
    "window_range_7d",
    "set_union_all_drift",
    "normalize_missing_column",
    "text_sentiment",
    "text_top_tokens",
    "similarity_ann_index_pq",
]


def _ordered_registry() -> dict[str, _registry.Query]:
    ordered: dict[str, _registry.Query] = {}
    for name in _PRIORITY + _PRIORITY_R10:
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
