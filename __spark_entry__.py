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
from datarepo_spark.queries import analysis as _analysis  # noqa: E402,F401

# The driver gates the first N queries() entries (N=50 of the full
# registry — len(REGISTRY) is the authoritative count), so
# ordering is coverage policy: one hard CORRECTNESS row per operator
# family per rotation. Everything not listed follows in registration
# order — still checked locally by tests/test_oracle_parity.py.
#
# -- r10 window (VERDICT r9 #2): skew_salted_join FIRST (re-spelled
# ROUND(CAST .. AS DOUBLE) per VERDICT r9 #1a — third gate attempt),
# then the 12 r9-born queries that have never held a driver row, the
# streaming stateful-EWMA twin (VERDICT r9 #6 — first streaming result
# under the gate), the r10-born interval-overlap join, and the 35
# remaining r6-gated queries (oldest cohort). After r10: every registry
# query has held a driver row and none is older than r7.
_PRIORITY = [
    "skew_salted_join",
    # -- r9-born, never driver-gated ----------------------------------
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
    # -- r10-born headline additions -----------------------------------
    "streaming_ewma_twin",
    "join_interval_overlap",
    # -- r6-cohort refresh (the 35 not re-gated in r9, reg. order) ------
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
    # exactly 50 entries total — the driver gates the first 50
]

# r11 rotation staging: the r10-born queries that did not fit the r10
# window lead (each driver-sim-verified green at sf0.01 when it
# landed), then the r7-gated cohort (oldest after r10) by registration
# order.
_PRIORITY_R11 = [
    "profile_iqr_outliers",
    "events_anomaly_mad",
    "text_rrf_fusion",
    "graph_degree_distribution",
    "dedup_jaccard_prefix",
    "profile_ks_drift",
    "similarity_batch_knn",
    "streaming_window_counts_twin",
    "streaming_debounce_twin",
    "join_asof_tolerance",
    "pipeline_quality_funnel",
    "text_zipf_profile",
    "similarity_ann_ivf_batch",
    "graph_personalized_pagerank",
    "graph_label_propagation",
    "events_seasonal_profile",
    "ivm_distinct_by_status",
    "agg_boolean_suite",
    "fn_bitwise_suite",
    "fn_regexp_suite",
    "window_gap_islands",
    "join_null_safe",
    "profile_benford",
    "skew_salted_agg_dup_payloads",
    "profile_linear_trend",
    "events_time_weighted_avg",
    "window_rolling_median",
    "profile_chi_square",
    "profile_gini",
    "profile_bootstrap_ci",
    "profile_welch_ttest",
    "events_autocorrelation",
    "events_cusum_drift",
    "multimodal_scene_cuts",
    "profile_expectations",
    "events_rolling_distinct_users",
    "streaming_sessionize_twin",
    "agg_frequent_itemsets",
    "profile_table_fingerprint",
    "profile_join_cardinality_estimate",
    "classify_auc",
    "classify_calibration",
    "events_hourly_p95",
    "streaming_interval_join_twin",
    "profile_conformal_interval",
    "join_scd2_lookup",
]


def _ordered_registry() -> dict[str, _registry.Query]:
    ordered: dict[str, _registry.Query] = {}
    for name in _PRIORITY + _PRIORITY_R11:
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
