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
from datarepo_spark.queries import insights as _insights  # noqa: E402,F401

# The driver gates the first N queries() entries (N=50 of the full
# registry — len(REGISTRY) is the authoritative count), so
# ordering is coverage policy: one hard CORRECTNESS row per operator
# family per rotation. Everything not listed follows in registration
# order — still checked locally by tests/test_oracle_parity.py.
#
# -- r11 window (VERDICT r10 #1): the 46 r10-born queries that have
# never held a driver row (the statistics/data-quality layer, the four
# remaining streaming twins incl. the stream-stream interval join —
# VERDICT r10 #2 — SCD2, gaps-and-islands, itemsets, AUC/calibration,
# batch ANN, and the skew dup-payload query), then 4 refresh slots on
# the oldest green cohort (r7): the heavy TPC-H Q18, the flagship
# MinHash-LSH dedup, the brute-force ANN baseline, and the video
# near-dup decode path. After r11: every registry query as of r10 has
# held a driver row and none is older than r8.
_PRIORITY = [
    # -- r10-born, never driver-gated (staged r10 as _PRIORITY_R11) ----
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
    # -- r7-cohort refresh (oldest green rows, 4 slots) ----------------
    "q18_large_volume",
    "dedup_minhash_lsh",
    "similarity_knn_brute_force",
    "multimodal_video_near_dup",
    # exactly 50 entries total — the driver gates the first 50
]

# r12 rotation staging: queries born in r11 that should lead the next
# window (filled as they land; drained into _PRIORITY at the r12
# rotation), then the oldest-cohort refresh picks up from r8. Each is
# driver-sim-verified green at sf0.01 when it lands here.
_PRIORITY_R12: list[str] = [
    "bench_calibration",
    "profile_psi_drift",
    "profile_spearman_rank",
    "profile_jensen_shannon",
    "profile_covariance_matrix",
    "events_ohlc_bars",
    "events_rate_of_change",
    "agg_collect_ordered",
    "window_pareto_cumshare",
    "graph_common_neighbors",
    "graph_kcore_peel",
    "window_top_with_ties",
    "text_ttr_hapax",
    "text_readability",
    "similarity_cosine_histogram",
    "streaming_dedup_first_twin",
    "ivm_topk_by_status",
    "profile_key_skew",
    "profile_qq_deciles",
    "window_yoy_growth",
    "streaming_stream_static_twin",
    "events_peak_concurrency",
    "events_conversion_latency",
    "events_dau_wau_mau",
    "delta_replace_where",
    "streaming_delta_sink_twin",
    "events_error_rate_slo",
    "profile_rfm_segmentation",
    "classify_confusion_matrix",
]


def _ordered_registry() -> dict[str, _registry.Query]:
    ordered: dict[str, _registry.Query] = {}
    for name in _PRIORITY + _PRIORITY_R12:
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
