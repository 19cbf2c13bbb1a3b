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
from datarepo_spark.queries import ranked as _ranked  # noqa: E402,F401

# The driver gates the first N queries() entries (N=50 of the full
# registry — len(REGISTRY) is the authoritative count), so
# ordering is coverage policy: one hard CORRECTNESS row per operator
# family per rotation. Everything not listed follows in registration
# order — still checked locally by tests/test_oracle_parity.py.
#
# -- r12 window (VERDICT r11 #3): the 29 r11-born queries that have
# never held a driver row (the insights analytics batch — including
# the three queries REWRITTEN this round onto the two-pass distributed
# rank/prefix-sum primitive per VERDICT r11 #1, plus the migrated RFM
# NTILE and conversion-latency percentiles — the k-core/link-
# prediction graph pair, the three remaining streaming twins, the
# replaceWhere writer path, top-k IVM, and the confusion matrix), then
# 21 refresh slots on the oldest green cohort (r8): the heavy curate/
# decontaminate pipelines (also the r11 perf watch items), the delta
# write/maintenance paths, the text-quality layer, ANN variants, and
# event analytics. After r12: every registry query as of r11 has held
# a driver row and none is older than r9.
_PRIORITY = [
    # -- r11-born, never driver-gated (staged r11 as _PRIORITY_R12) ----
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
    # -- r8-cohort refresh (oldest green rows, 21 slots) ---------------
    "pipeline_curate_v3",
    "pipeline_decontaminate_neardup",
    "pipeline_pack_sequences",
    "pipeline_mixture_sample",
    "delta_merge_upsert",
    "delta_dv_delete",
    "delta_zorder_skip",
    "classify_nb_language",
    "text_perplexity",
    "text_quality_rank",
    "text_normalize",
    "dedup_semantic",
    "dedup_cluster_survivors",
    "similarity_ann_ivfpq",
    "similarity_kmeans_assign",
    "similarity_ann_index",
    "events_funnel",
    "events_retention",
    "events_transition_matrix",
    "q4_order_priority",
    "q19_disjunctive_predicates",
    # exactly 50 entries total — the driver gates the first 50
]

# r13 rotation staging: queries born in r12 that should lead the next
# window (filled as they land; drained into _PRIORITY at the r13
# rotation), then the oldest-cohort refresh picks up from r9. Each is
# driver-sim-verified green at sf0.01 when it lands here.
_PRIORITY_R13: list[str] = [
    "profile_mann_whitney",
    "profile_kruskal_wallis",
    "profile_weighted_median",
    "window_lorenz_deciles",
    "events_kaplan_meier",
    "events_interarrival",
    "agg_association_rules",
    "graph_local_clustering",
    "events_cohort_ltv",
    "agg_count_min_sketch",
    "sample_neyman_allocation",
    "streaming_running_total_twin",
    "agg_bloom_filter",
]


def _ordered_registry() -> dict[str, _registry.Query]:
    ordered: dict[str, _registry.Query] = {}
    for name in _PRIORITY + _PRIORITY_R13:
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
