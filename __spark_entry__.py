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
    # -- r6 window: the 51-query cohort whose most recent driver gate
    # is r1/r2 (VERDICT r5 #2). Shared machinery under them (readconf,
    # type canonicalization, session conf) changed in r3-r5; they are
    # re-proven locally every round by tests/test_oracle_parity.py, but
    # the hard driver-gated row is stale — refresh it. 49 of the 51 fit
    # (deferring reshape_posexplode + set_union_distinct, whose exact
    # siblings are in-window) plus r6-born similarity_ann_index_pq.
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "filter_comparisons",
    "filter_in_contains_dnf",
    "filter_not_in",
    "filter_sql_string",
    "normalize_missing_column",
    "join_left",
    "join_outer_full",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_theta_inequality",
    "join_range_bucketed",
    "join_asof_backward",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_distinct_counts",
    "agg_median_quantile",
    "agg_whole_frame",
    "window_rank_topk_per_group",
    "window_rank_variants",
    "window_lag_lead",
    "window_first_last",
    "window_running_sum",
    "window_rolling_mean",
    "window_range_7d",
    "fn_string_suite",
    "fn_date_suite",
    "fn_math_suite",
    "fn_array_suite",
    "fn_json_extract",
    "fn_conditional_null",
    "set_union_all_drift",
    "set_except",
    "set_intersect",
    "reshape_explode",
    "reshape_pivot",
    "reshape_unpivot",
    "sort_topk",
    "dedup_distinct_subset",
    "events_tumbling_window",
    "events_sessionize",
    "text_sentiment",
    "text_top_tokens",
    "similarity_ann_index_pq",  # r6-born: persisted IVF-PQ index
]

# r7 rotation staging: queries that should take the next window's slots
# — the two stale-cohort deferrals (reshape_posexplode,
# set_union_distinct, still r1-gated) plus the r6-born queries without
# a driver row yet (dedup_incremental_index, pipeline_token_budget,
# multimodal_ahash, multimodal_near_dup, multimodal_audio_features,
# multimodal_video_frame_hashes), then the r3/r4-gated cohort by age.

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
    for name in _PRIORITY + _PRIORITY_R5:
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
