"""Merge every query module's (QUERIES, ORACLES) for __spark_entry__."""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

#: Query modules, each exposing QUERIES and (optionally) ORACLES.
#:
#: ORDER MATTERS for the driver's correctness gate: it verifies the
#: first 50 entries of collect() per round, so the window rotates each
#: round.  Module order alone can't pack a round's debut queries into
#: the window (they are scattered across modules), so collect() hoists
#: the explicit ``_WINDOW`` name list to the front; everything else
#: follows in module order.  tests/test_registry_window.py pins the
#: resulting first 50 so any window change is an explicit edit.
#:
#: The current window's composition rationale lives in the comment
#: block directly above ``_WINDOW`` below; the next round's rotation
#: plan sits above that.
_MODULES = [
    "sleep_edf_data_pipeline_spark.queries.extras",
    "sleep_edf_data_pipeline_spark.queries.sleep_relational",
    "sleep_edf_data_pipeline_spark.queries.tpch_relational",
    "sleep_edf_data_pipeline_spark.queries.joins_advanced",
    "sleep_edf_data_pipeline_spark.queries.relational_breadth",
    "sleep_edf_data_pipeline_spark.queries.event_windows",
    "sleep_edf_data_pipeline_spark.queries.advanced_windows",
    "sleep_edf_data_pipeline_spark.queries.serving",
    "sleep_edf_data_pipeline_spark.queries.dedup_queries",
    "sleep_edf_data_pipeline_spark.queries.text_queries",
    "sleep_edf_data_pipeline_spark.queries.similarity_queries",
    "sleep_edf_data_pipeline_spark.queries.multimodal_queries",
    "sleep_edf_data_pipeline_spark.queries.corpus_prep",
    "sleep_edf_data_pipeline_spark.queries.corpus_filters",
    "sleep_edf_data_pipeline_spark.queries.tpch_deep",
    "sleep_edf_data_pipeline_spark.queries.behavior_analytics",
    "sleep_edf_data_pipeline_spark.queries.graph_stats",
    "sleep_edf_data_pipeline_spark.queries.training_data",
    "sleep_edf_data_pipeline_spark.queries.tpch_complete",
    "sleep_edf_data_pipeline_spark.queries.quantization_queries",
    "sleep_edf_data_pipeline_spark.queries.corpus_quality",
    # r04 debuts — appended at the END so the pinned round-4 window is
    # untouched; rotate into the window in round 5.
    "sleep_edf_data_pipeline_spark.queries.timeseries_extra",
    "sleep_edf_data_pipeline_spark.queries.retrieval",
    "sleep_edf_data_pipeline_spark.queries.selection_extra",
    # r05 debuts — appended at the END so the pinned round-5 window is
    # untouched; rotate into the window in round 6 (see plan above).
    "sleep_edf_data_pipeline_spark.queries.heavy_hitters",
    # r06 debuts — appended at the END so the pinned round-6 window is
    # untouched; rotate into the window in round 7 (see plan above).
    "sleep_edf_data_pipeline_spark.queries.lm_data_extras",
    "sleep_edf_data_pipeline_spark.queries.engine_extras",
    "sleep_edf_data_pipeline_spark.queries.drift_stats",
    "sleep_edf_data_pipeline_spark.queries.assoc_mining",
    "sleep_edf_data_pipeline_spark.queries.trend_stats",
    "sleep_edf_data_pipeline_spark.queries.storage_roundtrip",
]

# ROUND-7 WINDOW PLAN (execute at the START of round 7, never
# mid-round — the driver grades the window as committed at round end):
# 1) any round-6 debut with only local verification (as of the second
#    r6 session that is: decontaminate_auto, bpe_merge_pairs,
#    bigram_lm_surprisal, hard_negatives, hard_negatives_lsh,
#    cdc_chunks, token_entropy_by_source, plus the engine_extras four —
#    label_propagation_communities, incremental_customer_summary,
#    temperature_mixture_weights, normalize_text_nfc,
#    community_quality, psi_drift_by_source, ks_two_sample,
#    image_dhash_neardups, top_event_paths, pmi_cooccurrence,
#    revenue_trend_ols, acf_user_value, orc_roundtrip_agg,
#    csv_roundtrip_agg, cross_split_leakage,
#    inverted_index_postings, bfs_distances,
#    scd2_customer_priority, link_negative_sampling,
#    classifier_calibration, cusum_changepoint);
# 2) any query whose implementation round 6 REWROTE after its last
#    driver row (candidates: bloom_decontaminate if the auto-switch
#    lands, heavy_hitters_cms if the executor-side probe lands after
#    its r6 row);
# 3) the 8 sleep-spine names deliberately deferred from the r06
#    window (staging_cast, moving_average, transition_flag,
#    gaps_islands, episode_detection, episode_ranking, episode_bounds,
#    sleep_metrics) plus the 2 rows-only sketches left stale at r03
#    (approx_distinct_parts, approx_quantiles_price);
# 4) backfill with the next-stalest driver rows (after the r06 window
#    lands, the stalest remaining pool is the r04 set — compare
#    CORRECTNESS_r04.json names against the r05/r06 windows).
# Update tests/test_registry_window.py's pin in the same commit.

#: The driver-verification window: collect() hoists these 50 names to
#: the front, in this order.  Every name must exist in some module.
#:
#: ROUND-6 WINDOW (executing the round-5 rotation plan): the four
#: round-5 debuts that have never had a driver row (audio_features,
#: heavy_hitters_exact, and the rows-only heavy_hitters_cms /
#: mad_outliers_approx — the driver records the weaker rows-only
#: check for those two); the two queries round 5 rewrote after their
#: then-latest driver row (dsir_importance_weights — histogram
#: rewrite after its r04 row; volume_shipping — nation-pair pushdown,
#: re-verified green in the r05 window but re-windowed per the
#: round-5 verdict); the four r02-stale input stages
#: (document_chunks_udtf, simhash_fingerprints, minhash_signatures,
#: lsh_buckets); then 40 of the 48 oracle-backed queries whose latest
#: driver row is r03.  The 8 r03-stale names deferred to round 7 are
#: the shallow sleep-pipeline spine — the in-window downstream
#: composites sleep_summary / sleep_features consume every spine
#: stage, so the spine re-verifies transitively, and each stage also
#: holds dedicated pytest goldens.
_WINDOW = [
    # -- round-5 debuts, never driver-rowed (4; last 2 rows-only) -----
    "audio_features",
    "heavy_hitters_exact",
    "heavy_hitters_cms",
    "mad_outliers_approx",
    # -- rewritten in round 5 after their then-latest driver row (2) --
    "dsir_importance_weights",
    "volume_shipping",
    # -- r02-stale input stages (4) -----------------------------------
    "document_chunks_udtf",
    "simhash_fingerprints",
    "minhash_signatures",
    "lsh_buckets",
    # -- latest driver row is r03 (40 of 48 oracle-backed) ------------
    "above_average_orders",
    "asof_last_order",
    "correlated_above_cust_avg",
    "customers_with_urgent_orders",
    "customers_without_orders",
    "distinct_counts",
    "event_type_pivot",
    "events_near_orders",
    "full_outer_reconciliation",
    "fuzzy_name_dedup",
    "hourly_densified",
    "hourly_event_agg",
    "json_props_agg",
    "linear_interpolation",
    "lineitem_rollup",
    "locf_gap_fill",
    "modern_agg_suite",
    "nation_set_ops",
    "orders_cube",
    "orders_per_customer",
    "part_attributes_unpivot",
    "pricing_summary",
    "priority_set_ops_all",
    "product_profit",
    "quantity_band_agg",
    "quantity_quantiles",
    "range_frame_spend",
    "regional_revenue",
    "scalar_functions",
    "session_window_agg",
    "ship_latency_percentiles",
    "shipping_grouping_sets",
    "sleep_features",
    "sleep_summary",
    "sliding_window_agg",
    "top_orders_per_customer",
    "top_revenue_orders",
    "value_outliers",
    "weighted_discount_udaf",
    "window_function_suite",
]

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name: {name} in {modname}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name not in mod.QUERIES:
                raise ValueError(f"oracle without query: {name} in {modname}")
            oracles[name] = sql
    missing = [n for n in _WINDOW if n not in queries]
    if missing:
        raise ValueError(f"_WINDOW names not registered: {missing}")
    if len(set(_WINDOW)) != len(_WINDOW):
        raise ValueError("_WINDOW has duplicates")
    ordered = {n: queries[n] for n in _WINDOW}
    ordered.update((n, f) for n, f in queries.items() if n not in ordered)
    return ordered, oracles
