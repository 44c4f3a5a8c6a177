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
    # r07 debuts — appended at the END so the pinned round-7 window is
    # untouched; rotate into the window in round 8 (see plan above).
    "sleep_edf_data_pipeline_spark.queries.tokenizer_apply",
    "sleep_edf_data_pipeline_spark.queries.embedding_drift",
    "sleep_edf_data_pipeline_spark.queries.occupancy",
    "sleep_edf_data_pipeline_spark.queries.edit_distance",
    # r08 debuts — appended at the END so the pinned round-8 window is
    # untouched; rotate into the window in round 9 (see plan above).
    "sleep_edf_data_pipeline_spark.queries.url_dedup",
    "sleep_edf_data_pipeline_spark.queries.span_dedup",
    # r09 debuts — appended at the END so the pinned round-9 window is
    # untouched; rotate into the window in round 10 (see plan above).
    "sleep_edf_data_pipeline_spark.queries.line_dedup",
    "sleep_edf_data_pipeline_spark.queries.semantic_decontam",
    "sleep_edf_data_pipeline_spark.queries.retrieval_fusion",
    "sleep_edf_data_pipeline_spark.queries.cluster_quality",
    "sleep_edf_data_pipeline_spark.queries.corpus_verdict",
    "sleep_edf_data_pipeline_spark.queries.quantization_sq",
    "sleep_edf_data_pipeline_spark.queries.readability",
    "sleep_edf_data_pipeline_spark.queries.novelty",
    "sleep_edf_data_pipeline_spark.queries.wordpiece",
    "sleep_edf_data_pipeline_spark.queries.link_prediction",
    "sleep_edf_data_pipeline_spark.queries.layout",
    "sleep_edf_data_pipeline_spark.queries.skyline",
    "sleep_edf_data_pipeline_spark.queries.chi2_drift",
    "sleep_edf_data_pipeline_spark.queries.sampling_advanced",
    # r10 debuts — appended at the END so the pinned round-10 window is
    # untouched; rotate into the window in round 11 (see plan above).
    "sleep_edf_data_pipeline_spark.queries.intra_doc_dedup",
    "sleep_edf_data_pipeline_spark.queries.quantile_sketch",
    "sleep_edf_data_pipeline_spark.queries.coreset",
    "sleep_edf_data_pipeline_spark.queries.dedup_cascade",
    "sleep_edf_data_pipeline_spark.queries.winsorize",
    "sleep_edf_data_pipeline_spark.queries.quantile_transform",
    "sleep_edf_data_pipeline_spark.queries.hll_rollup",
    "sleep_edf_data_pipeline_spark.queries.vocab_coverage",
    "sleep_edf_data_pipeline_spark.queries.asof_forward",
]

# ROUND-11 ROTATION PLAN (execute at the START of round 11, never
# mid-round): after the round-10 window below runs, the stale pools
# computed from CORRECTNESS_r0{1..9}.json "latest green row per name"
# are: 11 r06-stale names left by this round's backfill
# (above_average_orders, correlated_above_cust_avg,
# customers_with_urgent_orders, customers_without_orders,
# distinct_counts, nation_set_ops, orders_per_customer,
# priority_set_ops_all, regional_revenue, top_revenue_orders,
# volume_shipping), then the 47-name r07 pool ages in.  Compose
# round 11 as:
# 1) the round-10 debuts (registered after the round-10 window was
#    pinned — all locally driver_sim hash-green at 3 SFs in round 10,
#    never driver-rowed): intra_doc_dedup, ddsketch_quantiles_price
#    (no-oracle sketch, rows-only), kcenter_coreset,
#    dedup_cascade_verdict, winsorized_price_stats,
#    quantile_rank_transform, hll_rollup_distinct (no-oracle sketch,
#    rows-only), cum_distinct_users, vocab_coverage_curve,
#    asof_next_conversion, hll_rolling_wau (no-oracle sketch,
#    rows-only);
# 2) any query whose plan is rewritten after its round-10 driver row;
# 3) the 11 r06-stale names above;
# 4) backfill to exactly 50 with the stalest of the 47-name r07 pool
#    (prefer LLM-data ops first: semdedup_prune, cross_split_leakage,
#    bloom_decontaminate, pq/ivfpq family, cdc_chunks, bpe_merge_pairs,
#    normalize_text_nfc, ...).  11 + 0 + 11 + 28 = exactly 50 if no
#    plans are rewritten post-row.
# Update tests/test_registry_window.py pins in the same commit.

#: The driver-verification window: collect() hoists these 50 names to
#: the front, in this order.  Every name must exist in some module.
#:
#: ROUND-10 WINDOW (executing the round-9 rotation plan; the stale
#: pool was recomputed from the correctness records as 46 names, not
#: the 48 the plan estimated — mad_outliers_approx and lsh_buckets
#: were re-rowed in round 9's audit group):
#: 1) the 15 round-9 debuts (locally hash-green at 3 SFs, never
#:    driver-rowed);
#: 2) no audit-rewritten plans (none postdate their r9 driver row);
#: 3) backfill with 35 of the 46-name r06-stale pool, LLM-data and
#:    reference-parity ops first, leaving 11 for round 11.
_WINDOW = [
    # -- round-9 debuts, never driver-rowed (15) ----------------------
    "line_dedup_stats",
    "decontaminate_semantic",
    "rrf_fusion",
    "kmeans_silhouette",
    "corpus_keep_verdict",
    "sq_topk_rescore",
    "sq_recall_eval",
    "readability_scores",
    "ngram_novelty",
    "wordpiece_encode_stats",
    "edge_similarity_scores",
    "zorder_layout_stats",
    "pareto_frontier",
    "chi2_drift_by_source",
    "priority_sample_estimate",
    # -- r06-stale backfill (35 of 46) --------------------------------
    "asof_last_order",
    "audio_features",
    "document_chunks_udtf",
    "dsir_importance_weights",
    "event_type_pivot",
    "events_near_orders",
    "full_outer_reconciliation",
    "fuzzy_name_dedup",
    "heavy_hitters_cms",
    "hourly_densified",
    "hourly_event_agg",
    "json_props_agg",
    "linear_interpolation",
    "lineitem_rollup",
    "locf_gap_fill",
    "minhash_signatures",
    "modern_agg_suite",
    "orders_cube",
    "part_attributes_unpivot",
    "pricing_summary",
    "product_profit",
    "quantity_band_agg",
    "quantity_quantiles",
    "range_frame_spend",
    "scalar_functions",
    "ship_latency_percentiles",
    "shipping_grouping_sets",
    "simhash_fingerprints",
    "sleep_features",
    "sleep_summary",
    "sliding_window_agg",
    "top_orders_per_customer",
    "value_outliers",
    "weighted_discount_udaf",
    "window_function_suite",
]

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """All registered (queries, oracles), driver window hoisted first.

    CACHE CONTRACT: several query functions ``persist()`` a *reduced*
    intermediate (per-key grid, coded corpus, histogram) that feeds
    multiple consumers in the same plan, and deliberately do NOT
    unpersist — the frame must stay cached until the caller has
    consumed the returned DataFrame.  The harness callers (the external
    driver, bench.py, scripts/driver_sim.py, tests) all call
    ``spark.catalog.clearCache()`` between queries.  Any other
    long-lived session embedding these functions must do the same, or
    cached fact-derived frames accumulate across queries.
    """
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
