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
#: ROUND-4 WINDOW (executing the round-3 rotation plan): the 37
#: queries that debuted in round 3 and have only local verification
#: (all of training_data, tpch_complete, quantization_queries,
#: corpus_quality, plus ranking_suite / incremental_dedup /
#: quality_classifier / multimodal_resize / customer_distribution /
#: waiting_suppliers / kcore_membership / triangle_counts), then the
#: three serving queries whose last driver row is r01, then ten
#: backfill slots for queries whose implementation is touched this
#: round (k-means rewrite, ngram-Jaccard prefix filter, multimodal
#: codec) or that anchor the dedup/ANN spine.  The two approximate
#: sketches (approx_distinct_parts, approx_quantiles_price) already
#: have their by-design rows-only r03 rows and stay outside.
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
]

# ROUND-5 WINDOW PLAN (execute at the START of round 5, never
# mid-round — the driver grades the window as committed at round end):
# 1) the eleven r04 debuts with only local verification so far:
#    ewma_user_value, last_touch_attribution, ohlc_bars, bm25_topk,
#    twap_user_value, rolling_median_value, quality_decile_select,
#    source_overlap_matrix, cohort_ltv, key_skew_report, mad_outliers;
# 2) any query whose ONLY driver row is r01/r02 and that r04's window
#    did not re-verify (compare CORRECTNESS_r0{1,2}.json names against
#    the r04 _WINDOW below — the dedup/text/similarity/corpus_prep
#    r02 families are the stalest);
# 3) backfill with queries whose implementation round 5 touches.
# Update tests/test_registry_window.py's pin in the same commit.

#: The driver-verification window: collect() hoists these 50 names to
#: the front, in this order.  Every name must exist in some module.
_WINDOW = [
    # -- round-3 debuts: training_data (9) --------------------------
    "decontaminate_overlap",
    "repetition_stats",
    "stratified_sample",
    "domain_mixture_weights",
    "json_props_stats",
    "pii_scrub",
    "cluster_size_histogram",
    "semdedup_prune",
    "duplicate_spans",
    # -- round-3 debuts: tpch_complete (8) --------------------------
    "priority_order_counts",
    "forecast_revenue",
    "returned_item_customers",
    "important_stock",
    "shipping_priority_buckets",
    "promo_revenue_share",
    "part_supplier_diversity",
    "dominant_small_part_suppliers",
    # -- round-3 debuts: quantization_queries (6) --------------------
    "pq_codes",
    "pq_topk_adc",
    "pq_topk_refined",
    "pq_recall_eval",
    "ivfpq_topk",
    "ivfpq_residual_topk",
    # -- round-3 debuts: corpus_quality (6) --------------------------
    "bloom_decontaminate",
    "dsir_importance_weights",
    "unigram_logprob_scores",
    "importance_resample",
    "length_bucket_packing",
    "corpus_shuffle_order",
    # -- round-3 debut stragglers inside older modules (8) -----------
    "ranking_suite",
    "incremental_dedup",
    "quality_classifier",
    "multimodal_resize",
    "customer_distribution",
    "waiting_suppliers",
    "kcore_membership",
    "triangle_counts",
    # -- last driver row is r01 (3) ----------------------------------
    "subject_list",
    "subject_lookup",
    "subject_timeseries",
    # -- backfill: implementations touched this round + spine (10) ---
    "kmeans_clusters",
    "ngram_jaccard_neardups",
    "multimodal_features",
    "frame_sampling",
    "cosine_topk_ivf",
    "minhash_lsh_neardups",
    "dedup_exact",
    "dedup_clusters",
    "diagnostics",
    "data_quality_checks",
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
