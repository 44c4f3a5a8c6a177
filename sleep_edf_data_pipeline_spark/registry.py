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
]

# ROUND-9 WINDOW PLAN (execute at the START of round 9, never
# mid-round — the driver grades the window as committed at round end):
# 1) the round-8 debuts with only local verification (4):
#    bpe_encode_sample, cdc_dedup_spans, url_canonical_dedup,
#    host_dedup_profile
#    (all local driver_sim hash-green at 3 SFs in round 8);
# 2) queries the round-8 corpus-pass audit REWROTE after their last
#    driver row (plan-only changes, same oracles, but the rows predate
#    the code): mad_outliers_approx, hard_negatives_lsh, lsh_buckets,
#    pq_recall_eval, pq_topk_refined (5).  The audit's other rewrites
#    (funnel_counts, user_rfm, mad_outliers, key_skew_report,
#    vocab_growth_curve) are already covered by item 1/3; everything
#    in the round-8 window (peak_concurrent_sessions,
#    bpe_encode_stats, embedding_neardups, ...) gets its r08 row from
#    a driver run that postdates all round-8 commits;
# 3) backfill with the stalest pools — computed at round-8 close, the
#    exact r05-stale pool (last driver row r05, in no window since) is
#    these 39:
#    bigram_counts cohort_ltv context_packing copurchase_pairs
#    dataset_split_stats deterministic_downsample event_transitions
#    ewma_user_value exact_moments_suite funnel_counts key_skew_report
#    large_volume_customers last_touch_attribution length_histogram
#    mad_outliers market_share min_cost_supplier ohlc_bars
#    pagerank_copurchase quality_decile_select quality_scores
#    regex_token_stats retention_cohorts rolling_median_value
#    sales_opportunity simhash_neardups small_quantity_revenue
#    source_overlap_matrix special_promo_revenue stopword_profile
#    subject_list subject_lookup subject_timeseries token_stats
#    top_supplier_revenue twap_user_value user_rfm vocab_top_tokens
#    weekly_active_users
#    plus 2 from the 50-name r06-stale pool:
#    heavy_hitters_exact, session_window_agg
#    = 4 + 5 + 39 + 2 = exactly 50.
# Update tests/test_registry_window.py's pin in the same commit.

#: The driver-verification window: collect() hoists these 50 names to
#: the front, in this order.  Every name must exist in some module.
#:
#: ROUND-8 WINDOW (executing the round-7 rotation plan verbatim): the
#: 6 round-7 debuts that have never had a driver row (all local
#: driver_sim hash-green at 3 SFs in round 7); the full 34-name
#: r04-stale pool (green in CORRECTNESS_r04, in no window since); and
#: 10 LLM-data-ops names from the 49-name r05-stale pool.  No query
#: was rewritten after its round-7 driver row, so there is no item-2
#: component this round.
_WINDOW = [
    # -- round-7 debuts, never driver-rowed (6) -----------------------
    "bpe_encode_stats",
    "embedding_drift_by_label",
    "session_window_agg_bucketed",
    "peak_concurrent_sessions",
    "fuzzy_name_dedup_symspell",
    "vocab_growth_curve",
    # -- r04-stale backfill: the full 34-name pool --------------------
    "cluster_size_histogram",
    "corpus_shuffle_order",
    "cosine_topk_ivf",
    "customer_distribution",
    "data_quality_checks",
    "decontaminate_overlap",
    "dedup_clusters",
    "diagnostics",
    "domain_mixture_weights",
    "dominant_small_part_suppliers",
    "duplicate_spans",
    "forecast_revenue",
    "frame_sampling",
    "importance_resample",
    "important_stock",
    "json_props_stats",
    "kcore_membership",
    "length_bucket_packing",
    "minhash_lsh_neardups",
    "multimodal_features",
    "multimodal_resize",
    "ngram_jaccard_neardups",
    "part_supplier_diversity",
    "pii_scrub",
    "priority_order_counts",
    "promo_revenue_share",
    "quality_classifier",
    "ranking_suite",
    "repetition_stats",
    "returned_item_customers",
    "shipping_priority_buckets",
    "stratified_sample",
    "unigram_logprob_scores",
    "waiting_suppliers",
    # -- r05-stale backfill (10): LLM-data ops ------------------------
    "ann_recall_eval",
    "bm25_topk",
    "cosine_topk_bruteforce",
    "dedup_canonical_docs",
    "doc_fingerprints",
    "document_chunks",
    "embedding_neardups",
    "gopher_quality_flags",
    "language_id",
    "tfidf_top_terms",
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
