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
]

# ROUND-10 ROTATION PLAN (execute at the START of round 10, never
# mid-round): after the round-9 window below runs, the stalest pool is
# the r06 window remainder (last driver row r06, in no window since) —
# 48 names = the ROUND6_WINDOW of tests/test_registry_window.py at the
# round-6 commit, minus heavy_hitters_exact and session_window_agg
# (taken into the round-9 window).  Compose round 10 as:
# 1) the 15 round-9 debuts (all local driver_sim hash-green at 3 SFs
#    in round 9, never driver-rowed): line_dedup_stats,
#    decontaminate_semantic, rrf_fusion, kmeans_silhouette,
#    corpus_keep_verdict, sq_topk_rescore, sq_recall_eval,
#    readability_scores, ngram_novelty, wordpiece_encode_stats,
#    edge_similarity_scores, zorder_layout_stats, pareto_frontier,
#    chi2_drift_by_source, priority_sample_estimate;
# 2) any query whose plan is rewritten after its round-9 driver row
#    (none as of round-9 close — the url_dedup shared-tail refactor
#    and the reverted cdc experiment both PREDATE the round-9 driver
#    run, so their r9 rows cover current code);
# 3) backfill with 35 of the 48-name r06-stale pool (prefer LLM-data
#    ops first), leaving 13 for round 11.  15 + 0 + 35 = exactly 50.
# Update tests/test_registry_window.py pins in the same commit.

#: The driver-verification window: collect() hoists these 50 names to
#: the front, in this order.  Every name must exist in some module.
#:
#: ROUND-9 WINDOW (executing the round-8 rotation plan verbatim):
#: 1) the 4 round-8 debuts that have never had a driver row (all local
#:    driver_sim hash-green at 3 SFs in round 8);
#: 2) the 5 plans the round-8 corpus-pass audit REWROTE after their
#:    last driver row (same oracles, plan-only changes);
#: 3) the full 39-name r05-stale pool + 2 names from the r06-stale
#:    pool (heavy_hitters_exact, session_window_agg) = exactly 50.
_WINDOW = [
    # -- round-8 debuts, never driver-rowed (4) -----------------------
    "bpe_encode_sample",
    "cdc_dedup_spans",
    "url_canonical_dedup",
    "host_dedup_profile",
    # -- audit-rewritten after their last driver row (5) --------------
    "mad_outliers_approx",
    "hard_negatives_lsh",
    "lsh_buckets",
    "pq_recall_eval",
    "pq_topk_refined",
    # -- r05-stale backfill: the full 39-name pool --------------------
    "bigram_counts",
    "cohort_ltv",
    "context_packing",
    "copurchase_pairs",
    "dataset_split_stats",
    "deterministic_downsample",
    "event_transitions",
    "ewma_user_value",
    "exact_moments_suite",
    "funnel_counts",
    "key_skew_report",
    "large_volume_customers",
    "last_touch_attribution",
    "length_histogram",
    "mad_outliers",
    "market_share",
    "min_cost_supplier",
    "ohlc_bars",
    "pagerank_copurchase",
    "quality_decile_select",
    "quality_scores",
    "regex_token_stats",
    "retention_cohorts",
    "rolling_median_value",
    "sales_opportunity",
    "simhash_neardups",
    "small_quantity_revenue",
    "source_overlap_matrix",
    "special_promo_revenue",
    "stopword_profile",
    "subject_list",
    "subject_lookup",
    "subject_timeseries",
    "token_stats",
    "top_supplier_revenue",
    "twap_user_value",
    "user_rfm",
    "vocab_top_tokens",
    "weekly_active_users",
    # -- r06-stale (2) -------------------------------------------------
    "heavy_hitters_exact",
    "session_window_agg",
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
