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
    # r11 debuts — appended at the END so the pinned round-11 window is
    # untouched; rotate into the window in round 12 (see plan above).
    "sleep_edf_data_pipeline_spark.queries.unigram_lm",
    "sleep_edf_data_pipeline_spark.queries.kn_bigram",
    "sleep_edf_data_pipeline_spark.queries.lsh_recall",
]

# ROUND-12 ROTATION PLAN (execute at the START of round 12, never
# mid-round): after the round-11 window below runs, the stale pool is
# the 20 r07-latest names the round-11 backfill did not reach
# (acf_user_value, approx_distinct_parts*, approx_quantiles_price*,
# classifier_calibration, community_quality, csv_roundtrip_agg,
# episode_bounds, episode_detection, episode_ranking, gaps_islands,
# incremental_customer_summary, link_negative_sampling, moving_average,
# orc_roundtrip_agg, revenue_trend_ols, scd2_customer_priority,
# sleep_metrics, staging_cast, top_event_paths, transition_flag;
# * = no-oracle sketches — ALREADY converted to verdict-row form late
# in round 11 (approx_distinct_parts, approx_quantiles_price, and
# mad_outliers_approx from the r08 pool), so they enter the round-12
# window as post-row rewrites with contract-bearing rows), then the
# r08 pool ages in.  Compose round 12 as:
# 1) the round-11 debuts (registered after the round-11 window was
#    pinned; all locally hash-green at 3 SFs in round 11):
#    unigram_lm_vocab, unigram_lm_encode_stats, kn_bigram_surprisal,
#    lsh_neardup_recall;
# 2) any query whose plan is rewritten after its round-11 driver row;
# 3) the 20 r07-stale names above;
# 4) backfill to exactly 50 with the stalest r08 names (LLM-data ops
#    first).
# Update tests/test_registry_window.py pins in the same commit.

#: The driver-verification window: collect() hoists these 50 names to
#: the front, in this order.  Every name must exist in some module.
#:
#: ROUND-11 WINDOW (executing the round-10 rotation plan verbatim):
#: 1) the 11 round-10 debuts (locally hash-green at 3 SFs in round 10,
#:    never driver-rowed); the three no-oracle sketches among them now
#:    emit tolerance-VERDICT rows (VERDICT r10 item 7) so their
#:    rows-only driver record carries the est-vs-exact contract;
#: 2) heavy_hitters_cms — rewritten after its round-10 driver row to
#:    emit verdict rows (same item 7), so it re-rows;
#: 3) the 11 r06-stale names;
#: 4) backfill with 27 of the 47-name r07-stale pool, LLM-data ops
#:    first (dedup/decontam/PQ/tokenizer/drift/graph), leaving 20 for
#:    round 12.
_WINDOW = [
    # -- round-10 debuts, never driver-rowed (11) ---------------------
    "intra_doc_dedup",
    "ddsketch_quantiles_price",
    "kcenter_coreset",
    "dedup_cascade_verdict",
    "winsorized_price_stats",
    "quantile_rank_transform",
    "hll_rollup_distinct",
    "cum_distinct_users",
    "hll_rolling_wau",
    "vocab_coverage_curve",
    "asof_next_conversion",
    # -- rewritten after its r10 row (verdict-row form) (1) -----------
    "heavy_hitters_cms",
    # -- r06-stale (the 11 left by round 10's backfill) ---------------
    "above_average_orders",
    "correlated_above_cust_avg",
    "customers_with_urgent_orders",
    "customers_without_orders",
    "distinct_counts",
    "nation_set_ops",
    "orders_per_customer",
    "priority_set_ops_all",
    "regional_revenue",
    "top_revenue_orders",
    "volume_shipping",
    # -- r07-stale backfill (27 of 47, LLM-data ops first) ------------
    "semdedup_prune",
    "cross_split_leakage",
    "bloom_decontaminate",
    "decontaminate_auto",
    "pq_codes",
    "pq_topk_adc",
    "ivfpq_topk",
    "ivfpq_residual_topk",
    "cdc_chunks",
    "bpe_merge_pairs",
    "normalize_text_nfc",
    "dedup_exact",
    "incremental_dedup",
    "image_dhash_neardups",
    "hard_negatives",
    "kmeans_clusters",
    "bigram_lm_surprisal",
    "token_entropy_by_source",
    "pmi_cooccurrence",
    "inverted_index_postings",
    "temperature_mixture_weights",
    "psi_drift_by_source",
    "ks_two_sample",
    "cusum_changepoint",
    "bfs_distances",
    "triangle_counts",
    "label_propagation_communities",
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
