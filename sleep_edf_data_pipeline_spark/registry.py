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
#: ROUND-5 WINDOW (executing the round-4 rotation plan): the eleven
#: round-4 debuts that have only local verification, then 36 of the 40
#: queries whose ONLY driver row is r02 (every r02 name not re-checked
#: by the r03/r04 windows), then the three serving queries — their
#: implementations move onto a materialized clustered mart this round
#: (VERDICT r04 item 5), so they re-verify even though r04 was green.
#: The four r02-stale names left for round 6 are input stages whose
#: downstream composites hold fresher rows: document_chunks_udtf
#: (twin of document_chunks, in-window), simhash_fingerprints (feeds
#: simhash_neardups, in-window), minhash_signatures (feeds
#: minhash_lsh_neardups, r04-green), lsh_buckets (feeds
#: embedding_neardups, in-window).  The by-design rows-only sketches
#: (approx_distinct_parts, approx_quantiles_price, and the new
#: mad_outliers_approx) stay outside.
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
]

# ROUND-6 WINDOW PLAN (execute at the START of round 6, never
# mid-round — the driver grades the window as committed at round end):
# 1) round-5 debuts with only local verification: audio_features
#    (multimodal_queries, oracle-backed) and mad_outliers_approx
#    (rows-only sketch);
# 2) queries whose implementation round 5 REWROTE after their last
#    driver row, so the hard signal is for the old code:
#    dsir_importance_weights (r04 row; histogram rewrite) and
#    volume_shipping (r03 row; nation-pair pushdown);
# 3) the four r02-stale names deliberately left out of the r05 window:
#    document_chunks_udtf, simhash_fingerprints, minhash_signatures,
#    lsh_buckets;
# 4) any query whose ONLY driver row is r03 and that r05's window did
#    not re-verify (compare CORRECTNESS_r03.json names against the
#    windows below — the r01/r03 relational spine is next-stalest);
# 5) backfill with queries whose implementation round 6 touches.
# Update tests/test_registry_window.py's pin in the same commit.

#: The driver-verification window: collect() hoists these 50 names to
#: the front, in this order.  Every name must exist in some module.
_WINDOW = [
    # -- round-4 debuts, local-only until now (11) --------------------
    "ewma_user_value",
    "twap_user_value",
    "ohlc_bars",
    "rolling_median_value",
    "last_touch_attribution",
    "cohort_ltv",
    "bm25_topk",
    "quality_decile_select",
    "source_overlap_matrix",
    "key_skew_report",
    "mad_outliers",
    # -- only driver row is r02 (36 of 40; see module docstring) ------
    "ann_recall_eval",
    "bigram_counts",
    "context_packing",
    "copurchase_pairs",
    "cosine_topk_bruteforce",
    "dataset_split_stats",
    "dedup_canonical_docs",
    "deterministic_downsample",
    "doc_fingerprints",
    "document_chunks",
    "embedding_neardups",
    "event_transitions",
    "exact_moments_suite",
    "funnel_counts",
    "gopher_quality_flags",
    "language_id",
    "large_volume_customers",
    "length_histogram",
    "market_share",
    "min_cost_supplier",
    "pagerank_copurchase",
    "quality_scores",
    "regex_token_stats",
    "retention_cohorts",
    "sales_opportunity",
    "simhash_neardups",
    "small_quantity_revenue",
    "special_promo_revenue",
    "stopword_profile",
    "tfidf_top_terms",
    "token_stats",
    "top_supplier_revenue",
    "user_rfm",
    "vocab_top_tokens",
    "volume_shipping",
    "weekly_active_users",
    # -- serving trio: implementation moves to the clustered mart this
    #    round, so re-verify on top of the green r04 rows (3) ---------
    "subject_list",
    "subject_lookup",
    "subject_timeseries",
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
