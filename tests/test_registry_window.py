"""Pin the driver-verification window (registry order, first 50).

The external driver hash-verifies only the first 50 entries of
``registry.collect()`` per round; module edits that insert or reorder
queries would silently change WHICH queries get driver rows.  This pin
makes any window change an explicit, reviewed edit.

Round-12 window = the round-11 rotation plan executed, plus the
VERDICT r11 item-1 correction (json_roundtrip_agg was the 5th
never-driver-rowed r11 debut but was omitted from the plan's debut
list): the 5 round-11 debuts, the 20 r07-stale names, then 25 of the
50-name r08-stale pool (LLM-data ops first).  See the rotation
rationale in registry.py.
"""

from sleep_edf_data_pipeline_spark import registry

ROUND12_WINDOW = [
    # round-11 debuts, never driver-rowed (5)
    "unigram_lm_vocab", "unigram_lm_encode_stats",
    "kn_bigram_surprisal", "lsh_neardup_recall", "json_roundtrip_agg",
    # r07-stale (20)
    "acf_user_value", "approx_distinct_parts", "approx_quantiles_price",
    "classifier_calibration", "community_quality", "csv_roundtrip_agg",
    "episode_bounds", "episode_detection", "episode_ranking",
    "gaps_islands", "incremental_customer_summary",
    "link_negative_sampling", "moving_average", "orc_roundtrip_agg",
    "revenue_trend_ols", "scd2_customer_priority", "sleep_metrics",
    "staging_cast", "top_event_paths", "transition_flag",
    # r08-stale backfill (25 of 50, LLM-data ops first)
    "minhash_lsh_neardups", "ngram_jaccard_neardups",
    "dedup_canonical_docs", "dedup_clusters",
    "fuzzy_name_dedup_symspell", "embedding_neardups",
    "duplicate_spans", "doc_fingerprints", "decontaminate_overlap",
    "gopher_quality_flags", "quality_classifier", "language_id",
    "pii_scrub", "repetition_stats", "bpe_encode_stats",
    "unigram_logprob_scores", "vocab_growth_curve", "tfidf_top_terms",
    "bm25_topk", "ann_recall_eval", "cosine_topk_bruteforce",
    "cosine_topk_ivf", "kcore_membership", "multimodal_features",
    "embedding_drift_by_label",
]

#: The two no-oracle sketches in the window are by-design rows-only
#: (an approximate sketch cannot hash-match an exact oracle) — both
#: were converted late in round 11 to EMIT their tolerance verdict as
#: rows (est vs exact twin, bound, within_bound flag), so the
#: rows-only driver record carries the contract instead of an
#: unreadable estimate.  The exact twins are oracle-green and the
#: measured deltas live in SKETCH_TOLERANCE.json /
#: tests/test_sketch_tolerance.py.
ROWS_ONLY_IN_WINDOW = {
    "approx_distinct_parts",
    "approx_quantiles_price",
}


def test_driver_window_is_exactly_the_planned_50():
    queries, oracles = registry.collect()
    assert list(queries)[:50] == ROUND12_WINDOW
    # every window entry except the by-design rows-only sketches is
    # oracle-backed
    no_oracle = [n for n in ROUND12_WINDOW if n not in oracles]
    assert sorted(no_oracle) == sorted(ROWS_ONLY_IN_WINDOW)


#: The round-12 debut modules (registered after the round-12 window
#: was pinned).  The rotation-plan guard below keeps the plan comment's
#: debut enumeration mechanically complete — the failure mode that
#: dropped json_roundtrip_agg from the r12 plan (VERDICT r11 item 1).
R12_DEBUT_MODULES = [
    "sleep_edf_data_pipeline_spark.queries.lsh_recall_sampled",
    "sleep_edf_data_pipeline_spark.queries.unigram_lm_roundtrip",
    "sleep_edf_data_pipeline_spark.queries.tokenizer_roundtrip",
    "sleep_edf_data_pipeline_spark.queries.ann_roundtrip",
    "sleep_edf_data_pipeline_spark.queries.jl_projection",
    "sleep_edf_data_pipeline_spark.queries.ivf_probe_curve",
    "sleep_edf_data_pipeline_spark.queries.winnowing",
    "sleep_edf_data_pipeline_spark.queries.shard_packing",
]


def test_rotation_plan_enumerates_every_r12_debut():
    import importlib
    import inspect

    # the debut-module list above must itself be current: everything in
    # _MODULES after the r11 block is a debut module
    tail = registry._MODULES[registry._MODULES.index(
        "sleep_edf_data_pipeline_spark.queries.lsh_recall"
    ) + 1:]
    assert tail == R12_DEBUT_MODULES

    src = inspect.getsource(registry)
    plan = src.split("ROUND-13 ROTATION PLAN", 1)[1].split("_WINDOW = [", 1)[0]
    for modname in R12_DEBUT_MODULES:
        for qname in importlib.import_module(modname).QUERIES:
            assert qname in plan, (
                f"round-13 rotation plan omits debut {qname!r} "
                f"(from {modname}) — the json_roundtrip_agg failure mode"
            )


def test_window_hoist_preserves_full_registry():
    queries, oracles = registry.collect()
    # exact pin (ADVICE r5): update explicitly when queries are added,
    # matching the window-pin philosophy above.
    assert len(queries) == 235
    assert len(oracles) == 228
    assert all(name in queries for name in oracles)
