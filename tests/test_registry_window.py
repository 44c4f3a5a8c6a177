"""Pin the driver-verification window (registry order, first 50).

The external driver hash-verifies only the first 50 entries of
``registry.collect()`` per round; module edits that insert or reorder
queries would silently change WHICH queries get driver rows.  This pin
makes any window change an explicit, reviewed edit.

Round-13 window = the round-13 rotation plan executed: the 11
round-12 debuts, the 7 queries whose plans were rewritten by round-13
optimizations after their last driver row (re-verification rule), the
25 r08-stale names, then 7 r09-stale names (LLM-data ops first).  See
the rotation rationale in registry.py.
"""

from sleep_edf_data_pipeline_spark import registry

ROUND13_WINDOW = [
    # round-12 debuts, never driver-rowed (11)
    "lsh_neardup_recall_sampled", "unigram_lm_roundtrip_stats",
    "bpe_roundtrip_stats", "wordpiece_roundtrip_stats",
    "ivfpq_roundtrip_topk", "jl_distortion_audit",
    "ivfpq_probe_recall_curve", "winnowing_fingerprints",
    "winnowing_neardups", "winnowing_source_stats",
    "shard_snake_packing",
    # plans rewritten by round-13 optimizations (7)
    "kcore_membership", "bfs_distances", "audio_features",
    "dedup_cascade_verdict", "psi_drift_by_source",
    "label_propagation_communities", "community_quality",
    # r08-stale (25)
    "cluster_size_histogram", "corpus_shuffle_order",
    "customer_distribution", "data_quality_checks", "diagnostics",
    "document_chunks", "domain_mixture_weights",
    "dominant_small_part_suppliers", "forecast_revenue",
    "frame_sampling", "importance_resample", "important_stock",
    "json_props_stats", "length_bucket_packing", "multimodal_resize",
    "part_supplier_diversity", "peak_concurrent_sessions",
    "priority_order_counts", "promo_revenue_share", "ranking_suite",
    "returned_item_customers", "session_window_agg_bucketed",
    "shipping_priority_buckets", "stratified_sample",
    "waiting_suppliers",
    # r09-stale backfill (7, LLM-data ops first)
    "simhash_neardups", "url_canonical_dedup", "cdc_dedup_spans",
    "host_dedup_profile", "lsh_buckets", "pq_recall_eval",
    "pq_topk_refined",
]

#: Every round-13 window entry is oracle-backed (the round-11
#: rows-only tolerance sketches rotated out with the r07-stale pool).
ROWS_ONLY_IN_WINDOW = set()


def test_driver_window_is_exactly_the_planned_50():
    queries, oracles = registry.collect()
    assert list(queries)[:50] == ROUND13_WINDOW
    # every window entry except the by-design rows-only sketches is
    # oracle-backed
    no_oracle = [n for n in ROUND13_WINDOW if n not in oracles]
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
