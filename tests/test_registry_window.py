"""Pin the driver-verification window (registry order, first 50).

The external driver hash-verifies only the first 50 entries of
``registry.collect()`` per round; module edits that insert or reorder
queries would silently change WHICH queries get driver rows.  This pin
makes any window change an explicit, reviewed edit.

Round-8 window = the round-7 rotation plan executed verbatim: the 6
round-7 debuts that have never had a driver row, the full 34-name
r04-stale pool (green in CORRECTNESS_r04, in no window since), and 10
LLM-data-ops names from the r05-stale pool.  See the rotation
rationale in registry.py.
"""

from sleep_edf_data_pipeline_spark import registry

ROUND8_WINDOW = [
    # round-7 debuts (6)
    "bpe_encode_stats", "embedding_drift_by_label",
    "session_window_agg_bucketed", "peak_concurrent_sessions",
    "fuzzy_name_dedup_symspell", "vocab_growth_curve",
    # r04-stale backfill (34)
    "cluster_size_histogram", "corpus_shuffle_order", "cosine_topk_ivf",
    "customer_distribution", "data_quality_checks",
    "decontaminate_overlap", "dedup_clusters", "diagnostics",
    "domain_mixture_weights", "dominant_small_part_suppliers",
    "duplicate_spans", "forecast_revenue", "frame_sampling",
    "importance_resample", "important_stock", "json_props_stats",
    "kcore_membership", "length_bucket_packing", "minhash_lsh_neardups",
    "multimodal_features", "multimodal_resize", "ngram_jaccard_neardups",
    "part_supplier_diversity", "pii_scrub", "priority_order_counts",
    "promo_revenue_share", "quality_classifier", "ranking_suite",
    "repetition_stats", "returned_item_customers",
    "shipping_priority_buckets", "stratified_sample",
    "unigram_logprob_scores", "waiting_suppliers",
    # r05-stale backfill (10): LLM-data ops
    "ann_recall_eval", "bm25_topk", "cosine_topk_bruteforce",
    "dedup_canonical_docs", "doc_fingerprints", "document_chunks",
    "embedding_neardups", "gopher_quality_flags", "language_id",
    "tfidf_top_terms",
]

#: Every round-8 window entry is oracle-backed (the two by-design
#: rows-only sketches approx_distinct_parts / approx_quantiles_price
#: got their driver rows in the round-7 window and rotate out).
ROWS_ONLY_IN_WINDOW = set()


def test_driver_window_is_exactly_the_planned_50():
    queries, oracles = registry.collect()
    assert list(queries)[:50] == ROUND8_WINDOW
    # every window entry except the by-design rows-only sketches is
    # oracle-backed
    no_oracle = [n for n in ROUND8_WINDOW if n not in oracles]
    assert sorted(no_oracle) == sorted(ROWS_ONLY_IN_WINDOW)


def test_window_hoist_preserves_full_registry():
    queries, oracles = registry.collect()
    # exact pin (ADVICE r5): update explicitly when queries are added,
    # matching the window-pin philosophy above.
    assert len(queries) == 193
    assert len(oracles) == 189
    assert all(name in queries for name in oracles)
