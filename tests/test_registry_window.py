"""Pin the driver-verification window (registry order, first 50).

The external driver hash-verifies only the first 50 entries of
``registry.collect()`` per round; module edits that insert or reorder
queries would silently change WHICH queries get driver rows.  This pin
makes any window change an explicit, reviewed edit.

Round-7 window = the 28 round-6 debuts that have never had a driver
row, the 8 sleep-pipeline-spine names deferred from the round-6 window
plus the 2 rows-only sketches stale since r03, and 12 backfill entries
from the r04-stale pool (the full PQ search family — the round-6
verdict's one `weak` item — plus the highest-value dedup / clustering /
graph queries).  See the rotation rationale in registry.py.
"""

from sleep_edf_data_pipeline_spark import registry

ROUND7_WINDOW = [
    "acf_user_value", "bfs_distances", "bigram_lm_surprisal",
    "bpe_merge_pairs", "cdc_chunks", "classifier_calibration",
    "community_quality", "cross_split_leakage", "csv_roundtrip_agg",
    "cusum_changepoint", "decontaminate_auto", "hard_negatives",
    "hard_negatives_lsh", "image_dhash_neardups",
    "incremental_customer_summary", "inverted_index_postings",
    "ks_two_sample", "label_propagation_communities",
    "link_negative_sampling", "normalize_text_nfc", "orc_roundtrip_agg",
    "pmi_cooccurrence", "psi_drift_by_source", "revenue_trend_ols",
    "scd2_customer_priority", "temperature_mixture_weights",
    "token_entropy_by_source", "top_event_paths",
    "staging_cast", "moving_average", "transition_flag", "gaps_islands",
    "episode_detection", "episode_ranking", "episode_bounds",
    "sleep_metrics", "approx_distinct_parts", "approx_quantiles_price",
    "ivfpq_residual_topk", "pq_topk_adc", "pq_topk_refined",
    "ivfpq_topk", "pq_codes", "pq_recall_eval", "bloom_decontaminate",
    "incremental_dedup", "dedup_exact", "semdedup_prune",
    "kmeans_clusters", "triangle_counts",
]

#: Window entries that are by-design rows-only sketches (no DuckDB
#: oracle can express them); the driver records the weaker rows-only
#: check for these two and the judge sees which.
ROWS_ONLY_IN_WINDOW = {"approx_distinct_parts", "approx_quantiles_price"}


def test_driver_window_is_exactly_the_planned_50():
    queries, oracles = registry.collect()
    assert list(queries)[:50] == ROUND7_WINDOW
    # every window entry except the two by-design rows-only sketches
    # is oracle-backed
    no_oracle = [n for n in ROUND7_WINDOW if n not in oracles]
    assert sorted(no_oracle) == sorted(ROWS_ONLY_IN_WINDOW)


def test_window_hoist_preserves_full_registry():
    queries, oracles = registry.collect()
    # exact pin (ADVICE r5): update explicitly when queries are added,
    # matching the window-pin philosophy above.
    assert len(queries) == 189
    assert len(oracles) == 185
    assert all(name in queries for name in oracles)
