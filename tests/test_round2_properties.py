"""Property tests for round-2 operators: invariants the oracles can't
state (the differential harness proves equality; these prove the
*semantics* are the intended ones on any data).
"""

from __future__ import annotations

import pytest

from sleep_edf_data_pipeline_spark import registry

QUERIES, _ = registry.collect()


def test_funnel_counts_monotone(spark, sf_dir):
    """Each funnel stage can only lose users: n(view) ≥ n(click after)
    ≥ n(purchase after)."""
    rows = {r["stage"]: r["n_users"] for r in QUERIES["funnel_counts"](spark, sf_dir).collect()}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]
    assert rows["1_view"] > 0


def test_pagerank_mass_conserved_and_positive(spark, sf_dir):
    """Total PageRank mass stays ≈ 1 — the fixed-point floor loses up
    to 2^-28 per edge contribution and per node update per iteration,
    so the deficit is bounded by (|E| + |V|)·iters·2^-28 (≲ 1e-3 at
    test scale, and only ever a deficit, never a surplus) — and every
    rank keeps the (1-d)/N damping floor."""
    rows = QUERIES["pagerank_copurchase"](spark, sf_dir).collect()
    n = len(rows)
    total = sum(r["pagerank"] for r in rows)
    assert 1.0 - 1e-3 < total <= 1.0 + n * 1e-9
    d, floor = 0.85, lambda nn: (1.0 - 0.85) / nn  # noqa: E731
    assert all(r["pagerank"] >= floor(n) - 1e-9 for r in rows)


def test_context_packing_bins_are_dense_and_bounded(spark, sf_dir):
    """Within each shard: bin ids start at 0, are dense, and no bin
    exceeds 2048 tokens except by the final chunk that crosses the
    boundary (greedy concat-then-cut semantics)."""
    import collections

    rows = QUERIES["context_packing"](spark, sf_dir).collect()
    per_shard_bins = collections.defaultdict(lambda: collections.defaultdict(int))
    for r in rows:
        per_shard_bins[r["source"]][r["bin_id"]] += r["n_tokens"]
    assert per_shard_bins
    for source, bins in per_shard_bins.items():
        ids = sorted(bins)
        assert ids[0] == 0, f"{source}: first bin {ids[0]}"
        assert ids == list(range(len(ids))), f"{source}: bins not dense"
        # every bin except the last holds > 2048 - max_chunk tokens and
        # at most 2048 + (chunk that crossed the boundary)
        for b in ids[:-1]:
            assert 2048 - 50 < bins[b] <= 2048 + 50, (source, b, bins[b])


def test_rfm_quartiles_cover_and_order(spark, sf_dir):
    """Quartile labels are in 1..4 and each metric's label 1 group is
    at least as good as its label 4 group."""
    rows = QUERIES["user_rfm"](spark, sf_dir).collect()
    for col in ("r_quartile", "f_quartile", "m_quartile"):
        vals = {r[col] for r in rows}
        assert vals <= {1, 2, 3, 4} and 1 in vals
    q1 = [r["frequency"] for r in rows if r["f_quartile"] == 1]
    q4 = [r["frequency"] for r in rows if r["f_quartile"] == 4]
    if q1 and q4:
        assert min(q1) >= max(q4)


def test_deterministic_downsample_is_stable(spark, sf_dir):
    """Same corpus → identical sample decisions on every run (the whole
    point vs RNG sampling)."""
    a = {r["source"]: r["n_sampled"] for r in QUERIES["deterministic_downsample"](spark, sf_dir).collect()}
    b = {r["source"]: r["n_sampled"] for r in QUERIES["deterministic_downsample"](spark, sf_dir).collect()}
    assert a == b
    assert sum(a.values()) > 0


def test_dedup_canonical_keeps_exactly_one_per_hash(spark, sf_dir):
    df = QUERIES["dedup_canonical_docs"](spark, sf_dir)
    assert df.count() == df.select("content_hash").distinct().count()


def test_ann_recall_within_bounds(spark, sf_dir):
    rows = QUERIES["ann_recall_eval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_hits"] <= r["k"]
