"""Plan pins + properties for trend_stats and storage_roundtrip.

Trend stats are moment computations — the tests pin the plan shapes
that matter at 100 TB (dims broadcast, one window walk, bounded
shuffle count) and the analytic invariants (R² and ACF ranges).
Storage roundtrips are fidelity claims — the tests assert the staged
ORC/CSV copies aggregate to EXACTLY the direct-parquet values, so any
encode/decode loss fails here before the oracle ever sees it.
"""

from __future__ import annotations

import math
import re

from sleep_edf_data_pipeline_spark.queries import storage_roundtrip as sr
from sleep_edf_data_pipeline_spark.queries import trend_stats as ts


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_shuffles(plan: str) -> int:
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan)) - len(
        re.findall(r"ReusedExchange", plan)
    )


def test_trend_ols_broadcasts_dims_and_bounds_shuffles(spark, sf_dir):
    """customer and nation must ride as broadcasts (shuffling the fact
    on nationkey at 100 TB is the classic snowflake mistake); the only
    fact-scale exchange is the lineitem⋈orders key, plus the two
    rollup exchanges whose inputs are already month-level."""
    plan = _plan(ts.q_revenue_trend_ols(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert _n_shuffles(plan) <= 4, plan


def test_trend_ols_r2_in_unit_interval(spark, sf_dir):
    rows = ts.q_revenue_trend_ols(spark, sf_dir).collect()
    assert rows, "expected at least one nation trend"
    for r in rows:
        assert 0.0 <= r["r2"] <= 1.0 + 1e-12, r
        assert math.isfinite(r["slope"]) and math.isfinite(r["intercept"]), r
        assert r["n_months"] >= 2, r


def test_acf_single_window_walk_bounded_shuffles(spark, sf_dir):
    """All three lags must come from ONE window walk (one Window node,
    one user_id exchange) — three separate walks would triple the sort
    cost; the only other exchange is the (user, lag) moment rollup."""
    plan = _plan(ts.q_acf_user_value(spark, sf_dir))
    assert plan.count("Window") == 1, plan
    assert _n_shuffles(plan) <= 2, plan


def test_acf_in_valid_range(spark, sf_dir):
    rows = ts.q_acf_user_value(spark, sf_dir).collect()
    assert rows, "expected ACF rows"
    for r in rows:
        assert -1.0 - 1e-12 <= r["acf"] <= 1.0 + 1e-12, r
        assert r["n_pairs"] >= ts.ACF_MIN_PAIRS, r
        assert r["lag"] in ts.ACF_LAGS, r


def test_acf_perfect_correlation_on_linear_series(spark):
    """A strictly linear series has lag-k ACF exactly +1 up to float
    rounding — run the synthetic series through the PRODUCTION
    q_acf_user_value (table() monkeypatched, same pattern as
    test_cusum_finds_injected_shift) so the moment algebra is checked
    end to end, not re-derived in the test."""
    import pyspark.sql.functions as F

    n = 64
    rows = [(1, i, i, float(i)) for i in range(n)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tsn long, value double"
    ).select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.col("tsn") * 1_000_000)
        .cast("timestamp_ntz")
        .alias("ts"),
        "value",
    )

    orig = ts.table
    try:
        ts.table = lambda spark_, sf_dir_, name_: df  # noqa: E731
        out = ts.q_acf_user_value(spark, "/unused").collect()
    finally:
        ts.table = orig

    assert {r["lag"] for r in out} == set(ts.ACF_LAGS)
    for r in out:
        assert r["user_id"] == 1
        assert r["n_pairs"] == n - r["lag"]
        assert abs(r["acf"] - 1.0) < 1e-9, r


def _as_key(rows):
    return {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["n_rows"],
            r["sum_qty"],
            r["revenue"],
            r["first_ship"],
            r["last_ship"],
        )
        for r in rows
    }


def test_storage_roundtrips_match_direct_parquet(spark, sf_dir):
    """The staged ORC and CSV copies must aggregate bit-identically to
    the direct parquet scan — doubles included (CSV uses shortest
    round-trip repr; timestamps are pinned to the microsecond
    pattern)."""
    from sleep_edf_data_pipeline_spark.tables import table

    direct = _as_key(
        sr._roundtrip_agg(
            table(spark, sf_dir, "lineitem").select(*sr._STAGE_COLS)
        ).collect()
    )
    orc = _as_key(sr.q_orc_roundtrip_agg(spark, sf_dir).collect())
    csv = _as_key(sr.q_csv_roundtrip_agg(spark, sf_dir).collect())
    assert orc == direct
    assert csv == direct


def test_stage_path_is_content_keyed_and_stable(sf_dir):
    """Same corpus → same staging dir (overwrite, not accrete); the
    path embeds the content fingerprint so a rewritten corpus can
    never serve a stale staged copy."""
    p1 = sr._stage_path(sf_dir, "orc")
    p2 = sr._stage_path(sf_dir, "orc")
    assert p1 == p2
    assert sr._stage_path(sf_dir, "csv") != p1
    assert sr._stage_path("/root/testdata/sf0.01", "orc") != p1


def test_staged_write_is_widened_to_session_parallelism(spark, sf_dir):
    """A single-split local source must stage as MANY files, not one:
    gzip text is unsplittable, so a one-file stage serializes the
    write AND the read-back onto one core.  ``_staged_slice`` widens
    narrow scans to the session's parallelism (and is a no-op on
    already-wide scans at real scale)."""
    import os

    sr.q_csv_roundtrip_agg(spark, sf_dir).collect()
    path = sr._stage_path(sf_dir, "csv")
    data_files = [
        f for f in os.listdir(path)
        if f.startswith("part-") and not f.startswith("._")
    ]
    assert len(data_files) > 1
    assert (
        sr._staged_slice(spark, sf_dir).rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )


def test_inverted_index_bounded_state_and_takeordered(spark, sf_dir):
    """The index build must be two exchanges max ((term,doc) tf agg +
    the term window; the final term rollup reuses the window's
    partitioning) and the vocabulary cut must compile to TakeOrdered,
    never a global sort.  The truncation-before-collect contract is
    structural: the collect_list consumes the post-filter (r<=8)
    frame, so no plan node buffers an unbounded group."""
    from sleep_edf_data_pipeline_spark.queries.retrieval import (
        POSTINGS_PER_TERM,
        q_inverted_index_postings,
    )

    df = q_inverted_index_postings(spark, sf_dir)
    plan = _plan(df)
    assert _n_shuffles(plan) <= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    for r in df.collect():
        n_postings = len(r["postings"].split(","))
        assert 1 <= n_postings <= POSTINGS_PER_TERM, r
        assert r["df"] >= n_postings, r


def test_bfs_distances_invariants(spark, sf_dir):
    """Exactly one seed at dist 0; every distance in [0, BFS_ROUNDS];
    and BFS monotonicity — every node at dist d+1 is adjacent to some
    node at dist d (spot-checked via the edge list); the iterative
    frame must execute from its persisted form (InMemoryTableScan),
    not re-derive the subtree per round."""
    from sleep_edf_data_pipeline_spark.queries.graph_stats import (
        BFS_ROUNDS,
        _copurchase_edges,
        q_bfs_distances,
    )

    df = q_bfs_distances(spark, sf_dir)
    plan = _plan(df)
    assert "InMemoryTableScan" in plan, plan

    rows = {r["node"]: r["dist"] for r in df.collect()}
    assert sorted(rows.values())[0] == 0
    assert sum(1 for d in rows.values() if d == 0) == 1
    assert all(0 <= d <= BFS_ROUNDS for d in rows.values())

    adj = {}
    for e in _copurchase_edges(spark, sf_dir).collect():
        adj.setdefault(e["dst"], set()).add(e["src"])
    for node, d in rows.items():
        if d > 0:
            assert any(rows.get(p) == d - 1 for p in adj.get(node, ())), node


def test_link_negatives_are_nonedges_from_popular_pool(spark, sf_dir):
    """Every sampled negative must be a genuine non-edge, drawn from
    the top-NEG_POOL popularity pool, with ≤NEG_PER_NODE per node and
    dense ranks starting at 1."""
    from sleep_edf_data_pipeline_spark.queries.graph_stats import (
        NEG_PER_NODE,
        NEG_POOL,
        _copurchase_edges,
        q_link_negative_sampling,
    )

    df = q_link_negative_sampling(spark, sf_dir)
    # The edge subtree has three consumers — it must execute from its
    # persisted form, not re-derive the order⋈order join per consumer.
    assert "InMemoryTableScan" in _plan(df), _plan(df)

    edges = {
        (e["src"], e["dst"]) for e in _copurchase_edges(spark, sf_dir).collect()
    }
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    pool = {
        n for n, _ in sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:NEG_POOL]
    }

    by_node = {}
    for r in df.collect():
        assert (r["node"], r["negative"]) not in edges, r
        assert r["negative"] in pool, r
        assert r["node"] != r["negative"], r
        by_node.setdefault(r["node"], []).append(r["rank"])
    for node, ranks in by_node.items():
        assert len(ranks) <= NEG_PER_NODE
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), node
