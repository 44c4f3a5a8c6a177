"""Physical-plan regression tests: the plans that make 100 TB feasible.

Correctness tests prove the operators compute the right answer; these
prove Catalyst produces the *plan we designed for* — broadcast joins on
small dimensions, parquet filter/column pushdown, and exactly one
shuffle for the whole sleep window chain.  A regression here is a
silent 10-100× slowdown at cluster scale that sf0.001 wall-clock would
never notice.
"""

from __future__ import annotations

import re

from sleep_edf_data_pipeline_spark import registry
from sleep_edf_data_pipeline_spark.tables import table

QUERIES, _ = registry.collect()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def n_shuffles(plan: str) -> int:
    # AQE wraps exchanges; count origins, not reuses.
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan)) - len(
        re.findall(r"ReusedExchange", plan)
    )


def test_snowflake_join_broadcasts_all_dimensions(spark, sf_dir):
    """regional_revenue joins lineitem against 4 small dims: every one
    must broadcast — a shuffle join on region/nation at 100 TB would
    shuffle the fact table four times."""
    plan = plan_of(QUERIES["regional_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_point_lookup_pushes_filter_to_scan(spark, sf_dir):
    """subject_lookup's predicate must reach the parquet reader
    (PushedFilters), not run as a post-scan Filter over a full read."""
    plan = plan_of(QUERIES["subject_lookup"](spark, sf_dir))
    assert re.search(r"PushedFilters: \[[^\]]*(EqualTo|IsNotNull)", plan), plan


def test_timeseries_scan_prunes_columns(spark, sf_dir):
    """subject_timeseries projects 4 of 8+ columns; ReadSchema must
    contain only what the query needs (column pruning reached the
    scan)."""
    plan = plan_of(QUERIES["subject_timeseries"](spark, sf_dir))
    # the FileScan's bracketed output list is never display-truncated
    # (ReadSchema is, once the mart scan carries a filter column too)
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, plan
    read_cols = [c.split("#")[0] for c in m.group(1).split(",") if c]
    assert len(read_cols) <= 5, read_cols


def test_sleep_metrics_single_shuffle(spark, sf_dir):
    """The whole metrics chain (5 moving averages, lag, two
    row_numbers, running sum, partition counts) shares one
    partitioning on subject_id: exactly one exchange of the fact
    data, plus only broadcast exchanges for the tiny episode frames."""
    plan = plan_of(QUERIES["sleep_metrics"](spark, sf_dir))
    assert n_shuffles(plan) <= 1, f"expected <=1 data shuffle:\n{plan}"


def test_sliding_window_is_mapside_fanout(spark, sf_dir):
    """Sliding windows must fan out map-side (Expand/generator), never
    via a self-join; one aggregation shuffle only."""
    plan = plan_of(QUERIES["sliding_window_agg"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert n_shuffles(plan) <= 1, plan


def test_asof_join_single_shuffle_no_join_node(spark, sf_dir):
    """The as-of join is implemented as union + keyed window (one
    shuffle), not a per-row range join."""
    plan = plan_of(QUERIES["asof_last_order"](spark, sf_dir))
    assert n_shuffles(plan) <= 2, plan


def test_semi_join_stays_semi(spark, sf_dir):
    """EXISTS must compile to a (broadcast) LeftSemi, not an inner join
    + distinct — the latter shuffles the full probe side."""
    plan = plan_of(QUERIES["customers_with_urgent_orders"](spark, sf_dir))
    assert "LeftSemi" in plan, plan


def test_events_scan_reads_only_needed_columns(spark, sf_dir):
    """hourly_event_agg needs ts/event_type/value/user_id; props (the
    widest column, JSON text) must be pruned from the scan."""
    plan = plan_of(QUERIES["hourly_event_agg"](spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "props" not in m.group(1), plan


def test_quantity_band_join_is_broadcast_nested_loop(spark, sf_dir):
    """The theta/band join's build side is a handful of band rows —
    must be BroadcastNestedLoopJoin, never a cartesian shuffle."""
    plan = plan_of(QUERIES["quantity_band_agg"](spark, sf_dir))
    assert "BroadcastNestedLoop" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_table_helper_preserves_partition_count_for_big_scans(spark):
    """spread() must be a no-op when the scan already has >= default
    parallelism splits (the 100 TB case)."""
    from sleep_edf_data_pipeline_spark.tables import spread

    df = table(spark, "/root/testdata/sf0.001", "lineitem")
    pre = df.repartition(8)
    assert spread(pre, "l_orderkey").rdd.getNumPartitions() == 8


def test_volume_shipping_broadcasts_dims_one_fact_join(spark, sf_dir):
    """Q7-analogue: nation/supplier chains broadcast; the only sort-merge
    join (if any) is the lineitem⋈orders fact join, and fact-scale
    shuffles stay ≤ 3 (two join sides + final agg)."""
    plan = plan_of(QUERIES["volume_shipping"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert plan.count("SortMergeJoin") <= 1, plan
    assert n_shuffles(plan) <= 3, plan


def test_native_chunking_is_pure_codegen(spark, sf_dir):
    """document_chunks (native path) must stay shuffle-free and
    Python-free — the whole point of de-UDTF-ing it."""
    plan = plan_of(QUERIES["document_chunks"](spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "Python" not in plan and "BatchEvalPython" not in plan, plan


def test_gopher_flags_zero_shuffle_projection(spark, sf_dir):
    """Quality-rule flags are a pure projection; any exchange means a
    regression re-introduced an aggregate."""
    plan = plan_of(QUERIES["gopher_quality_flags"](spark, sf_dir))
    assert n_shuffles(plan) == 0, plan


def test_user_rfm_has_no_global_window_sort(spark, sf_dir):
    """Quartile labels come from percentile thresholds, not a global
    ntile: no Window over SinglePartition may appear (the 1-row
    threshold aggregates legitimately merge on a single partition,
    but no per-user data may sort through one)."""
    plan = plan_of(QUERIES["user_rfm"](spark, sf_dir))
    assert "Window" not in plan or "SinglePartition" not in plan.split("Window")[0], plan
    assert not re.search(r"Window \[.*ntile", plan), plan


def test_kmeans_assignment_shuffle_free(spark, sf_dir):
    """Cluster assignment folds centroids to literals: the final
    assignment plan must read the scan with no exchange and no join."""
    from sleep_edf_data_pipeline_spark.operators.clustering import assign_clusters

    emb = table(spark, sf_dir, "embeddings")
    centroids = [[0.0] * 64, [1.0] * 64]
    plan = plan_of(assign_clusters(emb, centroids))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_copurchase_pairs_no_cartesian(spark, sf_dir):
    """Basket pair generation must stay an equi-join on the order key —
    a cartesian/NLJ over lineitem would be quadratic in the fact."""
    plan = plan_of(QUERIES["copurchase_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_weekly_active_users_is_fanout_not_selfjoin(spark, sf_dir):
    """The 4-week sliding WAU fans out map-side (explode), never via a
    range self-join of activity against itself."""
    plan = plan_of(QUERIES["weekly_active_users"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert "Generate explode" in plan or "Expand" in plan, plan
