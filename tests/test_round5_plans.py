"""Plan pins for the round-5 work: the late r04 debuts that had no
pins (VERDICT r04 item 6) plus the rewritten key_skew_report.

Same contract as test_round{3,4}_plans.py: prove Catalyst produced the
shapes the 100 TB design calls for.
"""

from __future__ import annotations

import re

from sleep_edf_data_pipeline_spark import registry

QUERIES, _ = registry.collect()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def n_shuffles(plan: str) -> int:
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan)) - len(
        re.findall(r"ReusedExchange", plan)
    )


def partitionless_windows(plan: str) -> list[str]:
    """Window specs with NO partition columns — the single-partition
    sort the r04 verdict flagged.  In the spec's argument list the
    partition columns come first as bare refs; a partition-less spec
    starts directly with a sort item (`col ASC/DESC NULLS ...`)."""
    specs = re.findall(
        r"windowspecdefinition\((.*?)specifiedwindowframe", plan
    )
    return [s for s in specs if re.match(r"[^,]* (ASC|DESC) ", s)]


def test_key_skew_has_no_partitionless_window(spark, sf_dir):
    """The whole point of the rewrite: the skew diagnostic must never
    single-partition the key histogram it exists to diagnose.  Windows
    run partitioned by digit-bucket; the only SinglePartition exchanges
    feed scalar (1-row) aggregates."""
    plan = plan_of(QUERIES["key_skew_report"](spark, sf_dir))
    assert partitionless_windows(plan) == [], plan
    assert "CartesianProduct" not in plan, plan
    # one partitioned window subtree (cum is consumed once)
    assert plan.count("Window [") == 1, plan


def test_rolling_median_is_one_window_walk(spark, sf_dir):
    plan = plan_of(QUERIES["rolling_median_value"](spark, sf_dir))
    assert n_shuffles(plan) == 1, plan
    assert plan.count("Window [") == 1, plan
    assert "PushedFilters: [IsNotNull(value)]" in plan, plan


def test_cohort_ltv_does_not_force_broadcast_of_cohorts(spark, sf_dir):
    """The per-user cohort frame is unbounded at 100 TB — the join
    must not carry a planner-forced broadcast hint (AQE may still pick
    broadcast at runtime from measured size, which is the point)."""
    df = QUERIES["cohort_ltv"](spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in optimized
    plan = plan_of(df)
    assert partitionless_windows(plan) == [], plan


def test_source_overlap_joins_stay_keyed(spark, sf_dir):
    """The gram stream is shuffled exactly once (groupBy(gram) with a
    map-side-combined collect_set bounded by the source count); source
    pairs expand inside the per-gram array, so NO join of any kind
    touches the gram set — the only joins left are the broadcasts of
    the tiny per-source size frame."""
    plan = plan_of(QUERIES["source_overlap_matrix"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_mad_outliers_fact_never_shuffles(spark, sf_dir):
    """Exact and sketch twins: the fact is only ever probed by
    broadcast joins of the tiny per-type stats; every Exchange in the
    plan belongs to a per-type aggregate, and the sketch twin really
    plans percentile_approx.

    Since round 11 the REGISTERED ``mad_outliers_approx`` is the
    verdict form (runs BOTH twins + a union/hash-agg reconciliation),
    so the per-path pins apply to the production functions directly
    and the composition gets its own budget: 2 × the twin's ≤3
    aggregate exchanges + 1 reconciliation exchange, still no
    sort-merge join anywhere (the union groupBy replaced the
    full-outer join a naive reconciliation would shuffle-sort)."""
    from sleep_edf_data_pipeline_spark.queries.selection_extra import (
        q_mad_outliers,
        q_mad_outliers_approx,
    )

    for fn, marker in [
        (q_mad_outliers, "percentile("),
        (q_mad_outliers_approx, "percentile_approx("),
    ]:
        plan = plan_of(fn(spark, sf_dir))
        assert marker in plan, (marker, plan)
        assert "SortMergeJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        # stats aggregates: med + mad, each partial+final over event_type
        assert n_shuffles(plan) <= 3, plan
        spark.catalog.clearCache()
    plan = plan_of(QUERIES["mad_outliers_approx"](spark, sf_dir))
    assert "percentile(" in plan and "percentile_approx(" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert n_shuffles(plan) <= 7, plan


def test_gram_histogram_rewrites_scan_corpus_once(spark, sf_dir):
    """dsir_importance_weights and source_overlap_matrix (round-5
    rewrites): all consumers aggregate from ONE persisted histogram,
    so the final plan reads the corpus from the in-memory relation and
    never re-plans a documents parquet scan (the r04 plans re-exploded
    the corpus per consumer — 3 scans for dsir)."""
    for name in ("dsir_importance_weights", "source_overlap_matrix"):
        df = QUERIES[name](spark, sf_dir)
        plan = plan_of(df)
        # both histogram consumers read the cache (FileScan strings
        # still appear in the plan text — InMemoryRelation prints its
        # stored build plan inline — so count consumers, not scans)
        assert plan.count("InMemoryTableScan") >= 2, (name, plan)
        spark.catalog.clearCache()


def test_heavy_hitters_exact_is_takeordered(spark, sf_dir):
    """One hash-agg exchange on the key, TakeOrdered for the top-20 —
    never a global Sort of the aggregated key space."""
    plan = plan_of(QUERIES["heavy_hitters_exact"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert n_shuffles(plan) == 1, plan
