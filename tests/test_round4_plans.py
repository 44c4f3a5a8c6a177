"""Plan pins for the round-4 time-series additions.

Same contract as test_round3_plans.py: prove Catalyst produced the
single-exchange shapes the 100 TB design calls for.
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


def test_ewma_is_one_window_walk(spark, sf_dir):
    """16 lag taps must fuse into ONE Window over ONE exchange —
    a per-tap window would shuffle the fact 16 times."""
    plan = plan_of(QUERIES["ewma_user_value"](spark, sf_dir))
    assert n_shuffles(plan) == 1, plan
    assert plan.count("Window") == 1, plan


def test_attribution_has_no_self_join(spark, sf_dir):
    """One fact exchange for the window carry + the tiny channel agg;
    the naive as-of formulation would plan a Join."""
    plan = plan_of(QUERIES["last_touch_attribution"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert n_shuffles(plan) == 2, plan


def test_ohlc_two_sorts_share_one_exchange(spark, sf_dir):
    """Forward and reverse row_number share the (event_type, hour)
    hash partitioning — one exchange, two sorts — and the final
    aggregate rides the same partitioning (no further shuffle)."""
    plan = plan_of(QUERIES["ohlc_bars"](spark, sf_dir))
    assert n_shuffles(plan) == 1, plan
    assert plan.count("Window") == 2, plan
    assert "Join" not in plan, plan


def test_bm25_is_two_scans_and_takeordered(spark, sf_dir):
    """One stats aggregate broadcast back as a 1-row frame (the only
    join is the broadcast cross of that scalar frame), scoring stays
    in codegen higher-order filters, top-k is TakeOrdered — no global
    sort, no shuffle of the scored frame."""
    plan = plan_of(QUERIES["bm25_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert n_shuffles(plan) == 0, plan
