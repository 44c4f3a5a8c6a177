"""Round-6 plan pins: the decontamination auto-switch.

VERDICT r5 item 3: bloom_decontaminate loses to the exact broadcast
join at every locally measurable scale; its win regime (eval-gram set
too large to broadcast as strings) is unreachable on one box.  The
settlement is ``decontaminate_auto``: a measured size-based switch
that makes the weak variant unreachable by default.  These tests pin
branch selection on both sides of the threshold and that the switch
cannot change values.
"""

from __future__ import annotations

from sleep_edf_data_pipeline_spark.queries import corpus_quality as cq
from sleep_edf_data_pipeline_spark.queries import training_data as td


def test_auto_picks_exact_join_below_threshold(spark, sf_dir, monkeypatch):
    """At any locally testable scale the eval-gram count is far below
    the broadcast budget, so the auto path must delegate to the exact
    broadcast join — the measured winner."""
    calls = []
    real = td.q_decontaminate_overlap
    monkeypatch.setattr(
        td,
        "q_decontaminate_overlap",
        lambda s, d: calls.append("exact") or real(s, d),
    )
    monkeypatch.setattr(
        cq, "q_bloom_decontaminate",
        lambda s, d: calls.append("bloom"),
    )
    df = cq.q_decontaminate_auto(spark, sf_dir)
    assert calls == ["exact"]
    assert df.count() > 0


def test_auto_picks_bloom_above_threshold(spark, sf_dir, monkeypatch):
    """Force the threshold to 0: the auto path must route to the
    bloom-prefiltered variant (the 100 TB plan, where the bitset is
    fixed-size while the gram strings are not broadcastable)."""
    calls = []
    real = cq.q_bloom_decontaminate
    monkeypatch.setattr(cq, "AUTO_BLOOM_MAX_BROADCAST_GRAMS", 0)
    monkeypatch.setattr(
        cq,
        "q_bloom_decontaminate",
        lambda s, d: calls.append("bloom") or real(s, d),
    )
    df = cq.q_decontaminate_auto(spark, sf_dir)
    assert calls == ["bloom"]
    assert df.count() > 0


def test_auto_output_equals_exact_twin(spark, sf_dir):
    """The switch may change the plan, never the values: auto ≡ the
    exact join, row for row (both share the same DuckDB oracle)."""
    auto = {
        (r["doc_id"], r["n_grams"], r["n_contaminated"], r["drop_doc"])
        for r in cq.q_decontaminate_auto(spark, sf_dir).collect()
    }
    exact = {
        (r["doc_id"], r["n_grams"], r["n_contaminated"], r["drop_doc"])
        for r in td.q_decontaminate_overlap(spark, sf_dir).collect()
    }
    assert auto == exact


def test_multimodal_features_stays_arrow_batched(spark, sf_dir):
    """VERDICT r5 item 4: multimodal_features crept +0.11 s over two
    rounds.  Pin the plan so creep can never be a silently changed
    codec path: exactly ONE Arrow-batched MapInPandas stage, zero
    row-at-a-time Python evals, and no shuffle beyond the single
    deliberate spread() repartition of the scan."""
    from sleep_edf_data_pipeline_spark.queries.multimodal_queries import (
        q_multimodal_features,
    )

    plan = (
        q_multimodal_features(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1, plan
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("Exchange") <= 1, plan
