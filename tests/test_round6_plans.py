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


def _plan_of(spark, sf_dir, name):
    from sleep_edf_data_pipeline_spark.queries import lm_data_extras as lx

    return (
        lx.QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_bpe_merge_pairs_uses_takeordered_not_global_sort(spark, sf_dir):
    """The top-64 cut must be TakeOrderedAndProject (per-partition
    top-k merged on the driver), never a global single-partition sort
    of the full pair space; the only window runs over the already-
    truncated 64-row frame."""
    plan = _plan_of(spark, sf_dir, "bpe_merge_pairs")
    assert "TakeOrdered" in plan, plan
    assert "BatchEvalPython" not in plan


def test_bigram_lm_reuses_one_materialized_gram_pass(spark, sf_dir):
    """The tokenize→shingle subtree must run ONCE: every consumer
    (bigram counts, contexts, vocab, per-doc sum) reads the persisted
    per-doc gram histogram (InMemoryTableScan), not a re-explode of
    the corpus — the dsir lesson, pinned."""
    plan = _plan_of(spark, sf_dir, "bigram_lm_surprisal")
    # every consumer reads the cache (the plan TEXT inlines the cached
    # subtree per reference, so parquet-scan substrings repeat — the
    # InMemoryTableScan nodes are what executes)
    assert plan.count("InMemoryTableScan") >= 3, plan


def test_hard_negatives_is_partition_local_topk(spark, sf_dir):
    """One Arrow-batched scoring stage; the scored pair matrix never
    shuffles (no join of corpus against corpus)."""
    plan = _plan_of(spark, sf_dir, "hard_negatives")
    assert plan.count("MapInPandas") == 1, plan
    for bad in ("SortMergeJoin", "CartesianProduct", "BatchEvalPython"):
        assert bad not in plan, plan


def test_top_event_paths_single_window_pass_and_takeordered(spark, sf_dir):
    """Both lag columns must ride ONE user_id window (a single
    user_id shuffle feeds one Window node computing e1 and e2); the
    global cut must be TakeOrderedAndProject, never a full sort; the
    rank window only ever sees the 20 surviving rows."""
    from sleep_edf_data_pipeline_spark.queries import behavior_analytics as ba

    plan = (
        ba.QUERIES["top_event_paths"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("windowspecdefinition(user_id") == 2, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    for bad in ("SortMergeJoin", "CartesianProduct", "BatchEvalPython"):
        assert bad not in plan, plan


def test_pmi_runs_on_cached_pair_vocab_not_corpus(spark, sf_dir):
    """The corpus is tokenized ONCE into the persisted pair-count
    table; marginals, N, and the scored frame all read caches
    (InMemoryTableScan ×≥4 — pair table ×2 consumers + marginal table
    ×2 endpoint joins).  Marginal attach is broadcast; the only
    nested-loop join is the 1-row N attach; the global cut is
    TakeOrderedAndProject."""
    from sleep_edf_data_pipeline_spark.queries import assoc_mining as am

    plan = (
        am.QUERIES["pmi_cooccurrence"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("InMemoryTableScan") >= 4, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    for bad in ("SortMergeJoin", "CartesianProduct", "BatchEvalPython"):
        assert bad not in plan, plan


def test_cdc_and_entropy_are_join_free(spark, sf_dir):
    """cdc_chunks (window explode + islands) and
    token_entropy_by_source (two-level histogram agg) must stay
    join-free — their cost is one token pass each."""
    for name in ("cdc_chunks", "token_entropy_by_source"):
        plan = _plan_of(spark, sf_dir, name)
        for bad in (
            "SortMergeJoin",
            "BroadcastHashJoin",
            "CartesianProduct",
            "BatchEvalPython",
        ):
            assert bad not in plan, (name, plan)
