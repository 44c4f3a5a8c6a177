"""Unit/plan tests for queries.training_data (round-3 corpus ops).

Oracle parity at sf0.001 is covered by test_oracle_parity via the
registry; these pin plan shapes (the 100 TB story) and semantic
invariants that a hash match alone would not explain.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.queries.training_data import (
    EVAL_MOD,
    STRATUM_CAP,
    q_decontaminate_overlap,
    q_domain_mixture_weights,
    q_json_props_stats,
    q_pii_scrub,
    q_repetition_stats,
    q_stratified_sample,
)
from sleep_edf_data_pipeline_spark.tables import table


def test_decontaminate_excludes_eval_and_broadcasts(spark, sf_dir):
    df = q_decontaminate_overlap(spark, sf_dir)
    rows = df.collect()
    assert rows, "train side must be non-empty"
    assert all(r["doc_id"] % EVAL_MOD != 0 for r in rows)
    assert all(0 <= r["n_contaminated"] <= r["n_grams"] for r in rows)
    # synthetic corpus has a tiny vocab: contamination must actually
    # fire, otherwise the filter is vacuous
    assert any(r["drop_doc"] for r in rows)
    # eval n-gram set joins as a broadcast — the corpus never shuffles
    # for the join (one exchange remains for the final groupBy)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_stratified_sample_caps_each_source(spark, sf_dir):
    rows = q_stratified_sample(spark, sf_dir).collect()
    per_source = Counter(r["source"] for r in rows)
    n_sources = (
        table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    assert len(per_source) == n_sources
    assert all(c <= STRATUM_CAP for c in per_source.values())
    # deterministic: second build yields the identical id set
    again = {r["doc_id"] for r in q_stratified_sample(spark, sf_dir).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_mixture_weights_are_consistent(spark, sf_dir):
    rows = q_domain_mixture_weights(spark, sf_dir).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    n = len(rows)
    for r in rows:
        # weight × share = 1/n_sources by construction (round-off only)
        assert abs(r["uniform_weight"] * r["token_share"] - 1.0 / n) < 1e-4


def test_pii_scrub_masks_every_digit(spark, sf_dir):
    rows = q_pii_scrub(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert not any(ch.isdigit() for ch in r["masked_name"])
        assert r["n_masked_chars"] == r["masked_name"].count("*")
        assert r["had_pii"] == (r["n_masked_chars"] > 0)


def test_json_props_covers_all_events(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    total = ev.count()
    rows = q_json_props_stats(spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == total
    for r in rows:
        assert r["k_min"] <= r["k_avg"] <= r["k_max"]


def test_repetition_stats_bounds(spark, sf_dir):
    rows = q_repetition_stats(spark, sf_dir).collect()
    assert len(rows) == table(spark, sf_dir, "documents").count()
    for r in rows:
        assert 0.0 <= r["dup_token_frac"] < 1.0
        assert r["top_bigram_count"] >= (1 if r["n_tokens"] >= 2 else 0)
