"""Round-10 pins: intra-doc line dedup plan shape + invariants."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_intra_doc_dedup_plan_has_no_joins_or_windows(spark):
    """The whole operator is two hash aggregations over one corpus
    pass: at the (doc_id, line_hash) grain the within-doc first
    occurrence always survives, so no survivor window (the cross-doc
    operator's one window) and no join of any kind exists."""
    from sleep_edf_data_pipeline_spark.queries.intra_doc_dedup import (
        q_intra_doc_dedup,
    )

    spark.catalog.clearCache()
    plan = _plan(q_intra_doc_dedup(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_intra_doc_dedup_invariants(spark):
    """Counts reconcile per doc; the corpus-wide segment total matches
    the cross-doc operator's (shared segmentation head, so any
    boundary drift between the two modules breaks this)."""
    from sleep_edf_data_pipeline_spark.queries.intra_doc_dedup import (
        q_intra_doc_dedup,
    )
    from sleep_edf_data_pipeline_spark.queries.line_dedup import (
        q_line_dedup_stats,
    )

    spark.catalog.clearCache()
    intra = q_intra_doc_dedup(spark, SF_DIR)
    rows = intra.collect()
    assert rows
    for r in rows:
        assert r["n_lines"] == r["n_kept"] + r["n_removed"]
        assert r["max_line_occ"] >= 1
        assert 0.0 <= r["dup_char_frac"] < 1.0
        # a doc with no repeats removes nothing
        if r["max_line_occ"] == 1:
            assert r["n_removed"] == 0 and r["removed_chars"] == 0
    intra_total = intra.agg(F.sum("n_lines")).collect()[0][0]
    cross_total = (
        q_line_dedup_stats(spark, SF_DIR).agg(F.sum("n_lines")).collect()[0][0]
    )
    assert intra_total == cross_total
    # intra-doc keeps at least as much as cross-doc global dedup does
    intra_kept = intra.agg(F.sum("n_kept")).collect()[0][0]
    cross_kept = (
        q_line_dedup_stats(spark, SF_DIR).agg(F.sum("n_kept")).collect()[0][0]
    )
    assert intra_kept >= cross_kept
