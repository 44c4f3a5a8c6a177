"""Scale pins for the round-12 debut plans: the physical-plan
properties each query's 100 TB story depends on, asserted on the
executed plan so a regression fails here before it ships."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sampled_recall_sample_is_takeordered(spark):
    """The audit's only corpus-scale stage must be a TakeOrdered cut,
    never a global sort, and the pair stages must never go cartesian."""
    from sleep_edf_data_pipeline_spark.queries.lsh_recall_sampled import (
        _sampled_docs,
        q_lsh_neardup_recall_sampled,
    )

    sample_plan = _plan(_sampled_docs(spark, SF_DIR))
    assert "TakeOrderedAndProject" in sample_plan, sample_plan
    assert "Sort " not in sample_plan.replace("TakeOrderedAndProject", "")

    plan = _plan(q_lsh_neardup_recall_sampled(spark, SF_DIR))
    spark.catalog.clearCache()
    assert "CartesianProduct" not in plan, plan


def test_jl_audit_filter_reaches_the_scan(spark):
    """The vec_id < 64 sample filter must push to the parquet scan
    (constant audit cost in the corpus), and the pair join must be a
    broadcast, never a shuffle."""
    from sleep_edf_data_pipeline_spark.queries.jl_projection import (
        q_jl_distortion_audit,
    )

    plan = _plan(q_jl_distortion_audit(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id," in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_probe_curve_probes_the_persisted_encode(spark):
    """The sweep must consume the ONE persisted assign+encode pass
    (InMemoryTableScan), not re-encode the corpus per setting."""
    from sleep_edf_data_pipeline_spark.queries.ivf_probe_curve import (
        q_ivfpq_probe_recall_curve,
    )

    df = q_ivfpq_probe_recall_curve(spark, SF_DIR)
    plan = _plan(df)
    spark.catalog.clearCache()
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tokenizer_roundtrips_read_artifact_not_corpus(spark):
    """The roundtrip apply stages must join the vocab-sized artifact
    via broadcast, never a corpus-side sort-merge."""
    from sleep_edf_data_pipeline_spark.queries.tokenizer_roundtrip import (
        q_bpe_roundtrip_stats,
    )

    plan = _plan(q_bpe_roundtrip_stats(spark, SF_DIR))
    spark.catalog.clearCache()
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_winnowing_fingerprints_single_exchange_two_windows(spark):
    """Both per-doc window passes (gram count + W-frame min) must ride
    ONE doc_id exchange — the whole 100 TB story is one corpus shuffle."""
    from sleep_edf_data_pipeline_spark.queries.winnowing import (
        q_winnowing_fingerprints,
    )

    plan = _plan(q_winnowing_fingerprints(spark, SF_DIR))
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window") == 2, plan


def test_winnowing_neardups_is_join_free(spark):
    """The pairing pass must be the join-free shape: per-hash counts as
    a window (not a count-filter-join that recomputes the winnow
    subtree), pairs exploded from MAXDF-bounded lists — so the plan has
    NO join operator and reads the documents scan exactly once."""
    from sleep_edf_data_pipeline_spark.queries.winnowing import (
        q_winnowing_neardups,
    )

    plan = _plan(q_winnowing_neardups(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_shard_packing_windows_are_stratified(spark):
    """No global-order window anywhere: the rank window partitions by
    the hash stratum, and the only unpartitioned window runs over the
    8-row shard totals, after the aggregate."""
    from sleep_edf_data_pipeline_spark.queries.shard_packing import (
        q_shard_snake_packing,
    )

    df = q_shard_snake_packing(spark, SF_DIR)
    plan = _plan(df)
    # the corpus-side rank window must key on the stratum column
    assert "row_number() windowspecdefinition(bucket#" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_winnowing_source_stats_single_pass(spark):
    """The source rollup must be the SAME single corpus pass as the
    per-doc form plus aggregation — one parquet scan, no joins."""
    from sleep_edf_data_pipeline_spark.queries.winnowing import (
        q_winnowing_source_stats,
    )

    plan = _plan(q_winnowing_source_stats(spark, SF_DIR))
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
