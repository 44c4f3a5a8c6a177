"""Stratified snake packing: balance, completeness, determinism
(queries/shard_packing.py)."""

from sleep_edf_data_pipeline_spark.queries.shard_packing import (
    NSHARDS,
    q_shard_snake_packing,
)


def test_all_shards_present_and_docs_conserved(spark, sf_dir):
    import duckdb

    rows = q_shard_snake_packing(spark, sf_dir).collect()
    assert sorted(r.shard_id for r in rows) == list(range(NSHARDS))
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs


def test_token_load_is_balanced(spark, sf_dir):
    """Snake within unbiased strata: per-shard token totals stay
    within a few percent of the mean at sf0.001 (5k docs / 8 shards)."""
    rows = q_shard_snake_packing(spark, sf_dir).collect()
    ratios = [r.load_ratio for r in rows]
    assert abs(sum(ratios) - NSHARDS) < 1e-9  # ratios sum to S exactly
    assert max(ratios) < 1.10 and min(ratios) > 0.90, ratios


def test_assignment_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, q_shard_snake_packing(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_shard_snake_packing(spark, sf_dir).collect()))
    assert a == b
