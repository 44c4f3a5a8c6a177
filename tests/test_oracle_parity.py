"""Differential test: every registered query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate at sf0.001 (fast); the driver
runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from sleep_edf_data_pipeline_spark import registry
from tests.oracle_harness import assert_parity

QUERIES, ORACLES = registry.collect()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    assert_parity(spark, QUERIES[name], ORACLES[name], sf_dir, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
