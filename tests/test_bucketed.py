"""Bucketed tables: the write-once-shuffle-never join path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.tables import table
from sleep_edf_data_pipeline_spark.writers.bucketed import drop_table, write_bucketed
from tests.test_physical_plans import n_shuffles, plan_of


@pytest.fixture
def no_broadcast(spark):
    """The 100 TB case: neither fact side fits a broadcast, so the
    planner must use the bucket layout.  At sf0.001 everything fits, so
    disable auto-broadcast for the duration of the test."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.fixture
def bucketed_tables(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
    yield
    drop_table(spark, "b_orders")
    drop_table(spark, "b_lineitem")


def test_bucketed_join_has_zero_exchanges(spark, sf_dir, bucketed_tables, no_broadcast):
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = plan_of(joined)
    assert n_shuffles(plan) == 0, plan
    assert "BroadcastHashJoin" not in plan, plan  # genuinely co-located


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    expected = lineitem.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
    got = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert got == expected and got > 0


def test_bucketed_aggregation_elides_exchange(spark, sf_dir, bucketed_tables):
    agg = spark.table("b_lineitem").groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
    )
    assert n_shuffles(plan_of(agg)) == 0, plan_of(agg)
