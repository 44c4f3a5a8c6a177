"""Streaming DDSketch monitor: fold ≡ batch, order-free, α contract."""

from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _price_frame(spark):
    from sleep_edf_data_pipeline_spark.tables import table

    return table(spark, SF_DIR, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("x"),
    )


def test_streaming_quantiles_match_batch(spark, tmp_path):
    """Replaying lineitem through the foreachBatch monitor in
    micro-batches must fold to the batch sketch bit-for-bit (DDSketch
    merge is exact integer addition per bucket), and the quantiles
    answered from state must equal the batch query's row for row.
    Re-delivered batches are no-ops."""
    from sleep_edf_data_pipeline_spark.queries.quantile_sketch import (
        ddsketch_histogram,
        q_ddsketch_quantiles_price,
    )
    from sleep_edf_data_pipeline_spark.streaming.quantiles import (
        StreamingQuantileMonitor,
    )

    prices = _price_frame(spark)
    src = str(tmp_path / "price_stream")
    prices.repartition(4).write.parquet(src)

    mon = StreamingQuantileMonitor(str(tmp_path / "dd_state"))
    q = (
        spark.readStream.schema(prices.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mon.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert mon.last_batch_id is not None and mon.last_batch_id >= 1

    got_sk = sorted(map(tuple, mon.sketch(spark).collect()))
    want_sk = sorted(map(tuple, ddsketch_histogram(prices).collect()))
    assert got_sk == want_sk

    got = sorted(map(tuple, mon.quantiles(spark).collect()))
    want = sorted(
        map(tuple, q_ddsketch_quantiles_price(spark, SF_DIR).collect())
    )
    assert got == want

    # at-least-once re-delivery: same batch id again is a no-op
    v = mon.version
    mon.process_batch(prices, mon.last_batch_id)
    assert mon.version == v


def test_streaming_quantiles_order_free(spark, tmp_path):
    """Two out-of-order halves fold to the identical sketch — bucket
    counts commute (the property GK lacks and DDSketch was chosen
    for)."""
    from sleep_edf_data_pipeline_spark.queries.quantile_sketch import (
        q_ddsketch_quantiles_price,
    )
    from sleep_edf_data_pipeline_spark.streaming.quantiles import (
        StreamingQuantileMonitor,
    )

    prices = _price_frame(spark)
    hi = prices.filter(F.col("x") >= 30000.0)
    lo = prices.filter(F.col("x") < 30000.0)
    mon = StreamingQuantileMonitor(str(tmp_path / "dd_state_rev"))
    mon.process_batch(hi, 0)  # upper tail arrives FIRST
    mon.process_batch(lo, 1)
    got = sorted(map(tuple, mon.quantiles(spark).collect()))
    want = sorted(
        map(tuple, q_ddsketch_quantiles_price(spark, SF_DIR).collect())
    )
    assert got == want


def test_ddsketch_alpha_contract_vs_exact_order_statistic(spark):
    """Every answered quantile is within ALPHA relative error of the
    exact order statistic at the same target rank floor(q·(n−1))+1 —
    the published DDSketch guarantee, measured against a true sort."""
    from sleep_edf_data_pipeline_spark.queries.quantile_sketch import (
        ALPHA,
        QS,
        q_ddsketch_quantiles_price,
    )

    prices = _price_frame(spark)
    w = Window.partitionBy("grp").orderBy("x")
    ranked = prices.select(
        "grp",
        "x",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("grp")).alias("n"),
    )
    exact = {}
    for q in QS:
        target = F.floor(F.lit(q) * (F.col("n") - 1)) + 1
        vals = (
            ranked.filter(F.col("rn") == target)
            .select("grp", "x")
            .collect()
        )
        exact[q] = {r["grp"]: r["x"] for r in vals}

    for row in q_ddsketch_quantiles_price(spark, SF_DIR).collect():
        for q in QS:
            est = row[f"p{int(q * 100)}_sketch"]
            true = exact[q][row["l_returnflag"]]
            rel = abs(est - true) / true
            assert rel <= ALPHA * 1.01, (row["l_returnflag"], q, est, true)


def test_ddsketch_state_is_domain_bounded(spark):
    """Bucket count per group is log_γ(max/min)+O(1) — independent of
    row count (the bounded-state claim)."""
    import math

    from sleep_edf_data_pipeline_spark.queries.quantile_sketch import (
        GAMMA,
        ddsketch_histogram,
    )

    prices = _price_frame(spark)
    sk = ddsketch_histogram(prices)
    per_grp = sk.groupBy("grp").agg(F.count("*").alias("nb")).collect()
    bounds = prices.agg(F.min("x"), F.max("x")).collect()[0]
    cap = math.log(bounds[1] / bounds[0]) / math.log(GAMMA) + 2
    for r in per_grp:
        assert r["nb"] <= cap, (r, cap)
