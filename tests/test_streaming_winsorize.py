"""Streaming winsorize monitor: fold ≡ batch, order-free, no cache leak."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _cents_frame(spark):
    from sleep_edf_data_pipeline_spark.tables import table

    return table(spark, SF_DIR, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )


def test_streaming_winsorize_matches_batch(spark, tmp_path):
    """Replaying lineitem through the foreachBatch monitor in
    micro-batches folds to the batch histogram bit-for-bit, and the
    winsorized stats answered from state equal the batch query row
    for row.  Re-delivered batches are no-ops."""
    from sleep_edf_data_pipeline_spark.queries.winsorize import (
        price_histogram,
        q_winsorized_price_stats,
    )
    from sleep_edf_data_pipeline_spark.streaming.winsorize import (
        StreamingWinsorMonitor,
    )

    cents = _cents_frame(spark)
    src = str(tmp_path / "cents_stream")
    cents.repartition(4).write.parquet(src)

    mon = StreamingWinsorMonitor(str(tmp_path / "win_state"))
    q = (
        spark.readStream.schema(cents.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mon.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert mon.last_batch_id is not None and mon.last_batch_id >= 1

    got_h = sorted(map(tuple, mon.histogram(spark).collect()))
    want_h = sorted(map(tuple, price_histogram(cents).collect()))
    assert got_h == want_h

    got = sorted(map(tuple, mon.winsorized(spark).collect()))
    spark.catalog.clearCache()
    want = sorted(
        map(tuple, q_winsorized_price_stats(spark, SF_DIR).collect())
    )
    spark.catalog.clearCache()
    assert got == want

    # at-least-once re-delivery: same batch id again is a no-op
    v = mon.version
    mon.process_batch(cents, mon.last_batch_id)
    assert mon.version == v


def test_streaming_winsorize_answer_leaves_no_cache(spark, tmp_path):
    """Repeated answers on a long-lived monitor must not accumulate
    cached DataFrames (the r9 chi2 ADVICE item, pinned here for the
    new monitor)."""
    from sleep_edf_data_pipeline_spark.streaming.winsorize import (
        StreamingWinsorMonitor,
    )

    spark.catalog.clearCache()
    cents = _cents_frame(spark)
    mon = StreamingWinsorMonitor(str(tmp_path / "win_state2"))
    mon.process_batch(cents, 0)
    jcat = spark._jsparkSession.sharedState().cacheManager()
    for _ in range(3):
        mon.winsorized(spark).collect()
    assert jcat.isEmpty(), "monitor answers leaked cached frames"
