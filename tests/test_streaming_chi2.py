"""Streaming chi2 drift monitor: fold ≡ batch, order-free, replay-safe."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_chi2_matches_batch(spark, tmp_path):
    """Replaying documents through the foreachBatch monitor in
    micro-batches must fold to the batch value-grain histogram, and
    the chi2 from state must equal the batch query row for row
    (bucket thresholds derived from state min/max == corpus min/max).
    Re-delivered batches are no-ops."""
    from sleep_edf_data_pipeline_spark.queries.chi2_drift import (
        chi2_histogram,
        q_chi2_drift_by_source,
    )
    from sleep_edf_data_pipeline_spark.streaming.chi2 import (
        StreamingChi2Monitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    docs = table(spark, SF_DIR, "documents").select("source", "n_chars")
    src = str(tmp_path / "doc_stream")
    docs.repartition(4).write.parquet(src)

    mon = StreamingChi2Monitor(str(tmp_path / "chi2_state"))
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mon.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert mon.last_batch_id is not None and mon.last_batch_id >= 1

    want_hist = chi2_histogram(
        docs.select("source", F.col("n_chars").cast("bigint").alias("x"))
    )
    got_grid = sorted(map(tuple, mon.grid(spark).collect()))
    want_grid = sorted(map(tuple, want_hist.collect()))
    assert got_grid == want_grid

    got = sorted(map(tuple, mon.chi2(spark).collect()))
    spark.catalog.clearCache()
    want = sorted(map(tuple, q_chi2_drift_by_source(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    assert got == want

    # at-least-once re-delivery: same batch id again is a no-op
    v = mon.version
    mon.process_batch(docs, mon.last_batch_id)
    assert mon.version == v


def test_streaming_chi2_is_order_free(spark, tmp_path):
    """Two out-of-order halves fold to the identical statistic —
    histogram counts commute and thresholds derive from final state."""
    from sleep_edf_data_pipeline_spark.queries.chi2_drift import (
        q_chi2_drift_by_source,
    )
    from sleep_edf_data_pipeline_spark.streaming.chi2 import (
        StreamingChi2Monitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    docs = table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    )
    hi = docs.filter(F.col("doc_id") >= 250).drop("doc_id")
    lo = docs.filter(F.col("doc_id") < 250).drop("doc_id")
    mon = StreamingChi2Monitor(str(tmp_path / "chi2_state_rev"))
    mon.process_batch(hi, 0)  # late docs arrive FIRST
    mon.process_batch(lo, 1)
    got = sorted(map(tuple, mon.chi2(spark).collect()))
    spark.catalog.clearCache()
    want = sorted(map(tuple, q_chi2_drift_by_source(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    assert got == want
