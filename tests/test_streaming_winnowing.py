"""Streaming winnowing monitor: fold ≡ batch, order-free, replay-safe."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_winnowing_matches_batch(spark, tmp_path):
    """Replaying whole documents through the foreachBatch monitor in
    multiple micro-batches must fold to the exact batch per-source
    sums, and the profile from state must equal the batch query row
    for row.  Re-delivered batches are no-ops."""
    from sleep_edf_data_pipeline_spark.queries.winnowing import (
        q_winnowing_source_stats,
        winnowing_partials,
    )
    from sleep_edf_data_pipeline_spark.streaming.winnowing import (
        StreamingWinnowingMonitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    docs = table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    src = str(tmp_path / "doc_stream")
    docs.repartition(4).write.parquet(src)

    mon = StreamingWinnowingMonitor(str(tmp_path / "win_state"))
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

    got_grid = sorted(map(tuple, mon.grid(spark).collect()))
    want_grid = sorted(map(tuple, winnowing_partials(docs).collect()))
    assert got_grid == want_grid

    got = sorted(map(tuple, mon.stats(spark).collect()))
    want = sorted(
        map(tuple, q_winnowing_source_stats(spark, SF_DIR).collect())
    )
    assert got == want

    # at-least-once re-delivery: same batch id again is a no-op
    v = mon.version
    mon.process_batch(docs, mon.last_batch_id)
    assert mon.version == v
    assert sorted(map(tuple, mon.stats(spark).collect())) == got


def test_streaming_winnowing_is_order_free(spark, tmp_path):
    """Feeding the corpus in two out-of-order halves folds to the
    identical profile — the per-source sums commute because winnowing
    is doc-local."""
    from sleep_edf_data_pipeline_spark.queries.winnowing import (
        q_winnowing_source_stats,
    )
    from sleep_edf_data_pipeline_spark.streaming.winnowing import (
        StreamingWinnowingMonitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    docs = table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    hi = docs.filter(F.col("doc_id") >= 250)
    lo = docs.filter(F.col("doc_id") < 250)
    mon = StreamingWinnowingMonitor(str(tmp_path / "win_state_rev"))
    mon.process_batch(hi, 0)  # late docs arrive FIRST
    mon.process_batch(lo, 1)
    got = sorted(map(tuple, mon.stats(spark).collect()))
    want = sorted(
        map(tuple, q_winnowing_source_stats(spark, SF_DIR).collect())
    )
    assert got == want
