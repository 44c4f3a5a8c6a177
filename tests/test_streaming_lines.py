"""Streaming line-dedup monitor: fold ≡ batch, order-free, replay-safe."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_line_dedup_matches_batch(spark, tmp_path):
    """Replaying documents through the foreachBatch monitor in multiple
    micro-batches must fold to the exact batch (line_hash, doc_id)
    grain, and the retention profile from state must equal the batch
    query row for row.  Re-delivered batches are no-ops."""
    from sleep_edf_data_pipeline_spark.queries.line_dedup import (
        line_grain_partials,
        q_line_dedup_stats,
    )
    from sleep_edf_data_pipeline_spark.streaming.lines import (
        StreamingLineDedupMonitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = str(tmp_path / "doc_stream")
    docs.repartition(4).write.parquet(src)

    mon = StreamingLineDedupMonitor(str(tmp_path / "line_state"))
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
    want_grid = sorted(map(tuple, line_grain_partials(docs).collect()))
    assert got_grid == want_grid

    got = sorted(map(tuple, mon.retention(spark).collect()))
    want = sorted(map(tuple, q_line_dedup_stats(spark, SF_DIR).collect()))
    assert got == want

    # at-least-once re-delivery: same batch id again is a no-op
    v = mon.version
    mon.process_batch(docs, mon.last_batch_id)
    assert mon.version == v
    assert sorted(map(tuple, mon.retention(spark).collect())) == got


def test_streaming_line_dedup_is_order_free(spark, tmp_path):
    """Feeding the corpus in REVERSED doc order folds to the identical
    profile — the algebraic-grain property, no ordered-replay
    requirement."""
    from sleep_edf_data_pipeline_spark.queries.line_dedup import (
        q_line_dedup_stats,
    )
    from sleep_edf_data_pipeline_spark.streaming.lines import (
        StreamingLineDedupMonitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    hi = docs.filter(F.col("doc_id") >= 250)
    lo = docs.filter(F.col("doc_id") < 250)
    mon = StreamingLineDedupMonitor(str(tmp_path / "line_state_rev"))
    mon.process_batch(hi, 0)  # late docs arrive FIRST
    mon.process_batch(lo, 1)
    got = sorted(map(tuple, mon.retention(spark).collect()))
    want = sorted(map(tuple, q_line_dedup_stats(spark, SF_DIR).collect()))
    assert got == want
