"""Streaming readability monitor: fold ≡ batch, order-free, replay-safe."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_readability_matches_batch(spark, tmp_path):
    """Replaying documents through the foreachBatch monitor in multiple
    micro-batches must fold to the exact batch per-source sums, and the
    score profile from state must equal the batch query row for row.
    Re-delivered batches are no-ops."""
    from sleep_edf_data_pipeline_spark.queries.readability import (
        q_readability_scores,
        readability_partials,
    )
    from sleep_edf_data_pipeline_spark.streaming.readability import (
        StreamingReadabilityMonitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    docs = table(spark, SF_DIR, "documents").select("source", "text")
    src = str(tmp_path / "doc_stream")
    docs.repartition(4).write.parquet(src)

    mon = StreamingReadabilityMonitor(str(tmp_path / "read_state"))
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
    want_grid = sorted(map(tuple, readability_partials(docs).collect()))
    assert got_grid == want_grid

    got = sorted(map(tuple, mon.scores(spark).collect()))
    want = sorted(map(tuple, q_readability_scores(spark, SF_DIR).collect()))
    assert got == want

    # at-least-once re-delivery: same batch id again is a no-op
    v = mon.version
    mon.process_batch(docs, mon.last_batch_id)
    assert mon.version == v
    assert sorted(map(tuple, mon.scores(spark).collect())) == got


def test_streaming_readability_is_order_free(spark, tmp_path):
    """Feeding the corpus in two out-of-order halves folds to the
    identical profile — sums commute."""
    from sleep_edf_data_pipeline_spark.queries.readability import (
        q_readability_scores,
    )
    from sleep_edf_data_pipeline_spark.streaming.readability import (
        StreamingReadabilityMonitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    docs = table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    hi = docs.filter(F.col("doc_id") >= 250).drop("doc_id")
    lo = docs.filter(F.col("doc_id") < 250).drop("doc_id")
    mon = StreamingReadabilityMonitor(str(tmp_path / "read_state_rev"))
    mon.process_batch(hi, 0)  # late docs arrive FIRST
    mon.process_batch(lo, 1)
    got = sorted(map(tuple, mon.scores(spark).collect()))
    want = sorted(map(tuple, q_readability_scores(spark, SF_DIR).collect()))
    assert got == want
