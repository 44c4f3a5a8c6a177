"""Streaming occupancy monitor: fold ≡ batch, replay-safe."""

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_occupancy_matches_batch(spark, tmp_path):
    """Replaying the (closed) session rows through the foreachBatch
    monitor in multiple micro-batches must fold to the EXACT batch
    netted-delta grid (algebraic exactness), and the hourly peaks from
    the folded state must equal the batch query row for row.
    Re-delivered batches must not double-count."""
    from sleep_edf_data_pipeline_spark.queries.event_windows import (
        q_session_window_agg_bucketed,
    )
    from sleep_edf_data_pipeline_spark.queries.occupancy import (
        net_grid,
        q_peak_concurrent_sessions,
    )
    from sleep_edf_data_pipeline_spark.streaming.occupancy import (
        StreamingOccupancyMonitor,
    )

    sess = q_session_window_agg_bucketed(spark, SF_DIR)
    src = str(tmp_path / "sess_stream")
    sess.repartition(4).write.parquet(src)
    mon = StreamingOccupancyMonitor(str(tmp_path / "occ_state"))
    q = (
        spark.readStream.schema(sess.schema)
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
    want_grid = sorted(map(tuple, net_grid(sess).collect()))
    assert got_grid == want_grid

    got = sorted(map(tuple, mon.peaks(spark).collect()))
    want = sorted(
        map(tuple, q_peak_concurrent_sessions(spark, SF_DIR).collect())
    )
    assert got == want

    # at-least-once re-delivery: same batch id again is a no-op
    v = mon.version
    mon.process_batch(sess, mon.last_batch_id)
    assert mon.version == v
    assert sorted(map(tuple, mon.grid(spark).collect())) == got_grid
