"""Streaming host-audit monitor: fold ≡ batch, replay-safe."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_host_audit_matches_batch(spark, tmp_path):
    """Replaying the crawl records through the foreachBatch monitor in
    multiple micro-batches must fold to the exact batch per-host grid,
    and the domain table from state must equal the batch query row for
    row — including the countDistinct(canonical_url) column, which the
    state grain makes algebraic.  Re-delivered batches are no-ops."""
    from sleep_edf_data_pipeline_spark.queries.url_dedup import (
        _synth_raw_url,
        q_host_dedup_profile,
    )
    from sleep_edf_data_pipeline_spark.streaming.hosts import (
        StreamingHostAuditMonitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    crawl = _synth_raw_url(
        table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    ).select("doc_id", "n_chars", "url")
    src = str(tmp_path / "crawl_stream")
    crawl.repartition(4).write.parquet(src)

    mon = StreamingHostAuditMonitor(str(tmp_path / "host_state"))
    q = (
        spark.readStream.schema(crawl.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mon.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert mon.last_batch_id is not None and mon.last_batch_id >= 1

    got = sorted(map(tuple, mon.profile(spark).collect()))
    want = sorted(map(tuple, q_host_dedup_profile(spark, SF_DIR).collect()))
    assert got == want

    # at-least-once re-delivery: same batch id again is a no-op
    v = mon.version
    mon.process_batch(crawl, mon.last_batch_id)
    assert mon.version == v
    assert sorted(map(tuple, mon.profile(spark).collect())) == got


def test_streaming_host_state_is_distinct_url_grain(spark, tmp_path):
    """State rows are exactly the distinct (host, canonical_url) pairs
    — the bounded crawl frontier, not the stream."""
    from sleep_edf_data_pipeline_spark.queries.url_dedup import (
        _synth_raw_url,
        with_canonical_host,
    )
    from sleep_edf_data_pipeline_spark.streaming.hosts import (
        StreamingHostAuditMonitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    crawl = _synth_raw_url(
        table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    ).select("doc_id", "n_chars", "url")
    mon = StreamingHostAuditMonitor(str(tmp_path / "host_state2"))
    half = crawl.filter(F.col("doc_id") % 2 == 0)
    mon.process_batch(half, 0)
    mon.process_batch(crawl.subtract(half), 1)
    n_state = mon.grid(spark).count()
    n_pairs = (
        with_canonical_host(crawl).select("host", "cu").distinct().count()
    )
    assert n_state == n_pairs
