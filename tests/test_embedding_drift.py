"""Round-7: embedding-space drift — semantics + plan pins.

The registered query is hash-verified against DuckDB by the driver
contract; these tests pin the statistical extremes the oracle can't
see (identical distribution → cosine 1, orthogonal label → cosine of
the known closed form) and the scale shape (one corpus pass via the
persisted grid, broadcast-only joins).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.queries.embedding_drift import (
    q_embedding_drift_by_label,
)

SF_DIR = "/root/testdata/sf0.001"


def _write_emb(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_identical_labels_have_cosine_one(spark, tmp_path):
    """Every label drawing the SAME vector: each centroid is parallel
    to the global centroid, so cos = 1 exactly for every label."""
    v = [0.25, -0.5, 1.0, 0.125]  # binary fractions: exact in float
    rows = [(i, v, i % 3) for i in range(30)]
    d = _write_emb(spark, tmp_path, rows)
    out = q_embedding_drift_by_label(spark, d).collect()
    assert len(out) == 3
    for r in out:
        assert r["cos_to_global"] == 1.0
        assert r["n_vecs"] == 10


def test_orthogonal_label_closed_form(spark, tmp_path):
    """Label 0 lives on e1, label 1 on e2, equal counts: the global
    centroid is (e1+e2)/2, so each label's cosine is 1/√2."""
    rows = [(i, [1.0, 0.0], 0) for i in range(10)]
    rows += [(100 + i, [0.0, 1.0], 1) for i in range(10)]
    d = _write_emb(spark, tmp_path, rows)
    out = {r["label"]: r["cos_to_global"] for r in
           q_embedding_drift_by_label(spark, d).collect()}
    for lab in (0, 1):
        assert abs(out[lab] - 2 ** -0.5) < 1e-12


def test_plan_one_corpus_pass_broadcast_only(spark):
    plan = (
        q_embedding_drift_by_label(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the labels×dims grid is persisted: what executes downstream is
    # the InMemoryTableScan, so the vector corpus is read ONCE
    assert "InMemoryTableScan" in plan
    # the per-dim global frame joins by broadcast, never a shuffle join
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_streaming_embedding_drift_matches_batch(spark, tmp_path):
    """Replaying the embeddings table through the foreachBatch monitor
    in multiple micro-batches must fold to the EXACT batch grid
    (algebraic exactness), and the drift from the folded state must
    equal the batch query row for row.  Re-delivered batches must not
    double-count."""
    from sleep_edf_data_pipeline_spark.queries.embedding_drift import (
        centroid_grid,
    )
    from sleep_edf_data_pipeline_spark.streaming.embedding_drift import (
        StreamingEmbeddingDriftMonitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    emb = table(spark, SF_DIR, "embeddings")
    src = str(tmp_path / "emb_stream")
    emb.repartition(4).write.parquet(src)
    mon = StreamingEmbeddingDriftMonitor(str(tmp_path / "emb_state"))
    q = (
        spark.readStream.schema(emb.schema)
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
    want_grid = sorted(map(tuple, centroid_grid(emb).collect()))
    assert got_grid == want_grid

    got = sorted(map(tuple, mon.drift(spark).collect()))
    want = sorted(
        map(tuple, q_embedding_drift_by_label(spark, SF_DIR).collect())
    )
    assert got == want

    # at-least-once re-delivery: same batch id again is a no-op
    v = mon.version
    mon.process_batch(emb, mon.last_batch_id)
    assert mon.version == v
    assert sorted(map(tuple, mon.grid(spark).collect())) == got_grid

    # repeated answers leave no cached frames (r10 leak-free pin)
    spark.catalog.clearCache()
    jcat = spark._jsparkSession.sharedState().cacheManager()
    for _ in range(2):
        mon.drift(spark).collect()
    assert jcat.isEmpty(), "monitor answers leaked cached frames"
