"""Two-phase-commit JSONL shard sink (Python Data Source API writer)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.writers.jsonl_datasource import (
    JsonlShardsDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(JsonlShardsDataSource)


def test_batch_write_publishes_shards_and_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = spark.range(250, numPartitions=2).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    df.write.format("jsonlshards").option(
        "max_records_per_file", "100"
    ).mode("append").save(out)

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 250
    names = sorted(n for n in os.listdir(out) if n.endswith(".jsonl"))
    assert names == [m["shard"] for m in manifest["shards"]]
    assert names[0] == "shard-00000.jsonl"
    # size bound holds per shard
    assert all(m["rows"] <= 100 for m in manifest["shards"])
    # round trip
    rows = []
    for n in names:
        with open(os.path.join(out, n)) as f:
            rows += [json.loads(line) for line in f]
    assert len(rows) == 250
    assert {r["id"] * 2 == r["v"] for r in rows} == {True}
    # no staging debris
    assert not [n for n in os.listdir(out) if n.startswith("_staging")]


def test_failed_job_leaves_no_visible_output(spark, tmp_path):
    out = str(tmp_path / "fail")

    def boom(it):
        for pdf in it:
            raise RuntimeError("task failure")
            yield pdf

    df = spark.range(10, numPartitions=2).mapInPandas(boom, schema="id long")
    with pytest.raises(Exception):
        df.write.format("jsonlshards").mode("append").save(out)
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))
    assert not [
        n for n in os.listdir(out) if n.endswith(".jsonl")
    ] if os.path.isdir(out) else True


def test_stream_write_per_batch_manifests(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    spark.range(40).select(F.col("id")).write.parquet(src)

    q = (
        spark.readStream.schema("id bigint")
        .parquet(src)
        .writeStream.format("jsonlshards")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batches = [d for d in os.listdir(out) if d.startswith("batch=")]
    assert batches, os.listdir(out)
    total = 0
    for b in batches:
        m = json.load(open(os.path.join(out, b, "_MANIFEST.json")))
        total += m["total_rows"]
    assert total == 40


def test_pq_encode_is_streamable(spark, tmp_path, sf_dir):
    """pq_encode is a pure codegen projection, so the compression layer
    runs unchanged on a stream: encode a micro-batched replay of the
    embeddings table and get exactly the batch encoder's codes."""
    from sleep_edf_data_pipeline_spark.operators.quantization import (
        pq_encode,
        train_pq_codebooks,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb, dim=64, m=4, k=4, iters=1)
    batch = {
        r["vec_id"]: tuple(r[f"code_{j}"] for j in range(4))
        for r in pq_encode(emb, books).collect()
    }

    src = str(tmp_path / "emb_src")
    emb.write.parquet(src)
    stream = spark.readStream.schema(emb.schema).parquet(src)
    q = (
        pq_encode(stream, books)
        .select("vec_id", "code_0", "code_1", "code_2", "code_3")
        .writeStream.format("memory")
        .queryName("pq_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["vec_id"]: tuple(r[f"code_{j}"] for j in range(4))
        for r in spark.table("pq_stream").collect()
    }
    assert streamed == batch
