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
