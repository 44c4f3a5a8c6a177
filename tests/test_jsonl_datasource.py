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


def test_second_append_extends_instead_of_clobbering(spark, tmp_path):
    """Append into a populated dir continues numbering + merges manifest."""
    out = str(tmp_path / "append")
    df1 = spark.range(0, 150, numPartitions=2).select(F.col("id"))
    df1.write.format("jsonlshards").option(
        "max_records_per_file", "100"
    ).mode("append").save(out)
    df2 = spark.range(150, 250, numPartitions=1).select(F.col("id"))
    df2.write.format("jsonlshards").option(
        "max_records_per_file", "100"
    ).mode("append").save(out)

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 250
    names = sorted(n for n in os.listdir(out) if n.endswith(".jsonl"))
    assert names == [m["shard"] for m in manifest["shards"]]
    # shard indices are contiguous across both writes
    assert [int(n[6:11]) for n in names] == list(range(len(names)))
    rows = []
    for n in names:
        with open(os.path.join(out, n)) as f:
            rows += [json.loads(line) for line in f]
    assert sorted(r["id"] for r in rows) == list(range(250))


def test_overwrite_replaces_prior_shards(spark, tmp_path):
    out = str(tmp_path / "ow")
    spark.range(120, numPartitions=2).write.format("jsonlshards").mode(
        "append"
    ).save(out)
    spark.range(30, numPartitions=1).write.format("jsonlshards").mode(
        "overwrite"
    ).save(out)
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 30
    names = [n for n in os.listdir(out) if n.endswith(".jsonl")]
    assert len(names) == len(manifest["shards"])


def test_append_into_manifestless_shards_is_refused(spark, tmp_path):
    out = tmp_path / "foreign"
    out.mkdir()
    (out / "shard-00000.jsonl").write_text('{"id": 1}\n')
    with pytest.raises(Exception, match="no _MANIFEST"):
        spark.range(5).write.format("jsonlshards").mode("append").save(
            str(out)
        )
    # the foreign shard is untouched
    assert (out / "shard-00000.jsonl").read_text() == '{"id": 1}\n'


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


def test_bloom_filter_is_streamable(spark, tmp_path, sf_dir):
    """The bloom probe is a pure projection against a static bitset, so
    streaming decontamination-admission needs zero state: probe a
    micro-batched replay of the train grams and get exactly the batch
    probe's maybe-set."""
    from sleep_edf_data_pipeline_spark.operators.bloom import (
        build_bloom,
        with_bloom_probe,
    )
    from sleep_edf_data_pipeline_spark.operators.dedup import tokens, word_shingles
    from sleep_edf_data_pipeline_spark.queries.training_data import (
        DECONTAM_N,
        EVAL_MOD,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), DECONTAM_N))
        ).alias("gram"),
    )
    ev = grams.filter(F.col("doc_id") % EVAL_MOD == 0).select("gram").distinct()
    train = grams.filter(F.col("doc_id") % EVAL_MOD != 0)
    words, nbits = build_bloom(ev, "gram")

    batch_maybe = {
        (r["doc_id"], r["gram"])
        for r in with_bloom_probe(train, words, nbits, F.col("gram"))
        .filter("_maybe")
        .collect()
    }

    src = str(tmp_path / "grams_src")
    train.write.parquet(src)
    stream = spark.readStream.schema("doc_id bigint, gram string").parquet(src)
    q = (
        with_bloom_probe(stream, words, nbits, F.col("gram"))
        .filter("_maybe")
        .select("doc_id", "gram")
        .writeStream.format("memory")
        .queryName("bloom_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["doc_id"], r["gram"]) for r in spark.table("bloom_stream").collect()
    }
    assert streamed == batch_maybe and batch_maybe


def test_bloom_never_false_negative_random_keys(spark):
    """Property: every inserted key probes positive (the losslessness
    the confirm-join architecture depends on), across randomized key
    sets including unicode and near-collisions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sleep_edf_data_pipeline_spark.operators.bloom import (
        build_bloom,
        with_bloom_probe,
    )

    @settings(max_examples=5, deadline=None)
    @given(
        st.sets(
            st.text(min_size=1, max_size=12).filter(str.strip),
            min_size=1,
            max_size=40,
        )
    )
    def check(keys):
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        words, nbits = build_bloom(df, "k")
        n_pos = (
            with_bloom_probe(df, words, nbits, F.col("k"))
            .filter("_maybe")
            .count()
        )
        assert n_pos == len(keys)

    check()


# --- reader ----------------------------------------------------------------

def test_read_roundtrip_uses_manifest_schema(spark, tmp_path):
    """write → read with NO user schema: types come from the manifest."""
    out = str(tmp_path / "rt")
    df = spark.createDataFrame(
        [
            (1, "alpha", 1.5, True, [1, 2], "2024-01-01 10:00:00"),
            (2, "beta", -0.25, False, [], "2024-06-30 23:59:59"),
            (3, None, None, None, None, None),
        ],
        "id bigint, name string, score double, ok boolean, "
        "xs array<int>, ts_s string",
    ).select(
        "id", "name", "score", "ok", "xs",
        F.col("ts_s").cast("timestamp").alias("ts"),
    )
    df.write.format("jsonlshards").option(
        "max_records_per_file", "2"
    ).mode("overwrite").save(out)

    back = spark.read.format("jsonlshards").load(out)
    assert back.schema == df.schema
    a = sorted(df.collect(), key=lambda r: r["id"])
    b = sorted(back.collect(), key=lambda r: r["id"])
    assert a == b
    # one scan partition per manifest shard
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert back.rdd.getNumPartitions() == len(manifest["shards"])


def test_read_filters_and_repeated_queries_stay_consistent(spark, tmp_path):
    """Filters evaluate JVM-side (the reader deliberately has no
    pushFilters — see its docstring), and re-querying one loaded frame
    with different/no filters never replays a previous query's
    predicates."""
    out = str(tmp_path / "filt")
    spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 10).alias("bucket"),
        F.concat(F.lit("doc-"), F.col("id")).alias("name"),
    ).write.format("jsonlshards").mode("overwrite").save(out)

    back = spark.read.format("jsonlshards").load(out)
    got = back.filter(
        (F.col("bucket") == 3) & (F.col("id") < 100)
        & F.col("name").startswith("doc-")
    ).collect()
    assert sorted(r["id"] for r in got) == list(range(3, 100, 10))
    # expression filters too
    got2 = back.filter((F.col("id") + 1) % 500 == 0).collect()
    assert sorted(r["id"] for r in got2) == [499, 999]
    # the stale-pushdown regression: a filterless query on the SAME
    # frame after filtered ones must see every row
    assert back.count() == 1000


def test_read_null_comparison_semantics(spark, tmp_path):
    """NULLs written by the sink come back as NULLs with SQL filter
    semantics intact."""
    out = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id bigint, tag string"
    ).write.format("jsonlshards").mode("overwrite").save(out)
    back = spark.read.format("jsonlshards").load(out)
    assert [r["id"] for r in back.filter(F.col("tag") == "a").collect()] == [1]
    assert sorted(
        r["id"] for r in back.filter(F.col("tag") != "a").collect()
    ) == [3]
    assert [r["id"] for r in back.filter(F.col("tag").isNull()).collect()] == [2]
    assert sorted(
        r["id"] for r in back.filter(F.col("tag").isin("a", "b")).collect()
    ) == [1, 3]


def test_read_refuses_uncommitted_directory(spark, tmp_path):
    bare = tmp_path / "bare"
    bare.mkdir()
    (bare / "shard-00000.jsonl").write_text('{"id": 1}\n')
    with pytest.raises(Exception, match="_MANIFEST"):
        spark.read.format("jsonlshards").load(str(bare)).collect()


def test_append_with_mismatched_schema_is_refused(spark, tmp_path):
    out = str(tmp_path / "mismatch")
    spark.range(5).write.format("jsonlshards").mode("append").save(out)
    with pytest.raises(Exception, match="schema"):
        spark.range(5).select(
            F.col("id").alias("other")
        ).write.format("jsonlshards").mode("append").save(out)


def test_stream_read_back_of_streamed_batches(spark, tmp_path):
    """writeStream(jsonlshards) → readStream(jsonlshards): each
    committed batch=<id>/ directory streams back out, schema from the
    batch manifest, exactly-once by offset range."""
    out = str(tmp_path / "stream_shards")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    spark.range(40).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.format("jsonlshards")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    assert q.awaitTermination(120), q.exception()

    back = spark.read  # noqa: F841  (reader registration shared fixture)
    stream = spark.readStream.format("jsonlshards").load(out)
    q2 = (
        stream.writeStream.format("memory")
        .queryName("shards_back")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120), q2.exception()
    rows = spark.sql("SELECT * FROM shards_back").collect()
    assert sorted((r["id"], r["v"]) for r in rows) == [
        (i, 3 * i) for i in range(40)
    ]

    # a SECOND availableNow pass over the same checkpoint reads nothing
    # new (offsets are durable), then a new upstream batch streams in
    ck2 = str(tmp_path / "ck2")
    sink2 = str(tmp_path / "sink2")
    q3 = (
        spark.readStream.format("jsonlshards")
        .load(out)
        .writeStream.format("parquet")
        .option("checkpointLocation", ck2)
        .outputMode("append")
        .trigger(availableNow=True)
        .start(sink2)
    )
    assert q3.awaitTermination(120), q3.exception()
    assert spark.read.parquet(sink2).count() == 40
    spark.range(40, 50).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    ).write.mode("append").parquet(src)
    q4 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.format("jsonlshards")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    assert q4.awaitTermination(120), q4.exception()
    q5 = (
        spark.readStream.format("jsonlshards")
        .load(out)
        .writeStream.format("parquet")
        .option("checkpointLocation", ck2)
        .outputMode("append")
        .trigger(availableNow=True)
        .start(sink2)
    )
    assert q5.awaitTermination(120), q5.exception()
    assert sorted(
        r["id"] for r in spark.read.parquet(sink2).collect()
    ) == list(range(50))


def test_batch_read_of_streaming_layout(spark, tmp_path):
    """spark.read over a writeStream output = union of committed
    batch=<id>/ manifests, schema from the earliest batch."""
    out = str(tmp_path / "sl")
    src = str(tmp_path / "sl_src")
    spark.range(30).select(
        F.col("id"), (F.col("id") % 5).alias("g")
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.format("jsonlshards")
        .option("checkpointLocation", str(tmp_path / "sl_ck"))
        .trigger(availableNow=True)
        .start(out)
    )
    assert q.awaitTermination(120), q.exception()
    back = spark.read.format("jsonlshards").load(out)
    assert back.schema == schema
    assert sorted(r["id"] for r in back.collect()) == list(range(30))


def test_gzip_compression_roundtrip(spark, tmp_path):
    """option('compression','gzip') → shard-XXXXX.jsonl.gz shards that
    read back identically (batch and manifest schema intact)."""
    out = str(tmp_path / "gz")
    spark.range(500).select(
        F.col("id"), F.concat(F.lit("t-"), F.col("id")).alias("s")
    ).write.format("jsonlshards").option("compression", "gzip").option(
        "max_records_per_file", "200"
    ).mode("overwrite").save(out)
    names = sorted(n for n in os.listdir(out) if n.startswith("shard-"))
    assert names and all(n.endswith(".jsonl.gz") for n in names)
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert [m["shard"] for m in manifest["shards"]] == names
    back = spark.read.format("jsonlshards").load(out)
    assert sorted((r["id"], r["s"]) for r in back.collect()) == [
        (i, f"t-{i}") for i in range(500)
    ]
    # gzip shards really are gzip bytes
    with open(os.path.join(out, names[0]), "rb") as f:
        assert f.read(2) == b"\x1f\x8b"


def test_roundtrip_property_random_values(spark, tmp_path):
    """Property: any finite scalars/arrays/temporals survive the
    write→manifest→read cycle bit-for-bit (hypothesis-generated)."""
    import datetime
    import random

    rng = random.Random(20260814)
    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                None if i % 17 == 0 else rng.randint(-2**62, 2**62),
                None if i % 13 == 0 else rng.uniform(-1e12, 1e12),
                None if i % 11 == 0 else "".join(
                    chr(rng.randint(32, 0x2FA0)) for _ in range(rng.randint(0, 12))
                ),
                None if i % 7 == 0 else [
                    None if j == 2 else rng.randint(-1000, 1000)
                    for j in range(rng.randint(0, 4))
                ],
                None if i % 5 == 0 else datetime.datetime(
                    2020 + i % 6, 1 + i % 12, 1 + i % 28,
                    i % 24, i % 60, i % 60, (i * 12345) % 1_000_000
                ),
            )
        )
    schema = (
        "i bigint, n bigint, x double, s string, "
        "xs array<int>, ts timestamp_ntz"
    )
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "prop")
    df.write.format("jsonlshards").option(
        "max_records_per_file", "37"
    ).mode("overwrite").save(out)
    back = spark.read.format("jsonlshards").load(out)
    assert back.schema == df.schema
    a = sorted(df.collect(), key=lambda r: r["i"])
    b = sorted(back.collect(), key=lambda r: r["i"])
    assert a == b


def test_decimal_and_binary_round_trip(spark, tmp_path):
    """DECIMAL survives as exact decimal text and BINARY as base64 —
    json.dumps(default=str) used to emit a bytes repr the reader could
    not invert, and decimals came back as strings."""
    out = str(tmp_path / "decbin")
    df = spark.createDataFrame(
        [(1, "12345678901234.56", bytearray(b"\x00\xffpng")),
         (2, "-0.01", bytearray(b"")),
         (3, None, None)],
        "id int, d string, b binary",
    ).select("id", F.col("d").cast("decimal(18,2)").alias("d"), "b")
    df.write.format("jsonlshards").mode("append").save(out)

    back = spark.read.format("jsonlshards").load(out)
    assert dict(back.dtypes)["d"] == "decimal(18,2)"
    assert dict(back.dtypes)["b"] == "binary"
    got = {r["id"]: (r["d"], bytes(r["b"]) if r["b"] is not None else None)
           for r in back.collect()}
    import decimal
    assert got[1] == (decimal.Decimal("12345678901234.56"), b"\x00\xffpng")
    assert got[2] == (decimal.Decimal("-0.01"), b"")
    assert got[3] == (None, None)


def test_pre_v2_binary_shards_are_refused_with_clear_error(spark, tmp_path):
    """ADVICE r5: v1 shards (no format_version in the manifest) wrote
    binary columns as Python repr text; b64-decoding them would raise
    binascii garbage or silently corrupt.  A manifest without the
    marker + a BINARY schema must fail loudly; without binary columns
    the v1 data is byte-identical to v2 and must keep reading."""
    import json as _json

    out = tmp_path / "v1shards"
    spark.createDataFrame(
        [(1, b"\x00\x01"), (2, b"\x02")], "id bigint, payload binary"
    ).write.format("jsonlshards").mode("overwrite").save(str(out))
    mpath = out / "_MANIFEST.json"
    manifest = _json.loads(mpath.read_text())
    assert manifest["format_version"] == 2
    # forge a pre-v2 manifest (drop the marker)
    del manifest["format_version"]
    mpath.write_text(_json.dumps(manifest))
    with pytest.raises(Exception, match="pre-v2"):
        spark.read.format("jsonlshards").load(str(out)).collect()
    # appending binary data into a pre-v2 directory is refused too
    with pytest.raises(Exception, match="pre-v2"):
        spark.createDataFrame(
            [(3, b"\x03")], "id bigint, payload binary"
        ).write.format("jsonlshards").mode("append").save(str(out))
    # non-binary schema: v1 and v2 are byte-identical — still readable
    out2 = tmp_path / "v1plain"
    spark.createDataFrame([(1, "a")], "id bigint, s string").write.format(
        "jsonlshards"
    ).mode("overwrite").save(str(out2))
    m2path = out2 / "_MANIFEST.json"
    m2 = _json.loads(m2path.read_text())
    del m2["format_version"]
    m2path.write_text(_json.dumps(m2))
    got = spark.read.format("jsonlshards").load(str(out2)).collect()
    assert [(r["id"], r["s"]) for r in got] == [(1, "a")]
