"""Oracle-checked multimodal queries (binary payloads + typed metadata).

The test corpus has no media table, so assets are derived
deterministically from ``documents``: the text bytes become a
``fake/raw`` payload (the StubCodec's format — uint8 "pixels").  The
point under test is the Spark-side plumbing of
:mod:`..operators.multimodal`: binary columns through Arrow-batched
``mapInPandas`` feature extraction, and the explode fan-out for frame
sampling.  Because the corpus text is ASCII, the DuckDB oracle can
restate the decoded-byte math exactly (``ascii()`` per char == uint8
pixel value), so even the Pandas-UDF path is value-checked, not just
row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_features, sample_frames
from ..tables import spread, table

_FRAME_BYTES = 64
_EVERY_N = 10


def assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → ASSET_SCHEMA-shaped frame (payload = UTF-8 text bytes)."""
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    return docs.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.lit("fake/raw").alias("format"),
        F.col("text").cast("binary").alias("payload"),
        F.col("n_chars").cast("int").alias("width"),
        F.lit(1).alias("height"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + featurize payloads in Arrow batches (mapInPandas)."""
    feats = extract_features(assets_from_documents(spark, sf_dir))
    return feats.withColumn("mean_intensity", F.round("mean_intensity", 6))


# ASCII text ⇒ pixel j == ascii(char j); md5(payload) == md5(text).
ORACLE_MULTIMODAL_FEATURES = """
SELECT
    CAST(doc_id AS VARCHAR) AS asset_id,
    'image' AS media_type,
    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
    round(
        list_avg([ascii(text[j]) for j in range(1, length(text) + 1)]),
        6
    ) AS mean_intensity,
    CAST('0x' || substr(md5(text), 1, 14) AS BIGINT) AS feature_hash
FROM documents
"""


def q_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-index fan-out: every 10th 64-byte frame per asset."""
    return sample_frames(
        assets_from_documents(spark, sf_dir),
        every_n=_EVERY_N,
        frame_bytes=_FRAME_BYTES,
    )


ORACLE_FRAME_SAMPLING = f"""
SELECT
    CAST(doc_id AS VARCHAR) AS asset_id,
    'image' AS media_type,
    CAST(unnest(generate_series(
        0,
        greatest(CAST(octet_length(encode(text)) / {_FRAME_BYTES} AS INT) - 1, 0),
        {_EVERY_N}
    )) AS INT) AS frame_idx
FROM documents
"""


QUERIES = {
    "multimodal_features": q_multimodal_features,
    "frame_sampling": q_frame_sampling,
}

ORACLES = {
    "multimodal_features": ORACLE_MULTIMODAL_FEATURES,
    "frame_sampling": ORACLE_FRAME_SAMPLING,
}


_OUT_W = 16


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor resize to 16 'pixels' per asset (mapInPandas).

    Index i samples source pixel floor(i·W/16); ASCII payloads let the
    oracle replay the exact resized bytes (ascii(char) == pixel), so
    the Pandas-UDF resize path is value-checked end-to-end including
    the md5 of the resized payload.
    """
    from ..operators.multimodal import resize_assets

    out = resize_assets(assets_from_documents(spark, sf_dir), out_w=_OUT_W)
    return out.withColumn("mean_resized", F.round("mean_resized", 6))


# floor(i*W/16) is 0-based; DuckDB string index is 1-based.
ORACLE_MULTIMODAL_RESIZE = f"""
WITH sampled AS (
    SELECT doc_id,
           [text[CAST(i * length(text) // {_OUT_W} AS INT) + 1]
            for i in range(0, {_OUT_W})] AS px
    FROM documents
)
SELECT
    CAST(doc_id AS VARCHAR) AS asset_id,
    'image' AS media_type,
    {_OUT_W} AS out_w,
    round(list_avg([ascii(c) for c in px]), 6) AS mean_resized,
    CAST('0x' || substr(md5(array_to_string(px, '')), 1, 14) AS BIGINT)
        AS resized_hash
FROM sampled
"""


QUERIES["multimodal_resize"] = q_multimodal_resize
ORACLES["multimodal_resize"] = ORACLE_MULTIMODAL_RESIZE


_AUDIO_RATE = 16000


def audio_assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → WAV assets: sample j = (ascii(char j) − 96)·257.

    Deterministic synthesis through the REAL codec (encode_wav →
    RIFF PCM bytes), same philosophy as the image path: the corpus has
    no media table, so the payloads are derived from text in a way the
    DuckDB oracle can replay sample-exactly (ascii() per char).  The
    affine map keeps int16 range (space → −16448, 'z' → +6682) and
    makes word boundaries sign changes, so zero-crossing counts are
    non-trivial.
    """
    import numpy as np
    import pandas as pd

    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    src = docs.select(F.col("doc_id").cast("string").alias("asset_id"), "text")

    def encode(batches):
        from ..operators.codecs import encode_wav

        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                s = (
                    np.frombuffer(t.encode("ascii"), dtype=np.uint8).astype(
                        np.int16
                    )
                    - 96
                ) * 257
                payloads.append(encode_wav(s, _AUDIO_RATE))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": "audio",
                    "format": "audio/wav",
                    "payload": payloads,
                }
            )

    return src.mapInPandas(
        encode,
        schema="asset_id string, media_type string, format string, payload binary",
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio screens over real WAV bytes: encode→decode→featurize, all
    Arrow-batched.  Every feature is exact-integer-derived (int64 sums,
    one division, one correctly-rounded sqrt), so the oracle replays
    the decoded samples from the text and the hash gate checks the
    whole codec round trip end-to-end.

    r13 optimization (guide §4): ONE fused mapInPandas stage — the
    composed synth→featurize pair shipped every RIFF payload across
    the JVM↔Python boundary twice (see
    operators/multimodal.audio_features_from_text); the codec round
    trip still runs byte-identically inside the worker, so the output
    (and the oracle) are unchanged.  The standalone asset synth
    (``audio_assets_from_documents``) and payload featurizer
    (``extract_audio_features``) remain for compositions that need the
    intermediate WAV frame.
    """
    from ..operators.multimodal import audio_features_from_text

    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    src = docs.select(
        F.col("doc_id").cast("string").alias("asset_id"), "text"
    )
    return audio_features_from_text(src, rate=_AUDIO_RATE)


# sample j == (ascii(text[j]) - 96) * 257; the ×257 factor cancels in
# the zero-crossing sign product.
ORACLE_AUDIO_FEATURES = f"""
WITH s AS (
    SELECT doc_id, text, length(text) AS n FROM documents
)
SELECT
    CAST(doc_id AS VARCHAR) AS asset_id,
    CAST(n AS BIGINT) AS n_samples,
    CAST(n AS DOUBLE) / {_AUDIO_RATE}.0 AS duration_s,
    CASE WHEN n = 0 THEN 0.0 ELSE sqrt(
        CAST(list_sum([
            CAST((ascii(text[j]) - 96) * 257 AS BIGINT)
            * CAST((ascii(text[j]) - 96) * 257 AS BIGINT)
            for j in range(1, n + 1)
        ]) AS DOUBLE) / CAST(n AS DOUBLE))
    END AS rms,
    CASE WHEN n <= 1 THEN CAST(0 AS BIGINT) ELSE CAST(len(list_filter(
        range(1, n),
        j -> (ascii(text[j]) - 96) * (ascii(text[j + 1]) - 96) < 0
    )) AS BIGINT) END AS zero_crossings
FROM s
"""


QUERIES["audio_features"] = q_audio_features
ORACLES["audio_features"] = ORACLE_AUDIO_FEATURES


# --- image dHash near-duplicates -------------------------------------------

_DH_BITS = 32
_DH_CHUNKS = 4
_DH_WIDTH = _DH_BITS // _DH_CHUNKS
_DH_MASK = (1 << _DH_WIDTH) - 1
_DH_MAXHAM = 3


def q_image_dhash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-level near-dup pairs by perceptual dHash + banded Hamming.

    The multimodal face of the dedup surface: perceptual fingerprints
    (operators/multimodal.py: dhash_assets — decode through the codec
    registry, gradient-sign bits over nearest-neighbor samples), then
    the SAME pigeonhole chunk-banding as the text SimHash path
    (operators/dedup.py: simhash_near_dups) — candidates come from
    chunk-equality buckets, never an all-pairs scan, so the 100 TB
    story is identical to the proven SimHash decade evidence.
    """
    from ..operators.dedup import simhash_near_dups
    from ..operators.multimodal import dhash_assets

    fps = dhash_assets(
        assets_from_documents(spark, sf_dir), bits=_DH_BITS
    ).select(
        F.col("asset_id").cast("bigint").alias("doc_id"),
        F.col("dhash").alias("simhash"),
    )
    return simhash_near_dups(
        fps,
        "doc_id",
        bits=_DH_BITS,
        chunks=_DH_CHUNKS,
        max_hamming=_DH_MAXHAM,
    )


_DH_BITSUM = " + ".join(
    f"CASE WHEN s[{i + 1}] < s[{i + 2}] THEN {1 << i} ELSE 0 END"
    for i in range(_DH_BITS)
)

ORACLE_IMAGE_DHASH_NEARDUPS = f"""
WITH sampled AS (
    SELECT doc_id,
           [ascii(text[(i * length(text)) // {_DH_BITS + 1} + 1])
            for i in range(0, {_DH_BITS + 1})] AS s
    FROM documents
    WHERE length(text) > 0
),
fp AS (
    SELECT doc_id, CAST({_DH_BITSUM} AS BIGINT) AS dh FROM sampled
),
long AS (
    SELECT doc_id, dh, c AS chunk_idx,
           (dh >> (c * {_DH_WIDTH})) & {_DH_MASK} AS chunk_val
    FROM fp
    CROSS JOIN unnest(range(0, {_DH_CHUNKS})) AS tt(c)
),
pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.dh AS dh_a, b.dh AS dh_b
    FROM long AS a
    JOIN long AS b USING (chunk_idx, chunk_val)
    WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(dh_a, dh_b)) AS INT) AS hamming
FROM pairs
WHERE bit_count(xor(dh_a, dh_b)) <= {_DH_MAXHAM}
"""


QUERIES["image_dhash_neardups"] = q_image_dhash_neardups
ORACLES["image_dhash_neardups"] = ORACLE_IMAGE_DHASH_NEARDUPS
