"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The 100 TB training-data pattern: media rides as ``binary`` columns with
a typed metadata struct; decode / feature-extract / resize / frame-
sample run as Arrow-batched ``mapInPandas`` stages so bytes never
round-trip through Python row objects.

The codec layer is a registry: ``fake/raw`` (deterministic test
format) plus REAL pure-stdlib PNG/BMP decoders from
operators/codecs.py are built in; other formats raise
``NotImplementedError`` until registered — swapping in Pillow/ffmpeg
is one ``StubCodec.register_codec`` call.  The Spark-side plumbing
(schema, Arrow batching, partitioning, UDF signatures) is identical
for every format.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: An asset row: payload + enough metadata to route decoding.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image/audio/video
        StructField("format", StringType(), False),  # e.g. fake/raw, png
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "asset_id string, media_type string, n_bytes bigint, "
    "mean_intensity double, feature_hash bigint"
)


class StubCodec:
    """Codec registry for binary media payloads.

    ``fake/raw`` payloads are uint8 pixel bytes (row-major); ``png``
    and ``bmp`` decode for real through the pure-stdlib decoders in
    operators/codecs.py; any other format raises NotImplementedError
    until a codec is registered (``register_codec`` is the
    one-function Pillow/ffmpeg integration point).
    """

    _codecs: dict = {}

    @classmethod
    def register_codec(cls, fmt: str, fn) -> None:
        """Register ``fn(payload: bytes) -> np.ndarray`` for ``fmt``."""
        cls._codecs[fmt] = fn

    @classmethod
    def decode(cls, fmt: str, payload: bytes) -> np.ndarray:
        if fmt == "fake/raw":
            return np.frombuffer(payload, dtype=np.uint8)
        fn = cls._codecs.get(fmt)
        if fn is not None:
            return np.asarray(fn(payload), dtype=np.uint8).reshape(-1)
        raise NotImplementedError(
            f"codec for format {fmt!r} not available in this environment; "
            "register one via StubCodec.register_codec"
        )


def _register_builtin_codecs() -> None:
    from .codecs import decode_bmp, decode_png

    StubCodec.register_codec("png", decode_png)
    StubCodec.register_codec("bmp", decode_bmp)


_register_builtin_codecs()


def extract_features(assets: DataFrame) -> DataFrame:
    """Decode + featurize media payloads in Arrow batches.

    One mapInPandas stage: bytes → array → cheap features (byte size,
    mean intensity, content hash).  Partitioning: inherit the scan's
    file-split partitions; repartition upstream by size if payloads are
    skewed.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [
                StubCodec.decode(fmt, bytes(payload))
                for fmt, payload in zip(pdf["format"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "mean_intensity": [float(a.mean()) if a.size else 0.0 for a in arrs],
                    "feature_hash": [
                        int.from_bytes(
                            __import__("hashlib").md5(a.tobytes()).digest()[:7], "big"
                        )
                        for a in arrs
                    ],
                }
            )

    return assets.mapInPandas(featurize, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id string, media_type string, out_w int, "
    "mean_resized double, resized_hash bigint"
)


def resize_assets(assets: DataFrame, out_w: int = 16) -> DataFrame:
    """Nearest-neighbor resize through the codec stub (mapInPandas).

    The standard image-preprocessing stage restated for the binary
    column: decode → integer-strided sample to ``out_w`` pixels →
    features of the resized payload.  Deterministic (index ``i`` maps
    to source pixel ``floor(i·W/out_w)``), so the DuckDB oracle can
    replay it byte-for-byte on ASCII payloads.  Same Arrow-batch
    contract as extract_features: bytes never become Python row
    objects.
    """
    import hashlib

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, hashes = [], []
            for fmt, payload in zip(pdf["format"], pdf["payload"]):
                arr = StubCodec.decode(fmt, bytes(payload))
                if arr.size:
                    idx = (np.arange(out_w) * arr.size // out_w).astype(
                        np.int64
                    )
                    resized = arr[idx]
                else:
                    # empty payload: mirror extract_features' guard —
                    # mean 0.0 and the hash of zero bytes
                    resized = arr
                means.append(
                    float(resized.mean()) if resized.size else 0.0
                )
                hashes.append(
                    int.from_bytes(
                        hashlib.md5(resized.tobytes()).digest()[:7], "big"
                    )
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "out_w": np.int32(out_w),
                    "mean_resized": means,
                    "resized_hash": hashes,
                }
            )

    return assets.mapInPandas(do_resize, schema=RESIZE_SCHEMA)


def dhash_assets(assets: DataFrame, bits: int = 32) -> DataFrame:
    """Perceptual difference-hash (dHash) per asset — image-dedup keys.

    The classic image near-dup fingerprint (Krawetz's dHash): resample
    the decoded pixel stream to ``bits + 1`` samples (the same
    nearest-neighbor ``floor(i·n/(bits+1))`` rule as resize_assets;
    row-major order for 2-D assets) and emit bit ``i`` =
    ``[s_i < s_{i+1}]`` — a gradient sign signature that is invariant
    to global brightness/contrast shifts and stable under small local
    edits, so Hamming proximity ≈ perceptual similarity.  Pair with
    :func:`..dedup.simhash_near_dups` for banded (never all-pairs)
    candidate generation over the fingerprints.

    Deterministic integer/comparison math end-to-end, so the DuckDB
    oracle replays the bits exactly on ASCII payloads.  Empty payloads
    are dropped (no gradient exists).
    """

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vals = [], []
            for aid, fmt, payload in zip(
                pdf["asset_id"], pdf["format"], pdf["payload"]
            ):
                arr = StubCodec.decode(fmt, bytes(payload)).ravel()
                if not arr.size:
                    continue
                idx = (
                    np.arange(bits + 1) * arr.size // (bits + 1)
                ).astype(np.int64)
                s = arr[idx].astype(np.int64)
                v = 0
                for i in range(bits):
                    if s[i] < s[i + 1]:
                        v |= 1 << i
                ids.append(aid)
                vals.append(v)
            yield pd.DataFrame(
                {"asset_id": pd.Series(ids, dtype="object"),
                 "dhash": pd.Series(vals, dtype="int64")}
            )

    return assets.mapInPandas(hash_batch, schema="asset_id string, dhash bigint")


def sample_frames(
    assets: DataFrame, every_n: int = 10, frame_bytes: int = 1024
) -> DataFrame:
    """Frame-sampling plumbing for video payloads (stubbed codec).

    Emits one row per sampled frame index — the explode-style fan-out a
    real video pipeline needs; frame decoding itself goes through the
    codec registry.
    """
    n_frames = (F.length("payload") / F.lit(frame_bytes)).cast("int")
    idx = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
    )
    return assets.select(
        "asset_id",
        "media_type",
        F.explode(idx).alias("frame_idx"),
    )


AUDIO_FEATURE_SCHEMA = (
    "asset_id string, n_samples bigint, duration_s double, "
    "rms double, zero_crossings bigint"
)


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """Decode WAV payloads + featurize in Arrow batches (mapInPandas).

    The audio leg of ``extract_features``: RIFF PCM decode via the
    pure-stdlib codec (operators/codecs.decode_wav), then the standard
    cheap audio screens a corpus pipeline runs before expensive
    models — duration, RMS level (silence/clipping filter), and
    zero-crossing count (noisiness proxy).  All sums are exact int64
    (samples are int16 → squares fit comfortably), so the features are
    engine-reproducible: rms = sqrt(sum_sq/n) is one exact-integer
    division and one correctly-rounded sqrt.  Zero crossing = strict
    sign product < 0 between neighbors.

    Bytes stay Arrow-batched end-to-end — never row-at-a-time Python.
    """
    from .codecs import decode_wav

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [],
                "n_samples": [],
                "duration_s": [],
                "rms": [],
                "zero_crossings": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                samples, rate = decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                n = int(s.size)
                out["asset_id"].append(aid)
                out["n_samples"].append(n)
                out["duration_s"].append(n / rate)
                out["rms"].append(
                    float(np.sqrt(int((s * s).sum()) / n)) if n else 0.0
                )
                out["zero_crossings"].append(
                    int((s[:-1] * s[1:] < 0).sum()) if n > 1 else 0
                )
            yield pd.DataFrame(out)

    return assets.mapInPandas(featurize, schema=AUDIO_FEATURE_SCHEMA)


def audio_features_from_text(
    src: DataFrame,
    id_col: str = "asset_id",
    text_col: str = "text",
    rate: int = 16000,
) -> DataFrame:
    """Synthesize WAV (sample j = (ascii(char j) − 96)·257), round-trip
    it through the REAL codec (encode_wav → decode_wav), and featurize
    — all inside ONE ``mapInPandas`` stage.

    r13 optimization (guide §4): composing the standalone synth
    (mapInPandas) with :func:`extract_audio_features` (mapInPandas)
    shipped every RIFF payload across the JVM↔Python boundary twice —
    Python→JVM out of the encode stage, JVM→Python back into the
    featurize stage — purely to hand bytes from one Python function to
    the next.  Fused, the payload never leaves the worker: text comes
    in once, five scalar feature columns go out once.  The codec round
    trip itself still runs byte-for-byte (encode_wav then decode_wav on
    its output), so the features remain the decoded-samples features
    and the oracle contract is untouched.
    """
    from .codecs import decode_wav, encode_wav

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [],
                "n_samples": [],
                "duration_s": [],
                "rms": [],
                "zero_crossings": [],
            }
            for aid, t in zip(pdf[id_col], pdf[text_col]):
                synth = (
                    np.frombuffer(t.encode("ascii"), dtype=np.uint8).astype(
                        np.int16
                    )
                    - 96
                ) * 257
                samples, srate = decode_wav(encode_wav(synth, rate))
                s = samples.astype(np.int64)
                n = int(s.size)
                out["asset_id"].append(aid)
                out["n_samples"].append(n)
                out["duration_s"].append(n / srate)
                out["rms"].append(
                    float(np.sqrt(int((s * s).sum()) / n)) if n else 0.0
                )
                out["zero_crossings"].append(
                    int((s[:-1] * s[1:] < 0).sum()) if n > 1 else 0
                )
            yield pd.DataFrame(out)

    return src.select(
        F.col(id_col).cast("string").alias(id_col), text_col
    ).mapInPandas(fused, schema=AUDIO_FEATURE_SCHEMA)
