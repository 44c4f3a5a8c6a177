"""Pure-Python PNG/BMP codecs + their integration with the multimodal
operators (real bytes through the same mapInPandas plumbing as
fake/raw)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.operators.codecs import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
)
from sleep_edf_data_pipeline_spark.operators.multimodal import (
    ASSET_SCHEMA,
    StubCodec,
    extract_features,
    resize_assets,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    w, h = 13, 7  # odd sizes: catch stride bugs
    pix = RNG.integers(0, 256, size=w * h * channels, dtype=np.uint8)
    png = encode_png(pix, w, h, channels)
    out = decode_png(png)
    assert np.array_equal(out, pix)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_all_scanline_filters(filt):
    """Hand-build a PNG whose every scanline uses one filter type and
    check against an independently computed expectation."""
    w, h, ch = 6, 5, 3
    pix = RNG.integers(0, 256, size=(h, w * ch), dtype=np.uint8).astype(int)
    bpp = ch
    raw = bytearray()
    for y in range(h):
        raw.append(filt)
        prev = pix[y - 1] if y else np.zeros(w * ch, dtype=int)
        for x in range(w * ch):
            cur = pix[y][x]
            left = pix[y][x - bpp] if x >= bpp else 0
            ul = prev[x - bpp] if x >= bpp else 0
            if filt == 0:
                enc = cur
            elif filt == 1:
                enc = cur - left
            elif filt == 2:
                enc = cur - prev[x]
            elif filt == 3:
                enc = cur - ((left + prev[x]) >> 1)
            else:  # Paeth
                p = left + prev[x] - ul
                pa, pb, pc = abs(p - left), abs(p - prev[x]), abs(p - ul)
                pred = (
                    left
                    if (pa <= pb and pa <= pc)
                    else (prev[x] if pb <= pc else ul)
                )
                enc = cur - pred
            raw.append(enc & 0xFF)

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return (
            struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), pix.reshape(-1).astype(np.uint8))


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # 16-bit depth
    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return (
            struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)
        )

    png16 = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    )
    with pytest.raises(NotImplementedError):
        decode_png(png16)


def test_bmp_roundtrip_24bit():
    w, h = 11, 4
    pix = RNG.integers(0, 256, size=w * h * 3, dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(pix, w, h)), pix)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp(b"XX123456")


def test_codec_registry_dispatch():
    w, h = 4, 3
    pix = RNG.integers(0, 256, size=w * h, dtype=np.uint8)
    out = StubCodec.decode("png", encode_png(pix, w, h, 1))
    assert np.array_equal(out, pix)
    with pytest.raises(NotImplementedError):
        StubCodec.decode("jpeg", b"\xff\xd8\xff")


def test_multimodal_operators_on_real_png_and_bmp(spark):
    """extract_features + resize_assets run real PNG/BMP bytes through
    the identical Arrow plumbing, and the features equal the fake/raw
    features of the same pixels (codec-agnostic contract)."""
    w, h = 16, 8
    pix1 = RNG.integers(0, 256, size=w * h, dtype=np.uint8)
    pix2 = RNG.integers(0, 256, size=w * h * 3, dtype=np.uint8)
    rows = [
        ("png1", "image", "png", bytearray(encode_png(pix1, w, h, 1)), w, h),
        ("bmp1", "image", "bmp", bytearray(encode_bmp(pix2, w, h)), w, h),
        ("raw1", "image", "fake/raw", bytearray(pix1.tobytes()), w, h),
    ]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    feats = {
        r["asset_id"]: r for r in extract_features(assets).collect()
    }
    # png asset decodes to pix1 == raw asset's bytes → identical
    # intensity/hash despite different container bytes
    assert feats["png1"]["mean_intensity"] == feats["raw1"]["mean_intensity"]
    assert feats["png1"]["feature_hash"] == feats["raw1"]["feature_hash"]
    assert feats["bmp1"]["mean_intensity"] == pytest.approx(
        float(pix2.mean())
    )
    resized = {
        r["asset_id"]: r
        for r in resize_assets(assets, out_w=8).collect()
    }
    assert resized["png1"]["resized_hash"] == resized["raw1"]["resized_hash"]
    assert set(resized) == {"png1", "bmp1", "raw1"}


# ---------------------------------------------------------------- WAV


def test_wav_16bit_round_trip():
    import numpy as np

    from sleep_edf_data_pipeline_spark.operators.codecs import (
        decode_wav,
        encode_wav,
    )

    s = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000
    assert (out == s).all()


def test_wav_stereo_interleaved():
    import numpy as np

    from sleep_edf_data_pipeline_spark.operators.codecs import (
        decode_wav,
        encode_wav,
    )

    s = np.array([10, -10, 20, -20], dtype=np.int16)  # L R L R
    out, rate = decode_wav(encode_wav(s, rate=44100, channels=2))
    assert rate == 44100
    assert (out == s).all()


def test_wav_8bit_widens_to_int16():
    import io
    import wave

    import numpy as np

    from sleep_edf_data_pipeline_spark.operators.codecs import decode_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(16000)
        w.writeframes(bytes([0, 128, 255]))  # unsigned 8-bit per spec
    out, rate = decode_wav(buf.getvalue())
    assert rate == 16000
    assert out.tolist() == [-128 * 256, 0, 127 * 256]
    assert out.dtype == np.int16


def test_wav_rejects_garbage_and_unsupported():
    import pytest

    from sleep_edf_data_pipeline_spark.operators.codecs import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"RIFFnope")
