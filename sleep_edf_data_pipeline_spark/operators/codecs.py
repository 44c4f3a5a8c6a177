"""Pure-Python image codecs for the multimodal pipeline.

The container has no Pillow/ffmpeg, but PNG and BMP are decodable with
the stdlib (``zlib``, ``struct``) + numpy — enough for the multimodal
operators to exercise REAL bytes end-to-end instead of the ``fake/raw``
stub.  Scope is deliberately the common subset:

* PNG: 8-bit depth, color types 0 (grey), 2 (RGB), 4 (grey+alpha),
  6 (RGBA); all five scanline filters; non-interlaced only.
* BMP: BITMAPINFOHEADER, uncompressed, 8-bit palette-less or 24-bit
  BGR, bottom-up or top-down.

Decoders return a flat ``uint8`` array (row-major, channels
interleaved) — the contract of ``StubCodec.decode`` — so every
downstream feature/resize/hash stage is codec-agnostic.  Encoders
exist for tests (round-trip proof) and for the seed generator.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type → samples per pixel.
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a flat uint8 array."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width, height, channels, idat = 8, None, None, None, []
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if interlace:
                raise NotImplementedError("interlaced PNG")
            if color not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {color}")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        line = lines[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        f = filters[y]
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (line[x] + left) & 0xFF
        elif f == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = out[y, x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[y, x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter {f}")
    return out.astype(np.uint8).reshape(-1)


def encode_png(
    arr: np.ndarray, width: int, height: int, channels: int = 1
) -> bytes:
    """Encode a flat uint8 array as a filter-0, 8-bit PNG."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    img = np.asarray(arr, dtype=np.uint8).reshape(height, width * channels)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(height))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 8/24-bit BMP to a flat uint8 array.

    24-bit pixels are emitted RGB (BMP stores BGR); bottom-up rows are
    flipped to top-down so output order matches the PNG decoder's.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError("BMP core header")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression}")
    if bpp not in (8, 24):
        raise NotImplementedError(f"BMP bpp {bpp}")
    top_down = height < 0
    height = abs(height)
    nbytes = bpp // 8
    stride = (width * nbytes + 3) & ~3  # rows pad to 4 bytes
    rows = []
    for y in range(height):
        off = data_off + y * stride
        row = np.frombuffer(payload[off : off + width * nbytes], dtype=np.uint8)
        if bpp == 24:
            row = row.reshape(width, 3)[:, ::-1].reshape(-1)  # BGR → RGB
        rows.append(row)
    if not top_down:
        rows.reverse()
    return np.concatenate(rows) if rows else np.zeros(0, dtype=np.uint8)


def encode_bmp(arr: np.ndarray, width: int, height: int) -> bytes:
    """Encode a flat uint8 RGB array as a bottom-up 24-bit BMP."""
    img = np.asarray(arr, dtype=np.uint8).reshape(height, width, 3)
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    body = b"".join(
        img[y][:, ::-1].tobytes() + pad for y in range(height - 1, -1, -1)
    )
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body


# --------------------------------------------------------------------
# WAV (RIFF PCM) — the audio leg of the multimodal family.  stdlib
# ``wave`` handles the container; scope is uncompressed integer PCM
# (8/16-bit, any channel count), which is what featurization pipelines
# actually ingest.  Compressed formats (μ-law, ADPCM, float) raise —
# same honest-guard contract as the interlaced-PNG branch above.


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF PCM WAV → (int16 samples [frames × channels
    interleaved, flattened], sample_rate).

    8-bit PCM (unsigned per spec) is widened to int16 (−128..127 →
    ×256) so every downstream feature sees one dtype.
    """
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            width = w.getsampwidth()
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
            comp = w.getcomptype()
    except wave.Error as e:
        raise ValueError(f"not a PCM WAV: {e}") from e
    if comp != "NONE":
        raise NotImplementedError(f"compressed WAV ({comp}) not supported")
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2")
    elif width == 1:
        samples = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128
        ) * 256
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM not supported")
    return samples.astype(np.int16, copy=False), rate


def encode_wav(
    samples: np.ndarray, rate: int = 16000, channels: int = 1
) -> bytes:
    """Encode int16 samples as mono/interleaved 16-bit PCM WAV."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()
