"""Minimal EDF (European Data Format) reader/writer in pure Python.

EDF is a public, fixed-width format: a 256-byte ASCII header, a
256-byte-per-signal extension header, then data records of contiguous
little-endian int16 samples per signal.  This module implements just
enough of the spec to round-trip polysomnography-like multichannel
recordings for the distributed ingest path (sources.edf) without
external dependencies (mne/pyedflib are not in this environment; the
reader is import-gated so a library can be swapped in).

Reference behavior mirrored: lazy whole-file parse per task (the
reference mmaps with preload=False, ``ingest/processing.py:24``); here
one file arrives as one ``binaryFile`` row and is parsed in-memory.
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np


@dataclass
class EdfSignal:
    label: str
    sfreq: float
    physical: np.ndarray  # float64 samples


def _pad(s: str, width: int) -> bytes:
    b = s.encode("ascii")[:width]
    return b + b" " * (width - len(b))


def write_edf(
    signals: list[tuple[str, float, np.ndarray]],
    record_duration_s: float = 1.0,
    phys_range: tuple[float, float] = (-500.0, 500.0),
) -> bytes:
    """Serialize (label, sfreq, samples) channels to EDF bytes.

    All channels must span the same duration; samples are quantized to
    int16 over ``phys_range``.
    """
    if not signals:
        raise ValueError("no signals")
    durations = {len(s) / f for _, f, s in signals}
    if len({round(d, 6) for d in durations}) != 1:
        raise ValueError("signals must have equal duration")
    total_s = len(signals[0][2]) / signals[0][1]
    n_records = int(round(total_s / record_duration_s))
    ns = len(signals)
    pmin, pmax = phys_range
    dmin, dmax = -32768, 32767

    buf = io.BytesIO()
    header_bytes = 256 + 256 * ns
    buf.write(_pad("0", 8))
    buf.write(_pad("synthetic patient", 80))
    buf.write(_pad("synthetic recording", 80))
    buf.write(_pad("01.01.24", 8))
    buf.write(_pad("00.00.00", 8))
    buf.write(_pad(str(header_bytes), 8))
    buf.write(_pad("", 44))
    buf.write(_pad(str(n_records), 8))
    buf.write(_pad(str(record_duration_s), 8))
    buf.write(_pad(str(ns), 4))

    spr = [int(round(f * record_duration_s)) for _, f, _ in signals]
    for label, _, _ in signals:
        buf.write(_pad(label, 16))
    for _ in signals:
        buf.write(_pad("synthetic", 80))
    for _ in signals:
        buf.write(_pad("uV", 8))
    for _ in signals:
        buf.write(_pad(str(pmin), 8))
    for _ in signals:
        buf.write(_pad(str(pmax), 8))
    for _ in signals:
        buf.write(_pad(str(dmin), 8))
    for _ in signals:
        buf.write(_pad(str(dmax), 8))
    for _ in signals:
        buf.write(_pad("", 80))
    for n in spr:
        buf.write(_pad(str(n), 8))
    for _ in signals:
        buf.write(_pad("", 32))

    scale = (dmax - dmin) / (pmax - pmin)
    digitized = [
        np.clip(np.round((s - pmin) * scale + dmin), dmin, dmax).astype("<i2")
        for _, _, s in signals
    ]
    for r in range(n_records):
        for (n, d) in zip(spr, digitized):
            buf.write(d[r * n : (r + 1) * n].tobytes())
    return buf.getvalue()


def read_edf(data: bytes) -> list[EdfSignal]:
    """Parse EDF bytes into physical-valued signals."""
    hdr = data[:256]

    def field(off: int, width: int) -> str:
        return hdr[off : off + width].decode("ascii", "replace").strip()

    n_records = int(field(236, 8))
    record_duration = float(field(244, 8))
    ns = int(field(252, 4))

    ext = data[256 : 256 + 256 * ns]

    # Offsets per spec: label 16, transducer 80, phys_dim 8, then
    # phys_min/max, dig_min/max (8 each), prefilter 80, spr 8, reserved 32.
    off = 0
    widths = [16, 80, 8, 8, 8, 8, 8, 80, 8, 32]
    starts = []
    for w in widths:
        starts.append(off)
        off += w

    def col(idx: int) -> list[str]:
        base = starts[idx] * ns
        w = widths[idx]
        return [
            ext[base + i * w : base + (i + 1) * w].decode("ascii", "replace").strip()
            for i in range(ns)
        ]

    labels = col(0)
    pmin = [float(v) for v in col(3)]
    pmax = [float(v) for v in col(4)]
    dmin = [int(float(v)) for v in col(5)]
    dmax = [int(float(v)) for v in col(6)]
    spr = [int(v) for v in col(8)]

    header_bytes = 256 + 256 * ns
    body = np.frombuffer(data, dtype="<i2", offset=header_bytes)
    rec_len = sum(spr)
    n_records = min(n_records, len(body) // rec_len) if rec_len else 0
    body = body[: n_records * rec_len].reshape(n_records, rec_len)

    out: list[EdfSignal] = []
    pos = 0
    for i in range(ns):
        raw = body[:, pos : pos + spr[i]].reshape(-1).astype(np.float64)
        pos += spr[i]
        scale = (pmax[i] - pmin[i]) / (dmax[i] - dmin[i])
        phys = (raw - dmin[i]) * scale + pmin[i]
        out.append(
            EdfSignal(
                label=labels[i],
                sfreq=spr[i] / record_duration,
                physical=phys,
            )
        )
    return out
