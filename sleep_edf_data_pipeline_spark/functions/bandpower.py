"""Spectral feature math: Welch PSD + band-power reduction (P3, P4).

Pure NumPy (no scipy in this environment): Welch via Hann-windowed
overlapping segments + rFFT.  The band-power contract follows the
reference's unit-tested spec (``/root/reference/tests/test_ingest.py:
106-167``):

- PSD is computed over EEG channels only (column pruning at source, P2);
- per band [fmin, fmax]: inclusive frequency mask, sum × freq_res ×
  1e12 (V²→µV²), clamp at 1e-10 (no -inf), mean across channels in the
  LINEAR domain, then 10·log10 → dB;
- negative dB values are legal; NaN is a contract violation upstream.

These run inside Arrow-batched pandas UDFs (sources.edf), one file per
task — the Python cost is amortized per ~100-epoch batch, never per row.
"""

from __future__ import annotations

import numpy as np

from ..schema import BANDS


def welch_psd(
    x: np.ndarray,
    sfreq: float,
    nperseg: int = 256,
    noverlap: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Welch power spectral density of the last axis.

    Parameters: ``x`` shaped (..., n_samples); returns (freqs, psd) with
    psd shaped (..., n_freqs) in units²/Hz, one-sided.
    """
    n = x.shape[-1]
    nperseg = int(min(nperseg, n))
    if noverlap is None:
        noverlap = nperseg // 2
    step = nperseg - noverlap
    if step <= 0:
        raise ValueError("noverlap must be < nperseg")

    window = np.hanning(nperseg)
    scale = 1.0 / (sfreq * (window**2).sum())
    n_segments = 1 + (n - nperseg) // step

    psd = None
    for s in range(n_segments):
        seg = x[..., s * step : s * step + nperseg]
        seg = seg - seg.mean(axis=-1, keepdims=True)
        spec = np.fft.rfft(seg * window, axis=-1)
        p = (spec.real**2 + spec.imag**2) * scale
        psd = p if psd is None else psd + p
    psd = psd / n_segments
    # One-sided: double everything except DC and (if present) Nyquist.
    if nperseg % 2 == 0:
        psd[..., 1:-1] *= 2.0
    else:
        psd[..., 1:] *= 2.0
    freqs = np.fft.rfftfreq(nperseg, d=1.0 / sfreq)
    return freqs, psd


def band_powers_db(
    psd: np.ndarray,
    freqs: np.ndarray,
    bands=BANDS,
    clamp: float = 1e-10,
) -> np.ndarray:
    """Band-power reduction to dB.

    ``psd`` shaped (n_epochs, n_channels, n_freqs) in V²/Hz over the
    EEG picks only; returns (n_epochs, len(bands)) in dB(µV²).
    """
    if psd.ndim != 3:
        raise ValueError("psd must be (n_epochs, n_channels, n_freqs)")
    freq_res = float(freqs[1] - freqs[0]) if len(freqs) > 1 else 1.0
    out = np.empty((psd.shape[0], len(bands)), dtype=np.float64)
    for j, (_, fmin, fmax) in enumerate(bands):
        mask = (freqs >= fmin) & (freqs <= fmax)
        # V²/Hz → integrate over band → × 1e12 → µV²
        linear = psd[:, :, mask].sum(axis=-1) * freq_res * 1e12
        linear = np.maximum(linear, clamp)
        # Mean across channels in the linear domain, THEN log.
        mean_linear = linear.mean(axis=1) if linear.shape[1] else np.full(
            psd.shape[0], clamp
        )
        mean_linear = np.maximum(mean_linear, clamp)
        out[:, j] = 10.0 * np.log10(mean_linear)
    return out


def epoch_band_powers(
    signals: np.ndarray,
    sfreq: float,
    epoch_len_s: float = 30.0,
    bands=BANDS,
) -> np.ndarray:
    """Segment continuous EEG (n_channels, n_samples) into epochs and
    compute per-epoch band powers (S4 + P3 + P4 fused).

    Returns (n_epochs, len(bands)) dB values; trailing partial epochs
    are dropped (fixed 30 s tumbling segmentation).
    """
    n_channels, n_samples = signals.shape
    spe = int(round(epoch_len_s * sfreq))
    n_epochs = n_samples // spe
    if n_epochs == 0:
        return np.empty((0, len(bands)))
    x = signals[:, : n_epochs * spe].reshape(n_channels, n_epochs, spe)
    x = np.transpose(x, (1, 0, 2))  # (n_epochs, n_channels, spe)
    freqs, psd = welch_psd(x, sfreq)
    keep = (freqs >= 0.5) & (freqs <= 30.0)
    return band_powers_db(psd[:, :, keep], freqs[keep], bands)
