"""Band-power math unit tests with analytically derived goldens.

Mirrors the reference's test strategy (SURVEY §5.1): flat-PSD closed
form, linear-domain channel averaging, band masking, clamping.
"""

from __future__ import annotations

import numpy as np
import pytest

from sleep_edf_data_pipeline_spark.functions.bandpower import (
    band_powers_db,
    epoch_band_powers,
    welch_psd,
)
from sleep_edf_data_pipeline_spark.schema import BANDS


def test_flat_psd_closed_form():
    """Flat PSD of value p: band power = n_bins * p * freq_res * 1e12."""
    freqs = np.arange(0.5, 30.5, 0.5)
    freq_res = 0.5
    p = 2e-12
    psd = np.full((1, 1, len(freqs)), p)
    out = band_powers_db(psd, freqs, BANDS)
    for j, (_, fmin, fmax) in enumerate(BANDS):
        n_bins = int(((freqs >= fmin) & (freqs <= fmax)).sum())
        expected = 10 * np.log10(n_bins * p * freq_res * 1e12)
        assert out[0, j] == pytest.approx(expected, rel=1e-12)


def test_linear_domain_channel_averaging():
    """Channels average in linear power, not dB."""
    freqs = np.arange(0.5, 30.5, 0.5)
    psd = np.zeros((1, 2, len(freqs)))
    psd[0, 0, :] = 1e-12
    psd[0, 1, :] = 3e-12
    out = band_powers_db(psd, freqs, BANDS)
    mask = (freqs >= 0.5) & (freqs <= 4.0)
    lin1 = mask.sum() * 1e-12 * 0.5 * 1e12
    lin2 = mask.sum() * 3e-12 * 0.5 * 1e12
    expected = 10 * np.log10((lin1 + lin2) / 2)
    # dB-domain averaging would give a DIFFERENT (wrong) value.
    wrong = (10 * np.log10(lin1) + 10 * np.log10(lin2)) / 2
    assert out[0, 0] == pytest.approx(expected, rel=1e-12)
    assert abs(out[0, 0] - wrong) > 0.1


def test_band_masking_is_inclusive_and_disjoint_energy():
    """Energy in [8,12] shows in alpha, not beta."""
    freqs = np.arange(0.5, 30.5, 0.5)
    psd = np.zeros((1, 1, len(freqs)))
    psd[0, 0, (freqs >= 8) & (freqs <= 12)] = 5e-12
    out = band_powers_db(psd, freqs, BANDS)
    alpha = out[0, 2]
    beta = out[0, 4]
    assert alpha > 0
    assert beta == pytest.approx(10 * np.log10(1e-10))  # clamped floor


def test_clamp_prevents_neg_infinity():
    freqs = np.arange(0.5, 30.5, 0.5)
    psd = np.zeros((1, 1, len(freqs)))
    out = band_powers_db(psd, freqs, BANDS)
    assert np.isfinite(out).all()
    assert out == pytest.approx(np.full_like(out, 10 * np.log10(1e-10)))


def test_welch_parseval_white_noise():
    """PSD integral ≈ signal variance (Parseval) for white noise."""
    rng = np.random.default_rng(7)
    fs = 100.0
    x = rng.normal(0, 1.0, size=int(fs * 60))
    freqs, psd = welch_psd(x, fs)
    total_power = psd.sum() * (freqs[1] - freqs[0])
    assert total_power == pytest.approx(x.var(), rel=0.15)


def test_welch_detects_sine_peak():
    fs = 100.0
    t = np.arange(0, 30, 1 / fs)
    x = np.sin(2 * np.pi * 10.0 * t)
    freqs, psd = welch_psd(x, fs)
    assert abs(freqs[np.argmax(psd)] - 10.0) < 0.5


def test_epoch_band_powers_segments_and_drops_partial():
    fs = 100.0
    n_epochs = 3
    extra = 50  # half an epoch, must be dropped
    rng = np.random.default_rng(1)
    sig = rng.normal(0, 1e-6, size=(2, int(n_epochs * 30 * fs) + extra))
    out = epoch_band_powers(sig, fs)
    assert out.shape == (n_epochs, len(BANDS))
    assert np.isfinite(out).all()
