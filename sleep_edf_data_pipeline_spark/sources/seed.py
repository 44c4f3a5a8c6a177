"""Deterministic synthetic subject generator (SURVEY §2.1 S12).

Mirrors the *semantics* of the reference's seed script
(``scripts/seed_dev_data.py:30-104``): each subject gets a full-day
stage sequence containing a DAYTIME NAP plus a multi-cycle night —
deliberately adversarial for episode detection ("seeding a clean
uninterrupted night would let a regression through unnoticed") — and
band powers drawn around per-stage spectral centers.

Everything is a pure function of (seed, subject_id), so tests and CI
get byte-stable corpora without PhysioNet access.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schema import BAND_POWER_COLS, EPOCH_SCHEMA

#: Per-stage band-power centers in dB(µV²): (delta, theta, alpha, sigma, beta).
#: Shape follows sleep physiology: deep sleep is delta-dominant, wake is
#: alpha/beta-dominant, N2 carries sigma (spindles).
STAGE_POWER_CENTERS = {
    "W": (10.0, 8.0, 18.0, 6.0, 14.0),
    "N1": (14.0, 15.0, 12.0, 7.0, 8.0),
    "N2": (18.0, 14.0, 9.0, 13.0, 6.0),
    "N3": (26.0, 12.0, 6.0, 8.0, 4.0),
    "REM": (13.0, 16.0, 10.0, 6.0, 9.0),
}

#: Stage-sequence grammar in epoch counts (30 s each): morning wake,
#: a nap (short enough to never out-sleep the night), afternoon wake,
#: then a 4-cycle night, then morning wake.
def _day_plan(rng: np.random.Generator) -> list[tuple[str, int]]:
    plan: list[tuple[str, int]] = []
    plan.append(("W", int(rng.integers(300, 360))))  # morning+midday wake
    # nap: N1 → N2 (→ sometimes N3) → W
    plan.append(("N1", int(rng.integers(4, 8))))
    plan.append(("N2", int(rng.integers(20, 40))))
    if rng.random() < 0.5:
        plan.append(("N3", int(rng.integers(6, 12))))
    plan.append(("W", int(rng.integers(280, 340))))  # evening wake (> gap)
    for _cycle in range(4):  # night: 4 sleep cycles
        plan.append(("N1", int(rng.integers(4, 10))))
        plan.append(("N2", int(rng.integers(30, 50))))
        plan.append(("N3", int(rng.integers(20, 40))))
        plan.append(("REM", int(rng.integers(15, 30))))
        if rng.random() < 0.6:  # brief awakening, shorter than the gap
            plan.append(("W", int(rng.integers(1, 10))))
    plan.append(("W", int(rng.integers(60, 120))))  # morning
    return plan


def seed_epochs_pandas(
    n_subjects: int = 3, seed: int = 42, power_sd: float = 2.0
) -> pd.DataFrame:
    """Generate the synthetic epoch fact table as pandas."""
    frames = []
    for subject_id in range(n_subjects):
        rng = np.random.default_rng(seed * 100_003 + subject_id)
        stages: list[str] = []
        for stage, n in _day_plan(rng):
            stages.extend([stage] * n)
        n_epochs = len(stages)
        centers = np.array([STAGE_POWER_CENTERS[s] for s in stages])
        powers = centers + rng.normal(0.0, power_sd, size=centers.shape)
        frames.append(
            pd.DataFrame(
                {
                    "subject_id": np.int32(subject_id),
                    "epoch_idx": np.arange(n_epochs, dtype=np.int32),
                    "stage": stages,
                    **{
                        c: powers[:, j] for j, c in enumerate(BAND_POWER_COLS)
                    },
                    "load_timestamp": pd.Timestamp("2024-01-01"),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def seed_epochs(
    spark: SparkSession, n_subjects: int = 3, seed: int = 42
) -> DataFrame:
    """Synthetic epochs as a schema-pinned Spark DataFrame."""
    return spark.createDataFrame(
        seed_epochs_pandas(n_subjects, seed), schema=EPOCH_SCHEMA
    )
