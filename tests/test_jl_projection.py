"""JL sign-projection distortion audit: deterministic, exact-integer,
and concentrated the way the lemma says it must be (d=64 → d'=16 gives
ratio std ≈ sqrt(2/16) ≈ 0.35; the pins below are observed-floor
regressions, loose enough to survive corpus regeneration of the same
distribution)."""

from sleep_edf_data_pipeline_spark.queries.jl_projection import (
    JL_D,
    JL_DP,
    JL_SAMPLE,
    SIGNS,
    q_jl_distortion_audit,
)


def test_sign_matrix_is_deterministic_and_balanced():
    assert len(SIGNS) == JL_D and all(len(r) == JL_DP for r in SIGNS)
    assert all(s in (1, -1) for row in SIGNS for s in row)
    # md5 parity is fair: each projection column mixes both signs well
    for j in range(JL_DP):
        pos = sum(1 for i in range(JL_D) if SIGNS[i][j] == 1)
        assert 16 <= pos <= 48, (j, pos)


def test_distortion_concentrates_around_one(spark, sf_dir):
    rows = q_jl_distortion_audit(spark, sf_dir).collect()
    n = sum(r["n_pairs"] for r in rows)
    assert n == JL_SAMPLE * (JL_SAMPLE - 1) // 2  # every pair scored
    # mass within ratio [0.5, 1.5): measured 0.855 at sf0.001
    within = sum(r["n_pairs"] for r in rows if 10 <= r["ratio_band"] <= 29)
    assert within / n >= 0.75
    # unbiasedness: E[ratio] = 1 (measured 0.979)
    mean = sum(r["avg_ratio"] * r["n_pairs"] for r in rows) / n
    assert 0.9 <= mean <= 1.1
    # per-band sanity: min <= avg <= max, all bands coherent
    for r in rows:
        assert r["min_ratio_micro"] <= r["avg_ratio"] * 1e6 + 1
        assert r["avg_ratio"] * 1e6 <= r["max_ratio_micro"] + 1
        assert r["min_ratio_micro"] // 50_000 == r["ratio_band"]
