"""IVF-PQ nprobe sweep under BOTH shortlist policies: the production
fixed-50 cut measurably LOSES recall as nprobe widens (lossy-ADC
displacement before the exact re-rank), while the shortlist-∝-nprobe
policy is monotone — the operational takeaway the table exists to
surface.  See queries/ivf_probe_curve.py.  Everything is deterministic
(hash-stable pipeline), so the pins are exact."""

from sleep_edf_data_pipeline_spark.queries.ivf_probe_curve import (
    NPROBE_SWEEP,
    q_ivfpq_probe_recall_curve,
)
from sleep_edf_data_pipeline_spark.queries.quantization_queries import (
    IVF_K,
    PQ_QUERIES,
    PQ_TOPK,
)


def test_probe_curve_shape_and_pins(spark, sf_dir):
    rows = {
        r["nprobe"]: r
        for r in q_ivfpq_probe_recall_curve(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    assert set(rows) == set(NPROBE_SWEEP)
    denom = PQ_QUERIES * PQ_TOPK
    for np, r in rows.items():
        assert r["n_results_fixed"] == denom  # full top-5 per query
        assert 0 <= r["n_hits_fixed"] <= denom
        assert 0 <= r["n_hits_scaled"] <= denom
        assert abs(r["recall_fixed_shortlist"] - r["n_hits_fixed"] / denom) < 1e-12
        assert abs(r["recall_scaled_shortlist"] - r["n_hits_scaled"] / denom) < 1e-12
        assert abs(r["corpus_fraction_scanned"] - np / IVF_K) < 1e-12
        # at equal cut the policies coincide; wider cuts can only help
        assert r["n_hits_scaled"] >= r["n_hits_fixed"]

    # the scaled policy is monotone in nprobe (more cells + room for
    # them in the shortlist → candidate coverage only grows)
    sweep = sorted(rows)
    for lo, hi in zip(sweep, sweep[1:]):
        assert rows[hi]["n_hits_scaled"] >= rows[lo]["n_hits_scaled"]
    # identical cut at nprobe=1 → identical sets
    assert rows[1]["n_hits_scaled"] == rows[1]["n_hits_fixed"]

    # deterministic regression pins at sf0.001 (measured once)
    assert [rows[np]["n_hits_fixed"] for np in (1, 2, 4)] == [34, 34, 27]
    assert [rows[np]["n_hits_scaled"] for np in (1, 2, 4)] == [34, 37, 39]
