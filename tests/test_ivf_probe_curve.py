"""IVF-PQ nprobe sweep: deterministic tuning table whose measured
non-monotonicity (the fixed-shortlist displacement effect) is pinned —
see queries/ivf_probe_curve.py for why a recall DIP at wider nprobe is
the signal, not a bug."""

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
    rows = {r["nprobe"]: r for r in q_ivfpq_probe_recall_curve(spark, sf_dir).collect()}
    spark.catalog.clearCache()
    assert set(rows) == set(NPROBE_SWEEP)
    for np, r in rows.items():
        # every setting returns a full top-5 per query
        assert r["n_results"] == PQ_QUERIES * PQ_TOPK
        assert 0 <= r["n_hits"] <= r["n_results"]
        assert abs(r["mean_recall"] - r["n_hits"] / (PQ_QUERIES * PQ_TOPK)) < 1e-12
        assert abs(r["corpus_fraction_scanned"] - np / IVF_K) < 1e-12
    # deterministic regression pins at sf0.001 (measured once; the
    # whole pipeline is hash-stable, so these are exact)
    assert rows[1]["n_hits"] == 34
    assert rows[2]["n_hits"] == 34
    assert rows[4]["n_hits"] == 27  # the documented displacement dip
