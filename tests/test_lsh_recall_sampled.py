"""Sampled-truth LSH recall audit vs the exact form (VERDICT r11 #4).

Everything here is deterministic (md5 sample key, fixed permutation
coefficients), so the agreement bounds are tight regression pins, not
statistical tolerances.
"""

from sleep_edf_data_pipeline_spark.queries.lsh_recall import (
    q_lsh_neardup_recall,
)
from sleep_edf_data_pipeline_spark.queries.lsh_recall_sampled import (
    SAMPLE_DOCS,
    _sampled_docs,
    q_lsh_neardup_recall_sampled,
)


def _rows(df):
    return {r["jaccard_band"]: r for r in df.collect()}


def test_sample_is_fixed_size_and_deterministic(spark, sf_dir):
    a = _sampled_docs(spark, sf_dir).collect()
    b = _sampled_docs(spark, sf_dir).collect()
    assert len(a) == min(SAMPLE_DOCS, 500)
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)


def test_sampled_recall_tracks_exact_curve(spark, sf_dir):
    exact = _rows(q_lsh_neardup_recall(spark, sf_dir))
    spark.catalog.clearCache()
    sampled = _rows(q_lsh_neardup_recall_sampled(spark, sf_dir))
    spark.catalog.clearCache()

    # the min-md5 content key keeps dup clusters co-sampled: every
    # exact band survives into the sample with real pair mass
    assert set(sampled) == set(exact)
    for band, s in sampled.items():
        e = exact[band]
        assert s["n_true_pairs"] >= 100, band
        assert s["n_recovered"] <= s["n_true_pairs"], band
        # content-keyed sampling biases recall UP (shared-min-word
        # pairs are banding's easiest); allow a small downward wobble
        assert e["recall"] - 0.05 <= s["recall"] <= 1.0, band

    # exact duplicates (J = 1.0) must ALWAYS be recovered — identical
    # docs have identical signatures in every band
    assert sampled[10]["recall"] == 1.0
