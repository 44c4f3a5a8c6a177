"""Round-11: LSH near-dup recall contract — invariants + curve shape.

Cross-engine hash parity is covered by tests/test_oracle_parity.py;
these pin the properties a hash mismatch can't localize.
"""

SF_DIR = "/root/testdata/sf0.001"


def test_recall_curve_invariants(spark):
    """Numerator ⊆ denominator per band; bands cover [0.6, 1.0]; the
    top band (exact or near-exact duplicates, J ≥ 0.96 rounds into
    band 10... band 10 = J = 1.0 exactly) is fully recovered — equal
    signatures always share every band key."""
    from sleep_edf_data_pipeline_spark.queries.lsh_recall import (
        q_lsh_neardup_recall,
    )

    spark.catalog.clearCache()
    rows = {
        r["jaccard_band"]: r
        for r in q_lsh_neardup_recall(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert set(rows) <= {6, 7, 8, 9, 10}
    for r in rows.values():
        assert 0 <= r["n_recovered"] <= r["n_true_pairs"]
        assert abs(
            r["recall"] - r["n_recovered"] / r["n_true_pairs"]
        ) < 1e-12
    # identical token sets ⇒ identical signatures ⇒ same band keys
    assert rows[10]["recall"] == 1.0
    # the S-curve must rise: recall at the top bands strictly above the
    # threshold band (a broken permutation/band key flattens it)
    assert rows[9]["recall"] > rows[6]["recall"]


def test_recall_tracks_lsh_theory(spark):
    """Per-band recall should sit near the banded-LSH hit probability
    P = 1 − (1 − s^r)^b evaluated at the band midpoint (loose ±0.15
    envelope — the corpus Jaccard mass within a band is not uniform,
    and k=16 signatures quantize s)."""
    from sleep_edf_data_pipeline_spark.queries.lsh_recall import (
        LSH_BANDS,
        LSH_ROWS,
        q_lsh_neardup_recall,
    )

    spark.catalog.clearCache()
    rows = q_lsh_neardup_recall(spark, SF_DIR).collect()
    spark.catalog.clearCache()
    for r in rows:
        if r["jaccard_band"] >= 10 or r["n_true_pairs"] < 200:
            continue
        s = (r["jaccard_band"] + 0.5) / 10.0
        p_theory = 1.0 - (1.0 - s**LSH_ROWS) ** LSH_BANDS
        assert abs(r["recall"] - p_theory) < 0.15, (
            r["jaccard_band"],
            r["recall"],
            p_theory,
        )


def test_kn_bigram_plan_shape(spark):
    """KN scorer scale pins (same bar as its add-one sibling): no
    cartesian product, no sort-merge join — the type-table joins
    broadcast, the gram histogram persists once."""
    from sleep_edf_data_pipeline_spark.queries.kn_bigram import (
        q_kn_bigram_surprisal,
    )

    spark.catalog.clearCache()
    plan = (
        q_kn_bigram_surprisal(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    spark.catalog.clearCache()
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_lsh_recall_plan_shape(spark):
    """Recall contract composes two verified kernels; the composition
    joins pair frames on the pair key — no cartesian product anywhere
    (the truth side's prefix filter and the LSH band join are both
    equi-joins)."""
    from sleep_edf_data_pipeline_spark.queries.lsh_recall import (
        q_lsh_neardup_recall,
    )

    spark.catalog.clearCache()
    plan = (
        q_lsh_neardup_recall(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    spark.catalog.clearCache()
    assert "CartesianProduct" not in plan, plan
