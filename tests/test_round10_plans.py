"""Round-10 pins: intra-doc line dedup plan shape + invariants."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_intra_doc_dedup_plan_has_no_joins_or_windows(spark):
    """The whole operator is two hash aggregations over one corpus
    pass: at the (doc_id, line_hash) grain the within-doc first
    occurrence always survives, so no survivor window (the cross-doc
    operator's one window) and no join of any kind exists."""
    from sleep_edf_data_pipeline_spark.queries.intra_doc_dedup import (
        q_intra_doc_dedup,
    )

    spark.catalog.clearCache()
    plan = _plan(q_intra_doc_dedup(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kcenter_coreset_invariants(spark):
    """Gonzalez greedy structure: selection distances are monotone
    non-increasing over ranks, the final covering radius is bounded by
    the last selection distance, every corpus point is assigned, and
    the chosen centers are distinct corpus points."""
    from pyspark.sql import functions as F2

    from sleep_edf_data_pipeline_spark.queries.coreset import (
        K_CENTERS,
        q_kcenter_coreset,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    spark.catalog.clearCache()
    rows = sorted(
        q_kcenter_coreset(spark, SF_DIR).collect(),
        key=lambda r: r["center_rank"],
    )
    assert len(rows) == K_CENTERS
    assert len({r["vec_id"] for r in rows}) == K_CENTERS
    sel = [r["sel_d2"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(sel, sel[1:])), sel
    assert all(d > 0 for d in sel)
    radius = max(r["max_d2"] for r in rows)
    assert radius <= sel[-1]
    n_corpus = table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_assigned"] for r in rows) == n_corpus
    ids = {
        r["vec_id"]
        for r in table(spark, SF_DIR, "embeddings")
        .select("vec_id")
        .collect()
    }
    assert all(r["vec_id"] in ids for r in rows)


def test_kcenter_plan_reuses_codegen_and_casts_once(spark):
    """The per-round update is a broadcast 1-row cross join over the
    cached previous state — no shuffle joins, no corpus-sized sort
    beyond the TakeOrdered argmax."""
    from sleep_edf_data_pipeline_spark.queries.coreset import (
        q_kcenter_coreset,
    )

    spark.catalog.clearCache()
    df = q_kcenter_coreset(spark, SF_DIR)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dedup_cascade_reconciles_with_standalone_stages(spark):
    """Sequential-cascade accounting: every corpus doc lands in
    exactly one reason bucket, total characters reconcile, the exact
    stage matches the standalone md5 grain, and kills cannot exceed
    what the standalone (independent) operators report for their
    grain."""
    from pyspark.sql import functions as F2

    from sleep_edf_data_pipeline_spark.queries.dedup_cascade import (
        q_dedup_cascade_verdict,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    spark.catalog.clearCache()
    rows = q_dedup_cascade_verdict(spark, SF_DIR).collect()
    reasons = {r["reason"] for r in rows}
    assert reasons <= {"exact", "repetition", "neardup", "boilerplate", "kept"}
    assert "kept" in reasons
    docs = table(spark, SF_DIR, "documents")
    n, chars = docs.agg(
        F2.count("*"), F2.sum(F2.col("n_chars").cast("bigint"))
    ).collect()[0]
    assert sum(r["n_docs"] for r in rows) == n
    assert sum(r["n_chars"] for r in rows) == chars
    n_exact_losers = n - docs.select(F2.md5("text")).distinct().count()
    assert (
        sum(r["n_docs"] for r in rows if r["reason"] == "exact")
        == n_exact_losers
    )


def test_dedup_cascade_plan_has_no_cartesian(spark):
    from sleep_edf_data_pipeline_spark.queries.dedup_cascade import (
        q_dedup_cascade_verdict,
    )

    spark.catalog.clearCache()
    plan = _plan(q_dedup_cascade_verdict(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan


def test_winsorized_stats_plan_every_window_is_partitioned(spark):
    """The per-group cumulative runs through the digit-length
    decomposition: EVERY windowspec in the plan carries a partition
    key (first arg is a bare column, not an ASC/DESC order column) —
    the naive per-group ordered cumulative (whole price domain of a
    group in one task) must fail here."""
    import re as _re

    from sleep_edf_data_pipeline_spark.queries.winsorize import (
        q_winsorized_price_stats,
    )

    spark.catalog.clearCache()
    plan = _plan(q_winsorized_price_stats(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for s in specs:
        first = s.split(",")[0].strip()
        assert " ASC" not in first and " DESC" not in first, s


def test_winsorized_stats_values(spark):
    """Clip counts respect the 5% band definition and the winsorized
    mean sits inside [p05, p95]."""
    from sleep_edf_data_pipeline_spark.queries.winsorize import (
        q_winsorized_price_stats,
    )

    spark.catalog.clearCache()
    for r in q_winsorized_price_stats(spark, SF_DIR).collect():
        assert r["p05"] <= r["p95"]
        assert r["p05"] <= r["winsor_mean"] <= r["p95"]
        # ranks are floor(q*(n-1))+1: strictly-below-lo count < rank_lo,
        # strictly-above-hi count <= n - rank_hi
        n = r["n_rows"]
        assert r["n_clip_low"] < 0.05 * (n - 1) + 1
        assert r["n_clip_high"] <= n - (int(0.95 * (n - 1)) + 1)


def test_ddsketch_and_quantile_transform_window_discipline(spark):
    """The sketch tail's windows partition on grp (histogram grain);
    the rank transform inherits winsorize's rule — every windowspec
    carries a partition key.  Neither plan may contain a corpus-wide
    unpartitioned ordered window."""
    import re as _re

    from sleep_edf_data_pipeline_spark.queries.quantile_sketch import (
        q_ddsketch_quantiles_price,
    )
    from sleep_edf_data_pipeline_spark.queries.quantile_transform import (
        q_quantile_rank_transform,
    )

    for fn in (q_ddsketch_quantiles_price, q_quantile_rank_transform):
        spark.catalog.clearCache()
        plan = _plan(fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, plan
        specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs
        for s in specs:
            first = s.split(",")[0].strip()
            assert " ASC" not in first and " DESC" not in first, (fn, s)


def test_hll_rollup_unpartitioned_windows_are_days_bounded(spark):
    """The cumulative sketch-union window is unpartitioned but runs
    over the per-day rollup frame — bounded by the CALENDAR, not the
    corpus (the pareto 256-bucket precedent).  Pin that the plan's
    corpus-side work is a single aggregate and the window input is the
    days-grain frame (no second corpus scan feeding the window)."""
    from sleep_edf_data_pipeline_spark.queries.hll_rollup import (
        q_hll_rollup_distinct,
    )

    spark.catalog.clearCache()
    plan = _plan(q_hll_rollup_distinct(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "Join" not in plan, plan
    # one corpus scan total: the day rollup aggregate
    assert plan.count("Scan parquet") == 1, plan


def test_hll_rollup_tracks_exact_twin_within_3rsd(spark):
    """Day-distinct and cumulative-distinct estimates from the merged
    day sketches stay within 3·rsd of the exact twin on every day,
    and both queries agree on the day set and event counts' monotone
    cumulative structure."""
    from sleep_edf_data_pipeline_spark.queries.hll_rollup import (
        HLL_RSD,
        q_cum_distinct_users,
        q_hll_rollup_distinct,
    )

    spark.catalog.clearCache()
    est = {
        r["day"]: (r["est_day_users"], r["est_cum_users"])
        for r in q_hll_rollup_distinct(spark, SF_DIR).collect()
    }
    exact = {
        r["day"]: (r["n_day_users"], r["n_cum_users"])
        for r in q_cum_distinct_users(spark, SF_DIR).collect()
    }
    assert set(est) == set(exact) and est
    for d in exact:
        for i in (0, 1):
            tol = max(2.0, 3 * HLL_RSD * exact[d][i])
            assert abs(est[d][i] - exact[d][i]) <= tol, (d, i, est[d], exact[d])
    cums = [v[1] for _, v in sorted(exact.items())]
    assert all(a <= b for a, b in zip(cums, cums[1:]))


def test_hll_rolling_wau_matches_exact_keyset_within_3rsd(spark):
    """The sketch WAU reports the IDENTICAL report-week key set as
    the exact twin (same fanout rule) and every estimate is within
    3·rsd."""
    from sleep_edf_data_pipeline_spark.queries.graph_stats import (
        q_weekly_active_users,
    )
    from sleep_edf_data_pipeline_spark.queries.hll_rollup import (
        HLL_RSD,
        q_hll_rolling_wau,
    )

    spark.catalog.clearCache()
    est = {
        r["report_week"]: r["wau_est"]
        for r in q_hll_rolling_wau(spark, SF_DIR).collect()
    }
    exact = {
        r["report_week"]: r["wau"]
        for r in q_weekly_active_users(spark, SF_DIR).collect()
    }
    assert set(est) == set(exact) and est
    for k in exact:
        tol = max(2.0, 3 * HLL_RSD * exact[k])
        assert abs(est[k] - exact[k]) <= tol, (k, est[k], exact[k])


def test_intra_doc_dedup_invariants(spark):
    """Counts reconcile per doc; the corpus-wide segment total matches
    the cross-doc operator's (shared segmentation head, so any
    boundary drift between the two modules breaks this)."""
    from sleep_edf_data_pipeline_spark.queries.intra_doc_dedup import (
        q_intra_doc_dedup,
    )
    from sleep_edf_data_pipeline_spark.queries.line_dedup import (
        q_line_dedup_stats,
    )

    spark.catalog.clearCache()
    intra = q_intra_doc_dedup(spark, SF_DIR)
    rows = intra.collect()
    assert rows
    for r in rows:
        assert r["n_lines"] == r["n_kept"] + r["n_removed"]
        assert r["max_line_occ"] >= 1
        assert 0.0 <= r["dup_char_frac"] < 1.0
        # a doc with no repeats removes nothing
        if r["max_line_occ"] == 1:
            assert r["n_removed"] == 0 and r["removed_chars"] == 0
    intra_total = intra.agg(F.sum("n_lines")).collect()[0][0]
    cross_total = (
        q_line_dedup_stats(spark, SF_DIR).agg(F.sum("n_lines")).collect()[0][0]
    )
    assert intra_total == cross_total
    # intra-doc keeps at least as much as cross-doc global dedup does
    intra_kept = intra.agg(F.sum("n_kept")).collect()[0][0]
    cross_kept = (
        q_line_dedup_stats(spark, SF_DIR).agg(F.sum("n_kept")).collect()[0][0]
    )
    assert intra_kept >= cross_kept
