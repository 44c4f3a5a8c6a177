"""Bounded checks for the two no-oracle approximate sketches.

``approx_distinct_parts`` and ``approx_quantiles_price`` are no-oracle
by design (HLL++ / KLL results are engine-specific), but they are not
unfalsifiable: each has an exact twin in the registry
(``distinct_counts`` / ``quantity_quantiles``-style exact percentiles)
and a published error contract (rsd=0.01 for HLL++; rank error ≤ n/acc
for percentile_approx).  These tests assert the sketch stays inside a
generous multiple of its contract, so a broken sketch wiring (wrong
column, wrong group, garbage result) fails loudly instead of passing
``count() >= 0``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.queries.joins_advanced import (
    q_approx_quantiles_price,
)
from sleep_edf_data_pipeline_spark.queries.tpch_relational import (
    q_approx_distinct_parts,
    q_distinct_counts,
)
from sleep_edf_data_pipeline_spark.tables import table


def test_approx_distinct_within_3rsd_of_exact(spark, sf_dir):
    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in q_distinct_counts(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_n_parts"]
        for r in q_approx_distinct_parts(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for flag, n in exact.items():
        # rsd=0.01 → 3σ bound 3%; floor of ±2 absorbs tiny-group noise
        tol = max(2.0, 3 * 0.01 * n)
        assert abs(approx[flag] - n) <= tol, (flag, approx[flag], n)


def test_approx_quantiles_rank_error_within_contract(spark, sf_dir):
    """percentile_approx(acc) guarantees rank error ≤ n/acc.

    Value-space tolerance is data-dependent, so verify in RANK space:
    the number of values ≤ the sketch's answer must sit within
    n/acc (+1 for ties/rounding) of the target rank q·n.
    """
    acc = 10_000
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    approx = {
        r["l_returnflag"]: (r["price_p50_approx"], r["price_p99_approx"])
        for r in q_approx_quantiles_price(spark, sf_dir).collect()
    }
    stats = (
        li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    )
    for row in stats:
        flag, n = row["l_returnflag"], row["n"]
        for q, val in zip((0.5, 0.99), approx[flag]):
            rank = (
                li.filter(
                    (F.col("l_returnflag") == flag)
                    & (F.col("l_extendedprice") <= F.lit(val))
                ).count()
            )
            tol = n / acc + 1
            assert q * n - tol <= rank <= q * n + tol + 1, (
                flag,
                q,
                val,
                rank,
                n,
            )


def test_mad_sketch_flags_match_exact_within_rank_error(spark, sf_dir):
    """``mad_outliers_approx`` must flag (nearly) the same events as
    the exact twin: at test scales every group is smaller than the
    sketch accuracy, so percentile_approx is exact up to its
    no-interpolation semantics (it returns an observed value where
    exact `percentile` interpolates a half-step) — the flagged sets
    may disagree only on events whose robust_z sits at the 3.0 cut.
    """
    from sleep_edf_data_pipeline_spark.queries.selection_extra import (
        q_mad_outliers,
        q_mad_outliers_approx,
    )

    exact = {
        r["event_id"]: r["robust_z"]
        for r in q_mad_outliers(spark, sf_dir).collect()
    }
    approx = {
        r["event_id"]: r["robust_z"]
        for r in q_mad_outliers_approx(spark, sf_dir).collect()
    }
    assert exact, "exact twin returned no outliers — test is vacuous"
    disagree = set(exact) ^ set(approx)
    # a broken sketch (wrong column/group/threshold) disagrees on the
    # whole tail, not a boundary sliver
    assert len(disagree) <= max(2, len(exact) // 50), (
        len(disagree),
        len(exact),
    )
    for eid in disagree:
        z = exact.get(eid, approx.get(eid))
        assert abs(z - 3.0) < 0.1, (eid, z)


def test_heavy_hitters_cms_contract(spark, sf_dir):
    """CMS top-k: (1) every estimate >= the key's true count (CMS can
    only over-count); (2) over-estimation stays within 3·eps·N;
    (3) every returned key is a near-top key — its TRUE count reaches
    the 2·TOPK-th exact count (rank equality is impossible on this
    tie-dense uniform key distribution; see the module docstring)."""
    from sleep_edf_data_pipeline_spark.queries.heavy_hitters import (
        CMS_EPS,
        TOPK,
        q_heavy_hitters_cms,
        q_heavy_hitters_exact,
    )

    ev = table(spark, sf_dir, "events")
    n_total = ev.count()
    true_counts = {
        r["user_id"]: r["cnt"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    floor_cnt = sorted(true_counts.values(), reverse=True)[
        min(2 * TOPK, len(true_counts)) - 1
    ]
    got = q_heavy_hitters_cms(spark, sf_dir).collect()
    assert len(got) == min(TOPK, len(true_counts))
    slack = 3 * CMS_EPS * n_total
    for r in got:
        true = true_counts[r["user_id"]]
        assert r["est_events"] >= true, (r, true)
        assert r["est_events"] <= true + slack + 2, (r, true, slack)
        assert true >= floor_cnt, (r, true, floor_cnt)
    # exact twin sanity: its top-1 key must be in the sketch's set or
    # within slack of the sketch's smallest estimate
    top_exact = q_heavy_hitters_exact(spark, sf_dir).collect()[0]
    min_est = min(r["est_events"] for r in got)
    assert (
        any(r["user_id"] == top_exact["user_id"] for r in got)
        or top_exact["n_events"] <= min_est + slack
    )


def test_cms_reader_matches_jvm_estimates(spark, sf_dir):
    """The pure-Python CountMinSketchReader must reproduce the JVM
    implementation's estimateCount bit-for-bit for the same serialized
    sketch — the byte-layout parse and the long-item hash (wrapping
    64-bit multiply, arithmetic shift, 31-bit mask) are the risky
    parts.  Probes include negatives and >32-bit magnitudes.  The test
    itself may use the JVM gateway (classic-PySpark test host); the
    REGISTERED query must not — see test_no_jvm_gateway_in_package."""
    from sleep_edf_data_pipeline_spark.functions.cms import (
        CountMinSketchReader,
    )
    from sleep_edf_data_pipeline_spark.queries.heavy_hitters import (
        CMS_CONFIDENCE,
        CMS_EPS,
        CMS_SEED,
    )

    ev = table(spark, sf_dir, "events").select("user_id")
    raw = bytes(
        ev.agg(
            F.count_min_sketch(
                "user_id", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE), F.lit(CMS_SEED)
            ).alias("sk")
        ).collect()[0]["sk"]
    )
    reader = CountMinSketchReader(raw)
    jsketch = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        raw
    )
    assert reader.total_count == jsketch.totalCount()
    assert reader.depth == jsketch.depth()
    assert reader.width == jsketch.width()
    probes = (
        [r["user_id"] for r in ev.distinct().limit(200).collect()]
        + [0, -1, -(10**15), 10**12, 2**62, -(2**62)]
    )
    for item in probes:
        assert reader.estimate_long(int(item)) == jsketch.estimateCount(
            int(item)
        ), item


def test_space_saving_state_is_bounded_and_keeps_heavy_key():
    """Feed more distinct keys than SPACE_SAVING_COUNTERS through the
    candidate pass: the summary must stay bounded (the whole point —
    ADVICE r5 flagged the old unbounded dict) and a key with share far
    above 1/m must survive to the emitted top-64."""
    import pandas as pd

    from sleep_edf_data_pipeline_spark.queries import heavy_hitters as hh

    heavy = 7
    batches = []
    key = 10_000
    for _ in range(4):
        ids = []
        for _ in range(hh.SPACE_SAVING_COUNTERS // 2):
            ids.extend([key, key + 1, key + 2])  # unique singletons
            key += 3
        ids.extend([heavy] * 400)  # heavy key every batch
        batches.append(pd.DataFrame({"user_id": pd.Series(ids, dtype="int64")}))
    assert key - 10_000 > hh.SPACE_SAVING_COUNTERS  # more keys than counters
    [out] = list(hh._space_saving_topk(iter(batches)))
    assert len(out) <= hh.CANDIDATES_PER_PARTITION
    assert heavy in set(out["user_id"].astype(int))


def test_no_jvm_gateway_in_package():
    """No registered query or operator may touch the private
    ``spark._jvm`` gateway (breaks under Spark Connect; not public
    API).  The pure-Python CMS reader exists precisely so the sketch
    probe does not need it.  Tests may still use the gateway to
    cross-check."""
    import ast
    import pathlib

    import sleep_edf_data_pipeline_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = []
    for p in root.rglob("*.py"):
        tree = ast.parse(p.read_text(encoding="utf-8"))
        for node in ast.walk(tree):
            if isinstance(node, ast.Attribute) and node.attr == "_jvm":
                offenders.append(f"{p}:{node.lineno}")
    assert offenders == []
