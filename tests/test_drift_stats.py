"""Semantics + plan pins for queries/drift_stats.py (PSI, KS).

The registered queries are hash-verified against DuckDB by the driver
contract; these tests pin statistical properties the oracle can't see
(null-drift zero, disjoint-support extremes, bounds) and the physical
plan shapes that matter at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.queries.drift_stats import (
    q_ks_two_sample,
    q_psi_drift_by_source,
)

SF_DIR = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_psi_identical_distributions_is_zero(spark, tmp_path):
    """Two sources with IDENTICAL length histograms: every bin share
    equals the corpus share, so every PSI term is exactly ln(1)=0."""
    rows = []
    i = 0
    for src in ("src0", "src1"):
        for ln in range(100, 120):
            for _ in range(3):
                rows.append((i, "x", "en", src, ln))
                i += 1
    d = _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r["psi"] for r in q_psi_drift_by_source(spark, d).collect()}
    assert out["src0"] == 0.0 and out["src1"] == 0.0


def test_psi_disjoint_source_is_large_and_nonnegative(spark, tmp_path):
    """A source living in bins the rest never touches drifts hard; PSI
    is non-negative for every source (sum of (a−e)·ln(a/e) terms)."""
    rows = []
    i = 0
    for ln in range(100, 150):
        for _ in range(4):
            rows.append((i, "x", "en", "bulk", ln))
            i += 1
    for ln in range(900, 905):
        for _ in range(40):
            rows.append((i, "x", "en", "outlier", ln))
            i += 1
    d = _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r["psi"] for r in q_psi_drift_by_source(spark, d).collect()}
    assert out["outlier"] > 1.0          # way past the 0.25 alert rule
    assert all(v >= 0.0 for v in out.values())


def test_ks_identical_zero_and_disjoint_one(spark, tmp_path):
    rows = []
    i = 0
    # identical samples for src0/src1 → KS = 0
    for src in ("src0", "src1"):
        for ln in range(10, 40):
            rows.append((i, "x", "en", src, ln))
            i += 1
    d = _write_docs(spark, tmp_path, rows)
    r = q_ks_two_sample(spark, d).collect()[0]
    assert r["ks_stat"] == 0.0

    rows = [(i, "x", "en", "src0", ln) for i, ln in enumerate(range(10, 40))]
    rows += [
        (100 + j, "x", "en", "src1", ln) for j, ln in enumerate(range(500, 530))
    ]
    d = _write_docs(spark, tmp_path, rows)
    r = q_ks_two_sample(spark, d).collect()[0]
    assert r["ks_stat"] == 1.0           # disjoint supports
    assert r["n_a"] == 30 and r["n_b"] == 30


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_psi_plan_one_corpus_pass_no_sort_merge(spark):
    plan = _plan(q_psi_drift_by_source(spark, SF_DIR))
    # the histogram is persisted and every consumer reads the cache —
    # the corpus parquet appears in the cached subtree only (plan text
    # inlines it per consumer; what EXECUTES is the InMemoryTableScan)
    assert "InMemoryTableScan" in plan
    # everything after the hist runs on the value domain: broadcast
    # joins only, no sort-merge join anywhere
    assert "SortMergeJoin" not in plan


def test_ks_plan_broadcast_only_joins(spark):
    plan = _plan(q_ks_two_sample(spark, SF_DIR))
    # the digit-bucketed cumulative adds ≤19-row broadcast joins
    # (bucket offsets + totals) — never a fact-scale join
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
    # source pair filter reaches the parquet scan
    assert "PushedFilters: [In(source" in plan or "src0" in plan


def test_dhash_neardups_plan_no_cartesian(spark):
    from sleep_edf_data_pipeline_spark.queries.multimodal_queries import (
        q_image_dhash_neardups,
    )

    plan = _plan(q_image_dhash_neardups(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("ArrowEvalPython") == 0  # dhash runs in mapInPandas
    assert "MapInPandas" in plan


# --------------------------------------------------------------------------
# streaming drift monitor
# --------------------------------------------------------------------------


def test_streaming_drift_monitor_folds_and_alerts(spark, tmp_path):
    """4-batch replay: reference folds to the exact full histogram;
    same-distribution batches stay quiet; a shifted batch alerts."""
    from sleep_edf_data_pipeline_spark.queries.drift_stats import psi_between
    from sleep_edf_data_pipeline_spark.streaming.drift import (
        StreamingDriftMonitor,
        length_hist,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    docs = table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.parquet(src)
    # alert threshold calibrated to the tiny test batches: at ~125
    # docs per micro-batch the Laplace-smoothed PSI of a SAME-
    # distribution split has sampling noise ~2·B/n ≈ 0.16 and its tail
    # depends on which random split lands first (file listing order is
    # not deterministic), so the production 0.25 default intermittently
    # false-alarms here.  0.6 keeps the assertion meaningful: genuine
    # drift below asserts psi > 1.0.
    mon = StreamingDriftMonitor(str(tmp_path / "ref"), alert_threshold=0.6)
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mon.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(mon.history) >= 2

    # folded reference == one-shot batch histogram (algebraic exactness)
    got = sorted(map(tuple, mon.reference(spark).collect()))
    want = sorted(map(tuple, length_hist(docs).collect()))
    assert got == want

    # random 4-way splits of one corpus: no alert after the first batch
    assert mon.history[0][1] is None
    assert all(not alerted for _, _, alerted in mon.history)

    # a length-shifted batch must alert
    shifted = docs.withColumn("n_chars", F.col("n_chars") + 5000)
    v = mon.version
    mon.process_batch(shifted, mon.last_batch_id + 1)
    assert mon.history[-1][2] and mon.history[-1][1] > 1.0
    assert mon.version == v + 1  # and it still folded in

    # psi_between of a histogram against itself is exactly 0
    h = length_hist(docs)
    assert psi_between(h, h) == 0.0


def test_cusum_finds_injected_shift(spark):
    """A series with a deliberate level shift must put the change
    point at the shift boundary, and the normalized peak must equal
    the closed form |S_k|/n² = k·(n−k)·Δ/n² at that boundary."""
    import pyspark.sql.functions as F

    from sleep_edf_data_pipeline_spark.queries import drift_stats as ds

    n, k, lo, hi = 64, 40, 1.0, 5.0
    rows = [
        (i, i, "t", float(lo if i < k else hi))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, tsn long, event_type string, value double"
    )
    df = df.select(
        "event_id",
        F.timestamp_micros(F.col("tsn") * 1_000_000).cast("timestamp_ntz").alias("ts"),
        "event_type",
        "value",
    )

    import sleep_edf_data_pipeline_spark.tables as tables

    orig = tables.table
    try:
        tables_table = lambda spark_, sf_dir_, name_: df  # noqa: E731
        ds.table = tables_table
        out = ds.q_cusum_changepoint(spark, "/unused").collect()
    finally:
        ds.table = orig

    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == n
    # Max |S| for a step series sits at the last pre-shift row (k-1
    # 0-indexed → the k-th event).
    # Timezone-independent compare: .timestamp() on a naive datetime
    # applies the HOST'S local zone, so the test would fail off-UTC.
    from datetime import datetime, timedelta

    assert r["changepoint_ts"] == datetime(1970, 1, 1) + timedelta(seconds=k - 1)
    q_lo, q_hi = int(lo * ds.CUSUM_SCALE), int(hi * ds.CUSUM_SCALE)
    expected = k * (n - k) * (q_hi - q_lo) / (n * n * ds.CUSUM_SCALE)
    assert abs(r["peak_shift"] - expected) < 1e-9


def test_cusum_windows_partition_by_day_buckets(spark, sf_dir):
    """The events-scale windows must partition on (event_type, day) —
    a per-type-only ordered window puts one type's whole stream in a
    single sorted task (measured: 26.8x wall at the 135x skewed
    decade; 4.6x after the prefix-scan decomposition)."""
    import re

    from sleep_edf_data_pipeline_spark.queries.drift_stats import (
        q_cusum_changepoint,
    )

    plan = (
        q_cusum_changepoint(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    # Fact-scale walks are the ts-ASC-ordered cumsum/rownum windows;
    # the argmax specs (|S'| DESC first) see ≤ one row per bucket and
    # may partition by type alone.
    fact_specs = [s for s in specs if re.search(r"ts#\d+ ASC", s) and "DESC" not in s]
    assert fact_specs, specs
    for s in fact_specs:
        assert "day#" in s, (s, plan)


def test_streaming_cusum_matches_batch_partials(spark, tmp_path):
    """Replaying the events table through the foreachBatch CUSUM
    monitor in multiple micro-batches must fold to the EXACT batch
    day-partials (algebraic exactness), and the day-resolution change
    point from the folded state must equal the batch recomputation.
    Re-delivered batches must not double-count."""
    from sleep_edf_data_pipeline_spark.queries.drift_stats import (
        cusum_day_changepoint,
        cusum_day_partials,
        quantize_events,
    )
    from sleep_edf_data_pipeline_spark.streaming.cusum import (
        StreamingCusumMonitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    ev = table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_stream")
    ev.repartition(4).write.parquet(src)
    mon = StreamingCusumMonitor(str(tmp_path / "cusum_state"))
    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mon.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert mon.last_batch_id is not None and mon.last_batch_id >= 1

    got = sorted(map(tuple, mon.partials(spark).collect()))
    want = sorted(
        map(tuple, cusum_day_partials(quantize_events(ev)).collect())
    )
    assert got == want

    got_cp = sorted(map(tuple, mon.changepoint(spark).collect()))
    want_cp = sorted(
        map(
            tuple,
            cusum_day_changepoint(
                cusum_day_partials(quantize_events(ev))
            ).collect(),
        )
    )
    assert got_cp == want_cp

    # at-least-once re-delivery: same batch id again is a no-op
    v = mon.version
    mon.process_batch(ev, mon.last_batch_id)
    assert mon.version == v
    assert sorted(map(tuple, mon.partials(spark).collect())) == want


def test_psi_ks_have_no_unpartitioned_ordered_window(spark, sf_dir):
    """PSI/KS cumulative prefix sums must ride the digit-bucketed
    decomposition: an ``ORDER BY len`` window with no partition spec
    puts the whole distinct-length domain (bounded by MAX length, not
    O(10)) in one sorted task.  Every ordered windowspecdefinition in
    both plans must either carry a partition column (the _bkt digit
    bucket or the source key) or order on ``_bkt`` itself — the one
    domain in these plans that is bounded BY CONSTRUCTION (≤19 decimal
    digit-lengths of a bigint, data-independent), where the
    bucket-offsets frame takes its exclusive prefix."""
    import re

    from sleep_edf_data_pipeline_spark.queries import drift_stats as ds

    for q in (ds.q_psi_drift_by_source, ds.q_ks_two_sample):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs, plan
        for s in specs:
            # an unpartitioned ordered spec STARTS with "<col> ASC" —
            # a partitioned one starts with the bare partition column.
            # Only the ≤19-row bucket-totals frame may order
            # unpartitioned, and only on _bkt.
            if re.match(r"\s*_bkt#\d+L? ASC", s):
                continue
            assert not re.match(r"\s*\w+#\d+L? ASC", s), (s, plan)


def test_streaming_ks_matches_batch(spark, tmp_path):
    """Replaying the documents table through the foreachBatch KS
    monitor in multiple micro-batches must fold to the EXACT batch
    pair histogram (algebraic exactness), and the KS statistic from
    the folded state must equal the batch query row for row.
    Re-delivered batches must not double-count."""
    from sleep_edf_data_pipeline_spark.queries.drift_stats import (
        q_ks_two_sample,
    )
    from sleep_edf_data_pipeline_spark.streaming.ks import (
        StreamingKSMonitor,
        pair_hist_partial,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    docs = table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.parquet(src)
    mon = StreamingKSMonitor(str(tmp_path / "ks_state"))
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mon.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert mon.last_batch_id is not None and mon.last_batch_id >= 1

    got_pair = sorted(map(tuple, mon.pair(spark).collect()))
    want_pair = sorted(map(tuple, pair_hist_partial(docs).collect()))
    assert got_pair == want_pair

    got_ks = sorted(map(tuple, mon.ks(spark).collect()))
    want_ks = sorted(map(tuple, q_ks_two_sample(spark, SF_DIR).collect()))
    assert got_ks == want_ks

    # at-least-once re-delivery: same batch id again is a no-op
    v = mon.version
    mon.process_batch(docs, mon.last_batch_id)
    assert mon.version == v
    assert sorted(map(tuple, mon.pair(spark).collect())) == got_pair
