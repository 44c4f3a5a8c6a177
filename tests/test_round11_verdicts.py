"""Round-11: sketch verdict-row entries + contract-guard fixes.

VERDICT r10 item 7: the four no-oracle sketch entries in the round-11
driver window now EMIT their tolerance verdict as rows (est vs exact
twin, bound, pass flags), so a rows-only driver record carries a
checkable signal.  These tests pin the verdict schema and that every
flag passes on the test corpus.

ADVICE r10: loud-failure guards on the two shared algebraic helpers
(``grouped_cumsum`` non-negative keys, ``ddsketch_histogram`` positive
values) and snapshot-persisted re-delivery guards on the two new
streaming monitors.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401 (parity w/ siblings)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- verdicts
@pytest.mark.parametrize(
    "name,flags",
    [
        ("heavy_hitters_cms", ("within_bound", "near_top")),
        ("ddsketch_quantiles_price", ("within_alpha",)),
        ("hll_rollup_distinct", ("within_bound",)),
        ("hll_rolling_wau", ("key_matched", "within_bound")),
        # converted late in round 11, ahead of their round-12 rotation
        ("approx_distinct_parts", ("within_bound",)),
        ("approx_quantiles_price", ("within_bound",)),
        ("mad_outliers_approx", ("within_bound",)),
    ],
)
def test_sketch_verdict_rows_all_pass(spark, name, flags):
    from sleep_edf_data_pipeline_spark.registry import collect

    queries, oracles = collect()
    assert name not in oracles  # rows-only by design
    rows = queries[name](spark, SF_DIR).collect()
    spark.catalog.clearCache()
    assert rows, f"{name} returned no rows"
    for f_ in flags:
        assert all(r[f_] for r in rows), (
            f"{name}: contract flag {f_} failed on "
            f"{[r.asDict() for r in rows if not r[f_]]}"
        )


def test_heavy_hitters_verdict_carries_est_and_exact(spark):
    from sleep_edf_data_pipeline_spark.queries.heavy_hitters import (
        TOPK,
        q_heavy_hitters_cms_verdict,
    )

    rows = q_heavy_hitters_cms_verdict(spark, SF_DIR).collect()
    # sf0.001 has fewer distinct users than TOPK; the limit caps above
    assert 0 < len(rows) <= TOPK
    for r in rows:
        # CMS never under-counts; the verdict row must show it
        assert r["overcount"] == r["est_events"] - r["true_events"] >= 0


def test_ddsketch_verdict_exact_side_is_true_order_statistic(spark):
    """The verdict's exact column must equal the brute-force discrete
    order statistic at rank floor(q*(n-1))+1 (tiny SF only)."""
    from pyspark.sql import Window

    from sleep_edf_data_pipeline_spark.queries.quantile_sketch import (
        QS,
        q_ddsketch_quantiles_verdict,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    li = table(spark, SF_DIR, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("x"),
    )
    w = Window.partitionBy("grp").orderBy("x")
    ranked = li.select(
        "grp",
        "x",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("grp")).alias("n"),
    )
    got = {
        r["l_returnflag"]: r
        for r in q_ddsketch_quantiles_verdict(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    for q in QS:
        target = F.floor(F.lit(q) * (F.col("n") - 1)) + 1
        for r in (
            ranked.filter(F.col("rn") == target).select("grp", "x").collect()
        ):
            assert got[r["grp"]][f"p{int(q * 100)}_exact"] == pytest.approx(
                r["x"], abs=1e-9
            )


# ------------------------------------------------------------- loud guards
def test_grouped_cumsum_rejects_negative_keys(spark):
    from sleep_edf_data_pipeline_spark.queries.winsorize import grouped_cumsum

    bad = spark.createDataFrame(
        [("a", -5, 1), ("a", 3, 2)], "grp string, cents bigint, c bigint"
    )
    with pytest.raises(Exception, match="non-negative"):
        grouped_cumsum(bad).collect()


def test_ddsketch_histogram_rejects_non_positive_values(spark):
    from sleep_edf_data_pipeline_spark.queries.quantile_sketch import (
        ddsketch_histogram,
    )

    bad = spark.createDataFrame(
        [("a", 0.0), ("a", 2.0)], "grp string, x double"
    )
    with pytest.raises(Exception, match="x > 0"):
        ddsketch_histogram(bad).collect()


# --------------------------------------------------- restart-safe monitors
def _fold_two_batches(monitor, spark):
    b0 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "grp string, x double"
    )
    b1 = spark.createDataFrame([("a", 4.0)], "grp string, x double")
    monitor.process_batch(b0, 0)
    monitor.process_batch(b1, 1)


def test_quantile_monitor_attach_rehydrates_redelivery_guard(spark, tmp_path):
    """A process restart loses driver memory; attach() must recover
    last_batch_id from the committed snapshot so a re-delivered batch
    is still skipped (ADVICE r10: the guard previously reset to None)."""
    from sleep_edf_data_pipeline_spark.streaming.quantiles import (
        StreamingQuantileMonitor,
    )

    path = str(tmp_path / "ddq")
    mon = StreamingQuantileMonitor(path)
    _fold_two_batches(mon, spark)
    before = sorted(map(tuple, mon.sketch(spark).collect()))

    fresh = StreamingQuantileMonitor.attach(spark, path)
    assert (fresh.version, fresh.last_batch_id) == (mon.version, 1)
    # re-delivered batch after "restart": must be a no-op, not a double fold
    b1_again = spark.createDataFrame([("a", 4.0)], "grp string, x double")
    fresh.process_batch(b1_again, 1)
    assert fresh.version == mon.version
    assert sorted(map(tuple, fresh.sketch(spark).collect())) == before


def test_winsor_monitor_attach_rehydrates_redelivery_guard(spark, tmp_path):
    from sleep_edf_data_pipeline_spark.streaming.winsorize import (
        StreamingWinsorMonitor,
    )

    path = str(tmp_path / "wins")
    mon = StreamingWinsorMonitor(path)
    b0 = spark.createDataFrame(
        [("a", 100, ), ("a", 250)], "grp string, cents bigint"
    )
    b1 = spark.createDataFrame([("a", 400)], "grp string, cents bigint")
    mon.process_batch(b0, 0)
    mon.process_batch(b1, 1)
    before = sorted(map(tuple, mon.histogram(spark).collect()))

    fresh = StreamingWinsorMonitor.attach(spark, path)
    assert (fresh.version, fresh.last_batch_id) == (mon.version, 1)
    fresh.process_batch(b1, 1)
    assert fresh.version == mon.version
    assert sorted(map(tuple, fresh.histogram(spark).collect())) == before


def test_attach_on_empty_path_starts_clean(spark, tmp_path):
    from sleep_edf_data_pipeline_spark.streaming.quantiles import (
        StreamingQuantileMonitor,
    )

    fresh = StreamingQuantileMonitor.attach(spark, str(tmp_path / "none"))
    assert fresh.state() == (None, None)
