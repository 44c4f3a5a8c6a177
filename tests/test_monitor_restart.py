"""Fleet-wide restart rehydration for every versioned-state monitor.

ADVICE r10 flagged the restart gap on the two round-10 monitors; this
round the fix (guard persisted inside the snapshot via
``streaming/restart.py`` + ``attach()``) is applied to ALL fourteen
monitors, and this test pins the contract uniformly: after a process
"restart" (fresh instance via attach), a re-delivered batch id is a
no-op, and the NEXT batch id still folds.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    from sleep_edf_data_pipeline_spark.tables import table

    return table(spark, SF_DIR, "documents")


def _mk(name):
    """(monitor class, batch-frame builder) per monitor name — import
    lazily so collection stays cheap."""
    from sleep_edf_data_pipeline_spark.tables import table

    if name == "chi2":
        from sleep_edf_data_pipeline_spark.streaming.chi2 import (
            StreamingChi2Monitor as C,
        )

        return C, lambda s: _docs(s).select("source", "n_chars")
    if name == "lines":
        from sleep_edf_data_pipeline_spark.streaming.lines import (
            StreamingLineDedupMonitor as C,
        )

        return C, lambda s: _docs(s).select("doc_id", "text")
    if name == "readability":
        from sleep_edf_data_pipeline_spark.streaming.readability import (
            StreamingReadabilityMonitor as C,
        )

        return C, lambda s: _docs(s).select("source", "text")
    if name == "bpe":
        from sleep_edf_data_pipeline_spark.streaming.bpe import (
            StreamingVocabMonitor as C,
        )

        return C, _docs
    if name == "ks":
        from sleep_edf_data_pipeline_spark.streaming.ks import (
            StreamingKSMonitor as C,
        )

        return C, _docs
    if name == "drift":
        from sleep_edf_data_pipeline_spark.streaming.drift import (
            StreamingDriftMonitor as C,
        )

        return C, _docs
    if name == "cusum":
        from sleep_edf_data_pipeline_spark.streaming.cusum import (
            StreamingCusumMonitor as C,
        )

        return C, lambda s: table(s, SF_DIR, "events")
    if name == "embedding_drift":
        from sleep_edf_data_pipeline_spark.streaming.embedding_drift import (
            StreamingEmbeddingDriftMonitor as C,
        )

        return C, lambda s: table(s, SF_DIR, "embeddings")
    if name == "hosts":
        from sleep_edf_data_pipeline_spark.queries.url_dedup import (
            _synth_raw_url,
        )
        from sleep_edf_data_pipeline_spark.streaming.hosts import (
            StreamingHostAuditMonitor as C,
        )

        return C, lambda s: _synth_raw_url(
            _docs(s).select("doc_id", "n_chars")
        ).select("doc_id", "n_chars", "url")
    if name == "incremental":
        from sleep_edf_data_pipeline_spark.streaming.incremental import (
            StreamingOrderSummary as C,
        )

        return C, lambda s: table(s, SF_DIR, "orders")
    if name == "occupancy":
        from sleep_edf_data_pipeline_spark.queries.event_windows import (
            q_session_window_agg_bucketed,
        )
        from sleep_edf_data_pipeline_spark.streaming.occupancy import (
            StreamingOccupancyMonitor as C,
        )

        return C, lambda s: q_session_window_agg_bucketed(s, SF_DIR)
    if name == "quantiles":
        from sleep_edf_data_pipeline_spark.streaming.quantiles import (
            StreamingQuantileMonitor as C,
        )

        return C, lambda s: table(s, SF_DIR, "lineitem").select(
            F.col("l_returnflag").alias("grp"),
            F.col("l_extendedprice").alias("x"),
        )
    if name == "winsorize":
        from sleep_edf_data_pipeline_spark.streaming.winsorize import (
            StreamingWinsorMonitor as C,
        )

        return C, lambda s: table(s, SF_DIR, "lineitem").select(
            F.col("l_returnflag").alias("grp"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    if name == "hll":
        from sleep_edf_data_pipeline_spark.queries.hll_rollup import (
            _events_day,
        )
        from sleep_edf_data_pipeline_spark.streaming.hll import (
            StreamingDistinctMonitor as C,
        )

        return C, lambda s: _events_day(s, SF_DIR)
    if name == "winnowing":
        from sleep_edf_data_pipeline_spark.streaming.winnowing import (
            StreamingWinnowingMonitor as C,
        )

        return C, lambda s: _docs(s).select("doc_id", "source", "text")
    raise AssertionError(name)


ALL_MONITORS = [
    "chi2", "lines", "readability", "bpe", "ks", "drift", "cusum",
    "embedding_drift", "hosts", "incremental", "occupancy",
    "quantiles", "winsorize", "hll", "winnowing",
]


@pytest.mark.parametrize("name", ALL_MONITORS)
def test_monitor_restart_rehydrates_guard(spark, tmp_path, name):
    cls, build = _mk(name)
    df = build(spark).persist()
    path = str(tmp_path / name)
    mon = cls(path)
    mon.process_batch(df, 0)
    mon.process_batch(df, 1)
    assert (mon.version, mon.last_batch_id) == (2, 1)

    # "restart": fresh instance rehydrated from the committed snapshot
    fresh = cls.attach(spark, path)
    assert (fresh.version, fresh.last_batch_id) == (2, 1)

    # re-delivered batch id: no-op (no new snapshot committed)
    fresh.process_batch(df, 1)
    assert (fresh.version, fresh.last_batch_id) == (2, 1)

    # the NEXT batch id still folds (guard doesn't wedge the stream)
    fresh.process_batch(df, 2)
    assert (fresh.version, fresh.last_batch_id) == (3, 2)
    df.unpersist()
    spark.catalog.clearCache()


def test_attach_tolerates_pre_upgrade_snapshot(spark, tmp_path):
    """ADVICE r11: a snapshot committed BEFORE the guard column existed
    (no ``_last_batch_id``) must attach with last_batch_id=None — the
    pre-guard behaviour of trusting checkpoint replay — never raise an
    unresolved-column AnalysisException."""
    from sleep_edf_data_pipeline_spark.streaming.chi2 import (
        StreamingChi2Monitor,
    )
    from sleep_edf_data_pipeline_spark.writers.versioned import (
        commit_versioned,
    )

    path = str(tmp_path / "legacy")
    mon = StreamingChi2Monitor(path)
    mon.process_batch(_docs(spark).select("source", "n_chars"), 0)
    # simulate a pre-upgrade deployment: re-commit the state WITHOUT
    # the guard column
    from sleep_edf_data_pipeline_spark.streaming.restart import (
        GUARD_COL,
        unstamp,
    )
    from sleep_edf_data_pipeline_spark.writers.versioned import (
        read_versioned,
    )

    legacy = unstamp(read_versioned(spark, path, 1))
    assert GUARD_COL not in legacy.columns
    v2 = commit_versioned(legacy, path, 1)
    assert v2 == 2

    fresh = StreamingChi2Monitor.attach(spark, path)
    assert fresh.version == 2
    assert fresh.last_batch_id is None
    # and the stream proceeds normally from there
    fresh.process_batch(_docs(spark).select("source", "n_chars"), 1)
    assert (fresh.version, fresh.last_batch_id) == (3, 1)
    spark.catalog.clearCache()
