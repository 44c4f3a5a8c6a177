"""Measured row-group pruning from range-clustered layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.tables import table
from sleep_edf_data_pipeline_spark.writers.layout import (
    scan_rows_read,
    write_clustered,
)


def test_clustered_layout_prunes_point_lookups(spark, sf_dir, tmp_path):
    """A user_id point predicate over the clustered layout must read
    a small fraction of what the shuffled layout reads — parquet
    min/max row-group stats only prune when the data is clustered."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    total = ev.count()

    rand_path = str(tmp_path / "random")
    ev.repartition(8).write.parquet(rand_path)  # hash layout: no order
    clus_path = str(tmp_path / "clustered")
    write_clustered(ev, clus_path, ["user_id"], n_files=8)

    uid = ev.agg(F.max("user_id")).first()[0] // 2
    pred = F.col("user_id") == uid

    read_rand = scan_rows_read(
        spark, spark.read.parquet(rand_path).filter(pred)
    )
    read_clus = scan_rows_read(
        spark, spark.read.parquet(clus_path).filter(pred)
    )
    match = ev.filter(pred).count()

    # both layouts return the same answer
    assert (
        spark.read.parquet(clus_path).filter(pred).count()
        == spark.read.parquet(rand_path).filter(pred).count()
        == match
    )
    # the scan metric counts post-pushdown rows; the clustered layout
    # must not read more than one file's worth, and strictly less
    # than the random layout (which reads ~everything matching from
    # every file's row groups)
    assert read_clus <= total // 8 + match
    assert read_clus < read_rand or read_rand == match


def test_clustered_layout_prunes_ranges(spark, sf_dir, tmp_path):
    """Range predicates (the time-series access path) prune too."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    clus_path = str(tmp_path / "c2")
    write_clustered(ev, clus_path, ["user_id"], n_files=8)
    hi = ev.agg(F.max("user_id")).first()[0]
    pred = F.col("user_id") >= hi - hi // 16
    read = scan_rows_read(spark, spark.read.parquet(clus_path).filter(pred))
    total = ev.count()
    assert read < total // 2  # top-1/16 slice reads far under half
    assert (
        spark.read.parquet(clus_path).filter(pred).count()
        == ev.filter(pred).count()
    )


def test_zorder_layout_prunes_both_columns(spark, sf_dir, tmp_path):
    """Z-order on (user_id, value): BOTH columns' predicates prune.

    The single-column range layout answers user_id predicates well but
    a value predicate reads everything; the z-ordered layout must prune
    substantially on each column independently — the multi-dimensional
    skipping the layout exists for.  Thresholds are deliberately loose
    (8 files → 3 z-bits of granularity).
    """
    from sleep_edf_data_pipeline_spark.writers.layout import zorder_clustered

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    total = ev.count()

    lin_path = str(tmp_path / "linear")
    write_clustered(ev, lin_path, ["user_id"], n_files=8)
    z_path = str(tmp_path / "zorder")
    zorder_clustered(ev, z_path, ["user_id", "value"], n_files=8)

    hi_u = ev.agg(F.max("user_id")).first()[0]
    hi_v = ev.agg(F.expr("percentile(value, 0.9)")).first()[0]
    pred_u = F.col("user_id") >= hi_u - hi_u // 8
    pred_v = F.col("value") >= hi_v

    # answers identical on every layout
    for pred in (pred_u, pred_v):
        assert (
            spark.read.parquet(z_path).filter(pred).count()
            == spark.read.parquet(lin_path).filter(pred).count()
            == ev.filter(pred).count()
        )

    read_z_u = scan_rows_read(spark, spark.read.parquet(z_path).filter(pred_u))
    read_z_v = scan_rows_read(spark, spark.read.parquet(z_path).filter(pred_v))
    read_lin_v = scan_rows_read(
        spark, spark.read.parquet(lin_path).filter(pred_v)
    )

    # each z-ordered column prunes on its own
    assert read_z_u < (3 * total) // 4
    assert read_z_v < (3 * total) // 4
    # the value predicate cannot prune a user_id-only layout
    assert read_z_v < read_lin_v
