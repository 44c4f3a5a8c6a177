"""Layout-aware writes: range-clustered parquet for scan pruning.

At 100 TB the cheapest scan is the one that never reads the file:
parquet footers carry per-row-group min/max, and a pushed predicate
skips row groups (and whole files) whose range can't match.  That
statistic is only selective if the data is CLUSTERED on the predicate
column — random layout makes every min/max span everything.

``write_clustered`` is the engine's layout primitive:
``repartitionByRange`` (a range shuffle on the cluster keys — sampled
bounds, so files hold disjoint key ranges) + ``sortWithinPartitions``
(row groups within a file are also disjoint sub-ranges).  The same
recipe serves time-partitioned event tables (cluster by ts) and
key-serving tables (cluster by id); the effect is measured, not
asserted, in tests/test_layout.py via the FileSourceScan's row-count
metric: a point predicate over the clustered layout reads a small
fraction of the rows the unclustered layout reads.

This composes with (not replaces) directory partitioning: partition
by the coarse key (date), cluster by the fine key (user) within.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def scan_rows_read(spark: SparkSession, df: DataFrame) -> int:
    """Execute ``df`` and return rows the parquet scan actually
    produced after row-group pruning + pushed filters (the
    FileSourceScan metric — the number a layout change moves)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    # walk the executed plan for the scan node's numOutputRows metric
    nodes = [plan]
    total = 0
    while nodes:
        node = nodes.pop()
        name = node.nodeName()
        if "Scan" in name and "parquet" in node.toString().lower():
            metric = node.metrics().get("numOutputRows")
            if not metric.isEmpty():
                total += metric.get().value()
        for i in range(node.children().size()):
            nodes.append(node.children().apply(i))
    return total
