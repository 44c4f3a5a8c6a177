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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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


def _ge(v: Column):
    # closure factory: F.filter inspects lambda arity, and a
    # default-arg capture would receive the ARRAY INDEX as arg 2
    return lambda b: v >= b


def _buckets(
    df: DataFrame, cols: list[str], bits: int, rel_err: float
) -> list[Column]:
    """Equi-depth bucket ids (0 .. 2^bits − 1), one column per input.

    Boundaries come from ONE bounded ``approxQuantile`` pass over all
    columns together (cols × (2^bits − 1) doubles on the driver —
    layout metadata, scale-free, single input scan); the per-row bucket
    is a counting scan of the boundary array (JVM higher-order
    function, codegen).  Equi-depth (not min/max uniform) so skewed
    columns still spread across the z-curve.
    """
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    all_bounds = df.approxQuantile(cols, probs, rel_err)
    return [
        F.size(
            F.filter(
                F.array(*[F.lit(float(b)) for b in bounds]),
                _ge(F.col(col).cast("double")),
            )
        ).cast("bigint")
        for col, bounds in zip(cols, all_bounds)
    ]


def _morton(buckets: list[Column], bits: int) -> Column:
    """Interleave the bucket ids' bits (Morton / Z-curve order).

    Buckets must be BIGINT: interleave positions reach
    ``bits·n_cols − 1``, and 32-bit shifts wrap at 31 (Java shift
    semantics), which would alias high bits and corrupt the curve.
    """
    n = len(buckets)
    if bits * n > 63:
        raise ValueError(f"z-key needs {bits * n} bits; max 63 (signed long)")
    terms = [
        F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1).cast("bigint")), i * n + j
        )
        for i in range(bits)
        for j, b in enumerate(buckets)
    ]
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    bits: int = 8,
    n_files: int = 8,
    mode: str = "overwrite",
    rel_err: float = 0.001,
) -> None:
    """Write parquet Z-ORDER clustered on several columns at once.

    Range clustering (``write_clustered``) makes ONE column's row-group
    min/max tight; a second predicate column still spans everything.
    Z-ordering sorts by the bit-interleave of per-column equi-depth
    bucket ids, so every clustered column's min/max stays tight-ish in
    every row group — multi-dimensional data skipping, the same layout
    trick Delta's ``OPTIMIZE ZORDER BY`` applies.  Locality degrades
    with dimension count; 2-4 columns is the useful range.

    The whole computation is distributed: the only driver state is the
    boundary arrays (``cluster_cols × (2^bits − 1)`` doubles), and the
    write is the usual range shuffle + in-file sort on the z value.
    Measured (not asserted) in tests/test_layout.py: point predicates
    on EACH clustered column prune against a layout built once.
    """
    zcols = _buckets(df, cluster_cols, bits, rel_err)
    (
        df.withColumn("_z", _morton(zcols, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
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
