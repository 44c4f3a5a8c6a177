"""Incremental materialized-view maintenance via algebraic partial aggregates.

The engine's answer to "keep a 100 TB fact table's summary fresh
without re-scanning it": maintain the summary as ALGEBRAIC partials
(count / sum / min / max — anything whose merge is the same aggregate
over the partials), compute a partial over each newly-ingested delta
batch only, and fold it into the stored summary.  Derived measures
(avg, ratios) are never stored — they re-derive from the merged
partials at read time, so folding stays exact.

Scale shape: the delta partial is map-side combinable and sized by the
BATCH, not the table; the merge shuffles only grouped partial rows
(|groups|, not |facts|).  A full refresh re-scans everything; this
refresh is O(delta + groups).

This mirrors what Delta Live Tables / Materialize incremental views do
for re-aggregatable measures; non-algebraic measures (exact distinct,
medians) need sketch partials instead (see the HLL/KLL operators in
queries/extras.py for the engine's mergeable-sketch path).

Reference parity: the reference rebuilds its dbt summary models from
scratch every run (`/root/reference/warehouse/run_dbt.sh`); this module
is the incremental upgrade of that surface, not a port.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_partials(
    parts: Iterable[DataFrame],
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold partial-aggregate frames into one summary by re-aggregation.

    Every frame in ``parts`` must carry ``keys`` plus the measure
    columns; counts merge as ``sum`` of partial counts (list them in
    ``sum_cols``).  The union is by name, so partials may come from
    different snapshots/batches as long as schemas agree.
    """
    unioned = reduce(DataFrame.unionByName, list(parts))
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.max(c).alias(c) for c in max_cols]
        + [F.min(c).alias(c) for c in min_cols]
    )
    if not aggs:
        raise ValueError("merge_partials needs at least one measure column")
    return unioned.groupBy(*keys).agg(*aggs)


def order_summary_partial(orders: DataFrame) -> DataFrame:
    """Per-customer algebraic partial over one batch of ``orders``.

    Spend accumulates in DECIMAL (order-free exact — the engine's
    standard float discipline); the partial's schema is its own merge
    schema, so ``merge_partials(..., sum_cols=["n_orders", "spend"],
    max_cols=["max_price", "last_order"], min_cols=["min_price"])``
    folds any number of batches.
    """
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(price).alias("spend"),
        F.max(price).alias("max_price"),
        F.min(price).alias("min_price"),
        F.max("o_orderdate").alias("last_order"),
    )


def finish_order_summary(merged: DataFrame) -> DataFrame:
    """Derive read-time measures from merged partials (exact, one pass)."""
    spend_d = F.col("spend").cast("double")
    n_d = F.col("n_orders").cast("double")
    return merged.select(
        "o_custkey",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        spend_d.alias("total_spend"),
        F.col("max_price").cast("double").alias("max_price"),
        F.col("min_price").cast("double").alias("min_price"),
        "last_order",
        (spend_d / n_d).alias("avg_spend"),
    )
