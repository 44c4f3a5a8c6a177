"""Streaming incremental materialized-view maintenance (foreachBatch).

The streaming face of plans/incremental.py, completing the engine's
batch/stream twin pattern (sessions, dedup, OHLC, heavy hitters): each
micro-batch contributes its ALGEBRAIC partial aggregate, folded into
the stored summary by re-aggregation — so per batch the engine scans
only the delta plus the |groups|-sized stored partial, never the
accumulated fact history.  This is exactly Delta Live Tables-style
incremental aggregation expressed with the engine's own primitives.

Storage is the versioned table (writers/versioned.py): every refresh
is an atomic CAS commit, readers get snapshot isolation, and a crashed
refresh is invisible.  Restart safety: foreachBatch delivers each
batch id at-least-once; re-delivery of an already-folded batch would
double-count, so the maintainer skips ``batch_id <= last applied``.
The in-memory guard covers in-run retries; a restart-safe deployment
persists ``state()`` (version, last batch id — a few bytes) next to
the sink checkpoint, same contract as StreamingHeavyHitters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.incremental import (
    finish_order_summary,
    merge_partials,
    order_summary_partial,
)
from ..writers.versioned import commit_versioned, read_versioned
from .restart import RestartableMonitor, stamp, unstamp

_MERGE_KW = dict(
    keys=["o_custkey"],
    sum_cols=["n_orders", "spend"],
    max_cols=["max_price", "last_order"],
    min_cols=["min_price"],
)


class StreamingOrderSummary(RestartableMonitor):
    """foreachBatch sink folding per-batch partials into a stored MV."""

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``)."""
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # at-least-once re-delivery; folding twice double-counts
        partial = order_summary_partial(batch_df)
        if self.version is None:
            self.version = commit_versioned(stamp(partial, batch_id), self.path, None)
        else:
            stored = unstamp(read_versioned(
                batch_df.sparkSession, self.path, self.version
            ))
            merged = merge_partials([stored, partial], **_MERGE_KW)
            self.version = commit_versioned(stamp(merged, batch_id), self.path, self.version)
        self.last_batch_id = batch_id

    def state(self) -> tuple[int | None, int | None]:
        """Snapshot hook for restart-safe deployments."""
        return self.version, self.last_batch_id

    def summary(self, spark: SparkSession) -> DataFrame:
        """The served view: derived measures over the stored partial."""
        return finish_order_summary(unstamp(read_versioned(spark, self.path)))
