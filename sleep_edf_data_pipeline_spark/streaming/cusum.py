"""Streaming CUSUM change-point monitor (foreachBatch partial fold).

The streaming face of ``queries/drift_stats.q_cusum_changepoint``,
completing the batch/stream twin pattern the engine uses for sessions,
dedup, heavy hitters, MV maintenance, and PSI drift.  Each micro-batch
of events is reduced to its (event_type, day) CUSUM partials —
map-side-combinable exact integers — and folded into a versioned state
table; the monitor answers "where did this series shift?" on demand
from the folded state at day resolution.

State is bounded by the VALUE DOMAIN (types × days), never the stream.
The fold is algebraic (sum of int128 partials), so the state after any
prefix of micro-batches is bit-identical to the batch
``cusum_day_partials`` over the union of those batches, regardless of
micro-batching — the equivalence the tests pin.  At-least-once
re-delivery is guarded by batch id, the same contract as
streaming/incremental.py and streaming/drift.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.drift_stats import (
    cusum_day_changepoint,
    cusum_day_partials,
    quantize_events,
)
from ..writers.versioned import commit_versioned, read_versioned
from .restart import RestartableMonitor, stamp, unstamp


class StreamingCusumMonitor(RestartableMonitor):
    """foreachBatch sink folding CUSUM day-partials into versioned state."""

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``)."""
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: folding twice would double-count
        partials = cusum_day_partials(quantize_events(batch_df))
        if self.version is None:
            self.version = commit_versioned(stamp(partials, batch_id), self.path, None)
        else:
            prev = unstamp(read_versioned(batch_df.sparkSession, self.path, self.version))
            merged = (
                prev.unionByName(partials)
                .groupBy("event_type", "day")
                .agg(
                    F.sum("bsum").cast("decimal(38,0)").alias("bsum"),
                    F.sum("bcnt").cast("decimal(38,0)").alias("bcnt"),
                )
            )
            self.version = commit_versioned(stamp(merged, batch_id), self.path, self.version)
        self.last_batch_id = batch_id

    def partials(self, spark: SparkSession) -> DataFrame:
        """The folded (event_type, day, bsum, bcnt) state."""
        return unstamp(read_versioned(spark, self.path, self.version))

    def changepoint(self, spark: SparkSession) -> DataFrame:
        """Day-resolution change point per type from the folded state."""
        return cusum_day_changepoint(self.partials(spark))

    def state(self) -> tuple[int | None, int | None]:
        """Snapshot hook for restart-safe deployments."""
        return self.version, self.last_batch_id
