"""Streaming embedding-drift monitor (foreachBatch centroid-grid fold).

The streaming face of ``queries/embedding_drift.q_embedding_drift_by_label``,
closing the batch/stream twin pattern over the drift family's third
axis: PSI (streaming/drift.py), KS (streaming/ks.py), CUSUM
(streaming/cusum.py), and now embedding-space centroid shift.  Each
micro-batch of vectors is reduced to its (label, dim, s, n)
micro-quantized component-sum grid — map-side-combinable exact
BIGINTs — and folded into a versioned state table; the monitor answers
each label's centroid-vs-global cosine on demand from the folded
state.

State is bounded by |labels|×|dims|, never the stream.  The fold is
algebraic (sum of BIGINT component sums and counts), so the state
after any prefix of micro-batches is bit-identical to the batch grid
over the union of those batches, regardless of micro-batching — the
equivalence the tests pin: ``drift(spark)`` from state equals the
batch query row for row (both run the same shared tail).
At-least-once re-delivery is guarded by batch id, the same contract as
streaming/incremental.py and streaming/ks.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.embedding_drift import centroid_grid, drift_from_grid
from ..writers.versioned import commit_versioned, read_versioned
from .restart import RestartableMonitor, stamp, unstamp


class StreamingEmbeddingDriftMonitor(RestartableMonitor):
    """foreachBatch sink folding the (label, dim) centroid grid."""

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``)."""
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: folding twice would double-count
        partial = centroid_grid(batch_df)
        if self.version is None:
            self.version = commit_versioned(stamp(partial, batch_id), self.path, None)
        else:
            prev = unstamp(read_versioned(batch_df.sparkSession, self.path, self.version))
            merged = (
                prev.unionByName(partial)
                .groupBy("label", "dim")
                .agg(
                    F.sum("s").cast("bigint").alias("s"),
                    F.sum("n").cast("bigint").alias("n"),
                )
            )
            self.version = commit_versioned(stamp(merged, batch_id), self.path, self.version)
        self.last_batch_id = batch_id

    def grid(self, spark: SparkSession) -> DataFrame:
        """The folded (label, dim, s, n) state."""
        return unstamp(read_versioned(spark, self.path, self.version))

    def drift(self, spark: SparkSession) -> DataFrame:
        """Per-label centroid cosine vs global from the folded state —
        same shared tail as the batch query.

        The tail persists the grid (its input plan); a long-lived
        monitor answers repeatedly, so materialize the labels-sized
        result into a local checkpoint and unpersist through this
        handle — repeated calls leave no cached partitions (the
        chi2-monitor ADVICE fix, applied family-wide in r10)."""
        grid = self.grid(spark)
        out = drift_from_grid(grid).localCheckpoint(eager=True)
        grid.unpersist()
        return out

    def state(self) -> tuple[int | None, int | None]:
        """Snapshot hook for restart-safe deployments."""
        return self.version, self.last_batch_id
