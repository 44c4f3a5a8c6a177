"""Streaming chi-squared drift monitor (foreachBatch histogram fold).

The streaming face of ``queries/chi2_drift.q_chi2_drift_by_source``.
Bucketing needs the FINAL corpus min/max, so the folded state is the
value-grain histogram ``(source, x, c)`` — counts sum (algebraic) and
the bucket boundaries derive from the state at ANSWER time, exactly
like the batch query derives them from the full corpus.  Any
micro-batching of document rows, in any order, folds to the batch
histogram, and the test statistic runs through the batch query's own
tail (``chi2_from_histogram``): bit-identical to batch over the union
of batches, the equivalence the tests pin.

This is the same state discipline as the PSI drift monitor
(``streaming/drift.py``): keep the reduced histogram, never the data
— state size is sources × distinct feature values.  At-least-once
re-delivery is guarded by batch id; snapshots vacuumed every
``_VACUUM_EVERY`` commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.chi2_drift import chi2_histogram, chi2_tail
from ..writers.versioned import commit_versioned, read_versioned, vacuum
from .restart import RestartableMonitor, stamp, unstamp

#: Snapshot-vacuum cadence (see streaming/occupancy.py).
_VACUUM_EVERY = 8


class StreamingChi2Monitor(RestartableMonitor):
    """foreachBatch sink folding the (source, x) count histogram."""

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None
        self._commits = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``).

        ``batch_df`` carries document rows with at least ``source``
        and ``n_chars`` columns.
        """
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: folding twice would double-count
        partial = chi2_histogram(
            batch_df.select(
                "source", F.col("n_chars").cast("bigint").alias("x")
            )
        )
        if self.version is None:
            self.version = commit_versioned(stamp(partial, batch_id), self.path, None)
        else:
            prev = unstamp(read_versioned(
                batch_df.sparkSession, self.path, self.version
            ))
            merged = (
                prev.unionByName(partial)
                .groupBy("source", "x")
                .agg(F.sum("c").cast("bigint").alias("c"))
            )
            self.version = commit_versioned(stamp(merged, batch_id), self.path, self.version)
        self.last_batch_id = batch_id
        self._commits += 1
        if self._commits % _VACUUM_EVERY == 0:
            # each commit rewrites the histogram; keep only the newest
            vacuum(self.path, keep_last=1)

    def grid(self, spark: SparkSession) -> DataFrame:
        """The folded (source, x, c) histogram state."""
        return unstamp(read_versioned(spark, self.path, self.version))

    def chi2(self, spark: SparkSession) -> DataFrame:
        """Per-source chi-squared from state — same shared tail as the
        batch query (buckets derived from the state's min/max, exactly
        as batch derives them from the corpus).

        The tail persists a reduced intermediate; a long-lived monitor
        answers repeatedly, so the batch posture of "caller clears
        caches between queries" does not apply here.  Materialize the
        (tiny, per-source) statistic into a local checkpoint, then
        unpersist the intermediate — repeated ``chi2()`` calls leave
        no cached partitions behind.
        """
        result, o = chi2_tail(self.grid(spark))
        out = result.localCheckpoint(eager=True)
        o.unpersist()
        return out

    def state(self) -> tuple[int | None, int | None]:
        """Snapshot hook for restart-safe deployments."""
        return self.version, self.last_batch_id
