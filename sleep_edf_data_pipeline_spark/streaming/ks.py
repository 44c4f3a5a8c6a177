"""Streaming two-sample KS monitor (foreachBatch histogram fold).

The streaming face of ``queries/drift_stats.q_ks_two_sample``,
completing the batch/stream twin pattern (sessions, dedup, heavy
hitters, MV maintenance, PSI drift, CUSUM).  Each micro-batch of
documents is reduced to its two-source (len, ca, cb) length-histogram
partial — a map-side-combinable exact count — and folded into a
versioned state table; the monitor answers the EXACT
Kolmogorov–Smirnov statistic between the two sources on demand from
the folded state.

State is bounded by the VALUE DOMAIN (distinct doc lengths of the two
watched sources), never the stream.  The fold is algebraic (sum of
BIGINT counts), so the state after any prefix of micro-batches is
bit-identical to the batch pair histogram over the union of those
batches, regardless of micro-batching — the equivalence the tests pin:
``ks(spark)`` from state equals ``ks_from_pair`` over the union, row
for row (both run the same shared tail, including the digit-bucketed
cumulative).  At-least-once re-delivery is guarded by batch id, the
same contract as streaming/incremental.py and streaming/drift.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.drift_stats import KS_A, KS_B, ks_from_pair, pair_hist
from ..writers.versioned import commit_versioned, read_versioned, vacuum
from .restart import RestartableMonitor, stamp, unstamp


def pair_hist_partial(
    docs: DataFrame, a: str = KS_A, b: str = KS_B
) -> DataFrame:
    """(len, ca, cb) partial of a document micro-batch."""
    hist = docs.groupBy("source", F.col("n_chars").alias("len")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    return pair_hist(hist, a, b)


#: Snapshot-vacuum cadence (see streaming/occupancy.py).
_VACUUM_EVERY = 8


class StreamingKSMonitor(RestartableMonitor):
    """foreachBatch sink folding the two-source length histogram."""

    def __init__(self, path: str, a: str = KS_A, b: str = KS_B):
        self.path = path
        self.a = a
        self.b = b
        self.version: int | None = None
        self.last_batch_id: int | None = None
        self._commits = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``)."""
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: folding twice would double-count
        partial = pair_hist_partial(batch_df, self.a, self.b)
        if self.version is None:
            self.version = commit_versioned(stamp(partial, batch_id), self.path, None)
        else:
            prev = unstamp(read_versioned(batch_df.sparkSession, self.path, self.version))
            merged = (
                prev.unionByName(partial)
                .groupBy("len")
                .agg(
                    F.sum("ca").cast("bigint").alias("ca"),
                    F.sum("cb").cast("bigint").alias("cb"),
                )
            )
            self.version = commit_versioned(stamp(merged, batch_id), self.path, self.version)
        self.last_batch_id = batch_id
        self._commits += 1
        if self._commits % _VACUUM_EVERY == 0:
            # each commit rewrites the full histogram; without a sweep
            # the state dir grows O(batches) — keep only the newest
            vacuum(self.path, keep_last=1)

    def pair(self, spark: SparkSession) -> DataFrame:
        """The folded (len, ca, cb) state."""
        return unstamp(read_versioned(spark, self.path, self.version))

    def ks(self, spark: SparkSession) -> DataFrame:
        """Exact KS statistic from the folded state — same tail (and
        same digit-bucketed cumulative) as the batch query."""
        return ks_from_pair(self.pair(spark))

    def state(self) -> tuple[int | None, int | None]:
        """Snapshot hook for restart-safe deployments."""
        return self.version, self.last_batch_id
