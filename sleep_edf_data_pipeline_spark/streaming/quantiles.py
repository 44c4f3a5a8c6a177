"""Streaming DDSketch quantile monitor (foreachBatch bucket fold).

The streaming face of ``queries/quantile_sketch`` — and the reason
DDSketch was chosen over Greenwald-Khanna for the streaming-state
story: GK compaction is order-sensitive, but the DDSketch merge is
exact integer addition per geometric bucket, so folding per-batch
(grp, bkt, c) partials over ANY micro-batching, in any order, yields
the bit-identical full-stream sketch, and every answered quantile
carries the same α relative-error contract as batch.  State size is
groups × log_γ(max/min) buckets — bounded by the value DOMAIN, not
the stream length.

Same state discipline as the chi2/PSI monitors: keep the reduced
histogram, never the data; at-least-once re-delivery guarded by batch
id; snapshots vacuumed every ``_VACUUM_EVERY`` commits; the answer
path materializes through a local checkpoint so repeated calls on a
long-lived monitor leave no cached partitions behind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.quantile_sketch import ddsketch_histogram, quantiles_from_sketch
from ..writers.versioned import commit_versioned, read_versioned, vacuum
from .restart import RestartableMonitor, stamp, unstamp

#: Snapshot-vacuum cadence (see streaming/occupancy.py).
_VACUUM_EVERY = 8


class StreamingQuantileMonitor(RestartableMonitor):
    """foreachBatch sink folding the (grp, bkt) DDSketch histogram.

    Restart safety (ADVICE r10): the at-least-once re-delivery guard
    (``last_batch_id``) rides INSIDE each committed snapshot as a
    constant ``_last_batch_id`` column, so it survives a process
    restart with the same atomicity as the histogram itself (one CAS
    commit covers both).  Reattach with :meth:`attach` — a fresh
    ``__init__`` against an existing path starts a NEW fold lineage
    and must use a fresh path.
    """

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None
        self._commits = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``).

        ``batch_df`` carries rows with ``grp`` and positive ``x``
        columns (pre-projected by the caller).
        """
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: folding twice would double-count
        partial = ddsketch_histogram(batch_df.select("grp", "x"))
        if self.version is None:
            merged = partial
        else:
            prev = unstamp(read_versioned(
                batch_df.sparkSession, self.path, self.version
            ))
            merged = (
                prev.unionByName(partial)
                .groupBy("grp", "bkt")
                .agg(F.sum("c").cast("bigint").alias("c"))
            )
        self.version = commit_versioned(
            stamp(merged, batch_id), self.path, self.version
        )
        self.last_batch_id = batch_id
        self._commits += 1
        if self._commits % _VACUUM_EVERY == 0:
            # each commit rewrites the sketch; keep only the newest
            vacuum(self.path, keep_last=1)

    def sketch(self, spark: SparkSession) -> DataFrame:
        """The folded (grp, bkt, c) sketch state."""
        return unstamp(read_versioned(spark, self.path, self.version))

    def quantiles(self, spark: SparkSession) -> DataFrame:
        """Answer the registered quantiles from state via the batch
        query's own tail — bit-identical to batch over the union of
        batches (the replay-equivalence tests pin this)."""
        return quantiles_from_sketch(self.sketch(spark)).localCheckpoint(
            eager=True
        )

    def state(self) -> tuple[int | None, int | None]:
        """(version, last_batch_id) snapshot — informational; restarts
        rehydrate via :meth:`attach`, which reads both from the
        committed snapshot itself."""
        return self.version, self.last_batch_id
