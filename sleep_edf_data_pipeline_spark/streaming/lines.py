"""Streaming line-dedup monitor (foreachBatch algebraic-grain fold).

The streaming face of ``queries/line_dedup.q_line_dedup_stats`` — a
corpus arriving as a stream (crawl output) with the C4-style
duplicate-line retention profile answerable at any time.

The batch survivor rule (globally first occurrence by (doc_id,
seg_idx)) looks order-dependent, but the state that determines it is
not: at the **(line_hash, doc_id) grain** every column is an algebraic
fold — ``occ`` sums, ``min_idx`` mins, ``len`` is constant per hash —
so partials from any micro-batching of whole document rows (any
arrival ORDER, any batch boundaries) merge to exactly the batch
query's reduced frame, and the profile runs through the batch
query's own tail (``retention_from_partials``).  Answers are
bit-identical to batch over the union of batches — the equivalence
the tests pin — with no ordered-replay requirement, the same
order-free posture as the occupancy/KS/host monitors.

State is bounded by distinct (line, document) pairs — what the batch
shuffle must also hold; the heavy reduction (segment, hash, map-side
combine) happens per micro-batch, so the text itself is never kept.
At-least-once re-delivery is guarded by batch id; snapshots vacuumed
every ``_VACUUM_EVERY`` commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.line_dedup import line_grain_partials, retention_from_partials
from ..writers.versioned import commit_versioned, read_versioned, vacuum
from .restart import RestartableMonitor, stamp, unstamp

#: Snapshot-vacuum cadence (see streaming/occupancy.py).
_VACUUM_EVERY = 8


class StreamingLineDedupMonitor(RestartableMonitor):
    """foreachBatch sink folding (line_hash, doc_id) retention state."""

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None
        self._commits = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``).

        ``batch_df`` carries document rows with at least ``doc_id``
        and ``text`` columns.
        """
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: folding twice would double-count
        partial = line_grain_partials(batch_df.select("doc_id", "text"))
        if self.version is None:
            self.version = commit_versioned(stamp(partial, batch_id), self.path, None)
        else:
            prev = unstamp(read_versioned(
                batch_df.sparkSession, self.path, self.version
            ))
            merged = (
                prev.unionByName(partial)
                .groupBy("line_hash", "doc_id")
                .agg(
                    F.sum("occ").cast("bigint").alias("occ"),
                    F.min("min_idx").alias("min_idx"),
                    F.max("len").alias("len"),
                )
            )
            self.version = commit_versioned(stamp(merged, batch_id), self.path, self.version)
        self.last_batch_id = batch_id
        self._commits += 1
        if self._commits % _VACUUM_EVERY == 0:
            # each commit rewrites the full grain; keep only the newest
            vacuum(self.path, keep_last=1)

    def grid(self, spark: SparkSession) -> DataFrame:
        """The folded (line_hash, doc_id, occ, min_idx, len) state."""
        return unstamp(read_versioned(spark, self.path, self.version))

    def retention(self, spark: SparkSession) -> DataFrame:
        """Per-document retention profile from state — same shared
        tail as the batch query."""
        return retention_from_partials(self.grid(spark))

    def state(self) -> tuple[int | None, int | None]:
        """Snapshot hook for restart-safe deployments."""
        return self.version, self.last_batch_id
