"""Streaming readability monitor (foreachBatch algebraic-grain fold).

The streaming face of ``queries/readability.q_readability_scores`` —
quality triage over a corpus arriving as a stream (crawl output), the
per-source Flesch/FK/fog profile answerable at any time.

This is the cleanest possible instance of the repo's order-free fold
discipline (occupancy/KS/host/line monitors): the batch query's state
is ALREADY per-source partial sums — doc counts and BIGINT micro-unit
sums (``readability_partials``), one row per source — so the streaming
fold is a plain summation merge.  Any micro-batching of document rows,
in any arrival order, folds to exactly the batch frame, and answers
run through the batch query's own presentation tail
(``scores_from_partials``): bit-identical to batch over the union of
batches, the equivalence the tests pin.

State is one row per source (a handful), so snapshots are trivially
small; at-least-once re-delivery is guarded by batch id; snapshots are
vacuumed every ``_VACUUM_EVERY`` commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.readability import readability_partials, scores_from_partials
from ..writers.versioned import commit_versioned, read_versioned, vacuum
from .restart import RestartableMonitor, stamp, unstamp

#: Snapshot-vacuum cadence (see streaming/occupancy.py).
_VACUUM_EVERY = 8

_SUM_COLS = ("n_docs", "n_words", "wps_u", "spw_u", "flesch_u", "fk_u", "fog_u")


class StreamingReadabilityMonitor(RestartableMonitor):
    """foreachBatch sink folding per-source readability sums."""

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None
        self._commits = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``).

        ``batch_df`` carries document rows with at least ``source``
        and ``text`` columns.
        """
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: folding twice would double-count
        partial = readability_partials(batch_df.select("source", "text"))
        if self.version is None:
            self.version = commit_versioned(stamp(partial, batch_id), self.path, None)
        else:
            prev = unstamp(read_versioned(
                batch_df.sparkSession, self.path, self.version
            ))
            merged = (
                prev.unionByName(partial)
                .groupBy("source")
                .agg(
                    *[
                        F.sum(c).cast("bigint").alias(c)
                        for c in _SUM_COLS
                    ]
                )
            )
            self.version = commit_versioned(stamp(merged, batch_id), self.path, self.version)
        self.last_batch_id = batch_id
        self._commits += 1
        if self._commits % _VACUUM_EVERY == 0:
            # each commit rewrites the (tiny) grid; keep only the newest
            vacuum(self.path, keep_last=1)

    def grid(self, spark: SparkSession) -> DataFrame:
        """The folded per-source partial-sum state."""
        return unstamp(read_versioned(spark, self.path, self.version))

    def scores(self, spark: SparkSession) -> DataFrame:
        """Per-source readability profile from state — same shared
        tail as the batch query."""
        return scores_from_partials(self.grid(spark))

    def state(self) -> tuple[int | None, int | None]:
        """Snapshot hook for restart-safe deployments."""
        return self.version, self.last_batch_id
