"""Streaming winnowing-fingerprint monitor (foreachBatch fold).

The streaming face of ``queries/winnowing.q_winnowing_source_stats`` —
the near-dup index-sizing profile (fingerprints contributed per
source, selection density) kept live over a corpus arriving as a
stream (crawl output).

Winnowing selection is DOC-LOCAL (a per-doc window over that doc's
gram hashes), so with the stream at document grain — each document
arrives whole inside one micro-batch, the same contract as the
readability/line monitors — the per-source state is already algebraic:
BIGINT sums of per-doc (grams, windows, fingerprints) counts
(``queries/winnowing.winnowing_partials``).  Any micro-batching, in
any arrival order, folds to exactly the batch frame, and answers run
through the batch query's own presentation tail
(``stats_from_partials``): bit-identical to batch over the union of
batches — the equivalence the tests pin.

State is one row per source; snapshots are trivially small;
at-least-once re-delivery is guarded by batch id (persisted inside the
committed snapshot via the fleet-wide ``RestartableMonitor`` mixin);
snapshots are vacuumed every ``_VACUUM_EVERY`` commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.winnowing import stats_from_partials, winnowing_partials
from ..writers.versioned import commit_versioned, read_versioned, vacuum
from .restart import RestartableMonitor, stamp, unstamp

#: Snapshot-vacuum cadence (see streaming/occupancy.py).
_VACUUM_EVERY = 8

_SUM_COLS = ("n_docs", "n_grams", "n_windows", "n_fingerprints")


class StreamingWinnowingMonitor(RestartableMonitor):
    """foreachBatch sink folding per-source winnowing partial sums."""

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None
        self._commits = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``).

        ``batch_df`` carries WHOLE documents with at least ``doc_id``,
        ``source`` and ``text`` columns (doc-grain stream — a document
        split across batches would winnow each fragment separately).
        """
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: folding twice would double-count
        partial = winnowing_partials(
            batch_df.select("doc_id", "source", "text")
        )
        if self.version is None:
            self.version = commit_versioned(
                stamp(partial, batch_id), self.path, None
            )
        else:
            prev = unstamp(
                read_versioned(batch_df.sparkSession, self.path, self.version)
            )
            merged = (
                prev.unionByName(partial)
                .groupBy("source")
                .agg(
                    *[F.sum(c).cast("bigint").alias(c) for c in _SUM_COLS]
                )
            )
            self.version = commit_versioned(
                stamp(merged, batch_id), self.path, self.version
            )
        self.last_batch_id = batch_id
        self._commits += 1
        if self._commits % _VACUUM_EVERY == 0:
            # each commit rewrites the (tiny) grid; keep only the newest
            vacuum(self.path, keep_last=1)

    def grid(self, spark: SparkSession) -> DataFrame:
        """The folded per-source partial-sum state."""
        return unstamp(read_versioned(spark, self.path, self.version))

    def stats(self, spark: SparkSession) -> DataFrame:
        """Per-source fingerprint profile from state — same shared
        tail as the batch query."""
        return stats_from_partials(self.grid(spark))

    def state(self) -> tuple[int | None, int | None]:
        """Snapshot hook for restart-safe deployments."""
        return self.version, self.last_batch_id
