"""Streaming winsorized-stats monitor (foreachBatch histogram fold).

The streaming face of ``queries/winsorize.q_winsorized_price_stats``:
the thresholds are exact order statistics over the FULL stream so
far, so the folded state is the (grp, cents, c) value-grain histogram
— counts sum (algebraic), and the threshold + clipped-mean tail runs
at ANSWER time through the batch query's own
``winsorized_from_histogram``, exactly as the chi2 and DDSketch
monitors derive their answers from state.  Any micro-batching, in any
order, folds to the batch histogram bit-for-bit, so the answered
statistics equal batch row for row (the equivalence the tests pin).

State size is groups × distinct price values — bounded by the value
DOMAIN (prices are 2-decimal cents), not the stream length.  Same
state discipline as the sibling monitors: batch-id re-delivery guard,
snapshot vacuum every ``_VACUUM_EVERY`` commits, and the answer path
materializes through a local checkpoint then unpersists the tail's
cached histogram so a long-lived monitor leaks no cached partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.winsorize import price_histogram, winsorized_from_histogram
from ..writers.versioned import commit_versioned, read_versioned, vacuum
from .restart import RestartableMonitor, stamp, unstamp

#: Snapshot-vacuum cadence (see streaming/occupancy.py).
_VACUUM_EVERY = 8


class StreamingWinsorMonitor(RestartableMonitor):
    """foreachBatch sink folding the (grp, cents) price histogram.

    Restart safety (ADVICE r10): the re-delivery guard rides inside
    each committed snapshot as a constant ``_last_batch_id`` column —
    see ``streaming/quantiles.py``; reattach with :meth:`attach`.
    """

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None
        self._commits = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``).

        ``batch_df`` carries rows with ``grp`` and exact-cent BIGINT
        ``cents`` columns (pre-projected by the caller).
        """
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: folding twice would double-count
        partial = price_histogram(batch_df.select("grp", "cents"))
        if self.version is None:
            merged = partial
        else:
            prev = unstamp(read_versioned(
                batch_df.sparkSession, self.path, self.version
            ))
            merged = (
                prev.unionByName(partial)
                .groupBy("grp", "cents")
                .agg(F.sum("c").cast("bigint").alias("c"))
            )
        self.version = commit_versioned(
            stamp(merged, batch_id), self.path, self.version
        )
        self.last_batch_id = batch_id
        self._commits += 1
        if self._commits % _VACUUM_EVERY == 0:
            # each commit rewrites the histogram; keep only the newest
            vacuum(self.path, keep_last=1)

    def histogram(self, spark: SparkSession) -> DataFrame:
        """The folded (grp, cents, c) histogram state."""
        return unstamp(read_versioned(spark, self.path, self.version))

    def winsorized(self, spark: SparkSession) -> DataFrame:
        """Answer the winsorized statistics from state via the batch
        tail; materialize + unpersist so repeated calls on a
        long-lived monitor leave no cached partitions behind."""
        hist = self.histogram(spark)
        out = winsorized_from_histogram(hist).localCheckpoint(eager=True)
        # the tail persisted this same histogram plan internally;
        # unpersisting through this handle clears that cache entry
        hist.unpersist()
        return out

    def state(self) -> tuple[int | None, int | None]:
        """(version, last_batch_id) snapshot — informational; restarts
        rehydrate via :meth:`attach`, which reads both from the
        committed snapshot itself."""
        return self.version, self.last_batch_id
