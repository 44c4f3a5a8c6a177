"""Streaming occupancy monitor (foreachBatch netted-delta fold).

The streaming face of ``queries/occupancy.q_peak_concurrent_sessions``,
completing the batch→stream pairing for the round-7 interval-analytics
class the way dedup, CUSUM, KS, BPE, and embedding drift already pair.

The monitor consumes SESSION rows — the closed sessions a streaming
sessionizer emits (streaming/sessions.py; watermark-closed
``F.session_window`` output has exactly this schema) — NOT raw events:
sessionization across micro-batch boundaries is the sessionizer's
concern, and feeding closed sessions keeps the fold algebraic.  Each
micro-batch of sessions reduces to its (t, net) netted boundary-delta
grid (order-free BIGINT sums); grids fold by summing per timestamp, so
the state after any prefix of micro-batches is bit-identical to the
batch grid over the union of those batches, regardless of
micro-batching — the equivalence the tests pin: ``peaks(spark)`` from
state equals the batch query row for row (both run the same
``peak_from_net`` shared tail).

State is bounded by distinct boundary timestamps — by the CALENDAR at
any fixed time resolution, never by the stream.  At-least-once
re-delivery is guarded by batch id, the same contract as
streaming/incremental.py and streaming/ks.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.occupancy import net_grid, peak_from_net
from ..writers.versioned import commit_versioned, read_versioned, vacuum
from .restart import RestartableMonitor, stamp, unstamp

#: Snapshot-vacuum cadence: every N commits, drop all but the newest
#: snapshot.  Each commit rewrites the full grid, so without vacuuming
#: the state directory grows O(batches × grid size) over a long-running
#: stream (ADVICE r8); the newest snapshot is all a restart needs.
_VACUUM_EVERY = 8


class StreamingOccupancyMonitor(RestartableMonitor):
    """foreachBatch sink folding the netted boundary-delta grid."""

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None
        self._commits = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``).

        ``batch_df`` carries closed session rows with at least
        ``session_start`` / ``session_end`` columns.
        """
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: folding twice would double-count
        partial = net_grid(batch_df).select("t", "net")
        if self.version is None:
            self.version = commit_versioned(stamp(partial, batch_id), self.path, None)
        else:
            prev = unstamp(read_versioned(
                batch_df.sparkSession, self.path, self.version
            )).select("t", "net")
            merged = (
                prev.unionByName(partial)
                .groupBy("t")
                .agg(F.sum("net").cast("bigint").alias("net"))
            )
            self.version = commit_versioned(stamp(merged, batch_id), self.path, self.version)
        self.last_batch_id = batch_id
        self._commits += 1
        if self._commits % _VACUUM_EVERY == 0:
            # safe mid-stream: this monitor is the directory's only
            # reader and always reads self.version (the newest)
            vacuum(self.path, keep_last=1)

    def grid(self, spark: SparkSession) -> DataFrame:
        """The folded (t, net, day, hour) state."""
        return (
            unstamp(read_versioned(spark, self.path, self.version))
            .select("t", "net")
            .withColumn("day", F.to_date("t"))
            .withColumn("hour", F.hour("t"))
        )

    def peaks(self, spark: SparkSession) -> DataFrame:
        """Hourly peak concurrency from the folded state — same shared
        tail as the batch query."""
        return peak_from_net(self.grid(spark))

    def state(self) -> tuple[int | None, int | None]:
        """Snapshot hook for restart-safe deployments."""
        return self.version, self.last_batch_id
