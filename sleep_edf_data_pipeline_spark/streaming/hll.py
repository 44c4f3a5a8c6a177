"""Streaming HLL distinct-rollup monitor (foreachBatch sketch fold).

The streaming face of ``queries/hll_rollup``: the per-day HLL states
are MERGEABLE (Datasketches HLL union takes the register-wise max —
commutative and associative), so folding per-batch (day, sk) partials
with ``hll_union_agg`` over ANY micro-batching of the event stream
yields a state whose REGISTER CONTENT equals the batch sketch's.

The equivalence contract is MEASURED, not assumed — the naive
"identical estimates" claim is false at scale.  Register content
equals batch under any micro-batching, but Datasketches keeps a HIP
(historical inverse probability) estimator only on sketches that were
never merged: a day whose items all arrived in one micro-batch — or a
union window holding a SINGLE direct sketch, which Datasketches
copies wholesale, HIP included — estimates via HIP on the batch side
and via the composite estimator on the fold side.  Two valid
estimators of identical registers differ by ~1% at lgK=12 (measured
max 1.4% on sf0.1).  The pinned contract is therefore: every
day/cumulative estimate within 3·rsd of the batch twin's (both are
within the sketch's accuracy of the EXACT count), with EXACT equality
whenever the replay keeps whole days inside single micro-batches —
then every fold state is either direct or a union-of-one (which
copies the input wholesale, HIP included), so both sides run the
same estimator over the same registers (pinned at sf0.1 in the
order-free replay test; the cross-batch-day test pins the 3·rsd tier).

Unlike the integer-histogram monitors (chi2/PSI/DDSketch/winsorize),
byte-level state equality is also NOT pinned: serialized form can
differ by merge order (sparse→dense promotion timing).

Same state discipline as the sibling monitors: the folded state is
the days-sized (day, sk) frame, never the events; the at-least-once
re-delivery guard rides inside each committed snapshot as a constant
``_last_batch_id`` column (restart-rehydrated via :meth:`attach`,
ADVICE r10); snapshots vacuumed every ``_VACUUM_EVERY`` commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.hll_rollup import HLL_LGK
from ..writers.versioned import commit_versioned, read_versioned, vacuum
from .restart import RestartableMonitor, stamp, unstamp

#: Snapshot-vacuum cadence (see streaming/occupancy.py).
_VACUUM_EVERY = 8


class StreamingDistinctMonitor(RestartableMonitor):
    """foreachBatch sink folding per-day HLL sketches + event counts."""

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None
        self._commits = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``).

        ``batch_df`` carries ``day`` (date) and ``user_id`` columns
        (pre-projected by the caller, e.g. ``to_date(ts)``).
        """
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: double-folding inflates counts
        partial = batch_df.groupBy("day").agg(
            F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        if self.version is None:
            merged = partial
        else:
            prev = unstamp(read_versioned(
                batch_df.sparkSession, self.path, self.version
            ))
            merged = (
                prev.unionByName(partial)
                .groupBy("day")
                .agg(
                    # all partials share HLL_LGK (hll_union_agg's 2nd
                    # arg is allowDifferentLgConfigK, not lgK)
                    F.hll_union_agg("sk").alias("sk"),
                    F.sum("n_events").cast("bigint").alias("n_events"),
                )
            )
        self.version = commit_versioned(
            stamp(merged, batch_id), self.path, self.version
        )
        self.last_batch_id = batch_id
        self._commits += 1
        if self._commits % _VACUUM_EVERY == 0:
            # each commit rewrites the days-sized state; keep the newest
            vacuum(self.path, keep_last=1)

    def sketches(self, spark: SparkSession) -> DataFrame:
        """The folded (day, sk, n_events) state."""
        return unstamp(read_versioned(spark, self.path, self.version))

    def rollup(self, spark: SparkSession) -> DataFrame:
        """Answer the daily + cumulative distinct estimates from state
        — the batch query's own tail (ordered union window over the
        ≤days frame).  Estimates are within 3·rsd of the batch twin's,
        exactly equal when whole days stayed inside single
        micro-batches — see the module contract."""
        from pyspark.sql import Window

        w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        return (
            self.sketches(spark)
            .select(
                "day",
                "n_events",
                F.hll_sketch_estimate("sk")
                .cast("bigint")
                .alias("est_day_users"),
                F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
                .cast("bigint")
                .alias("est_cum_users"),
            )
            .localCheckpoint(eager=True)
        )

    def state(self) -> tuple[int | None, int | None]:
        """(version, last_batch_id) snapshot — informational; restarts
        rehydrate via :meth:`attach`."""
        return self.version, self.last_batch_id
