"""Restart-safe re-delivery guard shared by the versioned-state monitors.

ADVICE r10 found the gap on the round-10 monitors and round 11 fixed
it fleet-wide: every foreachBatch monitor guards against at-least-once
re-delivery with ``last_batch_id``, but driver memory does not survive
a process restart — after reattaching to the same Structured Streaming
checkpoint, a re-delivered batch would be folded twice.  The fix: the
guard rides INSIDE each committed snapshot as a constant
``_last_batch_id`` column, so it is persisted with the same atomicity
as the state itself (one CAS commit covers both), and :meth:`attach`
rehydrates ``(version, last_batch_id)`` from the snapshot on restart.

Usage inside a monitor's ``process_batch``::

    stamped = stamp(merged, batch_id)
    self.version = commit_versioned(stamped, self.path, self.version)

with ``prev``/state reads going through ``unstamp`` (or ``.drop``),
and the monitor class inheriting :class:`RestartableMonitor`.  The
column costs one BIGINT per state row; every monitor's state is
reduced (grid/histogram/vocab-sized), never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..writers.versioned import current_version, read_versioned

#: Snapshot column carrying the re-delivery guard.
GUARD_COL = "_last_batch_id"


def stamp(df: DataFrame, batch_id: int) -> DataFrame:
    """Attach the guard column (constant per snapshot)."""
    return df.withColumn(GUARD_COL, F.lit(batch_id).cast("bigint"))


def unstamp(df: DataFrame) -> DataFrame:
    """Remove the guard column from a state read."""
    return df.drop(GUARD_COL)


class RestartableMonitor:
    """Mixin: rehydrate the re-delivery guard from the committed
    snapshot.  Subclasses must expose ``path`` / ``version`` /
    ``last_batch_id`` attributes (the shared monitor shape) and accept
    ``path`` as the first ``__init__`` argument."""

    @classmethod
    def attach(cls, spark: SparkSession, path: str, **kwargs):
        """Reattach after a process restart: recover ``version`` and
        ``last_batch_id`` from the current snapshot so a re-delivered
        batch is still skipped instead of double-folded.  Extra
        ``kwargs`` pass through to ``__init__`` (monitor-specific
        parameters must match the original instance's)."""
        m = cls(path, **kwargs)
        m.version = current_version(path)
        if m.version is not None:
            snap = read_versioned(spark, path, m.version)
            # ADVICE r11: a pre-upgrade snapshot lacks the guard column
            # (AnalysisException on F.max), and an empty snapshot yields
            # max=NULL — both degrade to "no guard recovered"
            # (last_batch_id=None), i.e. the pre-round-11 behaviour of
            # trusting the checkpoint's replay, never a crash.
            if GUARD_COL in snap.columns:
                row = snap.agg(F.max(GUARD_COL).alias("b")).collect()[0]
                m.last_batch_id = None if row["b"] is None else int(row["b"])
        return m
