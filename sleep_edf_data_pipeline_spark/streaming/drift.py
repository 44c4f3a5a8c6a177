"""Streaming distribution-drift monitor (foreachBatch PSI gate).

The streaming face of queries/drift_stats.py, completing the engine's
batch/stream twin pattern: every micro-batch of documents is scored
against the accumulated REFERENCE length histogram BEFORE being folded
into it — the admission-time drift alarm a continuous-ingest corpus
pipeline needs (ship the alert, then update the reference).

State is the (len, c) histogram — bounded by the VALUE DOMAIN, not the
stream — stored as a versioned table (atomic CAS refresh, snapshot
isolation, same contract as streaming/incremental.py).  Folding is
algebraic (sum of counts), so the reference after any prefix of
batches is bit-identical to the batch histogram over the union of
those batches, regardless of micro-batching.  At-least-once
re-delivery is guarded by batch id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.drift_stats import psi_between
from ..writers.versioned import commit_versioned, read_versioned
from .restart import RestartableMonitor, stamp, unstamp


def length_hist(docs: DataFrame) -> DataFrame:
    """(len, c) histogram of a document batch — the algebraic partial."""
    return docs.groupBy(F.col("n_chars").alias("len")).agg(
        F.count("*").cast("bigint").alias("c")
    )


class StreamingDriftMonitor(RestartableMonitor):
    """foreachBatch sink: score each batch vs the reference, then fold."""

    def __init__(self, path: str, alert_threshold: float = 0.25):
        self.path = path
        self.alert_threshold = alert_threshold
        self.version: int | None = None
        self.last_batch_id: int | None = None
        #: (batch_id, psi, alerted) per processed batch; psi is None
        #: for the first batch (no reference exists yet).
        self.history: list[tuple[int, float | None, bool]] = []

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``)."""
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivery: scoring again is harmless, folding isn't
        spark = batch_df.sparkSession
        bh = length_hist(batch_df).persist()
        if self.version is None:
            psi = None
            self.version = commit_versioned(stamp(bh, batch_id), self.path, None)
        else:
            ref = unstamp(read_versioned(spark, self.path, self.version))
            psi = psi_between(ref, bh)
            merged = (
                ref.unionByName(bh)
                .groupBy("len")
                .agg(F.sum("c").cast("bigint").alias("c"))
            )
            self.version = commit_versioned(stamp(merged, batch_id), self.path, self.version)
        bh.unpersist()
        self.last_batch_id = batch_id
        self.history.append(
            (batch_id, psi, psi is not None and psi > self.alert_threshold)
        )

    def state(self) -> tuple[int | None, int | None]:
        """Snapshot hook for restart-safe deployments."""
        return self.version, self.last_batch_id

    def reference(self, spark: SparkSession) -> DataFrame:
        """The accumulated reference histogram (latest snapshot)."""
        return unstamp(read_versioned(spark, self.path))
