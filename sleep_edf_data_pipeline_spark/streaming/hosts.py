"""Streaming per-host crawl-audit monitor (foreachBatch state fold).

The streaming face of ``queries/url_dedup.q_host_dedup_profile``
(VERDICT r8 item 5), completing the batch→stream pairing the way
dedup, CUSUM, KS, BPE, embedding drift, and occupancy already pair:
a crawl stream folds per-host partials per micro-batch and the domain
table is answered from state at any time.

The non-algebraic piece of the batch profile is
``countDistinct(canonical_url)`` per host.  The fold becomes algebraic
by keeping state at the **(host, canonical_url) grain** — the same
state discipline as exact streaming dedup (streaming/dedup.py), whose
state is the distinct-key set by construction: per micro-batch, reduce
arrivals to (host, cu) partial counts; merge into state by summing.
``n_canonical_urls`` is then ``count(*)`` of state rows per host —
exact, order-free, micro-batching-invariant — and the profile runs
through the batch query's OWN tail (``profile_from_per``), so the
monitor's answer is bit-identical to the batch query over the union
of batches (the equivalence the tests pin).

State is bounded by the number of distinct (host, canonical URL)
pairs — the crawl frontier, exactly what the batch audit must also
hold in its shuffle — never by the stream length.  At-least-once
re-delivery is guarded by batch id; snapshots are vacuumed every
``_VACUUM_EVERY`` commits (ADVICE r8 posture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.url_dedup import profile_from_per, with_canonical_host
from ..writers.versioned import commit_versioned, read_versioned, vacuum
from .restart import RestartableMonitor, stamp, unstamp

#: Snapshot-vacuum cadence (see streaming/occupancy.py).
_VACUUM_EVERY = 8


class StreamingHostAuditMonitor(RestartableMonitor):
    """foreachBatch sink folding (host, canonical_url) crawl state."""

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None
        self._commits = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``).

        ``batch_df`` carries crawl records with at least ``url`` and
        ``n_chars`` columns (a raw URL per document, as a crawl
        frontier emits).
        """
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: folding twice would double-count
        partial = (
            with_canonical_host(batch_df)
            .groupBy("host", "cu")
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("n_chars"),
            )
        )
        if self.version is None:
            self.version = commit_versioned(stamp(partial, batch_id), self.path, None)
        else:
            prev = unstamp(read_versioned(
                batch_df.sparkSession, self.path, self.version
            ))
            merged = (
                prev.unionByName(partial)
                .groupBy("host", "cu")
                .agg(
                    F.sum("n_docs").cast("bigint").alias("n_docs"),
                    F.sum("n_chars").cast("bigint").alias("n_chars"),
                )
            )
            self.version = commit_versioned(stamp(merged, batch_id), self.path, self.version)
        self.last_batch_id = batch_id
        self._commits += 1
        if self._commits % _VACUUM_EVERY == 0:
            # each commit rewrites the full grid; keep only the newest
            vacuum(self.path, keep_last=1)

    def grid(self, spark: SparkSession) -> DataFrame:
        """The folded (host, cu, n_docs, n_chars) state."""
        return unstamp(read_versioned(spark, self.path, self.version))

    def profile(self, spark: SparkSession) -> DataFrame:
        """The domain table from state — same shared tail as the batch
        query, with ``countDistinct`` reduced to counting state rows."""
        per = self.grid(spark).groupBy("host").agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_canonical_urls"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        return profile_from_per(per)

    def state(self) -> tuple[int | None, int | None]:
        """Snapshot hook for restart-safe deployments."""
        return self.version, self.last_batch_id
