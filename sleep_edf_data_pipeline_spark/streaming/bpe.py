"""Streaming tokenizer monitor (foreachBatch vocabulary fold).

The streaming face of ``queries/tokenizer_apply.q_bpe_encode_stats``,
completing train→apply→continuous-admission for the tokenizer family
the way dedup and the drift axes already pair batch with stream.  Each
micro-batch of documents is reduced to its (source, tok, freq)
vocabulary partial — a map-side-combinable exact count — and folded
into a versioned state table; the monitor answers BOTH halves on
demand from the folded state: the trained merge table (re-derived from
the grid, identical algebra to ``bpe_merge_pairs``) and the per-source
encode statistics under it.

State is bounded by the VOCABULARY — Heaps-law sublinear in the
corpus, never the stream.  (A production deployment that must hard-cap
state would swap the exact fold for the bounded Space-Saving summary
``streaming/heavy_hitters.py`` already implements; the exact fold here
keeps the monitor oracle-comparable.)  The fold is algebraic (sum of
BIGINT counts), so the state after any prefix of micro-batches is
bit-identical to the batch vocabulary over the union of those batches,
regardless of micro-batching — the equivalence the tests pin:
``encode_stats(spark)`` from state equals the batch query row for row
(both run the same shared tail).  At-least-once re-delivery is guarded
by batch id, the same contract as streaming/incremental.py and
streaming/ks.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.tokenizer_apply import encode_stats_from_vocab, source_vocab
from ..writers.versioned import commit_versioned, read_versioned
from .restart import RestartableMonitor, stamp, unstamp


class StreamingVocabMonitor(RestartableMonitor):
    """foreachBatch sink folding the (source, tok) vocabulary grid."""

    def __init__(self, path: str):
        self.path = path
        self.version: int | None = None
        self.last_batch_id: int | None = None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass to ``.foreachBatch``)."""
        if self.last_batch_id is not None and batch_id <= self.last_batch_id:
            return  # re-delivered batch: folding twice would double-count
        partial = source_vocab(batch_df)
        if self.version is None:
            self.version = commit_versioned(stamp(partial, batch_id), self.path, None)
        else:
            prev = unstamp(read_versioned(batch_df.sparkSession, self.path, self.version))
            merged = (
                prev.unionByName(partial)
                .groupBy("source", "tok")
                .agg(F.sum("freq").cast("bigint").alias("freq"))
            )
            self.version = commit_versioned(stamp(merged, batch_id), self.path, self.version)
        self.last_batch_id = batch_id

    def vocab(self, spark: SparkSession) -> DataFrame:
        """The folded (source, tok, freq) state."""
        return unstamp(read_versioned(spark, self.path, self.version))

    def encode_stats(self, spark: SparkSession) -> DataFrame:
        """Train + apply from the folded state — same shared tail as
        the batch query (merge table re-derived from the grid).

        The tail persists the vocabulary grid (its input plan);
        materialize the per-source result into a local checkpoint and
        unpersist through this handle so repeated answers on a
        long-lived monitor leave no cached partitions (the
        chi2-monitor ADVICE fix, applied family-wide in r10)."""
        vocab = self.vocab(spark)
        out = encode_stats_from_vocab(vocab).localCheckpoint(eager=True)
        vocab.unpersist()
        return out

    def state(self) -> tuple[int | None, int | None]:
        """Snapshot hook for restart-safe deployments."""
        return self.version, self.last_batch_id
