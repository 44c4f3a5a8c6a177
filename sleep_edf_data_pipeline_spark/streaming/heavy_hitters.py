"""Streaming heavy hitters: a foreachBatch count-min-sketch accumulator.

The streaming counterpart of queries/heavy_hitters.py, completing the
batch/stream twin pattern the engine uses for sessions and dedup.
Each micro-batch contributes two BOUNDED summaries, computed
distributed and collected driver-side:

- its ``count_min_sketch`` bytes (one agg row, fixed ~1.1 MB), folded
  into the running sketch with :func:`functions.cms.merge_sketch_bytes`
  — CMS merge is exact integer addition, so the folded sketch is
  bit-identical to one sketch over the whole stream so far, regardless
  of how the stream was micro-batched;
- its per-partition Space-Saving candidates (≤ partitions × 64 ids),
  unioned into a candidate pool that is re-trimmed to
  ``max_candidates`` by current sketch estimate after every batch.

Total driver state is therefore fixed (one sketch + ≤ max_candidates
longs) for an unbounded stream — the property the batch CMS twin
exists for, carried into continuous ingest.  ``topk()`` is exactly the
batch probe: rank retained candidates by sketch estimate.

Durability: the accumulator is in-memory per run; a restart-safe
deployment snapshots ``sketch_bytes`` + ``candidates`` per committed
batch id next to the sink's checkpoint (both are small, and the merge
is idempotent per batch because batch ids are exactly-once in
foreachBatch).  The snapshot hook is exposed (``state()``) but not
wired to a store here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark.sql import functions as F

from ..functions.cms import CountMinSketchReader, merge_sketch_bytes
from ..queries.heavy_hitters import (
    CMS_CONFIDENCE,
    CMS_EPS,
    CMS_SEED,
    _space_saving_topk,
)


class StreamingHeavyHitters:
    """foreachBatch sink: fold per-batch CMS + candidates, serve top-k."""

    def __init__(self, key_col: str = "user_id", max_candidates: int = 1024):
        self.key_col = key_col
        self.max_candidates = max_candidates
        self.sketch_bytes: bytes | None = None
        self.candidates: set[int] = set()

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (pass this to ``.foreachBatch``)."""
        keyed = batch_df.select(F.col(self.key_col).alias("user_id"))
        row = keyed.agg(
            F.count_min_sketch(
                "user_id",
                F.lit(CMS_EPS),
                F.lit(CMS_CONFIDENCE),
                F.lit(CMS_SEED),
            ).alias("sk")
        ).collect()[0]["sk"]
        if row is None:  # empty micro-batch
            return
        batch_sketch = bytes(row)
        self.sketch_bytes = (
            batch_sketch
            if self.sketch_bytes is None
            else merge_sketch_bytes(self.sketch_bytes, batch_sketch)
        )
        batch_cands = {
            int(r["user_id"])
            for r in keyed.mapInPandas(
                _space_saving_topk, schema="user_id bigint"
            ).collect()
        }
        self.candidates |= batch_cands
        if len(self.candidates) > self.max_candidates:
            reader = CountMinSketchReader(self.sketch_bytes)
            ranked = sorted(
                self.candidates,
                key=lambda u: (-reader.estimate_long(u), u),
            )
            self.candidates = set(ranked[: self.max_candidates])

    def state(self) -> tuple[bytes | None, frozenset[int]]:
        """Snapshot hook for restart-safe deployments."""
        return self.sketch_bytes, frozenset(self.candidates)

    def topk(self, k: int = 20) -> list[tuple[int, int]]:
        """(key, est_count) top-k by sketch estimate — the batch probe."""
        if self.sketch_bytes is None:
            return []
        reader = CountMinSketchReader(self.sketch_bytes)
        ranked = sorted(
            ((u, reader.estimate_long(u)) for u in self.candidates),
            key=lambda t: (-t[1], t[0]),
        )
        return ranked[:k]
