"""Streaming deduplication: exact dedup over an unbounded stream.

The streaming counterpart of operators/dedup.py's exact path: a corpus
arriving as a stream (crawl output, log ship) deduplicated online by
content hash.

Two state disciplines, both native Structured Streaming operators (the
state store shards by key across executors exactly like a shuffle):

- :func:`streaming_exact_dedup` — ``dropDuplicates`` on the content
  hash: state grows with the distinct-key count and never expires.
  Right when the dedup horizon is "forever" and keys are hashes
  (fixed-width state per key).
- :func:`streaming_dedup_within_watermark` —
  ``dropDuplicatesWithinWatermark``: duplicates are only suppressed
  within the watermark horizon, and state older than the watermark is
  evicted — bounded state for unbounded streams, the 100 TB/day
  setting where exact forever-dedup state would not fit.

Both emit the surviving rows (first arrival wins), so the sink sees an
append-only deduplicated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable content key: md5 of the raw text (same as batch dedup)."""
    return df.withColumn("content_hash", F.md5(F.col(text_col)))


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the first arrival per content hash; unbounded state."""
    return with_content_hash(docs, text_col).dropDuplicates(["content_hash"])


def streaming_dedup_within_watermark(
    docs: DataFrame,
    event_time_col: str,
    watermark: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """First arrival per content hash within the watermark horizon.

    State for a hash is dropped once the watermark passes it — a
    duplicate arriving later than ``watermark`` after the original is
    NOT suppressed.  That trade (bounded state, horizon-scoped dedup)
    is the standard production posture for continuous corpus ingest.
    """
    return (
        with_content_hash(docs, text_col)
        .withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
