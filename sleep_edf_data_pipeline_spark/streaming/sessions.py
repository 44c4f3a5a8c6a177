"""Streaming session/episode detection (SURVEY §2.6 extension).

The reference's episode detection is a batch session window with a
60-minute gap (SURVEY: R7-R9 "session window in disguise").  In
Structured Streaming the same semantics are native:

- :func:`streaming_sessions` — ``session_window`` with a watermark:
  per-user activity sessions close after the gap elapses in event time;
  late events inside the watermark still merge.
- :func:`streaming_hourly_counts` — tumbling-window counts with
  watermarked late-data handling (append mode emits finalized windows
  only).

Both read any streaming source (file/kafka/rate); tests drive them with
a file source + ``Trigger.AvailableNow`` into a memory sink, which
exercises the real incremental execution engine.

State scale: session state is per (user, open-session) — bounded by the
watermark horizon; at 100 TB/day the state store shards by the groupBy
key across executors (RocksDB state store in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session aggregation over an event-time stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_hourly_counts(
    events: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling 1-hour event counts with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n_events",
        )
    )


def streaming_ohlc_bars(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of the batch ``ohlc_bars`` query.

    Batch picks open/close with forward/reverse ``row_number`` — an
    ordered window, which streaming aggregation can't run.  The same
    total order (ts, event_id) expressed as ``min_by``/``max_by`` over
    a struct key is commutative and incremental, so it streams: each
    micro-batch folds into per-(type, hour) state, and append mode
    emits a bar once the watermark passes its close.  Equivalence with
    the batch plan is pinned by test (same rows for the same input).
    """
    order_key = F.struct("ts", "event_id")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.min_by("value", order_key).alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max_by("value", order_key).alias("close_v"),
            F.count("*").alias("volume"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("bar_hour"),
            "open_v", "high_v", "low_v", "close_v", "volume",
        )
        .filter(F.col("volume") >= 3)
    )
