"""Stream-stream joins (Structured Streaming).

Attribution — joining a purchase stream back to the click that led to
it — is the canonical stream-stream interval join: both sides are
unbounded, so the join needs watermarks on BOTH inputs plus a time-range
predicate so the engine can bound its join state.  State for a click is
dropped once the watermark passes ``click_ts + horizon``; without the
range condition the state store would grow forever.

Scale: the join keys hash-shard state across executors exactly like a
batch shuffle join; the horizon (not the stream length) bounds per-key
state, so the operator runs indefinitely at constant memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Purchases matched to any same-user click within ``horizon`` before.

    Inner stream-stream join; append output mode.  Column schema of both
    inputs: (event_id, ts, user_id, value).
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = F.expr(
        f"""
        c_user = p_user
        AND purchase_ts >= click_ts
        AND purchase_ts <= click_ts + INTERVAL {horizon}
        """
    )
    return c.join(p, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
