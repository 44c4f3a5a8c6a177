"""Round-10: FORWARD as-of join with tolerance (conversion window).

``asof_last_order`` answers "the most recent order at/before this
event" (backward as-of).  The other direction every attribution
pipeline needs is the forward as-of WITH TOLERANCE: for each event,
the first order by the same user at/after the event, but only if it
lands within ``TOL_DAYS`` — the classic "did this touch convert
within a week" join (pandas ``merge_asof(direction='forward',
tolerance=...)``; kdb ``aj`` mirrored).

Same Spark-first shape as the backward twin — NO join at all: union
both sides tagged into one (user, time)-ordered stream and carry the
first following order's attributes BACKWARD onto each event row with
``first_value(... IGNORE NULLS)`` over a ``[1 FOLLOWING, UNBOUNDED
FOLLOWING]`` frame, then null out carries beyond the tolerance.  One
shuffle on user_id; ties at equal day resolve events-before-orders
(same-day orders count as conversions) then by ``o_orderkey`` —
deterministic in both engines.

Day grain deliberately: ``o_orderdate`` is a DATE, so comparing at
event-day grain makes "same day" well-defined instead of depending on
the event's time-of-day against a midnight-dated order.

Reference scope: extends SURVEY §2.6's join family (the reference has
no as-of surface; the backward twin cites the same gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

#: Conversion window (days).
TOL_DAYS = 7


def q_asof_next_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    od = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"),
        "o_orderkey",
        "o_totalprice",
    )
    # events sort BEFORE orders at equal day (is_event DESC), so the
    # strictly-following frame still sees same-day orders.
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", F.desc("is_event"), F.coalesce("o_orderkey", "event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    merged = ev.unionByName(od).select(
        "*",
        F.first("o_orderkey", ignorenulls=True).over(w).alias("nk"),
        F.first("o_totalprice", ignorenulls=True).over(w).alias("np"),
        F.first(
            F.when(F.col("is_event") == 0, F.col("t")), ignorenulls=True
        ).over(w).alias("nt"),
    )
    gap = F.datediff(F.col("nt"), F.col("t"))
    within = gap <= TOL_DAYS
    return merged.filter(F.col("is_event") == 1).select(
        "event_id",
        "user_id",
        F.col("t").alias("event_day"),
        F.when(within, F.col("nk")).alias("o_orderkey"),
        F.when(within, F.col("np")).alias("o_totalprice"),
        F.when(within, gap).cast("bigint").alias("gap_days"),
    )


ORACLE_ASOF_NEXT_CONVERSION = f"""
WITH ev AS (
    SELECT user_id, CAST(ts AS DATE) AS t, 1 AS is_event, event_id,
           CAST(NULL AS BIGINT) AS o_orderkey,
           CAST(NULL AS DOUBLE) AS o_totalprice
    FROM events
),
od AS (
    SELECT o_custkey AS user_id, o_orderdate AS t, 0 AS is_event,
           CAST(NULL AS BIGINT) AS event_id, o_orderkey, o_totalprice
    FROM orders
),
merged AS (
    SELECT *,
           first_value(o_orderkey IGNORE NULLS) OVER w AS nk,
           first_value(o_totalprice IGNORE NULLS) OVER w AS np,
           first_value(CASE WHEN is_event = 0 THEN t END IGNORE NULLS)
               OVER w AS nt
    FROM (SELECT * FROM ev UNION ALL SELECT * FROM od)
    WINDOW w AS (
        PARTITION BY user_id
        ORDER BY t, is_event DESC, coalesce(o_orderkey, event_id)
        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
    )
)
SELECT event_id, user_id, t AS event_day,
       CASE WHEN date_diff('day', t, nt) <= {TOL_DAYS} THEN nk END
           AS o_orderkey,
       CASE WHEN date_diff('day', t, nt) <= {TOL_DAYS} THEN np END
           AS o_totalprice,
       CAST(CASE WHEN date_diff('day', t, nt) <= {TOL_DAYS}
            THEN date_diff('day', t, nt) END AS BIGINT) AS gap_days
FROM merged WHERE is_event = 1
"""


QUERIES = {
    "asof_next_conversion": q_asof_next_conversion,
}

ORACLES = {
    "asof_next_conversion": ORACLE_ASOF_NEXT_CONVERSION,
}
