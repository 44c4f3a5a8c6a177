"""Time-window queries on the events stream table.

The reference's episode detection (R7-R9) is a batch session window in
disguise (SURVEY §2.6); here the same semantics are expressed with
Spark's native time-window operators — ``F.window`` tumbling buckets and
``F.session_window`` gap-merged sessions — both usable identically in
batch and Structured Streaming (streaming/sessions.py wires the
streaming variant).

Oracles restate the session semantics relationally (lag + cumsum
sessionization), proving the native operator's equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

#: 30-minute inactivity closes a session.
SESSION_GAP = "30 minutes"


def q_hourly_event_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window: counts, exact decimal sums, distinct users."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").getField("start").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


ORACLE_HOURLY_EVENT_AGG = """
SELECT
    date_trunc('hour', ts) AS hour_start,
    event_type,
    count(*) AS n_events,
    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
    count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session window per user (30-min gap): bounds + aggregates.

    ``F.session_window`` merges each event's [ts, ts+gap) interval;
    session end is last event + gap.  The oracle derives identical
    sessions with lag + running-sum sessionization — the two
    formulations must agree exactly.
    """
    ev = table(spark, sf_dir, "events")
    sw = F.session_window("ts", SESSION_GAP)
    return (
        ev.groupBy("user_id", sw)
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


def q_session_window_agg_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Skew-safe sessionization: the (user, day) bucket decomposition.

    ``q_session_window_agg``'s native operator partitions by user_id —
    under a Zipf head one hot user's whole event stream is a single
    merge task (measured 5.14× at the 135× skewed decade, the one
    events100 row AT the bar; SCALING.md round 7).  This variant is
    the CUSUM-style decomposition applied to sessionization:

    1. sessionize WITHIN (user_id, day) buckets — the hot key's walk
       splits across days, so per-task rows are bounded by a day's
       traffic, not the stream;
    2. merge chains ACROSS bucket boundaries on SESSION rows (a
       second gaps-and-islands: consecutive sessions of one user
       closer than the gap collapse — transitive, so month-long
       sessions spanning many midnights still merge);
    3. re-aggregate the chain: bounds, counts, and the exact
       DECIMAL(18,2) value sums are all algebraic, so the result is
       value-identical to the native operator (same oracle).

    Pass 2 partitions by user over SESSION rows — a reduction of the
    stream everywhere except the degenerate all-isolated-events case,
    where it equals the native cost (never exceeds it).  Gap
    comparisons run on ``unix_micros`` (exact integer µs, matching the
    oracle's INTERVAL comparison at timestamp precision).
    """
    gap_us = 30 * 60 * 1_000_000
    # events.ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the
    # session tz is pinned UTC, so the cast is value-preserving
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    d = ev.withColumn("day", F.to_date("ts"))
    wb = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    prev = F.lag("ts").over(wb)
    is_new = F.when(
        prev.isNull()
        | (us(F.col("ts")) - us(prev) >= gap_us),
        1,
    ).otherwise(0)
    sid = F.sum(is_new).over(
        wb.rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        d.withColumn("sid", sid)
        .groupBy("user_id", "day", "sid")
        .agg(
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_end"),
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("val"),
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("s_start", "s_end")
    prev_end = F.lag("s_end").over(w2)
    new_chain = F.when(
        prev_end.isNull()
        | (us(F.col("s_start")) - us(prev_end) >= gap_us),
        1,
    ).otherwise(0)
    chain = F.sum(new_chain).over(
        w2.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spans.withColumn("chain", chain)
        .groupBy("user_id", "chain")
        .agg(
            F.min("s_start").alias("session_start"),
            (F.max("s_end") + F.expr(f"INTERVAL {SESSION_GAP}")).alias(
                "session_end"
            ),
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("val").cast("double").alias("total_value"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events",
            "total_value",
        )
    )


ORACLE_SESSION_WINDOW_AGG = """
WITH gaps AS (
    SELECT
        user_id,
        event_id,
        ts,
        value,
        CASE
            WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                >= INTERVAL 30 MINUTE
            THEN 1 ELSE 0
        END AS is_new_session
    FROM events
),
sessions AS (
    SELECT
        *,
        sum(is_new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
    FROM gaps
)
SELECT
    user_id,
    min(ts) AS session_start,
    max(ts) + INTERVAL 30 MINUTE AS session_end,
    count(*) AS n_events,
    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_id
"""


def q_json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (props->k) + grouped aggregation."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k.cast("bigint")).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


ORACLE_JSON_PROPS_AGG = """
SELECT
    event_type,
    count(*) AS n_events,
    CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
    min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
    max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type
"""


def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (grouped conditional counts widened to columns) per user."""
    ev = table(spark, sf_dir, "events")
    cnt = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))  # noqa: E731
    return ev.groupBy("user_id").agg(
        cnt("click").alias("n_click"),
        cnt("view").alias("n_view"),
        cnt("purchase").alias("n_purchase"),
        cnt("signup").alias("n_signup"),
        cnt("error").alias("n_error"),
    )


ORACLE_EVENT_TYPE_PIVOT = """
SELECT
    user_id,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_purchase,
    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events
GROUP BY user_id
"""



def q_hourly_densified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: every hour in each user's span,
    zero-filled where no events occurred.

    The complement of LOCF gap-fill (advanced_windows): downstream
    models need explicit zero rows, not absent rows.  The hour spine is
    generated with ``sequence()`` + explode from each user's bounds —
    rows fan out map-side from a tiny grouped input, so the only
    shuffles are the two aggregations; the spine join is broadcast-able
    (one row per user-hour vs the event fact).
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start"),
    )
    counts = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(F.count("*").alias("n"))
    return spine.join(counts, ["user_id", "hour_start"], "left").select(
        "user_id",
        "hour_start",
        F.coalesce("n", F.lit(0)).alias("n_events"),
    )


ORACLE_HOURLY_DENSIFIED = """
WITH bounds AS (
    SELECT user_id,
           date_trunc('hour', min(ts)) AS h0,
           date_trunc('hour', max(ts)) AS h1
    FROM events GROUP BY user_id
),
spine AS (
    SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_start
    FROM bounds
),
counts AS (
    SELECT user_id, date_trunc('hour', ts) AS hour_start, count(*) AS n
    FROM events GROUP BY 1, 2
)
SELECT s.user_id, s.hour_start, CAST(coalesce(n, 0) AS BIGINT) AS n_events
FROM spine s LEFT JOIN counts c USING (user_id, hour_start)
"""


QUERIES = {
    "hourly_event_agg": q_hourly_event_agg,
    "hourly_densified": q_hourly_densified,
    "session_window_agg": q_session_window_agg,
    "session_window_agg_bucketed": q_session_window_agg_bucketed,
    "json_props_agg": q_json_props_agg,
    "event_type_pivot": q_event_type_pivot,
}

ORACLES = {
    "hourly_event_agg": ORACLE_HOURLY_EVENT_AGG,
    "hourly_densified": ORACLE_HOURLY_DENSIFIED,
    "session_window_agg": ORACLE_SESSION_WINDOW_AGG,
    "session_window_agg_bucketed": ORACLE_SESSION_WINDOW_AGG,
    "json_props_agg": ORACLE_JSON_PROPS_AGG,
    "event_type_pivot": ORACLE_EVENT_TYPE_PIVOT,
}
