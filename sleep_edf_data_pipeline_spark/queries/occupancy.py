"""Round-7: sweep-line occupancy — peak concurrent sessions per hour.

A new operator class for the engine: interval analytics.  Given the
per-user session intervals (the same 30-min-gap sessions
``session_window_agg`` emits), answer "how many sessions were open at
once, per hour?" — the capacity/occupancy question every serving or
ingest platform asks of its session table.

Algorithm: the classic sweep line, made exact and skew-safe:

1. each session becomes two deltas (+1 at start, −1 at end); netting
   the deltas per TIMESTAMP first makes tie-handling trivial (ends are
   exclusive, so at instant t: open(t) = starts≤t − ends≤t, which is
   precisely the inclusive cumsum of the netted deltas);
2. the global running concurrency is a prefix sum over time — an
   unpartitioned ordered window at 100 TB, so it is decomposed over
   the CALENDAR: within-(day, hour) cumsum (the fact-scale walk, one
   hour's deltas per task), plus per-day hour offsets (≤24 rows per
   day partition), plus day offsets from the day-totals frame — the
   one unpartitioned ordered window left, over a frame bounded by the
   CALENDAR (days in the retention window), independent of data
   volume (the same class as CUSUM's per-type day prefix and the
   drift cumulative's ≤19-row digit frame);
3. per hour: the peak is ``max(greatest(conc, conc − net))`` — the
   ``conc − net`` term is the level carried INTO the first delta of
   the hour, so an hour that opens high and only drains still reports
   its true peak at its boundary events.  Hours with no session
   boundary are absent by definition (their concurrency is constant
   and visible in the neighboring rows).

Everything is exact BIGINT arithmetic on counts — no floats anywhere.

Reference parity: no interval surface exists in the reference; extends
SURVEY §2.7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .event_windows import q_session_window_agg_bucketed


def net_grid(sess: DataFrame) -> DataFrame:
    """(t, net, day, hour) netted boundary-delta grid from session
    rows — the algebraic partial the streaming twin
    (streaming/occupancy.py) folds across micro-batches (net sums are
    order-free BIGINTs; state is bounded by distinct boundary
    timestamps, i.e. by the CALENDAR at any fixed time resolution,
    never by the stream)."""
    # explode, not union: a union of two selects over `sess` would run
    # the whole upstream sessionization twice; exploding a 2-slot
    # array emits both deltas from ONE pass over the session rows.
    deltas = sess.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("session_start").alias("t"), F.lit(1).alias("d")
                ),
                F.struct(
                    F.col("session_end").alias("t"), F.lit(-1).alias("d")
                ),
            )
        ).alias("x")
    ).select("x.t", "x.d")
    return (
        deltas.groupBy("t")
        .agg(F.sum("d").cast("bigint").alias("net"))
        .withColumn("day", F.to_date("t"))
        .withColumn("hour", F.hour("t"))
    )


def q_peak_concurrent_sessions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # The deltas ride the skew-safe (user, day)-bucketed sessionizer,
    # NOT the native per-user merge: under a Zipf user head the native
    # operator funnels the hot user's whole stream into one merge task
    # (5.14x at the 135x events decade), and this query inherited that
    # task in round 7.  The bucketed twin emits value-identical session
    # rows (same oracle), so only the plan changes.
    sess = q_session_window_agg_bucketed(spark, sf_dir)
    # persist WITHOUT an eager job (drift_stats pattern): three
    # consumers (the within-hour walk, the hour offsets, the day
    # offsets) all derive from `net` — uncached, the executed plan ran
    # the whole sessionization 6x for one query.  The cache fills at
    # first use; bench/driver clear the cache between queries.
    net = net_grid(sess).persist()
    return peak_from_net(net)


def peak_from_net(net: DataFrame) -> DataFrame:
    """Hourly peak concurrency from a (t, net, day, hour) grid — the
    shared tail of the batch query and the streaming monitor
    (calendar-decomposed global prefix; exact BIGINT)."""
    # fact-scale walk: one hour's deltas per task
    w1 = (
        Window.partitionBy("day", "hour")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cur = net.withColumn("c1", F.sum("net").over(w1))
    # per-day hour offsets: ≤24 rows per day partition
    htot = net.groupBy("day", "hour").agg(
        F.sum("net").cast("bigint").alias("hnet")
    )
    w2 = (
        Window.partitionBy("day")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hoff = htot.select(
        "day",
        "hour",
        F.coalesce(F.sum("hnet").over(w2), F.lit(0))
        .cast("bigint")
        .alias("hoff"),
    )
    # day offsets: the one unpartitioned ordered window, over a frame
    # bounded by the CALENDAR (days in the retention window) — not by
    # data volume
    dtot = htot.groupBy("day").agg(F.sum("hnet").cast("bigint").alias("dnet"))
    w3 = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    doff = dtot.select(
        "day",
        F.coalesce(F.sum("dnet").over(w3), F.lit(0))
        .cast("bigint")
        .alias("doff"),
    )
    conc = (
        cur.join(F.broadcast(hoff), ["day", "hour"])
        .join(F.broadcast(doff), "day")
        .select(
            "t",
            "net",
            (F.col("c1") + F.col("hoff") + F.col("doff"))
            .cast("bigint")
            .alias("conc"),
        )
    )
    return (
        conc.groupBy(F.date_trunc("hour", F.col("t")).alias("hour_start"))
        .agg(
            F.max(F.greatest(F.col("conc"), F.col("conc") - F.col("net")))
            .cast("bigint")
            .alias("peak_concurrent"),
            F.count("*").cast("bigint").alias("n_boundary_events"),
        )
    )


ORACLE_PEAK_CONCURRENT_SESSIONS = """
WITH gaps AS (
    SELECT user_id, event_id, ts,
        CASE
            WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                >= INTERVAL 30 MINUTE
            THEN 1 ELSE 0
        END AS is_new_session
    FROM events
),
sessions AS (
    SELECT *,
        sum(is_new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
    FROM gaps
),
ses AS (
    SELECT user_id, session_id,
           min(ts) AS s,
           max(ts) + INTERVAL 30 MINUTE AS e
    FROM sessions GROUP BY user_id, session_id
),
deltas AS (
    SELECT s AS t, 1 AS d FROM ses
    UNION ALL
    SELECT e AS t, -1 AS d FROM ses
),
net AS (
    SELECT t, CAST(sum(d) AS BIGINT) AS net FROM deltas GROUP BY t
),
cum AS (
    SELECT t, net,
           CAST(sum(net) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS conc
    FROM net
)
SELECT date_trunc('hour', t) AS hour_start,
       CAST(max(greatest(conc, conc - net)) AS BIGINT) AS peak_concurrent,
       CAST(count(*) AS BIGINT) AS n_boundary_events
FROM cum
GROUP BY 1
"""


QUERIES = {
    "peak_concurrent_sessions": q_peak_concurrent_sessions,
}

ORACLES = {
    "peak_concurrent_sessions": ORACLE_PEAK_CONCURRENT_SESSIONS,
}
