"""Behavioral analytics over the events stream: funnels, cohorts, RFM.

The product-analytics query family (funnel conversion, cohort
retention, Markov transition counts, RFM scoring) expressed as native
window/aggregate plans.  Each is one or two key-partitioned shuffles on
user_id — the natural distribution key at 100 TB, where a single user's
history always fits one executor's window buffer.

Ordering inside a user's history is (ts, event_id) — event_id breaks
timestamp ties so every window walk is total-ordered and the driver's
hash gate sees one canonical answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


# --- Funnel: view → click → purchase ---------------------------------------

def q_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users reaching each ordered funnel stage.

    Stage n = earliest event of type n at-or-after the user's stage
    n-1 time: three conditional min-aggregates chained by broadcast-
    joinable per-user frames (each stage's frame is ≤ one row per
    user).  No self-join explosion — the fact is scanned once per
    stage with a pushed event_type filter.
    """
    ev = table(spark, sf_dir, "events")
    # s1/s2 are each consumed twice (their stage count + the next
    # stage's join); persisted (lazy, drift_stats pattern) so the
    # executed plan scans the fact exactly once per stage — uncached,
    # the chained re-derivations scanned it 6x
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .persist()
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .persist()
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stages = [("1_view", s1), ("2_click", s2), ("3_purchase", s3)]
    frames = [
        s.agg(F.count("*").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )
        for name, s in stages
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


ORACLE_FUNNEL_COUNTS = """
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t2 FROM events e
    JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts >= s1.t1
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t3 FROM events e
    JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
    GROUP BY e.user_id
)
SELECT '1_view' AS stage, count(*) AS n_users FROM s1
UNION ALL
SELECT '2_click' AS stage, count(*) AS n_users FROM s2
UNION ALL
SELECT '3_purchase' AS stage, count(*) AS n_users FROM s3
"""


# --- Weekly retention cohorts ----------------------------------------------

def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort = first-activity week; distinct users active per offset.

    Two shuffles: per-user min (cohort assignment) and the cohort×week
    distinct count.  Week arithmetic on DATE columns (date_trunc to
    Monday, day-diff ÷ 7) — integer, engine-portable.
    """
    ev = table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    activity = ev.select("user_id", week.alias("act_week")).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("act_week").alias("cohort_week"))
    return (
        activity.join(cohort, "user_id")
        .withColumn(
            "week_offset",
            F.floor(F.datediff(F.col("act_week"), F.col("cohort_week")) / 7).cast(
                "int"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


ORACLE_RETENTION_COHORTS = """
WITH activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
    FROM events
),
cohort AS (
    SELECT user_id, min(act_week) AS cohort_week FROM activity GROUP BY user_id
)
SELECT c.cohort_week,
       CAST(floor(date_diff('day', c.cohort_week, a.act_week) / 7) AS INT)
           AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohort c ON a.user_id = c.user_id
GROUP BY c.cohort_week, floor(date_diff('day', c.cohort_week, a.act_week) / 7)
"""


# --- Markov transition counts ----------------------------------------------

def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count of (previous event type → event type) transitions.

    One lag window per user history (single shuffle on user_id), then a
    map-side-combining count — the first-order Markov structure of the
    event stream.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )


ORACLE_EVENT_TRANSITIONS = """
SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
FROM (
    SELECT event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_type
    FROM events
)
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


# --- RFM scoring ------------------------------------------------------------

def q_user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency / frequency / monetary quartile scores per user.

    Per-user aggregate (one shuffle on user_id), recency against the
    corpus max timestamp (1-row broadcast), then quartile labels by
    comparison against exact interpolated percentiles — also a 1-row
    broadcast.  Quartile 1 is best (most recent / most frequent /
    highest spend).  A global ``ntile`` window would force every user
    row through one partition; percentile-threshold bucketing keeps the
    plan fully parallel at any user cardinality, and ``percentile`` ↔
    ``quantile_cont`` is the engine-exact pair proven by
    q_quantity_quantiles.
    """
    ev = table(spark, sf_dir, "events")
    # persisted (lazy): the RFM frame feeds both the threshold
    # aggregate and the output, and the corpus max is the max of the
    # per-user maxes — so the fact is scanned ONCE (was 4x: two
    # consumers each re-deriving per_user + a separate raw max scan)
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("frequency"),
        F.round(F.sum(_dec("value")).cast("double"), 6).alias("monetary"),
    ).persist()
    max_ts = per_user.agg(F.max("last_ts").alias("corpus_max_ts"))
    rfm = per_user.crossJoin(F.broadcast(max_ts)).withColumn(
        "recency_days",
        F.datediff(
            F.col("corpus_max_ts").cast("date"), F.col("last_ts").cast("date")
        ).cast("int"),
    )
    thresholds = rfm.agg(
        *[
            F.round(F.percentile(c, F.lit(q)), 6).alias(f"{c}_p{int(q * 100)}")
            for c in ("recency_days", "frequency", "monetary")
            for q in (0.25, 0.5, 0.75)
        ]
    )

    def _quartile_low_is_good(c: str) -> F.Column:  # recency
        return (
            F.lit(1)
            + (F.col(c) > F.col(f"{c}_p25")).cast("int")
            + (F.col(c) > F.col(f"{c}_p50")).cast("int")
            + (F.col(c) > F.col(f"{c}_p75")).cast("int")
        )

    def _quartile_high_is_good(c: str) -> F.Column:  # frequency, monetary
        return (
            F.lit(1)
            + (F.col(c) < F.col(f"{c}_p75")).cast("int")
            + (F.col(c) < F.col(f"{c}_p50")).cast("int")
            + (F.col(c) < F.col(f"{c}_p25")).cast("int")
        )

    return rfm.crossJoin(F.broadcast(thresholds)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        _quartile_low_is_good("recency_days").alias("r_quartile"),
        _quartile_high_is_good("frequency").alias("f_quartile"),
        _quartile_high_is_good("monetary").alias("m_quartile"),
    )


_RFM_THRESHOLDS_SQL = ",\n           ".join(
    f"round(quantile_cont({c}, {q}), 6) AS {c}_p{int(q * 100)}"
    for c in ("recency_days", "frequency", "monetary")
    for q in (0.25, 0.5, 0.75)
)

ORACLE_USER_RFM = f"""
WITH per_user AS (
    SELECT user_id,
           max(ts) AS last_ts,
           count(*) AS frequency,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6)
               AS monetary
    FROM events GROUP BY user_id
),
mx AS (SELECT max(ts) AS corpus_max_ts FROM events),
rfm AS (
    SELECT user_id, frequency, monetary,
           CAST(date_diff('day', CAST(last_ts AS DATE),
                          CAST(corpus_max_ts AS DATE)) AS INT) AS recency_days
    FROM per_user, mx
),
th AS (
    SELECT {_RFM_THRESHOLDS_SQL}
    FROM rfm
)
SELECT user_id, recency_days, frequency, monetary,
       1 + CAST(recency_days > recency_days_p25 AS INT)
         + CAST(recency_days > recency_days_p50 AS INT)
         + CAST(recency_days > recency_days_p75 AS INT) AS r_quartile,
       1 + CAST(frequency < frequency_p75 AS INT)
         + CAST(frequency < frequency_p50 AS INT)
         + CAST(frequency < frequency_p25 AS INT) AS f_quartile,
       1 + CAST(monetary < monetary_p75 AS INT)
         + CAST(monetary < monetary_p50 AS INT)
         + CAST(monetary < monetary_p25 AS INT) AS m_quartile
FROM rfm, th
"""


QUERIES = {
    "funnel_counts": q_funnel_counts,
    "retention_cohorts": q_retention_cohorts,
    "event_transitions": q_event_transitions,
    "user_rfm": q_user_rfm,
}

ORACLES = {
    "funnel_counts": ORACLE_FUNNEL_COUNTS,
    "retention_cohorts": ORACLE_RETENTION_COHORTS,
    "event_transitions": ORACLE_EVENT_TRANSITIONS,
    "user_rfm": ORACLE_USER_RFM,
}


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is > 3 sample-stddevs from its type's mean.

    Anomaly surfacing with exact arithmetic: per-type mean/std derive
    from DECIMAL power sums (order-free), broadcast back onto the fact
    as a tiny per-type frame; the z computation and 3σ cut are then one
    deterministic double expression per row.
    """
    ev = table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    stats = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.count("value").alias("n"),
        F.sum(v.cast("decimal(38,4)")).alias("sv"),
        F.sum((v * v).cast("decimal(38,4)")).alias("svv"),
    )
    n = F.col("n").cast("double")
    sv = F.col("sv").cast("double")
    svv = F.col("svv").cast("double")
    # var > 0 guard before sqrt: E[x²]−E[x]² double rounding can go
    # slightly negative for near-constant groups; Spark sqrt(neg)=NaN
    # but DuckDB raises, so NULL-on-nonpositive is the shared behavior.
    var_v = (svv - sv * sv / n) / (n - 1)
    stats = stats.select(
        "et",
        (sv / n).alias("mean_v"),
        F.when(var_v > 0, F.sqrt(var_v)).alias("std_v"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.col("std_v")
    return (
        ev.join(F.broadcast(stats), ev.event_type == stats.et)
        .withColumn("z", F.round(z, 6))
        .filter(F.abs(F.col("z")) > 3.0)
        .select("event_id", "event_type", "value", "z")
    )


ORACLE_VALUE_OUTLIERS = """
WITH stats AS (
    SELECT event_type AS et,
           count(value) AS n,
           sum(CAST(CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sv,
           sum(CAST(CAST(value AS DECIMAL(18,2))
                    * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS svv
    FROM events GROUP BY event_type
),
m AS (
    SELECT et,
           CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean_v,
           CASE WHEN (CAST(svv AS DOUBLE)
                 - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                / (CAST(n AS DOUBLE) - 1) > 0
                THEN sqrt((CAST(svv AS DOUBLE)
                 - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                / (CAST(n AS DOUBLE) - 1)) END AS std_v
    FROM stats
)
SELECT event_id, event_type, value,
       round((value - mean_v) / std_v, 6) AS z
FROM events JOIN m ON event_type = et
WHERE abs(round((value - mean_v) / std_v, 6)) > 3.0
"""




def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per signup cohort by week of age (LTV curve).

    The retention query's revenue twin: users cohort by their first
    event's week; each purchase lands in an age bucket (weeks since
    cohort start); revenue accumulates across ages per cohort.  All
    money stays DECIMAL until one final double cast; the cumulative
    window runs over the tiny (cohort, age) aggregate, not the fact.
    Plan: one user_id agg (the cohort frame), one (cohort, age) agg,
    one window over the aggregate.  The cohort frame has a row per
    DISTINCT USER — unbounded at 100 TB — so it is NOT force-broadcast
    (cf. TRIANGLE_BROADCAST_MAX_EDGES): AQE picks broadcast when the
    runtime size fits and a shuffled hash join otherwise.
    """
    ev = table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .select(
            F.col("cohort_week"),
            F.floor(
                (F.unix_timestamp("ts") - F.unix_timestamp("cohort_week"))
                / F.lit(604800)
            ).cast("int").alias("age_weeks"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
    )
    weekly = purchases.groupBy("cohort_week", "age_weeks").agg(
        F.sum("v").alias("wk_rev"),
        F.count("*").alias("n_purchases"),
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return weekly.select(
        "cohort_week",
        "age_weeks",
        "n_purchases",
        F.sum("wk_rev").over(w).cast("double").alias("cum_revenue"),
    )


ORACLE_COHORT_LTV = """
WITH cohorts AS (
    SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
    FROM events GROUP BY user_id
),
purchases AS (
    SELECT c.cohort_week,
           CAST(floor(date_diff('second', c.cohort_week, e.ts) / 604800.0)
                AS INT) AS age_weeks,
           CAST(e.value AS DECIMAL(18,2)) AS v
    FROM events e JOIN cohorts c USING (user_id)
    WHERE e.event_type = 'purchase'
),
weekly AS (
    SELECT cohort_week, age_weeks,
           sum(v) AS wk_rev, count(*) AS n_purchases
    FROM purchases GROUP BY 1, 2
)
SELECT cohort_week, age_weeks, n_purchases,
       CAST(sum(wk_rev) OVER (PARTITION BY cohort_week ORDER BY age_weeks
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS cum_revenue
FROM weekly
"""


QUERIES["cohort_ltv"] = q_cohort_ltv
ORACLES["cohort_ltv"] = ORACLE_COHORT_LTV


# --- sequential path mining -------------------------------------------------

_PATH_TOP = 20


def q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 3-step user paths (order-2 sequential pattern mining).

    The journey-analysis extension of ``event_transitions``: both lag
    columns ride ONE window partitioning/sort (single shuffle on
    user_id), the (e1,e2,e3) count is a map-side-combinable hash agg,
    and the global cut is ``orderBy().limit()`` → TakeOrderedAndProject
    (per-partition top-20 merged on the driver — no single-partition
    sort of the full path space; the rank window below orders 20 rows).
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    paths = (
        ev.withColumn("e1", F.lag("event_type", 2).over(w))
        .withColumn("e2", F.lag("event_type", 1).over(w))
        .filter(F.col("e1").isNotNull())
        .groupBy("e1", "e2", F.col("event_type").alias("e3"))
        .agg(F.count("*").cast("bigint").alias("n_paths"))
    )
    top = paths.orderBy(
        F.desc("n_paths"), F.asc("e1"), F.asc("e2"), F.asc("e3")
    ).limit(_PATH_TOP)
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(
                F.desc("n_paths"), F.asc("e1"), F.asc("e2"), F.asc("e3")
            )
        ),
    )


ORACLE_TOP_EVENT_PATHS = f"""
WITH seq AS (
    SELECT event_type AS e3,
           lag(event_type, 1) OVER win AS e2,
           lag(event_type, 2) OVER win AS e1
    FROM events
    WINDOW win AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
counted AS (
    SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n_paths
    FROM seq WHERE e1 IS NOT NULL
    GROUP BY e1, e2, e3
),
ranked AS (
    SELECT *,
        CAST(row_number() OVER (
            ORDER BY n_paths DESC, e1 ASC, e2 ASC, e3 ASC
        ) AS INT) AS rank
    FROM counted
)
SELECT e1, e2, e3, n_paths, rank FROM ranked WHERE rank <= {_PATH_TOP}
"""


QUERIES["top_event_paths"] = q_top_event_paths
ORACLES["top_event_paths"] = ORACLE_TOP_EVENT_PATHS
