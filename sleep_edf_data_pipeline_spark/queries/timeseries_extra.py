"""Time-series finishing ops: EWMA, last-touch attribution, OHLC bars.

Three event-stream patterns the existing window family doesn't cover:
exponentially weighted smoothing, marketing-style revenue attribution,
and financial-style bar aggregation.  All are single-shuffle plans
partitioned on the stream's natural key (user_id / event_type) — at
100 TB one user's or one type-hour's history fits an executor window
buffer, and nothing here ever joins the fact to itself.

Cross-engine determinism notes (the float rules from SCALING.md):

* The EWMA uses α = 1/2, whose lag-k weight 2^-k is a POWER OF TWO —
  quantized values times power-of-two weights summed as BIGINT are
  exact, so Spark and DuckDB produce bit-identical doubles after the
  single final division.
* OHLC open/close are raw row values selected by a total order
  (ts, event_id) — no float arithmetic at all.
* Attribution sums route through DECIMAL(18,2), order-free.

Reference parity: the reference's analytics layer smooths epoch
streams with ordered rolling window averages
(models/intermediate/sleep_metrics.sql:9-22) and reduces runs to
first/last bounds per episode (models/marts — episode bounds);
these re-express the same shapes (ordered decay smoothing,
per-bucket first/last selection, windowed as-of credit) on the
generic events stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

#: EWMA memory: lag-k weight is 2^(HALF_LIFE_TAPS-1-k); 16 taps keep
#: the BIGINT accumulator ≤ ~2^53 even for value*2^20 quantization.
EWMA_TAPS = 16

#: Fixed-point quantization for the smoothed value (2^20 ≈ 1e6).
EWMA_SCALE = 1 << 20


def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (α=1/2, 16 taps) of event value, exact fixed-point.

    EWMA is a linear recurrence, which no engine's window agg exposes
    directly; with a half-life decay the 16-tap truncation is exact to
    ~2^-16 and each tap's weight 2^(15-k) is a power of two.  So:
    quantize value to BIGINT (floor(v·2^20)), take 16 ``lag`` taps over
    (ts, event_id) order, and fold them into one integer numerator /
    denominator pair — order-free, overflow-safe (≲ 2^50), and
    bit-identical across engines after the single double division.

    The 16 lags are ONE window walk in Spark (same frame, same order),
    not 16 shuffles; the plan is a single hash-partition on user_id.

    NULL values are filtered up front (mirrored in the oracle): if a
    row and all 15 prior taps were NULL, den=0 and Spark's 0/0 yields
    NULL while DuckDB yields NaN — filtering keeps the two engines
    identical whatever the data.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    q = F.floor(F.col("value") * F.lit(EWMA_SCALE)).cast("bigint")
    num = F.lit(0).cast("bigint")
    den = F.lit(0).cast("bigint")
    for k in range(EWMA_TAPS):
        weight = 1 << (EWMA_TAPS - 1 - k)
        tap = F.lag(q, k).over(w)
        num = num + F.coalesce(tap * F.lit(weight), F.lit(0))
        den = den + F.when(tap.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
    return (
        ev.select(
            "user_id",
            "event_id",
            (
                num.cast("double") / den.cast("double") / F.lit(float(EWMA_SCALE))
            ).alias("ewma_value"),
        )
        .filter(F.col("event_id") % 7 == 0)
    )


ORACLE_EWMA_USER_VALUE = f"""
WITH taps AS (
    SELECT user_id, event_id,
           {", ".join(
               f"lag(CAST(floor(value * {EWMA_SCALE}) AS BIGINT), {k}) "
               f"OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t{k}"
               for k in range(EWMA_TAPS)
           )}
    FROM events
    WHERE value IS NOT NULL
)
SELECT user_id, event_id,
       CAST(({" + ".join(
           f"COALESCE(t{k} * {1 << (EWMA_TAPS - 1 - k)}, 0)"
           for k in range(EWMA_TAPS)
       )}) AS DOUBLE)
       / CAST(({" + ".join(
           f"CASE WHEN t{k} IS NOT NULL THEN {1 << (EWMA_TAPS - 1 - k)} ELSE 0 END"
           for k in range(EWMA_TAPS)
       )}) AS DOUBLE)
       / {float(EWMA_SCALE)} AS ewma_value
FROM taps
WHERE event_id % 7 = 0
"""


def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue attribution: each purchase credits the user's most
    recent prior non-purchase event within 7 days.

    The classic marketing-attribution query, done without a self-join:
    one window walk per user carries the last non-purchase (ts, type)
    forward (``last(..., ignorenulls=True)`` over an up-to-previous-row
    frame), purchases outside the 7-day lookback fall into the
    ``organic`` channel, and revenue sums per channel as DECIMAL.
    A naive as-of self-join would shuffle the fact twice and explode on
    active users; this scans it once.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    not_purchase = F.col("event_type") != "purchase"
    touch_ts = F.last(
        F.when(not_purchase, F.col("ts")), ignorenulls=True
    ).over(w)
    touch_type = F.last(
        F.when(not_purchase, F.col("event_type")), ignorenulls=True
    ).over(w)
    purchases = (
        ev.select("user_id", "ts", "event_id", "event_type", "value",
                  touch_ts.alias("touch_ts"), touch_type.alias("touch_type"))
        .filter(F.col("event_type") == "purchase")
    )
    channel = F.when(
        F.col("touch_ts").isNotNull()
        & (F.col("touch_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
        F.col("touch_type"),
    ).otherwise(F.lit("organic"))
    return (
        purchases.select(
            channel.alias("channel"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("v").cast("double").alias("attributed_revenue"),
        )
    )


ORACLE_LAST_TOUCH_ATTRIBUTION = """
WITH touched AS (
    SELECT user_id, ts, event_id, event_type, value,
           last_value(CASE WHEN event_type != 'purchase' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ts,
           last_value(CASE WHEN event_type != 'purchase' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type
    FROM events
)
SELECT CASE WHEN touch_ts IS NOT NULL
                 AND touch_ts >= ts - INTERVAL 7 DAY
            THEN touch_type ELSE 'organic' END AS channel,
       count(*) AS n_purchases,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
           AS attributed_revenue
FROM touched
WHERE event_type = 'purchase'
GROUP BY 1
"""


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type: open/high/low/close/volume.

    The financial downsampling shape.  Open and close are single-row
    values selected by the total order (ts, event_id) — two
    row_numbers over one window spec (forward and reverse share the
    same hash partitioning, so Spark plans ONE exchange + two sorts) —
    then a hash aggregate per (event_type, hour) folds everything.
    No float arithmetic: O/H/L/C are raw row doubles, volume a count.
    """
    ev = table(spark, sf_dir, "events").withColumn(
        "bar_hour", F.date_trunc("hour", F.col("ts"))
    )
    fwd = Window.partitionBy("event_type", "bar_hour").orderBy(
        "ts", "event_id"
    )
    rev = Window.partitionBy("event_type", "bar_hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "event_type",
            "bar_hour",
            "value",
            F.row_number().over(fwd).alias("rn_f"),
            F.row_number().over(rev).alias("rn_r"),
        )
        .groupBy("event_type", "bar_hour")
        .agg(
            F.max(F.when(F.col("rn_f") == 1, F.col("value"))).alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max(F.when(F.col("rn_r") == 1, F.col("value"))).alias("close_v"),
            F.count("*").alias("volume"),
        )
        .filter(F.col("volume") >= 3)
    )


ORACLE_OHLC_BARS = """
WITH ranked AS (
    SELECT event_type,
           date_trunc('hour', ts) AS bar_hour,
           value,
           row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts, event_id) AS rn_f,
           row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn_r
    FROM events
)
SELECT event_type, bar_hour,
       max(CASE WHEN rn_f = 1 THEN value END) AS open_v,
       max(value) AS high_v,
       min(value) AS low_v,
       max(CASE WHEN rn_r = 1 THEN value END) AS close_v,
       count(*) AS volume
FROM ranked
GROUP BY event_type, bar_hour
HAVING count(*) >= 3
"""


QUERIES = {
    "ewma_user_value": q_ewma_user_value,
    "last_touch_attribution": q_last_touch_attribution,
    "ohlc_bars": q_ohlc_bars,
}

ORACLES = {
    "ewma_user_value": ORACLE_EWMA_USER_VALUE,
    "last_touch_attribution": ORACLE_LAST_TOUCH_ATTRIBUTION,
    "ohlc_bars": ORACLE_OHLC_BARS,
}


def q_twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily TWAP: each observation weighted by the seconds
    it was "in effect" (until the next event that day).

    The integration-over-time shape quote/sensor pipelines need, where
    a plain avg over-counts bursts.  Exactness: value rides as
    DECIMAL(18,2), the weight is an integer second count, and the
    weighted sum accumulates in DECIMAL (order-free, exact); ONE
    double division at the end — bit-stable cross-engine.  Plan: one
    (user_id) exchange shared by the lead() window and the (user, day)
    aggregate.
    """
    ev = table(spark, sf_dir, "events")
    day = F.to_date("ts")
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    next_ts = F.lead("ts").over(w)
    dt = (F.unix_timestamp(next_ts) - F.unix_timestamp("ts")).cast("bigint")
    weighted = (
        ev.select(
            "user_id",
            day.alias("day"),
            F.col("value").cast("decimal(18,2)").alias("v"),
            dt.alias("dt_s"),
        )
        .filter(F.col("dt_s").isNotNull() & (F.col("dt_s") > 0))
    )
    return (
        weighted.groupBy("user_id", "day")
        .agg(
            F.sum(F.col("v") * F.col("dt_s")).alias("num"),
            F.sum("dt_s").alias("den"),
            F.count("*").alias("n_obs"),
        )
        .filter(F.col("n_obs") >= 3)
        .select(
            "user_id",
            "day",
            (F.col("num").cast("double") / F.col("den").cast("double")).alias(
                "twap"
            ),
            "n_obs",
        )
    )


ORACLE_TWAP_USER_VALUE = """
WITH staged AS (
    SELECT user_id,
           CAST(ts AS DATE) AS day,
           CAST(value AS DECIMAL(18,2)) AS v,
           date_diff('second', ts,
                     lead(ts) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                    ORDER BY ts, event_id)) AS dt_s
    FROM events
)
SELECT user_id, day,
       CAST(sum(v * dt_s) AS DOUBLE) / CAST(CAST(sum(dt_s) AS BIGINT) AS DOUBLE) AS twap,
       count(*) AS n_obs
FROM staged
WHERE dt_s IS NOT NULL AND dt_s > 0
GROUP BY user_id, day
HAVING count(*) >= 3
"""


QUERIES["twap_user_value"] = q_twap_user_value
ORACLES["twap_user_value"] = ORACLE_TWAP_USER_VALUE


#: Rolling-median frame length (rows 14 preceding .. current).
MEDIAN_FRAME = 15


def q_rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 15-row rolling median of event value per user.

    The robust-statistics smoother (median absolute to outliers where
    the EWMA is not).  No engine exposes an exact windowed median, so
    the frame's values ride as a sorted array: ``collect_list`` over
    the frame (bounded at 15 elements — constant memory per row),
    ``array_sort``, middle element(s).  Values are 2^20-quantized
    BIGINTs, the even-frame midpoint is (a+b)/2^21 via one double
    division — bit-stable cross-engine with zero float comparisons.

    Plan: one (user_id) exchange, one window walk; the array never
    exceeds 15 BIGINTs so state is constant per row — the same plan
    holds on a 100 TB stream partition.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    q = F.floor(F.col("value") * F.lit(EWMA_SCALE)).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MEDIAN_FRAME - 1), 0)
    )
    arr = F.array_sort(F.collect_list(q).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    # odd n: lo == hi (same index); even n: true midpoint
    med = (lo + hi).cast("double") / F.lit(float(2 * EWMA_SCALE))
    return (
        ev.select(
            "user_id",
            "event_id",
            med.alias("rolling_median"),
        )
        .filter(F.col("event_id") % 5 == 0)
    )


ORACLE_ROLLING_MEDIAN_VALUE = f"""
WITH framed AS (
    SELECT user_id, event_id,
           list_sort(list(CAST(floor(value * {EWMA_SCALE}) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {MEDIAN_FRAME - 1} PRECEDING AND CURRENT ROW)
           ) AS arr
    FROM events
    WHERE value IS NOT NULL
)
SELECT user_id, event_id,
       CAST(arr[CAST((len(arr) + 1) // 2 AS INT)]
            + arr[CAST(len(arr) // 2 + 1 AS INT)] AS DOUBLE)
       / {float(2 * (1 << 20))} AS rolling_median
FROM framed
WHERE event_id % 5 = 0
"""


QUERIES["rolling_median_value"] = q_rolling_median_value
ORACLES["rolling_median_value"] = ORACLE_ROLLING_MEDIAN_VALUE
