"""Advanced join + order-statistics coverage (SURVEY §2.6 gap list).

SURVEY §2.6 lists the join classes the reference never uses — as-of
joins, range/theta joins — and exact/approximate order statistics.
They are first-class needs for a training-data pipeline (align events
to the latest model checkpoint, bucket by score range, percentile
quality cutoffs), so the engine exposes them here, each with a DuckDB
oracle.

Scale notes (100 TB):

- **As-of join** is implemented as the union + keyed-window
  ``last(ignorenulls)`` pattern: one shuffle on the join key, zero row
  explosion, and no per-key driver loop.  This beats the naive
  time-range join (which explodes to |events| × |orders-per-user| rows
  before picking the max) and stays fully JVM-side — no Pandas
  ``merge_asof`` needed.  Skewed keys fall to AQE skew-join handling
  on the single exchange.
- **Band join** broadcasts the (tiny, constant) band table; Spark
  plans BroadcastNestedLoopJoin — the only correct strategy for a
  pure theta join, and safe because the build side is O(#bands).
- **Interval join** keeps the equi-key in the join condition so
  Catalyst plans a hash join with the time-range as a residual filter
  — never a cartesian product.
- **Exact percentiles** shuffle once per group; the approximate twin
  (``percentile_approx``, a mergeable t-digest-style sketch) is the
  100 TB path: fixed memory per group, map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(18,2)")


# --- As-of join: latest order at-or-before each event ----------------------

def q_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the most recent order by that user at/before ts.

    Union both sides tagged, one window over (key, time): ``last``
    with ``ignorenulls`` carries the latest order's attributes forward
    onto every event row.  Ties at equal time resolve orders-first
    (``is_event`` sort key) then by ``o_orderkey`` — deterministic in
    both engines.  Events whose user never ordered keep nulls (left
    as-of semantics).
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("t"),
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
    # Total order within each user partition: time, then orders before
    # events at equal time (<= as-of), then a non-null row id.
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_event", F.coalesce("o_orderkey", "event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.unionByName(od)
        .withColumn("last_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("last_total", F.last("o_totalprice", ignorenulls=True).over(w))
        .filter(F.col("is_event") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("ts"),
            "last_orderkey",
            "last_total",
        )
    )


ORACLE_ASOF_LAST_ORDER = """
WITH u AS (
    SELECT user_id, ts AS t, 1 AS is_event, event_id,
           CAST(NULL AS BIGINT) AS o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice
    FROM events
    UNION ALL
    SELECT o_custkey, o_orderdate, 0, CAST(NULL AS BIGINT), o_orderkey, o_totalprice
    FROM orders
), w AS (
    SELECT *,
        last_value(o_orderkey IGNORE NULLS) OVER (
            PARTITION BY user_id
            ORDER BY t, is_event, coalesce(o_orderkey, event_id)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS last_orderkey,
        last_value(o_totalprice IGNORE NULLS) OVER (
            PARTITION BY user_id
            ORDER BY t, is_event, coalesce(o_orderkey, event_id)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS last_total
    FROM u
)
SELECT event_id, user_id, t AS ts, last_orderkey, last_total
FROM w WHERE is_event = 1
"""


# --- Theta (band) join: broadcast nested loop over a constant dim ----------

_BANDS = [
    (0.0, 10.0, "q00_10"),
    (10.0, 20.0, "q10_20"),
    (20.0, 30.0, "q20_30"),
    (30.0, 40.0, "q30_40"),
    (40.0, 1e18, "q40_plus"),
]


def q_quantity_band_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta join: bucket lineitems into quantity bands via a
    broadcast ``lo <= q < hi`` nested-loop join, then aggregate."""
    li = table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_BANDS, "lo double, hi double, band string")
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double")
                / F.count("l_extendedprice"),
                6,
            ).alias("avg_price"),
        )
    )


ORACLE_QUANTITY_BAND_AGG = """
SELECT
    band,
    count(*) AS n_items,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
    round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        / count(l_extendedprice), 6) AS avg_price
FROM lineitem
JOIN (VALUES
        (0.0, 10.0, 'q00_10'),
        (10.0, 20.0, 'q10_20'),
        (20.0, 30.0, 'q20_30'),
        (30.0, 40.0, 'q30_40'),
        (40.0, 1e18, 'q40_plus')
     ) AS b(lo, hi, band)
  ON l_quantity >= lo AND l_quantity < hi
GROUP BY band
"""


# --- Interval (equi + range) join ------------------------------------------

def q_events_near_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events within 3 days after the same user's order, per order.

    The equi-key (user) rides in the join condition so Catalyst plans
    a shuffled hash join with the time range as a residual — the only
    interval-join shape that survives 100 TB (a key-free range join
    would be a cartesian explosion).
    """
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("ts"), F.col("event_id")
    )
    od = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    return (
        od.join(
            ev,
            (od.user_id == ev.user_id)
            & (ev.ts >= od.o_orderdate)
            & (ev.ts < od.o_orderdate + F.expr("INTERVAL 3 DAYS")),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_event_ts"),
            F.max("ts").alias("last_event_ts"),
        )
    )


ORACLE_EVENTS_NEAR_ORDERS = """
SELECT
    o_orderkey,
    count(*) AS n_events,
    min(ts) AS first_event_ts,
    max(ts) AS last_event_ts
FROM orders
JOIN events
  ON o_custkey = user_id
 AND ts >= o_orderdate
 AND ts < o_orderdate + INTERVAL 3 DAY
GROUP BY o_orderkey
"""


# --- Exact + approximate percentiles ----------------------------------------

def q_quantity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group.

    ``percentile`` and DuckDB's ``quantile_cont`` both compute
    ``a + frac·(b−a)`` at rank ``(n−1)·q``; with quarter-point
    quantiles over small-magnitude doubles every step is IEEE-exact,
    and round(6) guards the residue.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("qty_p25"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("qty_p50"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("qty_p75"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
    )


ORACLE_QUANTITY_QUANTILES = """
SELECT
    l_returnflag,
    count(*) AS n_rows,
    round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25,
    round(quantile_cont(l_quantity, 0.50), 6) AS qty_p50,
    round(quantile_cont(l_quantity, 0.75), 6) AS qty_p75,
    min(l_quantity) AS qty_min,
    max(l_quantity) AS qty_max
FROM lineitem
GROUP BY l_returnflag
"""


def q_approx_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (no oracle: sketch-specific results).

    ``percentile_approx`` builds a fixed-size mergeable sketch per
    group — map-side combinable, constant memory — the 100 TB path
    where exact percentiles would shuffle every value.  This is the
    PRODUCTION path; the REGISTERED entry is the verdict form below
    (round 11) so its rows-only driver record carries the GK rank
    contract instead of bare estimates.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "price_p50_approx"
        ),
        F.percentile_approx("l_extendedprice", F.lit(0.99), F.lit(10000)).alias(
            "price_p99_approx"
        ),
    )


#: percentile_approx accuracy parameter used above; the GK guarantee
#: is a rank error of at most n/accuracy (+1 for the discrete pick).
APPROX_Q_ACCURACY = 10_000


def q_approx_quantiles_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REGISTERED form: per (group, quantile), the sketch value,
    its TRUE rank (one corpus pass of conditional counts against the
    6-row broadcast estimate frame), the target rank q·n, the
    n/accuracy+1 rank bound, and the within_bound flag — the
    Greenwald-Khanna contract as driver-checkable rows.
    """
    est = q_approx_quantiles_price(spark, sf_dir)
    melted = est.select(
        "l_returnflag",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0.5).alias("quantile"),
                    F.col("price_p50_approx").alias("approx_value"),
                ),
                F.struct(
                    F.lit(0.99).alias("quantile"),
                    F.col("price_p99_approx").alias("approx_value"),
                ),
            )
        ).alias("qv"),
    ).select("l_returnflag", "qv.quantile", "qv.approx_value")
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    ranked = (
        li.join(F.broadcast(melted), "l_returnflag")
        .groupBy("l_returnflag", "quantile", "approx_value")
        .agg(
            F.sum(
                F.when(
                    F.col("l_extendedprice") <= F.col("approx_value"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("rank"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    rank_err = F.abs(
        F.col("rank").cast("double")
        - F.col("quantile") * F.col("n").cast("double")
    )
    bound = F.col("n").cast("double") / F.lit(APPROX_Q_ACCURACY) + F.lit(1.0)
    return ranked.select(
        "l_returnflag",
        "quantile",
        "approx_value",
        "rank",
        "n",
        F.round(rank_err, 2).alias("rank_err"),
        F.round(bound, 2).alias("rank_bound"),
        (rank_err <= bound).alias("within_bound"),
    ).orderBy("l_returnflag", "quantile")



def q_full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: event activity vs urgent-order customers.

    The reconciliation pattern (which entities appear on one side only)
    needs FULL OUTER — the one join type the sleep pipeline never uses.
    Both grouped inputs are small relative to their facts; at scale
    full-outer cannot broadcast (both sides must keep unmatched rows),
    so this is the one join here that legitimately shuffles both sides
    on the key.
    """
    ev = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders")
    activity = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
            "event_value"
        ),
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_urgent"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
                "urgent_spend"
            ),
        )
    )
    return (
        activity.join(
            urgent, activity.user_id == urgent.o_custkey, "full_outer"
        )
        .select(
            F.coalesce("user_id", "o_custkey").alias("entity_id"),
            "n_events",
            "event_value",
            "n_urgent",
            "urgent_spend",
        )
    )


ORACLE_FULL_OUTER_RECONCILIATION = """
WITH activity AS (
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS event_value
    FROM events GROUP BY user_id
),
urgent AS (
    SELECT o_custkey, count(*) AS n_urgent,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS urgent_spend
    FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
)
SELECT coalesce(user_id, o_custkey) AS entity_id,
       n_events, event_value, n_urgent, urgent_spend
FROM activity FULL OUTER JOIN urgent ON user_id = o_custkey
"""


QUERIES = {
    "asof_last_order": q_asof_last_order,
    "quantity_band_agg": q_quantity_band_agg,
    "events_near_orders": q_events_near_orders,
    "quantity_quantiles": q_quantity_quantiles,
    "approx_quantiles_price": q_approx_quantiles_verdict,
    "full_outer_reconciliation": q_full_outer_reconciliation,
}

ORACLES = {
    "asof_last_order": ORACLE_ASOF_LAST_ORDER,
    "quantity_band_agg": ORACLE_QUANTITY_BAND_AGG,
    "events_near_orders": ORACLE_EVENTS_NEAR_ORDERS,
    "quantity_quantiles": ORACLE_QUANTITY_QUANTILES,
    "full_outer_reconciliation": ORACLE_FULL_OUTER_RECONCILIATION,
}
