"""Advanced window / subquery / UDAF operator classes.

Fills the remaining relational-taxonomy rows not covered elsewhere
(COVERAGE.md §2.6): RANGE window frames (value-based, not row-based),
ignore-nulls LOCF gap-fill, a *correlated* scalar subquery (Catalyst
decorrelation — the uncorrelated twin lives in relational_breadth),
sliding (overlapping) time windows, modern aggregate functions
(count_if / bool_and / bool_or / median), and a custom UDAF surface via
``groupBy().applyInPandas``.

Determinism notes (the driver hash-compares at sf0.01):
- All float sums route through DECIMAL or int64 so partial-aggregation
  merge order cannot perturb low bits.
- Rounding to basis points uses ``floor(x + 0.5)`` on BOTH engines —
  numpy ``round`` is half-to-even while DuckDB ``round`` is
  half-away-from-zero, so neither built-in is portable at ties.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

#: RANGE frame width for trailing spend: 30 days in seconds.
_TRAILING_SECONDS = 30 * 86400


def q_range_frame_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer: a RANGE (value-based) frame.

    Unlike the ROWS frames of the sleep pipeline (SURVEY R4/R9), the
    frame here is bounded by *order-date distance*, so a customer with
    three orders on one day aggregates all three as frame peers.
    Spark expresses time-RANGE frames by ordering on the epoch-seconds
    cast; one shuffle on o_custkey, sort within partitions, no join.
    """
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-_TRAILING_SECONDS, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_30d_spend"),
        F.count("*").over(w).alias("n_orders_30d"),
    )


ORACLE_RANGE_FRAME_SPEND = """
SELECT
    o_orderkey,
    o_custkey,
    o_orderdate,
    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        AS trailing_30d_spend,
    count(*) OVER w AS n_orders_30d
FROM orders
WINDOW w AS (
    PARTITION BY o_custkey
    ORDER BY o_orderdate
    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
)
"""


def q_locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over sensor dropouts.

    'error' events carry no valid reading (masked to NULL), and the
    fill takes the most recent non-null value per user — the standard
    time-series gap-fill, expressed as ``last(..., ignorenulls=True)``
    over a running ROWS frame.  Leading errors stay NULL.  No
    aggregation of floats: values are copied, so the result is
    bit-stable by construction.
    """
    ev = table(spark, sf_dir, "events")
    masked = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(masked, ignorenulls=True).over(w).alias("value_filled"),
    )


ORACLE_LOCF_GAP_FILL = """
SELECT
    event_id,
    user_id,
    ts,
    event_type,
    last_value(CASE WHEN event_type != 'error' THEN value END IGNORE NULLS)
        OVER (
            PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS value_filled
FROM events
"""


def q_correlated_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders pricier than *their own customer's* average order.

    A correlated scalar subquery — the outer row's o_custkey binds
    inside the subquery.  Deliberately written as SQL so Catalyst's
    decorrelation rewrites it (aggregate once per customer + join)
    rather than a hand-rolled groupBy+join; `.explain` shows the
    rewritten Aggregate ⋈ Filter plan with no per-row subplan.
    The average is an exact DECIMAL sum over an exact count, so the
    comparison threshold is bit-identical across engines.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("_aw_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM _aw_orders o
        WHERE o_totalprice > (
            SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)
            FROM _aw_orders i
            WHERE i.o_custkey = o.o_custkey
        )
        """
    )


ORACLE_CORRELATED_ABOVE_CUST_AVG = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > (
    SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
    FROM orders i
    WHERE i.o_custkey = o.o_custkey
)
"""


def q_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 2-hour windows sliding by 1 hour, per event type.

    Each event lands in exactly two windows; ``F.window(ts, "2 hours",
    "1 hour")`` fans out map-side (no self-join) before one grouped
    aggregation — the same operator drives streaming sliding windows.
    """
    ev = table(spark, sf_dir, "events")
    win = F.window("ts", "2 hours", "1 hour")
    return (
        ev.groupBy(win, "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


ORACLE_SLIDING_WINDOW_AGG = """
SELECT
    date_trunc('hour', ts) - to_hours(o) AS window_start,
    date_trunc('hour', ts) - to_hours(o) + INTERVAL 2 HOUR AS window_end,
    event_type,
    count(*) AS n_events,
    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
CROSS JOIN (VALUES (0), (1)) AS slides(o)
GROUP BY 1, 2, 3
"""


def q_modern_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / bool_and / bool_or / median per return-flag group.

    Median of an even-sized group is the midpoint of the two middle
    values in both engines (linear-interpolated percentile 0.5), and
    the remaining aggregates are order-free, so the row is
    deterministic without decimal routing.
    """
    lin = table(spark, sf_dir, "lineitem")
    return lin.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_big_discount"),
        F.bool_and(F.col("l_quantity") >= 1).alias("all_qty_positive"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.median("l_extendedprice").alias("median_price"),
    )


ORACLE_MODERN_AGG_SUITE = """
SELECT
    l_returnflag,
    CAST(count(*) FILTER (l_discount > 0.05) AS BIGINT) AS n_big_discount,
    bool_and(l_quantity >= 1) AS all_qty_positive,
    bool_or(l_tax > 0.07) AS any_high_tax,
    median(l_extendedprice) AS median_price
FROM lineitem
GROUP BY l_returnflag
"""


def _weighted_discount_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # Exact int64 arithmetic: discounts → basis points, quantities are
    # integral (TESTDATA), so numerator/denominator sums are exact and
    # order-independent; the single final division is deterministic.
    disc_bp = np.floor(pdf["l_discount"].to_numpy() * 10000 + 0.5).astype("int64")
    qty = pdf["l_quantity"].to_numpy().astype("int64")
    num = int((disc_bp * qty).sum())
    den = int(qty.sum())
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "l_linestatus": [pdf["l_linestatus"].iloc[0]],
            "qty_weighted_discount": [num / (10000.0 * den)],
            "total_qty": [den],
        }
    )


def q_weighted_discount_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF: quantity-weighted mean discount via applyInPandas.

    The UDAF surface the reference never needed (SURVEY §2.6 — no
    UDAF registrations): each group arrives as one Arrow-backed pandas
    frame; the weighted mean runs vectorized in numpy.  At scale the
    grouping is a single hash shuffle on two low-cardinality keys —
    for skewed keys, pre-aggregate partial (num, den) pairs per
    partition first (operators/skew.py pattern).
    """
    lin = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_discount"
    )
    return lin.groupBy("l_returnflag", "l_linestatus").applyInPandas(
        _weighted_discount_group,
        schema=(
            "l_returnflag string, l_linestatus string, "
            "qty_weighted_discount double, total_qty bigint"
        ),
    )


ORACLE_WEIGHTED_DISCOUNT_UDAF = """
SELECT
    l_returnflag,
    l_linestatus,
    CAST(sum(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)
             * CAST(l_quantity AS BIGINT)) AS DOUBLE)
        / (10000 * sum(CAST(l_quantity AS BIGINT))) AS qty_weighted_discount,
    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


QUERIES = {
    "range_frame_spend": q_range_frame_spend,
    "locf_gap_fill": q_locf_gap_fill,
    "correlated_above_cust_avg": q_correlated_above_cust_avg,
    "sliding_window_agg": q_sliding_window_agg,
    "modern_agg_suite": q_modern_agg_suite,
    "weighted_discount_udaf": q_weighted_discount_udaf,
}

ORACLES = {
    "range_frame_spend": ORACLE_RANGE_FRAME_SPEND,
    "locf_gap_fill": ORACLE_LOCF_GAP_FILL,
    "correlated_above_cust_avg": ORACLE_CORRELATED_ABOVE_CUST_AVG,
    "sliding_window_agg": ORACLE_SLIDING_WINDOW_AGG,
    "modern_agg_suite": ORACLE_MODERN_AGG_SUITE,
    "weighted_discount_udaf": ORACLE_WEIGHTED_DISCOUNT_UDAF,
}


def q_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear interpolation over sensor dropouts.

    The step past LOCF (`q_locf_gap_fill`): a masked reading is
    reconstructed from its nearest non-null neighbors on BOTH sides,
    weighted by event-time distance — ``prev + (next − prev)·(t −
    t_prev)/(t_next − t_prev)``.  Four ignore-nulls window lookups
    (value/ts × last-before/first-after) over one partition order; no
    float aggregation anywhere (times are exact int64 micros, the lerp
    is a single scalar double expression both engines evaluate with
    the same IEEE ops), so results are bit-stable.  Leading gaps
    backfill from the next reading, trailing gaps carry the last one.
    """
    ev = table(spark, sf_dir, "events")
    masked = F.when(F.col("event_type") != "error", F.col("value"))
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    before = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    after = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_t = F.when(masked.isNotNull(), t_us)
    prev_v = F.last(masked, ignorenulls=True).over(before)
    prev_t = F.last(obs_t, ignorenulls=True).over(before)
    next_v = F.first(masked, ignorenulls=True).over(after)
    next_t = F.first(obs_t, ignorenulls=True).over(after)
    frac = (t_us - prev_t).cast("double") / (next_t - prev_t).cast("double")
    interp = F.when(
        masked.isNotNull(), masked
    ).when(
        prev_v.isNotNull() & next_v.isNotNull() & (next_t != prev_t),
        prev_v + (next_v - prev_v) * frac,
    ).otherwise(F.coalesce(prev_v, next_v))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.round(interp, 6).alias("value_interp"),
    )


ORACLE_LINEAR_INTERPOLATION = """
WITH base AS (
    SELECT
        event_id, user_id, ts, event_type,
        CASE WHEN event_type != 'error' THEN value END AS masked,
        epoch_us(ts) AS t_us
    FROM events
),
neighbors AS (
    SELECT *,
        last_value(masked IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        last_value(CASE WHEN masked IS NOT NULL THEN t_us END IGNORE NULLS)
            OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
        first_value(masked IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        first_value(CASE WHEN masked IS NOT NULL THEN t_us END IGNORE NULLS)
            OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
    FROM base
)
SELECT
    event_id, user_id, ts, event_type,
    round(
        CASE
            WHEN masked IS NOT NULL THEN masked
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND next_t != prev_t
                THEN prev_v + (next_v - prev_v)
                     * (CAST(t_us - prev_t AS DOUBLE)
                        / CAST(next_t - prev_t AS DOUBLE))
            ELSE coalesce(prev_v, next_v)
        END, 6) AS value_interp
FROM neighbors
"""


QUERIES["linear_interpolation"] = q_linear_interpolation
ORACLES["linear_interpolation"] = ORACLE_LINEAR_INTERPOLATION


def q_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every SQL ranking function in one frame, tie-behavior exercised.

    rank / dense_rank / percent_rank / cume_dist rank customers within
    their market segment by WHOLE-dollar balance (coarsened on purpose
    so ties actually occur — tied rows must agree in every engine),
    while ntile runs over the fully tie-broken (balance, custkey)
    order, because ntile assigns by row POSITION and is only
    deterministic under a total order.  percent_rank/cume_dist are
    single divisions of identical integers — bit-stable unrounded.
    """
    cust = table(spark, sf_dir, "customer")
    coarse = F.floor(F.col("c_acctbal"))
    w_tie = Window.partitionBy("c_mktsegment").orderBy(F.desc(coarse))
    w_total = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        coarse.cast("bigint").alias("balance_floor"),
        F.rank().over(w_tie).alias("bal_rank"),
        F.dense_rank().over(w_tie).alias("bal_dense_rank"),
        F.percent_rank().over(w_tie).alias("bal_percent_rank"),
        F.cume_dist().over(w_tie).alias("bal_cume_dist"),
        F.ntile(4).over(w_total).alias("bal_quartile"),
    )


ORACLE_RANKING_SUITE = """
SELECT
    c_custkey,
    c_mktsegment,
    CAST(floor(c_acctbal) AS BIGINT) AS balance_floor,
    CAST(rank() OVER w_tie AS INT) AS bal_rank,
    CAST(dense_rank() OVER w_tie AS INT) AS bal_dense_rank,
    percent_rank() OVER w_tie AS bal_percent_rank,
    cume_dist() OVER w_tie AS bal_cume_dist,
    CAST(ntile(4) OVER (PARTITION BY c_mktsegment
        ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS bal_quartile
FROM customer
WINDOW w_tie AS (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal) DESC)
"""

QUERIES["ranking_suite"] = q_ranking_suite
ORACLES["ranking_suite"] = ORACLE_RANKING_SUITE
