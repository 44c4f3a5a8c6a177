"""Trend statistics: per-group OLS regression and autocorrelation.

Two classical analytics shapes the registry did not yet cover:

* ``revenue_trend_ols`` — least-squares trend line (slope, intercept,
  R²) of monthly revenue per nation.  The canonical "is this segment
  growing?" query; the reference's analytics layer answers the same
  question with per-subject trend summaries over epoch aggregates
  (models/marts, sleep summary metrics) — here re-expressed on the
  TPC-H fact tables.
* ``acf_user_value`` — lag-1/2/3 autocorrelation of each user's event
  value series.  The standard seasonality/persistence probe over an
  event stream, one window walk per user.

Cross-engine determinism (the SCALING.md float rules):

Both queries are *moment* computations — every aggregate is a sum of
integer-quantized terms, held in DECIMAL(38,0) (int128; HUGEINT in the
DuckDB oracle) so the sums are exact and order-free regardless of
partitioning.  Floating point appears only AFTER aggregation, in a
fixed expression tree (cast → subtract/multiply → divide → sqrt), and
every IEEE op there is correctly rounded and engine-independent, so
the final doubles are bit-identical.

Scale notes (100 TB): ``revenue_trend_ols`` reduces the fact table to
(nation × month) partial aggregates map-side before any shuffle — the
second-stage input is a few thousand rows no matter the corpus size.
``acf_user_value`` is one hash-partition by user_id and one ordered
window walk computing all three lags in a single frame — no self-join,
no second shuffle; a user's history streams through the window buffer.
Quantized moments in int128 cannot overflow (y ≤ 2^40-dollar months
would be needed to stress 38 digits).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import table

#: int128 carrier for exact moment sums (HUGEINT on the oracle side).
_D38 = "decimal(38,0)"

#: Fixed-point scale for event values (2^10; values are O(100), so
#: quantized terms stay far inside the exact-double and int128 range).
ACF_SCALE = 1 << 10

#: Autocorrelation lags computed (one window walk covers all three).
ACF_LAGS = (1, 2, 3)

#: Minimum (a, b) pairs for an ACF row — below this the estimate is
#: noise and (for constant series) the denominator degenerates.
ACF_MIN_PAIRS = 8


def _d(c):
    return c.cast(_D38)


def q_revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS trend of monthly gross revenue per customer nation.

    Stage 1 folds lineitem revenue (DECIMAL-exact
    ``l_extendedprice·(1−l_discount)``) to one BIGINT whole-dollar
    value per (nation, month); the month index x = 12·(year−1995) +
    month−1 is a small integer.  Stage 2 reduces each nation's ≤80
    (x, y) points to the five OLS moments n, Σx, Σx², Σy, Σxy, Σy² —
    exact in int128 — and emits::

        slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n
        r2        = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))

    Plan: lineitem⋈orders is the only fact-scale shuffle (orderkey);
    customer and nation ride as broadcasts; the month rollup happens
    map-side (partial agg) so the nation-level pass sees thousands of
    rows, not the fact table.  Degenerate nations (constant revenue,
    Σ-variance 0) are filtered on the exact integer term in both
    engines.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("rev"),
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (
            (F.year("o_orderdate") - F.lit(1995)) * 12
            + F.month("o_orderdate")
            - 1
        ).alias("x"),
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    monthly = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "x")
        .agg(F.floor(F.sum("rev")).cast("bigint").alias("y"))
    )

    x, y = F.col("x"), F.col("y")
    mom = monthly.groupBy("n_name").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(x).cast("bigint").alias("sx"),
        F.sum(x * x).cast("bigint").alias("sxx"),
        F.sum(_d(y)).cast(_D38).alias("sy"),
        F.sum(_d(x) * _d(y)).cast(_D38).alias("sxy"),
        F.sum(_d(y) * _d(y)).cast(_D38).alias("syy"),
    )

    num = (_d(F.col("n")) * F.col("sxy") - _d(F.col("sx")) * F.col("sy")).cast(_D38)
    den_x = (_d(F.col("n")) * _d(F.col("sxx")) - _d(F.col("sx")) * _d(F.col("sx"))).cast(_D38)
    den_y = (_d(F.col("n")) * F.col("syy") - F.col("sy") * F.col("sy")).cast(_D38)

    slope = num.cast("double") / den_x.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    r2 = (num.cast("double") * num.cast("double")) / (
        den_x.cast("double") * den_y.cast("double")
    )

    return (
        mom.filter((den_x > 0) & (den_y > 0))
        .select(
            "n_name",
            F.col("n").alias("n_months"),
            slope.alias("slope"),
            intercept.alias("intercept"),
            r2.alias("r2"),
        )
    )


ORACLE_REVENUE_TREND_OLS = """
WITH monthly AS (
    SELECT
        n_name,
        (EXTRACT(year FROM o_orderdate) - 1995) * 12
            + EXTRACT(month FROM o_orderdate) - 1 AS x,
        CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2))
                          - CAST(l_discount AS DECIMAL(18,2)))))
             AS BIGINT) AS y
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name, x
),
mom AS (
    SELECT
        n_name,
        CAST(count(*) AS BIGINT)     AS n,
        CAST(sum(x) AS BIGINT)       AS sx,
        CAST(sum(x * x) AS BIGINT)   AS sxx,
        CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
        CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
    FROM monthly
    GROUP BY n_name
),
terms AS (
    SELECT
        n_name, n, sx, sy,
        CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
             AS HUGEINT) AS num,
        CAST(CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
             - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)
             AS HUGEINT) AS den_x,
        CAST(CAST(n AS HUGEINT) * syy - sy * sy AS HUGEINT) AS den_y
    FROM mom
)
SELECT
    n_name,
    n AS n_months,
    CAST(num AS DOUBLE) / CAST(den_x AS DOUBLE) AS slope,
    (CAST(sy AS DOUBLE)
     - (CAST(num AS DOUBLE) / CAST(den_x AS DOUBLE)) * CAST(sx AS DOUBLE))
        / CAST(n AS DOUBLE) AS intercept,
    (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
        / (CAST(den_x AS DOUBLE) * CAST(den_y AS DOUBLE)) AS r2
FROM terms
WHERE den_x > 0 AND den_y > 0
"""


def q_acf_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/2/3 autocorrelation of each user's event-value series.

    One window walk per user (ordered by ts, event_id) materializes the
    three lagged values; an explode turns (row, lag) into the long
    form, and a single hash agg per (user, lag) folds the Pearson
    moments of the (current, lagged) pairs — all on fixed-point
    BIGINT terms carried in int128, so the sums are exact.  The final

        r_k = (nΣab − ΣaΣb) / sqrt((nΣa² − (Σa)²) · (nΣb² − (Σb)²))

    runs in IEEE doubles with one fixed expression tree (the sqrt is
    correctly rounded, hence engine-identical).  Users with fewer than
    ACF_MIN_PAIRS pairs at a lag, or a constant series (either exact
    integer variance term zero), are dropped in both engines.
    """
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            F.floor(F.col("value") * F.lit(ACF_SCALE)).cast("bigint").alias("q"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "q",
        *[F.lag("q", k).over(w).alias(f"b{k}") for k in ACF_LAGS],
    )
    pairs = lagged.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("lag"),
                        F.col("q").alias("a"),
                        F.col(f"b{k}").alias("b"),
                    )
                    for k in ACF_LAGS
                ]
            )
        ).alias("p"),
    ).select(
        "user_id", F.col("p.lag").alias("lag"), F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).filter(F.col("b").isNotNull())

    a, b = F.col("a"), F.col("b")
    mom = pairs.groupBy("user_id", "lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(_d(a)).cast(_D38).alias("sa"),
        F.sum(_d(b)).cast(_D38).alias("sb"),
        F.sum(_d(a) * _d(a)).cast(_D38).alias("saa"),
        F.sum(_d(b) * _d(b)).cast(_D38).alias("sbb"),
        F.sum(_d(a) * _d(b)).cast(_D38).alias("sab"),
    )

    num = (_d(F.col("n")) * F.col("sab") - F.col("sa") * F.col("sb")).cast(_D38)
    den_a = (_d(F.col("n")) * F.col("saa") - F.col("sa") * F.col("sa")).cast(_D38)
    den_b = (_d(F.col("n")) * F.col("sbb") - F.col("sb") * F.col("sb")).cast(_D38)

    return (
        mom.filter(
            (F.col("n") >= ACF_MIN_PAIRS) & (den_a > 0) & (den_b > 0)
        )
        .select(
            "user_id",
            "lag",
            F.col("n").alias("n_pairs"),
            (
                num.cast("double")
                / F.sqrt(den_a.cast("double") * den_b.cast("double"))
            ).alias("acf"),
        )
    )


ORACLE_ACF_USER_VALUE = f"""
WITH q AS (
    SELECT user_id, ts, event_id,
           CAST(floor(value * {ACF_SCALE}) AS BIGINT) AS q
    FROM events
    WHERE value IS NOT NULL
),
lagged AS (
    SELECT user_id, q,
           lag(q, 1) OVER w AS b1,
           lag(q, 2) OVER w AS b2,
           lag(q, 3) OVER w AS b3
    FROM q
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
pairs AS (
    SELECT user_id, 1 AS lag, q AS a, b1 AS b FROM lagged WHERE b1 IS NOT NULL
    UNION ALL
    SELECT user_id, 2 AS lag, q AS a, b2 AS b FROM lagged WHERE b2 IS NOT NULL
    UNION ALL
    SELECT user_id, 3 AS lag, q AS a, b3 AS b FROM lagged WHERE b3 IS NOT NULL
),
mom AS (
    SELECT user_id, lag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(a AS HUGEINT)) AS HUGEINT) AS sa,
           CAST(sum(CAST(b AS HUGEINT)) AS HUGEINT) AS sb,
           CAST(sum(CAST(a AS HUGEINT) * CAST(a AS HUGEINT)) AS HUGEINT) AS saa,
           CAST(sum(CAST(b AS HUGEINT) * CAST(b AS HUGEINT)) AS HUGEINT) AS sbb,
           CAST(sum(CAST(a AS HUGEINT) * CAST(b AS HUGEINT)) AS HUGEINT) AS sab
    FROM pairs
    GROUP BY user_id, lag
),
terms AS (
    SELECT user_id, lag, n,
           CAST(CAST(n AS HUGEINT) * sab - sa * sb AS HUGEINT) AS num,
           CAST(CAST(n AS HUGEINT) * saa - sa * sa AS HUGEINT) AS den_a,
           CAST(CAST(n AS HUGEINT) * sbb - sb * sb AS HUGEINT) AS den_b
    FROM mom
)
SELECT user_id, lag, n AS n_pairs,
       CAST(num AS DOUBLE)
           / sqrt(CAST(den_a AS DOUBLE) * CAST(den_b AS DOUBLE)) AS acf
FROM terms
WHERE n >= {ACF_MIN_PAIRS} AND den_a > 0 AND den_b > 0
"""


QUERIES = {
    "revenue_trend_ols": q_revenue_trend_ols,
    "acf_user_value": q_acf_user_value,
}

ORACLES = {
    "revenue_trend_ols": ORACLE_REVENUE_TREND_OLS,
    "acf_user_value": ORACLE_ACF_USER_VALUE,
}
