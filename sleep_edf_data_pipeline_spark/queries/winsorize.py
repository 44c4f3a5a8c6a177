"""Round-10: winsorized (clipped) robust price statistics per group.

The robust-stats family has MAD outliers (flagging), trimmed deciles
(PSI thresholds), and exact percentiles — but not the standard
WINSORIZED estimator: clamp every value into the exact [p05, p95]
order-statistic band and report the clipped mean with clip counts,
the robust location estimate analysts reach for when outliers must be
bounded, not dropped (Tukey; Huber, *Robust Statistics* §1).

Exactness: prices are exact cents (``round(x·100)``), the thresholds
are DISCRETE order statistics at rank ``floor(q·(n−1))+1`` (the
DDSketch/tolerance target-rank convention), and the clipped sum
``Σ c·clamp(cents, lo, hi)`` folds from the value-grain histogram in
BIGINT — both engines divide identical integers once at the end.

Scale shape (100 TB): ONE corpus pass into the map-side-combinable
(grp, cents) histogram; the cumulative that locates the thresholds is
the ``_bucketed_cumsum`` digit-length decomposition from the PSI
plan, generalized per group — intra-bucket windows partition on
(grp, digit-length) and the offsets window partitions on grp over a
≤19-row digit domain, so NO window anywhere is unbounded in the data
(the naive per-group ordered cumulative would put each group's whole
price domain in one task).  Thresholds are a groups-sized broadcast;
the final fold reruns over the cached histogram.

Reference scope: extends SURVEY §2.6's robust/statistics family per
the build brief; no such surface in the reference
(blaiseclarke/sleep-edf-data-pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

#: Winsorization band (classic 5% both sides).
Q_LO = 0.05
Q_HI = 0.95


def price_histogram(df: DataFrame) -> DataFrame:
    """(grp, cents, c) value-grain histogram from a (grp, cents)
    frame — the algebraic head shared by the batch query and the
    streaming monitor (counts sum, so partials over any micro-batching
    merge exactly)."""
    return df.groupBy("grp", "cents").agg(
        F.count("*").cast("bigint").alias("c")
    )


def grouped_cumsum(hist: DataFrame) -> DataFrame:
    """Per-group digit-length-bucketed inclusive cumsum over the
    (grp, cents, c) histogram (PSI's ``_bucketed_cumsum``
    decomposition with grp added to every partitioning): no
    data-unbounded ordered window anywhere.  Returns
    (grp, cents, c, cum, n).

    PRECONDITION (ADVICE r10): ``cents`` must be a NON-NEGATIVE
    integer key.  The bucket key is the decimal string length, which
    orders values correctly only when digit count is monotone in
    value — a negative key like -5 has string length 2 and would be
    cumulated after every single-digit positive.  Enforced below with
    a loud per-row check because the helper is shared by three
    operators (winsorize, quantile_transform, hll_rollup) plus the
    ddsketch verdict, and a future signed-value caller would
    otherwise silently get wrong cumulative sums.
    """
    guarded = F.when(F.col("cents") >= 0, F.col("cents")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("grouped_cumsum requires non-negative keys; got "),
                F.col("cents").cast("string"),
            )
        ).cast("bigint")
    )
    d = hist.withColumn("cents", guarded).withColumn(
        "_bkt", F.length(F.col("cents").cast("string"))
    )
    wb = (
        Window.partitionBy("grp", "_bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = d.select(
        "*", F.sum("c").over(wb).cast("bigint").alias("_in")
    )
    btot = intra.groupBy("grp", "_bkt").agg(F.max("_in").alias("_bm"))
    w_off = (
        Window.partitionBy("grp")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = (
        Window.partitionBy("grp")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    boff = btot.select(
        "grp",
        "_bkt",
        F.coalesce(F.sum("_bm").over(w_off), F.lit(0))
        .cast("bigint")
        .alias("_off"),
        F.sum("_bm").over(w_tot).cast("bigint").alias("n"),
    )
    return intra.join(F.broadcast(boff), ["grp", "_bkt"]).select(
        "grp",
        "cents",
        "c",
        (F.col("_in") + F.col("_off")).cast("bigint").alias("cum"),
        "n",
    )


def winsorized_from_histogram(hist: DataFrame) -> DataFrame:
    """Threshold + clipped-fold tail over the value-grain histogram —
    the presentation path shared with the streaming monitor.  The
    histogram is persisted here (two consumers: the cumulative and
    the final clipped fold); registry cache posture applies."""
    hist = hist.persist()
    cum = grouped_cumsum(hist)

    def _rank(q: float):
        return F.floor(F.lit(q) * (F.col("n") - 1)) + 1

    def _at(rank):
        hit = (F.col("cum") >= rank) & (F.col("cum") - F.col("c") < rank)
        return F.min(F.when(hit, F.col("cents")))

    thresholds = cum.groupBy("grp").agg(
        F.max("n").alias("n"),
        _at(_rank(Q_LO)).alias("lo"),
        _at(_rank(Q_HI)).alias("hi"),
    )

    clipped = hist.join(F.broadcast(thresholds), "grp").select(
        "grp",
        "n",
        "lo",
        "hi",
        "c",
        (
            F.col("c")
            * F.greatest(F.least(F.col("cents"), F.col("hi")), F.col("lo"))
        ).alias("cs"),
        F.when(F.col("cents") < F.col("lo"), F.col("c"))
        .otherwise(F.lit(0))
        .alias("clo"),
        F.when(F.col("cents") > F.col("hi"), F.col("c"))
        .otherwise(F.lit(0))
        .alias("chi"),
    )
    return clipped.groupBy("grp").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        (F.max("lo").cast("double") / F.lit(100.0)).alias("p05"),
        (F.max("hi").cast("double") / F.lit(100.0)).alias("p95"),
        F.sum("clo").cast("bigint").alias("n_clip_low"),
        F.sum("chi").cast("bigint").alias("n_clip_high"),
        (
            F.sum("cs").cast("double")
            / (F.max("n") * F.lit(100)).cast("double")
        ).alias("winsor_mean"),
    ).withColumnRenamed("grp", "l_returnflag")


def q_winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    return winsorized_from_histogram(price_histogram(li))


ORACLE_WINSORIZED_PRICE_STATS = f"""
WITH li AS (
    SELECT l_returnflag AS grp,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem
),
hist AS (
    SELECT grp, cents, CAST(count(*) AS BIGINT) AS c
    FROM li GROUP BY grp, cents
),
cum AS (
    SELECT grp, cents, c,
           CAST(sum(c) OVER (PARTITION BY grp ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
           CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS n
    FROM hist
),
thresholds AS (
    SELECT grp, max(n) AS n,
           min(CASE WHEN cum >= floor({Q_LO} * (n - 1)) + 1
                    AND cum - c < floor({Q_LO} * (n - 1)) + 1
                    THEN cents END) AS lo,
           min(CASE WHEN cum >= floor({Q_HI} * (n - 1)) + 1
                    AND cum - c < floor({Q_HI} * (n - 1)) + 1
                    THEN cents END) AS hi
    FROM cum GROUP BY grp
),
clipped AS (
    SELECT h.grp, t.n, t.lo, t.hi, h.c,
           h.c * greatest(least(h.cents, t.hi), t.lo) AS cs,
           CASE WHEN h.cents < t.lo THEN h.c ELSE 0 END AS clo,
           CASE WHEN h.cents > t.hi THEN h.c ELSE 0 END AS chi
    FROM hist h JOIN thresholds t ON t.grp = h.grp
)
SELECT grp AS l_returnflag,
       CAST(max(n) AS BIGINT) AS n_rows,
       CAST(max(lo) AS DOUBLE) / 100.0 AS p05,
       CAST(max(hi) AS DOUBLE) / 100.0 AS p95,
       CAST(sum(clo) AS BIGINT) AS n_clip_low,
       CAST(sum(chi) AS BIGINT) AS n_clip_high,
       CAST(sum(cs) AS DOUBLE) / CAST(max(n) * 100 AS DOUBLE) AS winsor_mean
FROM clipped GROUP BY grp
"""


QUERIES = {
    "winsorized_price_stats": q_winsorized_price_stats,
}

ORACLES = {
    "winsorized_price_stats": ORACLE_WINSORIZED_PRICE_STATS,
}
