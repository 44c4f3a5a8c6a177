"""Round-10: HLL-sketch daily distinct rollup + exact cumulative twin.

The 100 TB pattern for "distinct users over an arbitrary date range"
is NOT a distinct-count per query — it is a per-day MERGEABLE sketch
rollup: aggregate each day once into an HLL state, then answer any
range by unioning day states (Datasketches HLL; Flajolet 2007).
Spark ships this natively (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` — Apache DataSketches under the hood), and
this operator exercises that engine surface: per event-day, the
day-distinct estimate AND the cumulative-to-date estimate obtained by
unioning the day sketches through an ordered window over the ≤days
rollup frame (the corpus pass happens ONCE; everything after is
days-sized).

``cum_distinct_users`` is the EXACT twin, and it is exact the scalable
way: cumulative distinct-to-date equals the running count of each
user's FIRST-SEEN day — one map-side-combinable (user → min day)
pass, a days-sized first-seen histogram, and the digit-bucketed
cumulative.  No per-range distinct scans, no corpus-sized windows.

Driver posture: the sketch queries are registered WITHOUT an oracle
(sketch estimates are engine-specific); since round 11 the registered
entries are the VERDICT forms (``q_hll_rollup_verdict`` /
``q_hll_rolling_wau_verdict``): estimate vs exact twin, absolute
error, and the 3·rsd-with-floor-±2 within_bound flag per row, so the
rows-only driver record encodes the contract (VERDICT r10 item 7).
The error contract (3·rsd, lgK=12 → rsd ≈ 1.62%) is also bounded in
tests and the measured deltas recorded in ``SKETCH_TOLERANCE.json``.

Reference scope: extends SURVEY §2.7's approximate/rollup family per
the build brief; no such surface in the reference
(blaiseclarke/sleep-edf-data-pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table
from .winsorize import grouped_cumsum

#: Datasketches lgConfigK: rsd = 1.04 / sqrt(2^lgK) ≈ 1.62%.
HLL_LGK = 12

#: 3-sigma-style relative error bound for the contract tests.
HLL_RSD = 1.04 / (2 ** (HLL_LGK / 2))


def _events_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        F.to_date(F.col("ts")).alias("day"), F.col("user_id")
    )


def q_hll_rollup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_day(spark, sf_dir)
    # ONE corpus pass: per-day HLL state + event count (map-side
    # combinable — sketch partials merge in the partial agg).
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    # days-sized frame from here on: cumulative union through an
    # ordered window over ≤ |days| rows (bounded by the calendar).
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    rolled = daily.select(
        "day",
        "n_events",
        F.hll_sketch_estimate("sk").cast("bigint").alias("est_day_users"),
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
        .cast("bigint")
        .alias("est_cum_users"),
    )
    return rolled


def q_cum_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_day(spark, sf_dir)
    # exact day-distinct via (day, user) dedup; exact CUMULATIVE
    # distinct via each user's first-seen day — both map-side
    # combinable, then a days-sized cumulative (digit-bucketed: the
    # day key is re-expressed as epoch days, a non-negative BIGINT).
    day_users = ev.distinct()
    per_day = day_users.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_day_users")
    )
    first_seen = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    # LEFT-join first-seen counts onto EVERY event day (a day where no
    # new user appears still carries the running total forward), then
    # the digit-bucketed cumulative over epoch days.
    keyed = per_day.select("day").join(first_seen, "day", "left").select(
        F.lit("all").alias("grp"),
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("cents"),
        F.coalesce("c", F.lit(0).cast("bigint")).alias("c"),
    )
    cum = grouped_cumsum(keyed).select(
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("cents").cast("int"))
        .alias("day"),
        F.col("cum").alias("n_cum_users"),
    )
    return per_day.join(cum, "day").select(
        "day", "n_day_users", "n_cum_users"
    )


ORACLE_CUM_DISTINCT_USERS = """
WITH ev AS (
    SELECT CAST(ts AS DATE) AS day, user_id FROM events
),
per_day AS (
    SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_day_users
    FROM ev GROUP BY day
),
first_seen AS (
    SELECT day, CAST(count(*) AS BIGINT) AS c
    FROM (SELECT user_id, min(day) AS day FROM ev GROUP BY user_id)
    GROUP BY day
),
cum AS (
    SELECT p.day,
           CAST(sum(coalesce(f.c, 0)) OVER (ORDER BY p.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_cum_users
    FROM per_day p LEFT JOIN first_seen f ON f.day = p.day
)
SELECT p.day, p.n_day_users, c.n_cum_users
FROM per_day p JOIN cum c ON c.day = p.day
"""


def q_hll_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-4-week active users from MERGED weekly sketches — the
    sketch twin of the exact ``weekly_active_users``.

    The exact query fans each (user, activity-week) to its 4 report
    weeks and distinct-counts — at 100 TB that is 4× the user-week
    grain through a distinct shuffle per report week.  The sketch form
    reduces the corpus ONCE to |weeks| HLL states, fans the
    WEEKS-SIZED sketch frame ×4, and unions per report week: identical
    report-week key set (same fanout rule), mergeable state, and the
    same 3·rsd contract as the daily rollup, measured in
    ``SKETCH_TOLERANCE.json``.
    """
    ev = table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    weekly = ev.select(week.alias("act_week"), "user_id").groupBy(
        "act_week"
    ).agg(F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk"))
    fanned = weekly.select(
        "sk",
        F.explode(
            F.array(
                *[F.date_add(F.col("act_week"), 7 * off) for off in range(4)]
            )
        ).alias("report_week"),
    )
    return fanned.groupBy("report_week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("wau_est")
    )


def _bound(exact_col: str):
    """The contract bound per check: max(2, 3·rsd·exact) — 3-sigma
    relative error with a small-count floor of ±2 (lgK=12)."""
    return F.greatest(
        F.lit(2.0), F.lit(3.0 * HLL_RSD) * F.col(exact_col).cast("double")
    )


def q_hll_rollup_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REGISTERED form (VERDICT r10 item 7): per day, the HLL
    day/cumulative estimates NEXT TO the exact twin's counts, absolute
    errors, and the within_bound flag, so the rows-only driver record
    carries the 3·rsd (floor ±2) contract.  Both sides are one corpus
    pass each; the join is days-sized (both keyed by the same per-day
    grouping of the same events table, so the keysets are identical by
    construction)."""
    est = q_hll_rollup_distinct(spark, sf_dir)
    exact = q_cum_distinct_users(spark, sf_dir)
    j = est.join(exact, "day")
    day_err = F.abs(F.col("est_day_users") - F.col("n_day_users"))
    cum_err = F.abs(F.col("est_cum_users") - F.col("n_cum_users"))
    return j.select(
        "day",
        "n_events",
        "est_day_users",
        "n_day_users",
        day_err.cast("bigint").alias("day_abs_err"),
        "est_cum_users",
        "n_cum_users",
        cum_err.cast("bigint").alias("cum_abs_err"),
        F.lit(round(3 * HLL_RSD, 6)).alias("rel_bound_3rsd"),
        (
            (day_err.cast("double") <= _bound("n_day_users"))
            & (cum_err.cast("double") <= _bound("n_cum_users"))
        ).alias("within_bound"),
    ).orderBy("day")


def q_hll_rolling_wau_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REGISTERED form of the rolling-WAU sketch: per report week,
    the merged-sketch estimate vs the exact ``weekly_active_users``,
    plus a key_matched flag (the fanout rule must yield the identical
    report-week key set — checked via full outer join, not assumed)
    and the 3·rsd (floor ±2) within_bound flag."""
    from .graph_stats import q_weekly_active_users

    est = q_hll_rolling_wau(spark, sf_dir)
    exact = q_weekly_active_users(spark, sf_dir).select(
        "report_week", F.col("wau").cast("bigint").alias("wau_exact")
    )
    j = est.join(exact, "report_week", "full_outer")
    key_matched = F.col("wau_est").isNotNull() & F.col("wau_exact").isNotNull()
    err = F.abs(F.col("wau_est") - F.col("wau_exact"))
    return j.select(
        "report_week",
        "wau_est",
        "wau_exact",
        err.cast("bigint").alias("abs_err"),
        key_matched.alias("key_matched"),
        F.lit(round(3 * HLL_RSD, 6)).alias("rel_bound_3rsd"),
        (key_matched & (err.cast("double") <= _bound("wau_exact"))).alias(
            "within_bound"
        ),
    ).orderBy("report_week")


QUERIES = {
    "hll_rollup_distinct": q_hll_rollup_verdict,
    "cum_distinct_users": q_cum_distinct_users,
    "hll_rolling_wau": q_hll_rolling_wau_verdict,
}

ORACLES = {
    "cum_distinct_users": ORACLE_CUM_DISTINCT_USERS,
}
