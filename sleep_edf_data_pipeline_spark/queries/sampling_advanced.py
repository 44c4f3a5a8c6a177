"""Round-9: priority sampling — weighted top-k sample + subset-sum
estimator (Duffield, Lund & Thorup, JACM 2007).

The 100 TB problem: estimating Σ w over arbitrary ad-hoc subsets
without scanning the fact table — keep ONE k-item weighted sample and
answer any subset-sum from it.  Priority sampling is the provably
near-variance-optimal scheme: each item draws priority
``q_i = w_i / u_i`` (``u_i`` uniform in (0,1]), the sample is the k
largest priorities, the threshold ``τ`` is the (k+1)-th, and each
sampled item estimates with weight ``max(w_i, τ)`` — an unbiased
estimator whose variance no k+1-sample scheme can beat (DLT's main
theorem).

Engine-exact by construction — this is the transcendental-free member
of the weighted-sampling family (A-ES/A-Res need ``u^(1/w)`` or
``ln u``, whose libm bits differ across engines): ``u`` is the 60-bit
deterministic hash folded to 31 bits, priorities are ONE double
multiply + divide (identical IEEE in both engines), the top-(k+1) cut
compiles to TakeOrderedAndProject (never a global sort), and the
bounded estimator sum folds over an explicitly ordered (k+1)-element
array so even the float addition order is pinned.  The exact corpus
total — which the estimator exists to avoid at scale — is computed
here as the accuracy contract, the same honesty row the recall evals
publish.

Output: one row — population size, k, the realized threshold, the
exact total (BIGINT cents), the estimate, and the relative error.

Reference scope: no sampling-estimator surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's
selection/sketch family per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..tables import spread, table

#: Sample size (the estimator keeps k items; the cut scans k+1).
PS_K = 256

#: 31-bit uniform domain for the hash-derived u.
_U_DOM = 1 << 31


def q_priority_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(table(spark, sf_dir, "lineitem"), "l_orderkey").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").cast("bigint").alias("lnum"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("w"),
    )
    u = (
        hash64(
            F.concat_ws("|", F.col("okey"), F.col("lnum")), seed="psamp"
        )
        % _U_DOM
        + 1
    )
    q = (
        F.col("w").cast("double")
        * F.lit(float(_U_DOM))
        / F.col("u").cast("double")
    )
    scored = li.select("okey", "lnum", "w", u.alias("u")).select(
        "okey", "lnum", "w", q.alias("q")
    )
    # TakeOrderedAndProject: the k+1 cut never global-sorts
    top = scored.orderBy(F.desc("q"), "okey", "lnum").limit(PS_K + 1)
    packed = top.agg(
        F.reverse(
            F.array_sort(
                F.collect_list(F.struct("q", "okey", "lnum", "w"))
            )
        ).alias("a"),
        F.count("*").alias("n"),
    )
    tau = F.when(
        F.col("n") > PS_K, F.element_at("a", F.col("n").cast("int")).getField("q")
    ).otherwise(F.lit(0.0))
    sample = F.slice(F.col("a"), 1, PS_K)
    est = F.aggregate(
        sample,
        F.lit(0.0),
        lambda acc, s: acc
        + F.greatest(s.getField("w").cast("double"), F.col("_tau")),
    )
    sampled = packed.select(
        F.col("n"),
        tau.alias("_tau"),
        F.col("a"),
    ).select(
        F.least(F.col("n"), F.lit(PS_K).cast("bigint")).alias("sample_size"),
        F.col("_tau").alias("tau"),
        est.alias("est_cents"),
    )
    totals = li.agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum("w").cast("bigint").alias("true_total_cents"),
    )
    return sampled.crossJoin(F.broadcast(totals)).select(
        "n_items",
        F.lit(PS_K).cast("int").alias("k"),
        "sample_size",
        "tau",
        "true_total_cents",
        "est_cents",
        (
            (F.col("est_cents") - F.col("true_total_cents").cast("double"))
            / F.col("true_total_cents").cast("double")
        ).alias("rel_err"),
    )


ORACLE_PRIORITY_SAMPLE_ESTIMATE = f"""
WITH li AS (
    SELECT l_orderkey AS okey,
           CAST(l_linenumber AS BIGINT) AS lnum,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS w
    FROM lineitem
),
scored AS (
    SELECT okey, lnum, w,
           CAST(w AS DOUBLE) * CAST({_U_DOM} AS DOUBLE)
               / CAST(({hash64_sql(
                   "CAST(okey AS VARCHAR) || '|' || CAST(lnum AS VARCHAR)",
                   seed="psamp",
               )})
                      % {_U_DOM} + 1 AS DOUBLE) AS q
    FROM li
),
top AS (
    SELECT * FROM scored ORDER BY q DESC, okey, lnum LIMIT {PS_K + 1}
),
packed AS (
    SELECT list({{'q': q, 'okey': okey, 'lnum': lnum, 'w': w}}
                ORDER BY q DESC, okey DESC, lnum DESC) AS a,
           CAST(count(*) AS BIGINT) AS n
    FROM top
),
est AS (
    SELECT least(n, {PS_K}) AS sample_size,
           CASE WHEN n > {PS_K} THEN a[CAST(n AS INT)].q
                ELSE CAST(0 AS DOUBLE) END AS tau,
           n, a
    FROM packed
),
est2 AS (
    SELECT sample_size, tau,
           coalesce(list_sum(list_transform(a[1:{PS_K}],
               s -> greatest(CAST(s.w AS DOUBLE), tau))), 0) AS est_cents
    FROM est
),
totals AS (
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(w) AS BIGINT) AS true_total_cents
    FROM li
)
SELECT n_items,
       CAST({PS_K} AS INT) AS k,
       sample_size,
       tau,
       true_total_cents,
       est_cents,
       (est_cents - CAST(true_total_cents AS DOUBLE))
           / CAST(true_total_cents AS DOUBLE) AS rel_err
FROM est2, totals
"""


QUERIES = {
    "priority_sample_estimate": q_priority_sample_estimate,
}

ORACLES = {
    "priority_sample_estimate": ORACLE_PRIORITY_SAMPLE_ESTIMATE,
}
