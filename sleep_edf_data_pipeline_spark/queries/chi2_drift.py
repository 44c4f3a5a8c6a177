"""Round-9: chi-squared goodness-of-fit drift per source.

Completes the univariate drift family: PSI (``psi_drift_by_source``)
measures distribution shift in likelihood-ratio units, KS
(``ks_two_sample``) in max-CDF-gap units, CUSUM in sequential-mean
units — chi-squared is the classical COUNT-based test (Pearson 1900):
per source, ``Σ_b (o_b − e_b)² / e_b`` over a fixed bucketing of a
numeric feature (``n_chars``), with expectations from the pooled
corpus (``e_b = row_total · bucket_total / N``).  It is the test of
choice when the monitored feature is already categorical/bucketed and
counts are what the pipeline collects.

Distinct from PSI by construction, not just by formula: PSI bins into
corpus DECILES (equal-mass, data-dependent thresholds via the
digit-bucketed cumulative); chi-squared here uses FIXED-WIDTH buckets
against a broadcast 1-row min/max frame — the two disagree exactly
when drift concentrates in a fixed value band, which is why drift
suites ship both.

Exactness: with integers ``o`` (cell), ``rt`` (source total), ``ct``
(bucket total), ``N``, each cell's term is
``(o·N − rt·ct)² / (N·rt·ct)``.  The products are computed in DOUBLE
(each factor cast from BIGINT first — ``rt·ct`` alone would overflow
int64 once N exceeds ~2²¹, far below the advertised corpus sizes, and
``o·N`` beyond ~3·10⁹): both engines then perform the identical
left-associated IEEE multiply/subtract/divide sequence (DuckDB's
vectorized interpreter evaluates each SQL operator as a separate
kernel — no FMA contraction on scalar expressions), so the doubles
are bit-identical cross-engine even where they are no longer exact
integers; quantizing to BIGINT micros with one floor makes the
per-source SUM order-free exact.  Zero-count cells are densified via the
(sources × buckets) grid — a broadcast cross join of two
handful-sized aggregates — because absent cells still contribute
``rt·ct/N``.

Scale shape (100 TB): ONE corpus pass (projection + bucket id against
broadcast stats, map-side-combinable (source, bucket) groupBy); every
later frame is ≤ sources × buckets rows.  No windows, no corpus-sized
joins.

Reference scope: no drift surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's drift
family per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import spread, table

#: Fixed-width buckets over the monitored feature.
CHI2_BUCKETS = 10

#: Micro fixed-point scale for the summed terms.
_MICRO = 1_000_000


def chi2_histogram(docs: DataFrame) -> DataFrame:
    """(source, x, c) value-grain histogram from a (source, n_chars)
    frame — the head shared by the batch query and the streaming
    monitor (streaming/chi2.py).

    The monitored feature keeps its RAW value here (bucketing needs
    the final corpus min/max, which is only known at answer time), so
    every column is an algebraic fold — counts sum, and the tail's
    min/max derive from the value column — and partials over any
    micro-batching merge to the full-corpus histogram exactly.  State
    is sources × distinct feature values (a length histogram: small).
    """
    return docs.groupBy("source", "x").agg(
        F.count("*").cast("bigint").alias("c")
    )


def chi2_from_histogram(hist: DataFrame) -> DataFrame:
    """Bucket + test tail over the value-grain histogram — the shared
    presentation path (identical arithmetic to the module docstring).

    Relies on the registry cache posture (caller clears caches after
    consuming the result).  Long-lived embedders that answer
    repeatedly should use :func:`chi2_tail` and unpersist the returned
    intermediate themselves — see ``streaming/chi2.py``.
    """
    result, _o = chi2_tail(hist)
    return result


def chi2_tail(hist: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Like :func:`chi2_from_histogram`, but also returns the
    persisted (source, bucket) intermediate so callers outside the
    clear-caches-between-queries posture can ``unpersist()`` it once
    the statistic has materialized."""
    stats = hist.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    bucketed = hist.crossJoin(F.broadcast(stats)).select(
        "source",
        F.least(
            F.lit(CHI2_BUCKETS - 1).cast("bigint"),
            F.expr(f"(x - lo) * {CHI2_BUCKETS} div (hi - lo + 1)"),
        ).alias("bkt"),
        "c",
    )
    # persist the reduced (source, bucket) frame: four consumers (ct,
    # rt, n, grid's left join) would each re-run the histogram pass
    # otherwise (8 scans — the corpus-pass-audit anti-pattern).  ≤
    # sources × buckets rows; lazy persist, the bench/driver clear
    # caches between queries (registry posture).
    o = (
        bucketed.groupBy("source", "bkt")
        .agg(F.sum("c").cast("bigint").alias("o"))
        .persist()
    )
    ct = o.groupBy("bkt").agg(F.sum("o").cast("bigint").alias("ct"))
    rt = o.groupBy("source").agg(F.sum("o").cast("bigint").alias("rt"))
    n = ct.agg(F.sum("ct").cast("bigint").alias("n"))

    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(o, ["source", "bkt"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "rt",
            "ct",
            "n",
            F.coalesce("o", F.lit(0).cast("bigint")).alias("o"),
        )
    )
    o_d = F.col("o").cast("double")
    n_d = F.col("n").cast("double")
    rt_d = F.col("rt").cast("double")
    ct_d = F.col("ct").cast("double")
    num = o_d * n_d - rt_d * ct_d
    den = n_d * rt_d * ct_d
    term_u = F.floor(num * num / den * _MICRO).cast("bigint")
    per = grid.select("source", "rt", term_u.alias("tu"))
    result = per.groupBy("source").agg(
        F.max("rt").alias("n_docs"),
        F.count("*").cast("int").alias("n_buckets"),
        (F.sum("tu").cast("double") / F.lit(float(_MICRO))).alias("chi2"),
    )
    return result, o


def q_chi2_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), "doc_id").select(
        "source", F.col("n_chars").cast("bigint").alias("x")
    )
    return chi2_from_histogram(chi2_histogram(docs))


ORACLE_CHI2_DRIFT_BY_SOURCE = f"""
WITH docs AS (
    SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents
),
stats AS (
    SELECT min(x) AS lo, max(x) AS hi FROM docs
),
bucketed AS (
    SELECT source,
           least(CAST({CHI2_BUCKETS - 1} AS BIGINT),
                 (x - lo) * {CHI2_BUCKETS} // (hi - lo + 1)) AS bkt
    FROM docs, stats
),
o AS (
    SELECT source, bkt, CAST(count(*) AS BIGINT) AS o
    FROM bucketed GROUP BY source, bkt
),
ct AS (
    SELECT bkt, CAST(sum(o) AS BIGINT) AS ct FROM o GROUP BY bkt
),
rt AS (
    SELECT source, CAST(sum(o) AS BIGINT) AS rt FROM o GROUP BY source
),
nn AS (
    SELECT CAST(sum(ct) AS BIGINT) AS n FROM ct
),
grid AS (
    SELECT rt.source, rt.rt, ct.ct, nn.n,
           CAST(coalesce(o.o, 0) AS BIGINT) AS o
    FROM rt CROSS JOIN ct CROSS JOIN nn
    LEFT JOIN o ON o.source = rt.source AND o.bkt = ct.bkt
),
terms AS (
    SELECT source, rt,
           CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
           - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) AS num,
           CAST(n AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
               AS den
    FROM grid
),
per AS (
    SELECT source, rt,
           CAST(floor(num * num / den * {_MICRO}) AS BIGINT) AS tu
    FROM terms
)
SELECT source,
       max(rt) AS n_docs,
       CAST(count(*) AS INT) AS n_buckets,
       CAST(sum(tu) AS DOUBLE) / {float(_MICRO)} AS chi2
FROM per GROUP BY source
"""


QUERIES = {
    "chi2_drift_by_source": q_chi2_drift_by_source,
}

ORACLES = {
    "chi2_drift_by_source": ORACLE_CHI2_DRIFT_BY_SOURCE,
}
