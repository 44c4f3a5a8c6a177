"""Round-10: DDSketch quantiles — a mergeable bounded-state sketch.

Completes the streaming-state story for VALUE DISTRIBUTIONS (VERDICT
r9 item 6): the drift family (PSI/KS/chi2/CUSUM/embedding) is
exact-histogram based, and the one existing quantile sketch
(``approx_quantiles_price``, Spark's Greenwald-Khanna
``percentile_approx``) has no streaming twin because GK merge is
order-sensitive.  DDSketch (Masson, Rim & Lee, VLDB 2019) is the
quantile sketch whose merge IS order-free: values land in geometric
buckets at γᵏ boundaries, the sketch is the bucket-count histogram,
and merging two sketches is exact integer addition per bucket —
commutative and associative like the CMS fold, so a sketch folded
over ANY micro-batching of the stream is bit-identical to the batch
sketch (the property ``streaming/quantiles.py`` pins on replay).

Guarantee: with α the relative accuracy and γ = (1+α)/(1−α), bucket
``i = ceil(ln x / ln γ)`` holds values in (γ^{i−1}, γ^i]; answering a
quantile with the bucket midpoint-in-ratio ``2γ^i/(γ+1)`` is within
relative error α of the TRUE order statistic at the target rank —
the contract ``tests/test_sketch_tolerance.py`` bounds and
``SKETCH_TOLERANCE.json`` records against the exact twin.

State/scale shape (100 TB): the sketch for positive values in
[m, M] has at most ``log_γ(M/m)`` buckets — for the price domain at
α = 0.5% that is ~2.4k buckets per group, INDEPENDENT of row count.
The plan is one map-side-combinable groupBy((grp, bkt)) corpus pass;
the quantile-answering tail runs windows over the ≤ groups × buckets
histogram only.  No driver collect anywhere; the answer stays a
DataFrame.

Driver posture: registered WITHOUT an oracle (a sketch cannot
hash-match an exact oracle — the ``heavy_hitters_cms`` precedent);
the exact twin for the tolerance artifact is the discrete percentile
at the same target rank, measured by ``scripts/sketch_tolerance.py``.

Reference scope: no sketch surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's
approximate family per the build brief.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

#: Relative-accuracy target: every answered quantile is within 0.5%
#: of the exact order statistic at the target rank.
ALPHA = 0.005

#: Geometric bucket ratio, γ = (1+α)/(1−α).
GAMMA = (1.0 + ALPHA) / (1.0 - ALPHA)

_LN_GAMMA = math.log(GAMMA)

#: Quantiles the registered query answers.
QS = (0.5, 0.99)


def ddsketch_histogram(df: DataFrame) -> DataFrame:
    """(grp, bkt, c) sketch from a (grp, x) frame of POSITIVE values —
    the algebraic head shared by the batch query and the streaming
    monitor.  Counts sum, so partials over any partition of the input
    merge to the full sketch exactly (the DDSketch merge operation)."""
    bkt = F.ceil(F.log(F.col("x")) / F.lit(_LN_GAMMA)).cast("int")
    return df.groupBy("grp", bkt.alias("bkt")).agg(
        F.count("*").cast("bigint").alias("c")
    )


def quantiles_from_sketch(sk: DataFrame) -> DataFrame:
    """Answer ``QS`` from the (grp, bkt, c) sketch — windows over the
    ≤ groups × buckets histogram only, never the corpus.

    Target rank (1-based) ``floor(q·(n−1)) + 1`` — the discrete lower
    quantile, matched exactly by the tolerance measurement.  The
    answering bucket is the first whose cumulative count reaches the
    target; its estimate is ``2γ^bkt/(γ+1)``.
    """
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("grp")
    cum = sk.select(
        "grp",
        "bkt",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    est = F.lit(2.0) * F.pow(F.lit(GAMMA), F.col("bkt")) / F.lit(GAMMA + 1.0)
    aggs = [F.max("n").cast("bigint").alias("n_rows"),
            F.count("*").cast("int").alias("n_buckets")]
    for q in QS:
        target = F.floor(F.lit(q) * (F.col("n") - 1)) + 1
        hit = (F.col("cum") >= target) & (F.col("cum") - F.col("c") < target)
        aggs.append(
            F.min(F.when(hit, est)).alias(f"p{int(q * 100)}_sketch")
        )
    return cum.groupBy("grp").agg(*aggs)


def q_ddsketch_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("x"),
    )
    out = quantiles_from_sketch(ddsketch_histogram(li))
    return out.withColumnRenamed("grp", "l_returnflag")


QUERIES = {
    "ddsketch_quantiles_price": q_ddsketch_quantiles_price,
}

# No ORACLES entry: approximate sketch (see module docstring).
ORACLES: dict[str, str] = {}
