"""Round-10: exact per-group quantile-rank (percentile) transform.

The feature-engineering normalization scikit-learn calls
``QuantileTransformer`` and feature stores ship as "percentile rank":
map every value to its group-relative rank in [0, 1], robust to any
monotone distortion of the raw scale.  The registry's normalizations
(z-score, deciles for selection) are either moment-based or
coarse-binned; this is the exact value-grain transform, emitted at
the distinct-value grain (value → rank is constant within a value, so
emitting per VALUE instead of per ROW is lossless and keeps the
output vocabulary-sized).

Definition: ``pct_rank(v) = |rows strictly below v| / (n − 1)`` — the
SQL ``percent_rank`` of a value, computed in exact integer micros
(``(cum − c)·1e6 div (n − 1)``: identical integer division both
engines) and divided to DOUBLE once.

Scale shape (100 TB): ONE corpus pass into the map-side-combinable
(grp, cents) histogram, then the ``grouped_cumsum`` digit-length
decomposition (shared with ``winsorized_price_stats``) — no
data-unbounded ordered window anywhere; a naive
``percent_rank() OVER (PARTITION BY grp ORDER BY v)`` would sort each
group's whole corpus in one task.

Reference scope: extends SURVEY §2.6's normalization family per the
build brief; no such surface in the reference
(blaiseclarke/sleep-edf-data-pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .winsorize import grouped_cumsum, price_histogram

#: Fixed-point scale for the exact rank ratio.
_MICRO = 1_000_000


def q_quantile_rank_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    cum = grouped_cumsum(price_histogram(li))
    pct_u = F.expr(f"(cum - c) * {_MICRO} div greatest(n - 1, 1)")
    return cum.select(
        F.col("grp").alias("l_returnflag"),
        (F.col("cents").cast("double") / F.lit(100.0)).alias("price"),
        F.col("c").alias("n_occurrences"),
        (pct_u.cast("double") / F.lit(float(_MICRO))).alias("pct_rank"),
    )


ORACLE_QUANTILE_RANK_TRANSFORM = f"""
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
)
SELECT grp AS l_returnflag,
       CAST(cents AS DOUBLE) / 100.0 AS price,
       c AS n_occurrences,
       CAST((cum - c) * {_MICRO} // greatest(n - 1, 1) AS DOUBLE)
           / {float(_MICRO)} AS pct_rank
FROM cum
"""


QUERIES = {
    "quantile_rank_transform": q_quantile_rank_transform,
}

ORACLES = {
    "quantile_rank_transform": ORACLE_QUANTILE_RANK_TRANSFORM,
}
