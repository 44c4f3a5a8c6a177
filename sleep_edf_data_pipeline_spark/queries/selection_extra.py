"""Rank-based corpus selection: per-domain top-decile quality cut.

The CCNet-style selection step the quality family was missing: score
every document with an exact integer quality metric, rank WITHIN its
source domain, and keep the top 10% per domain — so no domain is
wiped out by a global threshold (the same reason `stratified_sample`
caps per group).

Determinism: the score is pure BIGINT arithmetic (alpha-token count
scaled by 1e6, integer-divided by token count — no float ratio), the
rank order is totally tie-broken by doc_id, and percent_rank's
(rank−1)/(n−1) is an exact small-integer fraction in double, so the
0.1 cut compares identically in any IEEE engine.

Scale shape: one hash-partition on source (the natural selection unit)
carrying only (doc_id, source, two BIGINTs) — text never shuffles; the
scoring projection is codegen higher-order functions on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table


def q_quality_decile_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks).cast("bigint")
    alpha = F.size(
        F.filter(toks, lambda t: t.rlike("^[a-z]+$"))
    ).cast("bigint")
    # integer division via `div`: a double division + BIGINT cast would
    # truncate in Spark but round in DuckDB (known cross-engine trap)
    scored = docs.select(
        "doc_id",
        "source",
        (alpha * F.lit(1_000_000).cast("bigint")).alias("a_scaled"),
        n_toks.alias("n_toks"),
    ).select(
        "doc_id",
        "source",
        F.expr("a_scaled div n_toks").alias("qscore"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("qscore"), F.asc("doc_id")
    )
    return (
        scored.select(
            "doc_id", "source", "qscore",
            F.percent_rank().over(w).alias("pr"),
        )
        .filter(F.col("pr") <= 0.1)
    )


ORACLE_QUALITY_DECILE_SELECT = """
WITH scored AS (
    SELECT doc_id, source,
           (CAST(len(list_filter(string_split(text, ' '),
                                 t -> regexp_full_match(t, '[a-z]+')))
                 AS BIGINT) * 1000000)
           // CAST(len(string_split(text, ' ')) AS BIGINT) AS qscore
    FROM documents
)
SELECT doc_id, source, qscore,
       percent_rank() OVER (PARTITION BY source
                            ORDER BY qscore DESC, doc_id ASC) AS pr
FROM scored
QUALIFY pr <= 0.1
"""


QUERIES = {"quality_decile_select": q_quality_decile_select}
ORACLES = {"quality_decile_select": ORACLE_QUALITY_DECILE_SELECT}
