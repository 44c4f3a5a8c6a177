"""Round-9: classic readability scores per source (quality family).

Flesch reading-ease, Flesch–Kincaid grade, and Gunning fog are the
standard cheap text-quality signals (used alongside the Gopher rules
and stopword/length heuristics this repo already registers in
``gopher_quality_flags`` / ``quality_scores``) for corpus triage:
boilerplate and machine-generated text land at implausible readability
extremes, so per-source score profiles flag whole shards for review.

Heuristics (deterministic, engine-portable — no dictionaries):

- **words**: lowercased ``\\s+`` tokens (the repo-wide ``tokens()``
  kernel), empties filtered;
- **sentences**: ``[.!?]+``-delimited non-empty segments, floored at 1
  (a no-punctuation document is one sentence — the honest fallback,
  not a pseudo-sentence re-segmentation, because sentence counts feed
  ratios rather than dedup grains);
- **syllables**: per word, the count of vowel runs ``[aeiouy]+``
  floored at 1 (the textbook approximation);
- **complex words** (fog): words with ≥ 3 vowel runs.

All per-document ratios are computed in integer micro-units (the
repo's fixed-point discipline: BIGINT sums are order-independent, so
Spark's partial aggregation and DuckDB's serial aggregation match
bit-for-bit): e.g. Flesch ``206.835 − 1.015·wps − 84.6·spw`` becomes
``206835000 − (1015·wps_µ) div 1000 − (846·spw_µ) div 10``.  Only the
final presentation divides back to double.

Scale shape (100 TB): ONE corpus pass — every feature is a codegen
projection over the text column (regexp + higher-order folds, no
Python), followed by a map-side-combinable groupBy on ``source``
(cardinality = handful).  No joins, no windows, no collects.

Reference scope: no corpus surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's
quality-scoring family per the build brief's text-analysis mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import tokens
from ..tables import spread, table

#: Micro fixed-point scale for per-document ratios.
_MICRO = 1_000_000


def readability_partials(docs: DataFrame) -> DataFrame:
    """Per-source partial sums from a (source, text) frame — the head
    shared by the batch query and the streaming monitor
    (streaming/readability.py).

    Every output column is an algebraic fold (doc counts and BIGINT
    micro-unit sums), so partials over ANY partition of the corpus —
    any micro-batching, any arrival order — merge by summation to the
    full-corpus frame exactly.  State is one row per source.
    """
    w = F.filter(tokens(F.col("text")), lambda x: x != F.lit(""))
    n_words = F.greatest(F.size(w).cast("bigint"), F.lit(1).cast("bigint"))
    n_sents = F.greatest(
        F.size(
            F.filter(
                F.split(F.col("text"), r"[.!?]+"),
                lambda s: F.trim(s) != F.lit(""),
            )
        ).cast("bigint"),
        F.lit(1).cast("bigint"),
    )
    runs = F.transform(
        w,
        lambda wd: F.size(
            F.regexp_extract_all(wd, F.lit("[aeiouy]+"), F.lit(0))
        ),
    )
    n_syll = F.aggregate(
        runs,
        F.lit(0).cast("bigint"),
        lambda acc, r: acc + F.greatest(r, F.lit(1)).cast("bigint"),
    )
    n_complex = F.aggregate(
        runs,
        F.lit(0).cast("bigint"),
        lambda acc, r: acc
        + F.when(r >= 3, F.lit(1)).otherwise(F.lit(0)).cast("bigint"),
    )

    per = docs.select(
        "source",
        n_words.alias("nw"),
        n_sents.alias("ns"),
        n_syll.alias("sy"),
        n_complex.alias("cx"),
    ).select(
        "source",
        "nw",
        F.expr(f"nw * {_MICRO} div ns").alias("wps_u"),
        F.expr(f"sy * {_MICRO} div nw").alias("spw_u"),
        F.expr(f"cx * {_MICRO} div nw").alias("cxr_u"),
    )
    per = per.select(
        "source",
        "nw",
        "wps_u",
        "spw_u",
        F.expr(
            "206835000 - (1015 * wps_u) div 1000 - (846 * spw_u) div 10"
        ).alias("flesch_u"),
        F.expr("(39 * wps_u) div 100 + (118 * spw_u) div 10 - 15590000").alias(
            "fk_u"
        ),
        F.expr("(4 * (wps_u + 100 * cxr_u)) div 10").alias("fog_u"),
    )

    return per.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("nw").cast("bigint").alias("n_words"),
        F.sum("wps_u").cast("bigint").alias("wps_u"),
        F.sum("spw_u").cast("bigint").alias("spw_u"),
        F.sum("flesch_u").cast("bigint").alias("flesch_u"),
        F.sum("fk_u").cast("bigint").alias("fk_u"),
        F.sum("fog_u").cast("bigint").alias("fog_u"),
    )


def scores_from_partials(per: DataFrame) -> DataFrame:
    """Presentation tail over the per-source partial sums — the single
    double division back from micro fixed-point (identical BIGINTs in,
    bit-identical doubles out on any engine)."""

    def _avg(col: str, alias: str) -> F.Column:
        return F.round(
            F.col(col).cast("double")
            / F.col("n_docs")
            / F.lit(float(_MICRO)),
            6,
        ).alias(alias)

    return per.select(
        "source",
        "n_docs",
        "n_words",
        _avg("wps_u", "avg_words_per_sentence"),
        _avg("spw_u", "avg_syllables_per_word"),
        _avg("flesch_u", "avg_flesch"),
        _avg("fk_u", "avg_fk_grade"),
        _avg("fog_u", "avg_fog"),
    )


def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "source", "text"
    )
    return scores_from_partials(readability_partials(docs))


ORACLE_READABILITY_SCORES = f"""
WITH per0 AS (
    SELECT source,
           list_filter(regexp_split_to_array(lower(text), '\\s+'),
                       x -> x != '') AS w,
           greatest(CAST(len(list_filter(
               regexp_split_to_array(text, '[.!?]+'),
               s -> trim(s) != '')) AS BIGINT), 1) AS ns
    FROM documents
),
per1 AS (
    SELECT source,
           greatest(CAST(len(w) AS BIGINT), 1) AS nw,
           ns,
           list_transform(w,
               wd -> len(regexp_extract_all(wd, '[aeiouy]+'))) AS runs
    FROM per0
),
per2 AS (
    SELECT source, nw, ns,
           CAST(coalesce(list_sum(list_transform(runs,
               r -> greatest(r, 1))), 0) AS BIGINT) AS sy,
           CAST(coalesce(list_sum(list_transform(runs,
               r -> CASE WHEN r >= 3 THEN 1 ELSE 0 END)), 0) AS BIGINT) AS cx
    FROM per1
),
per3 AS (
    SELECT source, nw,
           nw * {_MICRO} // ns AS wps_u,
           sy * {_MICRO} // nw AS spw_u,
           cx * {_MICRO} // nw AS cxr_u
    FROM per2
),
per AS (
    SELECT source, nw, wps_u, spw_u,
           206835000 - (1015 * wps_u) // 1000 - (846 * spw_u) // 10 AS flesch_u,
           (39 * wps_u) // 100 + (118 * spw_u) // 10 - 15590000 AS fk_u,
           (4 * (wps_u + 100 * cxr_u)) // 10 AS fog_u
    FROM per3
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nw) AS BIGINT) AS n_words,
       round(CAST(sum(wps_u) AS DOUBLE) / count(*) / {float(_MICRO)}, 6)
           AS avg_words_per_sentence,
       round(CAST(sum(spw_u) AS DOUBLE) / count(*) / {float(_MICRO)}, 6)
           AS avg_syllables_per_word,
       round(CAST(sum(flesch_u) AS DOUBLE) / count(*) / {float(_MICRO)}, 6)
           AS avg_flesch,
       round(CAST(sum(fk_u) AS DOUBLE) / count(*) / {float(_MICRO)}, 6)
           AS avg_fk_grade,
       round(CAST(sum(fog_u) AS DOUBLE) / count(*) / {float(_MICRO)}, 6)
           AS avg_fog
FROM per GROUP BY source
"""


QUERIES = {
    "readability_scores": q_readability_scores,
}

ORACLES = {
    "readability_scores": ORACLE_READABILITY_SCORES,
}
