"""Oracle-checked text-analysis queries over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    LANG_MARKERS,
    LANG_PRIORITY,
    with_fingerprints,
    with_language_id,
    with_quality_score,
    with_token_stats,
)
from ..tables import spread, table

H64 = "CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + char stats per document."""
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    return with_token_stats(docs).select(
        "doc_id", "n_tokens", "n_unique_tokens", "n_chars_measured", "avg_token_len"
    )


ORACLE_TOKEN_STATS = """
WITH t AS (
    SELECT doc_id, text, regexp_split_to_array(lower(text), '\\s+') AS words
    FROM documents
)
SELECT
    doc_id,
    CAST(len(words) AS BIGINT) AS n_tokens,
    CAST(len(list_distinct(words)) AS BIGINT) AS n_unique_tokens,
    CAST(length(text) AS BIGINT) AS n_chars_measured,
    round(
        CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(words),
        6
    ) AS avg_token_len
FROM t
"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID vs the labeled lang column."""
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    return with_language_id(docs).select(
        "doc_id",
        "lang",
        *[f"{lang}_hits" for lang in LANG_PRIORITY],
        "zh_hits",
        "predicted_lang",
    )


def _hits_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        f"CAST(len(list_intersect(list_distinct("
        f"regexp_split_to_array(lower(text), '\\s+')), [{markers}])) AS BIGINT)"
    )


_LANG_CASE = (
    "CASE WHEN zh_hits > greatest(en_hits, es_hits, de_hits, fr_hits) THEN 'zh'\n"
    + "\n".join(
        f"     WHEN {lang}_hits > 0 AND {lang}_hits >= greatest("
        + ", ".join(f"{o}_hits" for o in LANG_PRIORITY if o != lang)
        + f") THEN '{lang}'"
        for lang in LANG_PRIORITY
    )
    + "\n     ELSE 'und' END"
)

ORACLE_LANGUAGE_ID = (
    "WITH hits AS (\n    SELECT doc_id, lang,\n"
    + ",\n".join(f"        {_hits_sql(lang)} AS {lang}_hits" for lang in LANG_PRIORITY)
    + ",\n        CAST(length(regexp_replace(text, '[ -~]', '', 'g')) AS BIGINT)"
    + " AS zh_hits\n    FROM documents\n)\n"
    + "SELECT doc_id, lang, en_hits, es_hits, de_hits, fr_hits, zh_hits,\n"
    + _LANG_CASE
    + " AS predicted_lang\nFROM hits"
)


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality features + composite score."""
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    return with_quality_score(docs).select(
        "doc_id",
        "alpha_ratio",
        "space_ratio",
        "stopword_ratio",
        "token_diversity",
        "length_score",
        "quality_score",
    )


_EN_MARKERS = ", ".join(f"'{m}'" for m in LANG_MARKERS["en"])

ORACLE_QUALITY_SCORES = f"""
WITH t AS (
    SELECT
        doc_id,
        CAST(length(text) AS DOUBLE) AS n_chars,
        regexp_split_to_array(lower(text), '\\s+') AS words,
        CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS DOUBLE)
            AS n_alpha,
        CAST(length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
            AS n_space,
        CAST(len(list_intersect(list_distinct(
            regexp_split_to_array(lower(text), '\\s+')), [{_EN_MARKERS}])) AS DOUBLE)
            AS en_hits
    FROM documents
),
feat AS (
    SELECT
        doc_id,
        n_alpha / nullif(n_chars, 0) AS alpha_ratio,
        n_space / nullif(n_chars, 0) AS space_ratio,
        en_hits / {float(len(LANG_MARKERS["en"]))} AS stopword_ratio,
        CAST(len(list_distinct(words)) AS DOUBLE)
            / nullif(CAST(len(words) AS DOUBLE), 0) AS token_diversity,
        least(n_chars / 400.0, 1.0) AS length_score
    FROM t
)
SELECT
    doc_id,
    round(alpha_ratio, 6) AS alpha_ratio,
    round(space_ratio, 6) AS space_ratio,
    round(stopword_ratio, 6) AS stopword_ratio,
    round(token_diversity, 6) AS token_diversity,
    round(length_score, 6) AS length_score,
    round(
        0.3 * length_score + 0.3 * token_diversity
        + 0.2 * alpha_ratio + 0.2 * stopword_ratio,
        6
    ) AS quality_score
FROM feat
"""


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 + 60-bit fingerprints of whitespace-normalized text."""
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    return with_fingerprints(docs).select(
        "doc_id", "fingerprint_md5", "fingerprint_64"
    )


ORACLE_DOC_FINGERPRINTS = f"""
WITH t AS (
    SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
    FROM documents
)
SELECT
    doc_id,
    md5(norm) AS fingerprint_md5,
    {H64.format(s="norm")} AS fingerprint_64
FROM t
"""


QUERIES = {
    "token_stats": q_token_stats,
    "language_id": q_language_id,
    "quality_scores": q_quality_scores,
    "doc_fingerprints": q_doc_fingerprints,
}

ORACLES = {
    "token_stats": ORACLE_TOKEN_STATS,
    "language_id": ORACLE_LANGUAGE_ID,
    "quality_scores": ORACLE_QUALITY_SCORES,
    "doc_fingerprints": ORACLE_DOC_FINGERPRINTS,
}
