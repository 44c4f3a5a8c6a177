"""Text-analysis operators for training-data pipelines.

Language ID (marker-word heuristic), quality scoring, token counting,
and document fingerprinting — all as JVM-side expressions (regex,
array, hash built-ins), no Python UDFs, so they run inside whole-stage
codegen and scale linearly with the scan.

Counting uses the length-difference-after-regexp_replace idiom rather
than engine-specific count functions so the semantics are portable to
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64
from .dedup import tokens

#: Marker (stop)words per language for the ID heuristic.  Distinct-hit
#: counting: a language scores one point per marker word present.
LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "is", "to"),
    "es": ("el", "los", "la", "y", "una", "que"),
    "de": ("der", "die", "und", "ein", "nicht", "ist"),
    "fr": ("le", "la", "et", "des", "une", "est"),
}

#: Priority order for deterministic argmax tie-breaks.
LANG_PRIORITY = ("en", "es", "de", "fr")


def char_count(text: Column, char_class: str) -> Column:
    """Number of characters matching a regex class (portable idiom)."""
    return (
        F.length(text) - F.length(F.regexp_replace(text, char_class, ""))
    ).cast("bigint")


def non_ascii_count(text: Column) -> Column:
    """Characters outside printable ASCII (CJK et al.)."""
    return (F.length(F.regexp_replace(text, "[ -~]", ""))).cast("bigint")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: n_tokens, n_unique_tokens, n_chars, avg token len."""
    w = tokens(F.col(text_col))
    return df.withColumns(
        {
            "n_tokens": F.size(w).cast("bigint"),
            "n_unique_tokens": F.size(F.array_distinct(w)).cast("bigint"),
            "n_chars_measured": F.length(F.col(text_col)).cast("bigint"),
            "avg_token_len": F.round(
                (F.length(F.regexp_replace(F.col(text_col), r"\s+", "")))
                .cast("double")
                / F.size(w),
                6,
            ),
        }
    )


def lang_hits(text_col: str, lang: str) -> Column:
    """Distinct marker words of ``lang`` present in the text."""
    w = F.array_distinct(tokens(F.col(text_col)))
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(w, markers)).cast("bigint")


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID with deterministic priority tie-break.

    'zh' wins when non-ASCII characters dominate; otherwise the highest
    marker-hit language in LANG_PRIORITY order; 'und' when nothing hits.
    """
    out = df
    for lang in LANG_PRIORITY:
        out = out.withColumn(f"{lang}_hits", lang_hits(text_col, lang))
    out = out.withColumn("zh_hits", non_ascii_count(F.col(text_col)))

    # CASE in priority order: earlier WHENs win ties.
    cond_zh = F.col("zh_hits") > F.greatest(
        *[F.col(f"{lang}_hits") for lang in LANG_PRIORITY]
    )
    chain = F.when(cond_zh, F.lit("zh"))
    for lang in LANG_PRIORITY:
        others = [F.col(f"{o}_hits") for o in LANG_PRIORITY if o != lang]
        is_best = (F.col(f"{lang}_hits") > 0) & (
            F.col(f"{lang}_hits") >= F.greatest(*others)
        )
        chain = chain.when(is_best, F.lit(lang))
    return out.withColumn("predicted_lang", chain.otherwise(F.lit("und")))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score.

    length score, alpha ratio, stopword presence, token diversity —
    weighted into [0, 1]-ish; the exact formula is the contract, the
    point is the *shape* (cheap, columnar, scan-fused).
    """
    text = F.col(text_col)
    w = tokens(text)
    n_chars = F.length(text).cast("double")
    alpha_ratio = char_count(text, "[a-z]").cast("double") / F.when(
        n_chars > 0, n_chars
    )
    space_ratio = char_count(text, r"\s").cast("double") / F.when(
        n_chars > 0, n_chars
    )
    stop_ratio = lang_hits(text_col, "en").cast("double") / F.lit(
        float(len(LANG_MARKERS["en"]))
    )
    diversity = F.size(F.array_distinct(w)).cast("double") / F.when(
        F.size(w) > 0, F.size(w).cast("double")
    )
    len_score = F.least(n_chars / F.lit(400.0), F.lit(1.0))
    return df.withColumns(
        {
            "alpha_ratio": F.round(alpha_ratio, 6),
            "space_ratio": F.round(space_ratio, 6),
            "stopword_ratio": F.round(stop_ratio, 6),
            "token_diversity": F.round(diversity, 6),
            "length_score": F.round(len_score, 6),
            "quality_score": F.round(
                F.lit(0.3) * len_score
                + F.lit(0.3) * diversity
                + F.lit(0.2) * alpha_ratio
                + F.lit(0.2) * stop_ratio,
                6,
            ),
        }
    )


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of normalized text + 60-bit short hash.

    Normalization: lowercase + whitespace collapse — stable under
    reflow, the standard canonicalization before exact dedup.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumns(
        {
            "fingerprint_md5": F.md5(norm),
            "fingerprint_64": hash64(norm),
        }
    )
