"""Round-9: per-document cross-corpus n-gram novelty (dedup family).

The duplicate-burden signal used in pre-training curation (MassiveText
/ Dolma style): for each document, what fraction of its distinct word
trigrams appears ANYWHERE earlier in the corpus (first occurrence
attributed by ``min(doc_id)``)?  Documents with a low novel fraction
are near-copies or templates even when no single span/line crosses the
``duplicate_spans`` / ``line_dedup_stats`` thresholds — this is the
doc-grain drop signal those span-grain reports feed.

Complements (not duplicates) the existing dedup grains:
``dedup_exact`` (whole doc), ``line_dedup_stats`` (exact lines),
``duplicate_spans`` (fixed n-gram span listing), ``cdc_dedup_spans``
(content-defined chunks) all *enumerate* duplicated content; this
query *attributes* it — every distinct trigram is charged to exactly
one first-occurrence document, so summing ``n_novel`` over documents
reproduces the corpus-distinct trigram count exactly (an invariant the
tests pin).

Scale shape (100 TB): ONE corpus pass — tokenize + shingle + 60-bit
hash projected inline (text never shuffled), distinct on
``(tri_hash, doc_id)`` (map-side combinable), a window over
``tri_hash`` (cardinality ≈ distinct trigrams, unskewable by
construction) for the first-occurrence argmin, then a per-doc rollup.
No joins, no collects, no pairwise anything — the ``line_dedup_stats``
shuffle shape at trigram grain.

Reference scope: no corpus surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's dedup
family per the build brief's training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..operators.dedup import tokens, word_shingles

#: Shingle width: word trigrams, the standard near-dup grain.
NGRAM_N = 3

from ..tables import spread, table


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "text"
    )
    tri = docs.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), NGRAM_N)).alias("tri"),
    ).select("doc_id", hash64(F.col("tri"), seed="tri").alias("tri_hash"))
    per = tri.groupBy("tri_hash", "doc_id").agg(F.count("*").alias("_n"))
    first = F.min("doc_id").over(Window.partitionBy("tri_hash"))
    flagged = per.select(
        "doc_id",
        F.when(F.col("doc_id") == first, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("novel"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_trigrams"),
        F.sum("novel").cast("bigint").alias("n_novel"),
        F.round(
            F.sum("novel").cast("double") / F.count("*"), 6
        ).alias("novel_pct"),
    )


# word_shingles semantics replayed in SQL: documents shorter than n
# words get ONE shingle (the whole token list joined) — the slice
# ``w[i : i+n-1]`` with DuckDB's inclusive upper bound, i ranging over
# max(len - n + 1, 1) starts.
ORACLE_NGRAM_NOVELTY = f"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
    FROM documents
),
tri AS (
    SELECT doc_id,
           array_to_string(
               w[CAST(i AS BIGINT) : CAST(i + {NGRAM_N} - 1 AS BIGINT)],
               ' ') AS tri
    FROM toks,
         unnest(range(1, greatest(len(w) - {NGRAM_N} + 1, 1) + 1)) AS t(i)
),
hashed AS (
    SELECT doc_id, ({hash64_sql("tri", seed="tri")}) AS tri_hash FROM tri
),
per AS (
    SELECT tri_hash, doc_id FROM hashed GROUP BY tri_hash, doc_id
),
flagged AS (
    SELECT doc_id,
           CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY tri_hash)
                THEN 1 ELSE 0 END AS novel
    FROM per
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(sum(novel) AS BIGINT) AS n_novel,
       round(CAST(sum(novel) AS DOUBLE) / count(*), 6) AS novel_pct
FROM flagged GROUP BY doc_id
"""


QUERIES = {
    "ngram_novelty": q_ngram_novelty,
}

ORACLES = {
    "ngram_novelty": ORACLE_NGRAM_NOVELTY,
}
