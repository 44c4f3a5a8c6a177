"""Round-10: repetition-aware INTRA-document line dedup (Gopher rule 8).

The registry removes duplicates *across* documents at every grain
(whole-doc ``dedup_exact``, URL, line, span, chunk) and
``repetition_stats`` flags repeated n-grams, but the standard "remove
repeated paragraphs WITHIN a document" normalization — rule 8 of the
Gopher quality suite (Rae et al. 2021), applied BEFORE cross-document
dedup in Gopher/MassiveText and Dolma — had no registered operator
(VERDICT r9 item 5).  Per document: segment into pseudo-lines (the
``line_dedup_stats`` segmentation, reused verbatim), keep the FIRST
occurrence of each distinct line within the doc, drop later repeats,
and report the per-doc retention profile plus the duplicate-character
fraction the Gopher threshold actually tests.

Simpler than the cross-doc operator by construction: at the
(doc_id, line_hash) grain the survivor is ALWAYS the group's first
occurrence — no cross-group survivor window exists at all.  The plan
is ONE corpus pass (segment + 60-bit hash projected inline, text never
shuffled) into a map-side-combinable groupBy(line_hash, doc_id), then
a per-doc rollup of the already-reduced grain.  Zero joins, zero
windows, zero collects; both shuffles key on high-cardinality
hash-spread columns.  Shares ``line_grain_partials`` with
``line_dedup_stats`` / ``streaming/lines.py``, so the segmentation
boundary stays bit-identical across the whole line-dedup family.

``dup_char_frac`` divides two exact BIGINTs once in DOUBLE — identical
integer inputs make the quotient bit-identical cross-engine.

Reference parity: no corpus surface exists in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's dedup
family per the build brief's training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash64_sql
from ..tables import spread, table
from .line_dedup import LINE_TOKENS, line_grain_partials


def intra_doc_retention(per: DataFrame) -> DataFrame:
    """Per-doc rollup over the (line_hash, doc_id) grain: within each
    doc, one occurrence per distinct line survives."""
    return per.groupBy("doc_id").agg(
        F.sum("occ").cast("bigint").alias("n_lines"),
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum(F.col("occ") - 1).cast("bigint").alias("n_removed"),
        F.max("occ").cast("bigint").alias("max_line_occ"),
        F.sum(F.col("len")).cast("bigint").alias("kept_chars"),
        F.sum((F.col("occ") - 1) * F.col("len")).cast("bigint").alias(
            "removed_chars"
        ),
        (
            F.sum((F.col("occ") - 1) * F.col("len")).cast("double")
            / F.sum(F.col("occ") * F.col("len")).cast("double")
        ).alias("dup_char_frac"),
    )


def q_intra_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "text"
    )
    return intra_doc_retention(line_grain_partials(docs))


ORACLE_INTRA_DOC_DEDUP = f"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
    FROM documents
),
segs AS (
    SELECT doc_id, CAST(i AS INT) AS seg_idx,
           array_to_string(
               w[CAST(i * {LINE_TOKENS} + 1 AS BIGINT)
                 : CAST(i * {LINE_TOKENS} + {LINE_TOKENS} AS BIGINT)],
               ' ') AS seg
    FROM toks,
         unnest(range(0, CAST(ceil(len(w) / {LINE_TOKENS}.0) AS BIGINT)))
             AS t(i)
),
hashed AS (
    SELECT doc_id,
           ({hash64_sql("seg", seed="line")}) AS line_hash,
           CAST(length(seg) AS BIGINT) AS len
    FROM segs
),
per AS (
    SELECT line_hash, doc_id,
           CAST(count(*) AS BIGINT) AS occ,
           max(len) AS len
    FROM hashed GROUP BY line_hash, doc_id
)
SELECT doc_id,
       CAST(sum(occ) AS BIGINT) AS n_lines,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(occ - 1) AS BIGINT) AS n_removed,
       CAST(max(occ) AS BIGINT) AS max_line_occ,
       CAST(sum(len) AS BIGINT) AS kept_chars,
       CAST(sum((occ - 1) * len) AS BIGINT) AS removed_chars,
       CAST(sum((occ - 1) * len) AS DOUBLE)
           / CAST(sum(occ * len) AS DOUBLE) AS dup_char_frac
FROM per GROUP BY doc_id
"""

QUERIES = {
    "intra_doc_dedup": q_intra_doc_dedup,
}

ORACLES = {
    "intra_doc_dedup": ORACLE_INTRA_DOC_DEDUP,
}
