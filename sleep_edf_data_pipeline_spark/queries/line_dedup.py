"""Round-9: C4-style exact line/paragraph dedup across documents.

C4 (Raffel et al. 2020, "Exploring the Limits of Transfer Learning")
and Dolma both remove *exact duplicate lines across documents*, keeping
one global occurrence — the boilerplate killer (nav bars, license
blurbs, cookie banners) that whole-document dedup (``dedup_exact``),
URL dedup (``url_canonical_dedup``), fixed n-gram spans
(``duplicate_spans``), and CDC chunks (``cdc_dedup_spans``) all miss
or over/under-shoot in grain.  This fills the one standard
pre-training dedup grain the registry lacked (VERDICT r8 item 3).

Line boundary: natural corpora split on ``\\n``; the synthetic corpus
is single-line, so the registered query uses the deterministic
fallback every line-dedup pipeline needs anyway for wall-of-text
documents — segment the normalized whitespace-token stream into
fixed ``LINE_TOKENS``-token pseudo-lines (the same explode(sequence)/
slice kernel as ``document_chunks``, stride == width).  The dedup
semantics downstream of segmentation are boundary-agnostic.

Survivor rule: the globally FIRST occurrence of each normalized line
— min over (doc_id, seg_idx) — survives; every other occurrence
(including repeats *within* the surviving document) is removed.
Unique lines are trivially kept.  Output is the per-document
retention profile a C4-style filter emits: total/kept/removed line
counts and character volumes, all exact BIGINTs.

Scale shape (100 TB): ONE corpus pass — segment + 60-bit line hash
projected inline (text never shuffled), map-side-combinable
groupBy(line_hash, doc_id), then a window and a final groupBy over
frames already reduced to (distinct line, doc) grain.  No joins, no
collects, no pairwise anything; the window partitions on the 60-bit
hash (cardinality ~= distinct lines, never skewed by construction).
The survivor argmin rides the same window as the occurrence total via
an order-free packed key ``doc_id * 2^20 + seg_idx`` (documents are
bounded at 2^20 segments — 13M tokens — far above any real document;
guard documented rather than branched).

Reference parity: no corpus surface exists in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's dedup
family per the build brief's training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..operators.dedup import tokens
from ..tables import spread, table

#: Pseudo-line width (tokens).  A natural-text "line" is a sentence or
#: two (~a dozen tokens); 13 puts cross-document duplicate density on
#: the synthetic corpus in the operating regime of the real filter
#: (measured: 90 cross-doc duplicate lines at sf0.01).
LINE_TOKENS = 13

#: Packed survivor-key stride: seg_idx < 2^20 (a 13M-token document)
#: keeps ``doc_id * _SEG_STRIDE + seg_idx`` collision-free in int64
#: for doc_id < 2^43.
_SEG_STRIDE = 1 << 20


def line_grain_partials(docs: DataFrame) -> DataFrame:
    """(line_hash, doc_id) partials from a (doc_id, text) frame — the
    segmentation + hash head, shared by the batch query and the
    streaming monitor (streaming/lines.py).  Every column is an
    algebraic fold (occ sums, min_idx mins, len constant per hash), so
    partials over any partition of the corpus merge to the full-corpus
    frame exactly — the property the streaming fold relies on."""
    w = tokens(F.col("text"))
    n_segs = F.ceil(F.size(w) / F.lit(float(LINE_TOKENS))).cast("int")
    segs = docs.select(
        "doc_id",
        w.alias("_w"),
        F.explode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_idx"),
    )
    seg_text = F.concat_ws(
        " ", F.slice(F.col("_w"), F.col("seg_idx") * LINE_TOKENS + 1,
                     LINE_TOKENS)
    )
    hashed = segs.select(
        "doc_id",
        F.col("seg_idx").cast("int").alias("seg_idx"),
        hash64(seg_text, seed="line").alias("line_hash"),
        F.length(seg_text).cast("bigint").alias("len"),
    )
    return hashed.groupBy("line_hash", "doc_id").agg(
        F.count("*").cast("bigint").alias("occ"),
        F.min("seg_idx").alias("min_idx"),
        F.max("len").alias("len"),  # constant per hash
    )


def retention_from_partials(per: DataFrame) -> DataFrame:
    """Survivor window + per-doc rollup over the (line_hash, doc_id)
    grain — the tail shared with the streaming monitor."""
    w_hash = Window.partitionBy("line_hash")
    pkey = F.col("doc_id") * _SEG_STRIDE + F.col("min_idx")
    kept = F.when(pkey == F.min(pkey).over(w_hash), F.lit(1)).otherwise(
        F.lit(0)
    ).cast("bigint")
    flagged = per.select(
        "doc_id", "occ", "len", kept.alias("kept")
    )
    return flagged.groupBy("doc_id").agg(
        F.sum("occ").cast("bigint").alias("n_lines"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        F.sum(F.col("occ") - F.col("kept")).cast("bigint").alias("n_removed"),
        F.sum(F.col("kept") * F.col("len")).cast("bigint").alias(
            "kept_chars"
        ),
        F.sum((F.col("occ") - F.col("kept")) * F.col("len")).cast(
            "bigint"
        ).alias("removed_chars"),
    )


def q_line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "text"
    )
    return retention_from_partials(line_grain_partials(docs))


ORACLE_LINE_DEDUP_STATS = f"""
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
    SELECT doc_id, seg_idx,
           ({hash64_sql("seg", seed="line")}) AS line_hash,
           CAST(length(seg) AS BIGINT) AS len
    FROM segs
),
per AS (
    SELECT line_hash, doc_id,
           CAST(count(*) AS BIGINT) AS occ,
           min(seg_idx) AS min_idx,
           max(len) AS len
    FROM hashed GROUP BY line_hash, doc_id
),
flagged AS (
    SELECT doc_id, occ, len,
           CASE WHEN doc_id * {_SEG_STRIDE} + min_idx =
                min(doc_id * {_SEG_STRIDE} + min_idx)
                    OVER (PARTITION BY line_hash)
                THEN 1 ELSE 0 END AS kept
    FROM per
)
SELECT doc_id,
       CAST(sum(occ) AS BIGINT) AS n_lines,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(sum(occ - kept) AS BIGINT) AS n_removed,
       CAST(sum(kept * len) AS BIGINT) AS kept_chars,
       CAST(sum((occ - kept) * len) AS BIGINT) AS removed_chars
FROM flagged GROUP BY doc_id
"""

QUERIES = {
    "line_dedup_stats": q_line_dedup_stats,
}

ORACLES = {
    "line_dedup_stats": ORACLE_LINE_DEDUP_STATS,
}
