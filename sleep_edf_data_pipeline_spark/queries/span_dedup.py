"""Round-8: cross-document duplicate-span dedup over CDC chunks.

Suffix-array substring dedup (Lee et al., "Deduplicating Training Data
Makes Language Models Better") finds repeated SPANS across documents —
boilerplate, licenses, templates — that whole-document dedup can't
see.  A literal suffix array doesn't distribute; the scalable
equivalent every dedup storage system uses is CONTENT-DEFINED
chunking: cut at rolling-hash boundaries (``cdc_chunks`` — an edit
only moves boundaries in its own neighborhood), then exact-hash the
chunks and group ACROSS documents.  Two near-duplicate documents
disagree only in the edited chunks; every untouched span lands in a
shared hash bucket.

Scale shape: the chunk spans and the token arrays come from the SAME
documents scan (self-equi-join on doc_id — co-partitioned after one
shuffle); the cross-document group is a hash-groupBy on the 60-bit
chunk hash.  No pairwise comparisons anywhere — the hash bucket IS
the candidate set, the standard exact-dedup shuffle shape.

Reference parity: no span surface exists in the reference; extends
SURVEY §2.7's dedup family between ``dedup_exact`` (whole doc) and
``duplicate_spans`` (fixed n-grams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..operators.dedup import tokens
from ..tables import spread, table
from .lm_data_extras import ORACLE_CDC_CHUNKS, q_cdc_chunks


def q_cdc_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans = q_cdc_chunks(spark, sf_dir)
    toks = (
        spread(table(spark, sf_dir, "documents"), "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("w"))
    )
    chunk = spans.join(toks, "doc_id").select(
        "doc_id",
        "n_tokens",
        hash64(
            F.concat_ws(
                " ", F.slice(F.col("w"), F.col("start_tok"), F.col("n_tokens"))
            ),
            seed="span",
        ).alias("chunk_hash"),
    )
    return (
        chunk.groupBy("chunk_hash")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("kept_doc"),
            F.min("n_tokens").cast("int").alias("n_tokens"),
        )
        .filter((F.col("n_occurrences") >= 2) & (F.col("n_docs") >= 2))
    )


_CHUNK_TEXT = "array_to_string(list_slice(w, start_tok, end_tok), ' ')"

ORACLE_CDC_DEDUP_SPANS = f"""
WITH chunks AS ({ORACLE_CDC_CHUNKS}),
t AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
    FROM documents
),
hashed AS (
    SELECT c.doc_id, c.n_tokens,
           ({hash64_sql(_CHUNK_TEXT, seed="span")}) AS chunk_hash
    FROM chunks c JOIN t USING (doc_id)
)
SELECT chunk_hash,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       min(doc_id) AS kept_doc,
       CAST(min(n_tokens) AS INT) AS n_tokens
FROM hashed
GROUP BY chunk_hash
HAVING count(*) >= 2 AND count(DISTINCT doc_id) >= 2
"""

QUERIES = {
    "cdc_dedup_spans": q_cdc_dedup_spans,
}

ORACLES = {
    "cdc_dedup_spans": ORACLE_CDC_DEDUP_SPANS,
}
