"""Lexical retrieval: BM25 top-k over the documents table.

The missing retrieval primitive next to tf-idf (`tfidf_top_terms`) and
the embedding ANN family: score documents against a query term set
with BM25 (k1 = 1.2, b = 0.75) and return the deterministic top-k.

Cross-engine exactness (the SCALING.md float rules): transcendentals
and FMA-contractable dot products are banned, so the classic
``idf = ln(...)`` is replaced by the raw idf ratio
``(2N − 2df + 1)/(2df + 1)`` (a monotone transform of the Robertson
idf — same ranking family, exact in integers).  With k1 = 6/5 and
b = 3/4 every per-term score reduces to ONE BIGINT numerator and ONE
BIGINT denominator:

    score_t = (2N − 2df + 1) · 22 · tf · T
              ─────────────────────────────────
              (2df + 1) · (10·tf·T + 3·T + 9·dl·N)

(N docs, T total tokens, dl doc length, tf term frequency).  Each
term's double is produced by a single correctly-rounded division and
the terms are summed left-associatively — additions only, so DuckDB's
FMA contraction can't bite — making the final score bit-identical in
any IEEE engine with no rounding in the output.

Scale shape: ONE stats pass (N, T, per-term df as conditional counts —
map-side combining aggregate to a 1-row frame, broadcast back) + ONE
scoring scan (tf per term via JVM higher-order ``filter``, no
shuffle), then a rank-k TakeOrdered.  At 100 TB the stats frame is
still one row and the scoring scan is embarrassingly parallel.

Integer-regime bound: the BIGINT numerator is ≤ (2N+1)·22·tf·T, which
stays under 2^63 through ~10^6 docs at this corpus's shape (verified
at sf0.1 and the 10× decade).  Past that, drop the exact-rational
path and compute the same formula in DOUBLE — the ranking is
unaffected (scores are well-separated); the integer form exists so
the oracle hash-gate is bit-exact, not because retrieval needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

#: Query terms: mid-frequency words from the synthetic corpus vocab.
BM25_TERMS = ("shuffle", "broadcast", "window")

BM25_K = 20


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    dl = F.size("toks")

    stats_aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(dl.cast("bigint")).alias("total_toks"),
    ]
    for i, t in enumerate(BM25_TERMS):
        stats_aggs.append(
            F.sum(
                F.when(F.array_contains("toks", t), F.lit(1)).otherwise(0)
            ).cast("bigint").alias(f"df_{i}")
        )
    stats = docs.agg(*stats_aggs)

    scored = docs.crossJoin(F.broadcast(stats))
    n, t_total = F.col("n_docs"), F.col("total_toks")
    score = None
    def _match(term: str):
        # closure factory: a default-arg lambda would grow a second
        # parameter and PySpark would feed it the array INDEX
        return lambda x: x == F.lit(term)

    for i, term in enumerate(BM25_TERMS):
        # tf via a codegen higher-order filter; all-BIGINT num/den.
        tf = F.size(F.filter("toks", _match(term))).cast("bigint")
        df_t = F.col(f"df_{i}")
        num = (2 * n - 2 * df_t + 1) * 22 * tf * t_total
        den = (2 * df_t + 1) * (
            10 * tf * t_total + 3 * t_total + 9 * dl.cast("bigint") * n
        )
        term_score = num.cast("double") / den.cast("double")
        score = term_score if score is None else score + term_score
    return (
        scored.select("doc_id", score.alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_K)
    )


def _sql_tf(term: str) -> str:
    return (
        f"CAST(len(list_filter(string_split(text, ' '), "
        f"x -> x = '{term}')) AS BIGINT)"
    )


ORACLE_BM25_TOPK = f"""
WITH d AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
           {", ".join(f"{_sql_tf(t)} AS tf_{i}" for i, t in enumerate(BM25_TERMS))}
    FROM documents
),
s AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dl) AS BIGINT) AS total_toks,
           {", ".join(
               f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
               f" AS df_{i}"
               for i in range(len(BM25_TERMS))
           )}
    FROM d
)
SELECT doc_id,
       {" + ".join(
           f"(CAST((2*n_docs - 2*df_{i} + 1) * 22 * tf_{i} * total_toks AS DOUBLE)"
           f" / CAST((2*df_{i} + 1) * (10*tf_{i}*total_toks + 3*total_toks"
           f" + 9*dl*n_docs) AS DOUBLE))"
           for i in range(len(BM25_TERMS))
       )} AS bm25
FROM d, s
WHERE {" + ".join(f"tf_{i}" for i in range(len(BM25_TERMS)))} > 0
ORDER BY bm25 DESC, doc_id ASC
LIMIT {BM25_K}
"""


#: Posting list truncation (docs kept per term) and vocabulary cut
#: (terms kept, by document frequency).
POSTINGS_PER_TERM = 8
INDEX_TERMS = 100


def q_inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the inverted index: top-100 terms with truncated postings.

    The retrieval-infrastructure twin of `bm25_topk`: one tokenize
    pass → (term, doc) tf counts → per-term df / total_tf / top-8
    posting list "doc:tf" (ranked tf DESC, doc_id ASC), vocabulary cut
    to the 100 highest-df terms.

    Bounded-state discipline: the posting truncation happens BEFORE
    any collect — a row_number over the term partition keeps only 8
    rows per term, so the collect_list state is ≤8 structs per group
    no matter how common the term is ("the" at 100 TB appears in every
    document; an agg-then-truncate would buffer them all).  df and
    total_tf ride the same window pass, so the whole index is ONE
    term-key shuffle; the vocabulary cut compiles to TakeOrdered (no
    global sort).  Postings serialize as a comma-joined string —
    engine-portable and hash-stable.
    """
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    w = Window.partitionBy("term")
    ranked = tf.select(
        "term",
        "doc_id",
        "tf",
        F.row_number()
        .over(w.orderBy(F.desc("tf"), F.asc("doc_id")))
        .alias("r"),
        F.count("*").over(w).cast("bigint").alias("df"),
        F.sum("tf").over(w).cast("bigint").alias("total_tf"),
    ).filter(F.col("r") <= POSTINGS_PER_TERM)
    return (
        ranked.groupBy("term")
        .agg(
            F.max("df").alias("df"),
            F.max("total_tf").alias("total_tf"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("r"), F.col("doc_id"), F.col("tf")))
                    ),
                    lambda s: F.concat_ws(
                        ":", s.doc_id.cast("string"), s.tf.cast("string")
                    ),
                ),
                ",",
            ).alias("postings"),
        )
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(INDEX_TERMS)
    )


ORACLE_INVERTED_INDEX_POSTINGS = f"""
WITH tf AS (
    SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
    FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
        FROM documents
    )
    WHERE term <> ''
    GROUP BY term, doc_id
),
ranked AS (
    SELECT term, doc_id, tf,
           row_number() OVER (PARTITION BY term
                              ORDER BY tf DESC, doc_id ASC) AS r,
           CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df,
           CAST(sum(tf) OVER (PARTITION BY term) AS BIGINT) AS total_tf
    FROM tf
)
SELECT term,
       max(df) AS df,
       max(total_tf) AS total_tf,
       string_agg(doc_id || ':' || tf, ',' ORDER BY r) AS postings
FROM ranked
WHERE r <= {POSTINGS_PER_TERM}
GROUP BY term
ORDER BY df DESC, term ASC
LIMIT {INDEX_TERMS}
"""


QUERIES = {
    "bm25_topk": q_bm25_topk,
    "inverted_index_postings": q_inverted_index_postings,
}
ORACLES = {
    "bm25_topk": ORACLE_BM25_TOPK,
    "inverted_index_postings": ORACLE_INVERTED_INDEX_POSTINGS,
}
