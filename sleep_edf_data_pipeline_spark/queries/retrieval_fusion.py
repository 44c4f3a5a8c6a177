"""Round-9: hybrid retrieval — reciprocal-rank fusion (RRF).

Production RAG / training-data retrieval runs a lexical ranker (BM25)
and a dense ranker (embedding cosine) side by side and fuses the two
rank lists; RRF (Cormack et al. 2009) is the standard fusion because
it needs no score calibration: ``score(d) = Σ_lists 1/(K + rank_d)``.
This completes the retrieval family next to ``bm25_topk``,
``inverted_index_postings``, and the cosine top-k paths.

Lists fused here: the registry's own ``bm25_topk`` (fixed lexical
query, top-20) and a dense top-20 by cosine around a deterministic
probe (the lowest-id embedding), joined on the shared id universe
(vec_id ≡ doc_id in the test corpus; partial overlap is the normal
hybrid case and full-outer semantics keep single-list hits).

Scale shape (100 TB): each list is produced by an already-proven
corpus pass that ends in a TakeOrdered top-k (never a global sort);
the fusion itself joins two ≤k-row frames — driver-negligible at any
corpus size.  Ranks are assigned AFTER truncation (window over k rows,
the bounded-rank discipline from inverted_index_postings).  The RRF
score adds two independent double divisions of exact integers —
bit-stable cross-engine (no FMA-contractable product chain).

Reference parity: no retrieval surface exists in the reference;
extends SURVEY §2.7 per the build brief's training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.similarity import dot, norm
from ..tables import spread, table
from .retrieval import ORACLE_BM25_TOPK, q_bm25_topk
from .similarity_queries import _DOT, _NORM_A, _NORM_B

#: Classic RRF constant (Cormack et al. 2009).
RRF_C = 60

#: Dense-list depth (matches the lexical list's BM25_K).
DENSE_K = 20


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lexical list: the registered BM25 top-20, ranked post-truncation
    lex = q_bm25_topk(spark, sf_dir).select(
        F.col("doc_id").alias("item_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("lex_rank"),
    )
    # dense list: cosine around the lowest-id probe embedding
    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    probe = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("embedding").alias("_vp"),
            norm(F.col("embedding")).alias("_np"),
        )
    )
    den = norm(F.col("embedding")) * F.col("_np")
    cos = F.round(
        F.when(den > 0, dot(F.col("embedding"), F.col("_vp")) / den), 6
    )
    dense = (
        emb.crossJoin(F.broadcast(probe))
        .select("vec_id", cos.alias("_cos"))
        .orderBy(F.desc("_cos"), F.asc("vec_id"))
        .limit(DENSE_K)  # TakeOrdered — rank the truncated rows below
        .select(
            F.col("vec_id").alias("item_id"),
            F.row_number()
            .over(Window.orderBy(F.desc("_cos"), F.asc("vec_id")))
            .alias("dense_rank"),
        )
    )
    fused = lex.join(dense, "item_id", "full_outer")
    rrf = F.coalesce(
        1.0 / (F.lit(RRF_C) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(1.0 / (F.lit(RRF_C) + F.col("dense_rank")), F.lit(0.0))
    return fused.select(
        "item_id",
        F.col("lex_rank").cast("int").alias("lex_rank"),
        F.col("dense_rank").cast("int").alias("dense_rank"),
        rrf.alias("rrf_score"),
    )


ORACLE_RRF_FUSION = f"""
WITH lex_list AS ({ORACLE_BM25_TOPK}),
lex AS (
    SELECT doc_id AS item_id,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INT)
               AS lex_rank
    FROM lex_list
),
probe AS (
    SELECT embedding FROM embeddings ORDER BY vec_id LIMIT 1
),
scored AS (
    SELECT a.vec_id,
           round({_DOT} / nullif({_NORM_A} * {_NORM_B}, 0), 6) AS cos
    FROM embeddings a, (SELECT embedding, 0 AS vec_id FROM probe) b
),
dense AS (
    SELECT vec_id AS item_id,
           CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT)
               AS dense_rank
    FROM (SELECT * FROM scored ORDER BY cos DESC, vec_id ASC
          LIMIT {DENSE_K})
)
SELECT coalesce(l.item_id, d.item_id) AS item_id,
       l.lex_rank,
       d.dense_rank,
       coalesce(CAST(1.0 AS DOUBLE) / ({RRF_C} + l.lex_rank),
                CAST(0.0 AS DOUBLE))
       + coalesce(CAST(1.0 AS DOUBLE) / ({RRF_C} + d.dense_rank),
                  CAST(0.0 AS DOUBLE)) AS rrf_score
FROM lex l FULL OUTER JOIN dense d ON l.item_id = d.item_id
"""

QUERIES = {
    "rrf_fusion": q_rrf_fusion,
}

ORACLES = {
    "rrf_fusion": ORACLE_RRF_FUSION,
}
