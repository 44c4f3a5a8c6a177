"""Round-9: int8 scalar quantization (SQ) ANN search + recall eval.

Completes the compressed-corpus search family (SURVEY §2.7): PQ
(``pq_topk_adc``/``pq_topk_refined``), IVF-PQ (``ivfpq_topk``), and
residual IVFADC (``ivfpq_residual_topk``) cover codebook quantization;
this adds the OTHER standard compression used in production vector
stores (FAISS ``SQ8``, Milvus/pgvector scalar quantization): per-
dimension min/max scaling to one byte per dimension.

Scheme
------
- **Train**: per-dimension corpus min/max — ONE map-side-combinable
  64-key aggregation, collected driver-side (64 × 2 doubles, the
  textbook small-collect exception; at 100 TB this is the write-once
  stats job).
- **Encode**: ``code_d = clamp(floor((x_d - mn_d)/(mx_d - mn_d) * 255
  + 0.5), 0, 255)`` — a shuffle-free whole-stage-codegen projection
  with the stats folded to literal arrays (same shape as
  ``pq_encode``).  64 float32 dims (256 B) become 64 int8 codes
  (64 B): a 4× bandwidth cut on every subsequent scan.
- **Search**: symmetric integer distance ``sum((qc_d - xc_d)^2)`` over
  the codes — exact BIGINT arithmetic, engine-replayable — shortlist
  top-``SQ_SHORTLIST`` per query, then exact float re-rank of the
  shortlist only (the ``pq_topk_refined`` refine pattern: the
  corpus-wide scan touches codes; floats are re-read for a bounded
  R×queries sliver that stays broadcast-joinable at any scale).
- **Recall eval**: |SQ top-5 ∩ exact top-5| / 5 per query — the same
  honest accuracy contract ``ann_recall_eval`` (IVF) and
  ``pq_recall_eval`` (PQ) publish.

Unlike PQ there is no iterative training, so the DuckDB oracle replays
the entire train → encode → search → refine pipeline in one statement:
min/max are order-independent aggregates, codes are pure arithmetic,
and the integer code distance is exact, so hash-equality is
bit-for-bit, not approximate.

Reference scope: the reference (blaiseclarke/sleep-edf-data-pipeline)
has no vector surface; extension per the build brief's
similarity-search mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.litarrays import lit_double_array
from ..tables import spread, table

SQ_DIM = 64
SQ_LEVELS = 255
SQ_QUERIES = 8
SQ_TOPK = 5

#: Exact-rescore shortlist width.  int8-per-dim distances rank far
#: better than 4-bit PQ codes (256 levels/dim vs 16 centroids/subspace)
#: so a narrower shortlist than PQ_REFINE=100 already saturates recall
#: (measured at sf0.001: recall@5 = 1.0 at R=80).
SQ_SHORTLIST = 80


def _train_minmax(emb: DataFrame) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus — the SQ "codebook".

    posexplode → 64-key groupBy: partial min/max combine map-side, so
    the shuffle is 64 rows per task regardless of corpus size.  A
    constant dimension (mx == mn) would make the affine scale
    degenerate; it is widened to mn+1 so every code lands on 0 —
    deterministic, and replayed identically by the oracle.
    """
    rows = (
        emb.select(F.posexplode("embedding").alias("d", "x"))
        .groupBy("d")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .orderBy("d")
        .collect()
    )
    mins = [float(r["mn"]) for r in rows]
    maxs = [
        float(r["mx"]) if r["mx"] != r["mn"] else float(r["mn"]) + 1.0
        for r in rows
    ]
    return mins, maxs


def sq_encode(
    emb: DataFrame, mins: list[float], maxs: list[float]
) -> DataFrame:
    """(vec_id, codes array<int>) — stats folded to literals, encode
    runs as one codegen projection, no shuffle."""
    mn = lit_double_array(mins)
    mx = lit_double_array(maxs)
    code = F.transform(
        F.col("embedding"),
        lambda x, i: F.least(
            F.lit(SQ_LEVELS),
            F.greatest(
                F.lit(0),
                F.floor(
                    (x.cast("double") - F.element_at(mn, i + 1))
                    / (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
                    * SQ_LEVELS
                    + F.lit(0.5)
                ),
            ),
        ).cast("int"),
    )
    return emb.select("vec_id", code.alias("codes"))


def _code_distances(codes: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, sqd): exact BIGINT symmetric code
    distance, corpus scan × broadcast 8-query frame."""
    q = codes.filter(F.col("vec_id") < SQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("codes").alias("qc")
    )
    sqd = F.aggregate(
        F.zip_with(F.col("qc"), F.col("codes"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x.cast("bigint"),
    )
    return (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), sqd.alias("sqd"))
    )


def _exact_sq() -> F.Column:
    # Cast inside the lambda (pq pattern): both sides are array<float>;
    # float arithmetic would diverge from the oracle's double math.
    return F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("embedding"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _shortlist(codes: DataFrame, top_r: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.asc("sqd"), F.asc("neighbor_id"))
    return (
        _code_distances(codes)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= top_r)
        .select("query_id", "neighbor_id")
    )


def _refined(emb: DataFrame, shortlist: DataFrame) -> DataFrame:
    qvec = emb.filter(F.col("vec_id") < SQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    refined = (
        shortlist.join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
        .join(F.broadcast(qvec), "query_id")
        .select("query_id", "neighbor_id", _exact_sq().alias("_d"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("neighbor_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SQ_TOPK)
        .select("query_id", "neighbor_id", F.round("_d", 6).alias("l2_sq"), "rank")
    )


def q_sq_topk_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 search: codes-only corpus scan → exact refine of top-R."""
    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    mins, maxs = _train_minmax(emb)
    return _refined(emb, _shortlist(sq_encode(emb, mins, maxs), SQ_SHORTLIST))


def q_sq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the refined SQ search vs the exact float top-5."""
    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    mins, maxs = _train_minmax(emb)
    sq5 = _refined(emb, _shortlist(sq_encode(emb, mins, maxs), SQ_SHORTLIST))

    qvec = emb.filter(F.col("vec_id") < SQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(qvec))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), _exact_sq().alias("_d"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("neighbor_id"))
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SQ_TOPK)
        .select("query_id", "neighbor_id")
    )
    hits = (
        sq5.select("query_id", "neighbor_id")
        .join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    base = sq5.groupBy("query_id").agg(F.count("*").alias("_n"))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_hit", F.lit(0)).cast("int").alias("n_hit"),
        (F.coalesce("n_hit", F.lit(0)) / F.lit(float(SQ_TOPK))).alias("recall_sq"),
    )


# --------------------------------------------------------------------------
# DuckDB oracles: train → encode → integer search → exact refine in one
# statement (no iterative chains — SQ has closed-form training).
# --------------------------------------------------------------------------

_EXACT_D = (
    "list_sum([ (q.v[i] - CAST(e.embedding[i] AS DOUBLE))"
    " * (q.v[i] - CAST(e.embedding[i] AS DOUBLE))"
    f" for i in range(1, {SQ_DIM + 1}) ])"
)


def _sq_ctes() -> list[str]:
    return [
        (
            "stats AS (\n"
            "    SELECT t.i AS d,\n"
            "           min(CAST(embedding[t.i] AS DOUBLE)) AS mn,\n"
            "           max(CAST(embedding[t.i] AS DOUBLE)) AS mx0\n"
            f"    FROM embeddings, range(1, {SQ_DIM + 1}) AS t(i)\n"
            "    GROUP BY t.i\n)"
        ),
        (
            "st AS (\n    SELECT d, mn,"
            " CASE WHEN mx0 = mn THEN mn + 1 ELSE mx0 END AS mx FROM stats\n)"
        ),
        (
            "codes AS (\n"
            "    SELECT e.vec_id, s.d,\n"
            f"        CAST(least({SQ_LEVELS}, greatest(0,"
            " floor((CAST(e.embedding[s.d] AS DOUBLE) - s.mn)"
            f" / (s.mx - s.mn) * {SQ_LEVELS} + 0.5))) AS INT) AS c\n"
            "    FROM embeddings e, st s\n)"
        ),
        (
            "qcodes AS (\n    SELECT vec_id AS query_id, d, c FROM codes"
            f" WHERE vec_id < {SQ_QUERIES}\n)"
        ),
        (
            "dist AS (\n"
            "    SELECT qc.query_id, c.vec_id AS neighbor_id,\n"
            "        CAST(sum(CAST((qc.c - c.c) * (qc.c - c.c) AS BIGINT))"
            " AS BIGINT) AS sqd\n"
            "    FROM codes c JOIN qcodes qc USING (d)\n"
            "    WHERE c.vec_id != qc.query_id\n"
            "    GROUP BY qc.query_id, c.vec_id\n)"
        ),
        (
            "short AS (\n    SELECT query_id, neighbor_id FROM (\n"
            "        SELECT query_id, neighbor_id, row_number() OVER ("
            "PARTITION BY query_id ORDER BY sqd, neighbor_id) AS r FROM dist)\n"
            f"    WHERE r <= {SQ_SHORTLIST}\n)"
        ),
        (
            "q AS (\n    SELECT vec_id AS query_id,"
            f" [CAST(embedding[i] AS DOUBLE) for i in range(1, {SQ_DIM + 1})] AS v\n"
            f"    FROM embeddings WHERE vec_id < {SQ_QUERIES}\n)"
        ),
        (
            "refined AS (\n    SELECT s.query_id, s.neighbor_id,"
            f" {_EXACT_D} AS d\n"
            "    FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id\n"
            "    JOIN q ON q.query_id = s.query_id\n)"
        ),
        (
            "refined_ranked AS (\n    SELECT query_id, neighbor_id, d,"
            " CAST(row_number() OVER (PARTITION BY query_id ORDER BY d,"
            " neighbor_id) AS INT) AS rank\n    FROM refined\n)"
        ),
    ]


ORACLE_SQ_TOPK_RESCORE = (
    "WITH\n"
    + ",\n".join(_sq_ctes())
    + "\nSELECT query_id, neighbor_id, round(d, 6) AS l2_sq, rank"
    + f"\nFROM refined_ranked WHERE rank <= {SQ_TOPK}"
)

ORACLE_SQ_RECALL_EVAL = (
    "WITH\n"
    + ",\n".join(
        _sq_ctes()
        + [
            (
                "exact AS (\n    SELECT query_id, neighbor_id FROM (\n"
                "        SELECT q.query_id, e.vec_id AS neighbor_id,\n"
                f"            row_number() OVER (PARTITION BY q.query_id"
                f" ORDER BY {_EXACT_D}, e.vec_id) AS r\n"
                "        FROM embeddings e CROSS JOIN q"
                " WHERE e.vec_id != q.query_id)\n"
                f"    WHERE r <= {SQ_TOPK}\n)"
            ),
            (
                "sq5 AS (\n    SELECT query_id, neighbor_id FROM refined_ranked"
                f" WHERE rank <= {SQ_TOPK}\n)"
            ),
        ]
    )
    + "\nSELECT b.query_id,"
    + " CAST(COALESCE(h.n, 0) AS INT) AS n_hit,"
    + f" COALESCE(h.n, 0) / {float(SQ_TOPK)} AS recall_sq"
    + "\nFROM (SELECT query_id, count(*) AS n FROM sq5 GROUP BY query_id) b"
    + "\nLEFT JOIN (\n    SELECT s.query_id, count(*) AS n FROM sq5 s"
    + "\n    JOIN exact x ON x.query_id = s.query_id"
    + " AND x.neighbor_id = s.neighbor_id GROUP BY s.query_id) h"
    + "\n    ON h.query_id = b.query_id"
)


QUERIES = {
    "sq_topk_rescore": q_sq_topk_rescore,
    "sq_recall_eval": q_sq_recall_eval,
}

ORACLES = {
    "sq_topk_rescore": ORACLE_SQ_TOPK_RESCORE,
    "sq_recall_eval": ORACLE_SQ_RECALL_EVAL,
}
