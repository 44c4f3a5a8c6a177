"""Oracle-checked similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    brute_force_topk,
    hyperplane_lsh_buckets,
    ivf_topk,
)
from ..tables import spread, table

#: Query set: the first 10 vectors.
N_QUERIES = 10
TOP_K = 5

_DOT = (
    "list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)"
    " for i in range(1, len(a.embedding) + 1)])"
)
_NORM_A = (
    "sqrt(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)"
    " for i in range(1, len(a.embedding) + 1)]))"
)
_NORM_B = (
    "sqrt(list_sum([CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)"
    " for i in range(1, len(b.embedding) + 1)]))"
)


def q_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 query vectors against the whole corpus.

    No spread(): the matmul path is BLAS-bound per scan split, and at
    real scale the corpus already arrives as thousands of splits — the
    local repartition would cost more than the (trivial) compute.
    """
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return brute_force_topk(emb, queries, k=TOP_K)


ORACLE_COSINE_TOPK_BRUTEFORCE = f"""
WITH scored AS (
    SELECT
        a.vec_id AS query_id,
        b.vec_id AS neighbor_id,
        round({_DOT} / nullif({_NORM_A} * {_NORM_B}, 0), 6) AS cosine_sim
    FROM embeddings AS a
    JOIN embeddings AS b ON a.vec_id != b.vec_id
    WHERE a.vec_id < {N_QUERIES}
),
ranked AS (
    SELECT
        *,
        CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC
        ) AS INT) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""


def q_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-blocked cosine top-5: probe only the query's cluster block."""
    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return ivf_topk(emb, queries, k=TOP_K)


ORACLE_COSINE_TOPK_IVF = f"""
WITH scored AS (
    SELECT
        a.vec_id AS query_id,
        b.vec_id AS neighbor_id,
        round({_DOT} / nullif({_NORM_A} * {_NORM_B}, 0), 6) AS cosine_sim
    FROM embeddings AS a
    JOIN embeddings AS b ON a.label = b.label AND a.vec_id != b.vec_id
    WHERE a.vec_id < {N_QUERIES}
),
ranked AS (
    SELECT
        *,
        CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC
        ) AS INT) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""

_N_PLANES = 8
_DIM = 64

_H64 = "CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"


def _proj_sql(p: int) -> str:
    comp = _H64.format(s=f"'{p}:' || CAST(i - 1 AS VARCHAR)")
    return (
        f"list_sum([CAST(embedding[i] AS DOUBLE) * "
        f"(CASE WHEN {comp} % 2 = 0 THEN 1.0 ELSE -1.0 END)"
        f" for i in range(1, len(embedding) + 1)])"
    )


def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (8 planes → 256 buckets)."""
    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    return hyperplane_lsh_buckets(emb, n_planes=_N_PLANES, dim=_DIM)


ORACLE_LSH_BUCKETS = (
    "WITH proj AS (\n    SELECT vec_id,\n"
    + ",\n".join(f"        {_proj_sql(p)} AS p{p}" for p in range(_N_PLANES))
    + "\n    FROM embeddings\n)\nSELECT vec_id, CAST("
    + " + ".join(
        f"CASE WHEN p{p} > 0 THEN {2**p} ELSE 0 END" for p in range(_N_PLANES)
    )
    + " AS BIGINT) AS bucket\nFROM proj"
)


def q_embedding_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within IVF blocks (cos ≥ 0.3)."""
    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    from ..operators.similarity import dot, norm

    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("_va"),
        F.col("label").alias("_block"),
        norm(F.col("embedding")).alias("_na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("_vb"),
        F.col("label").alias("_block"),
        norm(F.col("embedding")).alias("_nb"),
    )
    den = F.col("_na") * F.col("_nb")
    cos = F.when(den > 0, dot(F.col("_va"), F.col("_vb")) / den)
    return (
        a.join(b, "_block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", F.round(cos, 6))
        .filter(F.col("cosine_sim") >= 0.3)
        .select("id_a", "id_b", "cosine_sim")
    )


ORACLE_EMBEDDING_NEARDUPS = f"""
SELECT
    a.vec_id AS id_a,
    b.vec_id AS id_b,
    round({_DOT} / nullif({_NORM_A} * {_NORM_B}, 0), 6) AS cosine_sim
FROM embeddings AS a
JOIN embeddings AS b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round({_DOT} / nullif({_NORM_A} * {_NORM_B}, 0), 6) >= 0.3
"""



_KM_K = 8
_KM_ITERS = 3
_KM_DIM = 64
_KM_FP = "268435456.0"  # 2^28, matches operators.clustering.FP_SCALE


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF centroid training: 3 Lloyd rounds, deterministic seeding.

    Iterative (driver-coordinated rounds), yet fully hash-verifiable:
    every arithmetic step is engine-portable (fixed-point centroid
    sums, see operators/clustering.py), so the oracle below replays
    the whole training loop as unrolled SQL and DuckDB re-derives the
    exact assignment, bit-for-bit.  tests/test_clustering.py
    additionally proves the fixed-point properties (assignment =
    argmin, inertia monotonically non-increasing).
    """
    from ..operators.clustering import kmeans

    # No spread(): the local-training path collects one probe (the
    # repartition shuffle would only tax that collect), and past the
    # budget the distributed loop parallelizes on the scan's natural
    # file/row-group splits.
    vecs = table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans(vecs, k=_KM_K, iters=_KM_ITERS)
    return assigned.select(
        "vec_id", "cluster", F.round("sq_dist", 6).alias("sq_dist")
    )


def kmeans_assignment_ctes(
    k: int = _KM_K, iters: int = _KM_ITERS, dim: int = _KM_DIM
) -> tuple[list[str], str]:
    """(CTE list, final-assignment CTE name) for the unrolled Lloyd loop.

    Shared by the kmeans oracle here and the SemDeDup oracle
    (queries/training_data.py), which consumes the final assignment
    ``a{iters}(vec_id, v, cluster, d)`` as its clustering stage.
    """
    ctes, final = _kmeans_cte_chain(k, iters, dim)
    return ctes, final


def _kmeans_oracle(k: int = _KM_K, iters: int = _KM_ITERS, dim: int = _KM_DIM) -> str:
    """Unrolled Lloyd loop as DuckDB SQL (one CTE chain per iteration).

    Mirrors operators/clustering.py exactly: seed = vectors of the k
    lowest ids; assignment = argmin of the sequential squared-distance
    sum with lowest-cluster tie-break; update = mean of
    ``floor(v * 2^28)`` integer sums (exact, order-free in any engine)
    with empty clusters keeping their previous centroid.
    """
    ctes, final = _kmeans_cte_chain(k, iters, dim)
    return (
        "WITH\n"
        + ",\n".join(ctes)
        + f"\nSELECT vec_id, cluster, round(d, 6) AS sq_dist FROM {final}"
    )


def _kmeans_cte_chain(
    k: int, iters: int, dim: int
) -> tuple[list[str], str]:
    rng = f"range(1, {dim + 1})"
    sq = f"list_sum([ (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]) for i in {rng} ])"
    ctes = [
        f"emb AS (\n    SELECT vec_id,"
        f" [CAST(embedding[i] AS DOUBLE) for i in {rng}] AS v\n"
        f"    FROM embeddings\n)",
        f"c0 AS (\n    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)"
        f" AS cluster, v AS c\n    FROM emb ORDER BY vec_id LIMIT {k}\n)",
    ]
    for it in range(iters + 1):  # iters updates + final assignment
        ctes.append(
            f"d{it} AS (\n    SELECT e.vec_id, e.v, c.cluster, {sq} AS d\n"
            f"    FROM emb e CROSS JOIN c{it} c\n)"
        )
        ctes.append(
            f"a{it} AS (\n    SELECT vec_id, v, cluster, d FROM (\n"
            f"        SELECT *, row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY d, cluster) AS rn FROM d{it}\n"
            f"    ) WHERE rn = 1\n)"
        )
        if it == iters:
            break
        ctes.append(
            f"u{it} AS (\n    SELECT a.cluster, t.i AS dim,\n"
            f"        CAST(SUM(CAST(floor(a.v[t.i] * {_KM_FP}) AS BIGINT))"
            f" AS DOUBLE) / ({_KM_FP} * COUNT(*)) AS m\n"
            f"    FROM a{it} a CROSS JOIN generate_series(1, {dim}) AS t(i)\n"
            f"    GROUP BY a.cluster, t.i\n)"
        )
        ctes.append(
            f"g{it} AS (\n    SELECT cluster, list(m ORDER BY dim) AS c"
            f" FROM u{it} GROUP BY cluster\n)"
        )
        ctes.append(
            f"c{it + 1} AS (\n    SELECT p.cluster, COALESCE(g.c, p.c) AS c\n"
            f"    FROM c{it} p LEFT JOIN g{it} g USING (cluster)\n)"
        )
    return ctes, f"a{iters}"


ORACLE_KMEANS_CLUSTERS = _kmeans_oracle()

QUERIES = {
    "kmeans_clusters": q_kmeans_clusters,
    "cosine_topk_bruteforce": q_cosine_topk_bruteforce,
    "cosine_topk_ivf": q_cosine_topk_ivf,
    "lsh_buckets": q_lsh_buckets,
    "embedding_neardups": q_embedding_neardups,
}

ORACLES = {
    "kmeans_clusters": ORACLE_KMEANS_CLUSTERS,
    "cosine_topk_bruteforce": ORACLE_COSINE_TOPK_BRUTEFORCE,
    "cosine_topk_ivf": ORACLE_COSINE_TOPK_IVF,
    "lsh_buckets": ORACLE_LSH_BUCKETS,
    "embedding_neardups": ORACLE_EMBEDDING_NEARDUPS,
}
