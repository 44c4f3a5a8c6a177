"""Round-9: clustering quality — centroid-based (simplified) silhouette.

The clustering family (k-means, SemDeDup, IVF/PQ) had no quality
diagnostic: a data-curation pipeline that blocks on k-means needs to
know whether the blocking is real structure or noise before trusting
SemDeDup/IVF pruning.  The full silhouette is all-pairs (O(N²) —
non-distributable); the standard scalable variant ("simplified
silhouette", used by sklearn at scale and in the original Rousseeuw
follow-ups) replaces mean intra/inter-cluster distances with distances
to centroids: a(i) = ||x_i − c_own||, b(i) = min_{j≠own} ||x_i − c_j||,
s(i) = (b − a) / max(a, b).

Scale shape (100 TB): one corpus pass, O(N·k) distance folds against
k BROADCAST centroid literals (no join — the centroids are plan
constants, exactly how the Lloyd assignment step already runs), then
one tiny groupBy(cluster).  Float discipline: per-row s(i) is a fixed
expression tree (identical in DuckDB — sequential list_sum folds, no
FMA-contractable chain), quantized to integer micro-units with
``floor(s·10^6)`` and summed as BIGINT; the per-cluster mean is ONE
double division of exact integers — order-free, hash-stable.

The oracle replays the full Lloyd training (the shared unrolled CTE
chain), takes a(i) from the assignment argmin and b(i) as the min
distance over the other clusters, and reduces identically.

Reference parity: no clustering surface exists in the reference;
extends SURVEY §2.7's clustering/ANN family per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.litarrays import lit_double_array
from ..tables import table
from .similarity_queries import (
    _KM_DIM,
    _KM_ITERS,
    _KM_K,
    kmeans_assignment_ctes,
)

#: Micro-unit quantization for the silhouette sum (exact in BIGINT).
_SIL_FP = 1_000_000


def _sq_dist_to(centroid: list[float]):
    """Sequential-fold squared distance to a literal centroid — the
    same expression shape as the oracle's ``list_sum`` (element order
    preserved, so the double is bit-identical cross-engine)."""
    arr = lit_double_array(centroid)
    return F.aggregate(
        F.zip_with(
            F.col("embedding"),
            arr,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def q_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import kmeans

    vecs = table(spark, sf_dir, "embeddings")
    assigned, centroids = kmeans(vecs, k=_KM_K, iters=_KM_ITERS)
    dists = [_sq_dist_to(c) for c in centroids]
    # a: distance to the OWN centroid, recomputed with the same fold
    # as b so both sides of the ratio share one arithmetic path
    a2 = F.coalesce(
        *[
            F.when(F.col("cluster") == j, d)
            for j, d in enumerate(dists)
        ]
    )
    b2 = F.least(
        *[
            F.when(F.col("cluster") != j, d)
            for j, d in enumerate(dists)
        ]
    )
    a, b = F.sqrt(a2), F.sqrt(b2)
    s = F.when(
        F.greatest(a, b) > 0, (b - a) / F.greatest(a, b)
    ).otherwise(F.lit(0.0))
    si = F.floor(s * _SIL_FP).cast("bigint")
    per_vec = assigned.select("vec_id", "cluster", si.alias("si"))
    return per_vec.groupBy("cluster").agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        (
            F.sum("si").cast("double")
            / (F.count("*") * F.lit(float(_SIL_FP)))
        ).alias("mean_silhouette"),
    )


def _oracle() -> str:
    ctes, final = kmeans_assignment_ctes(_KM_K, _KM_ITERS, _KM_DIM)
    d_all = f"d{_KM_ITERS}"  # distances to ALL centroids, final round
    return (
        "WITH\n"
        + ",\n".join(ctes)
        + f""",
nb AS (
    SELECT dd.vec_id, min(dd.d) AS b2
    FROM {d_all} dd JOIN {final} aa USING (vec_id)
    WHERE dd.cluster != aa.cluster
    GROUP BY dd.vec_id
),
sil AS (
    SELECT aa.cluster,
           CASE WHEN greatest(sqrt(aa.d), sqrt(nb.b2)) > 0
                THEN CAST(floor((sqrt(nb.b2) - sqrt(aa.d))
                          / greatest(sqrt(aa.d), sqrt(nb.b2))
                          * {_SIL_FP}) AS BIGINT)
                ELSE 0 END AS si
    FROM {final} aa JOIN nb USING (vec_id)
)
SELECT cluster,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(si) AS DOUBLE) / (count(*) * CAST({_SIL_FP} AS DOUBLE))
           AS mean_silhouette
FROM sil GROUP BY cluster"""
    )


ORACLE_KMEANS_SILHOUETTE = _oracle()

QUERIES = {
    "kmeans_silhouette": q_kmeans_silhouette,
}

ORACLES = {
    "kmeans_silhouette": ORACLE_KMEANS_SILHOUETTE,
}
