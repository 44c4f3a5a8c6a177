"""Lloyd's k-means over an embedding column — IVF centroid training.

The missing piece between the brute-force and IVF top-k paths in
operators/similarity.py: IVF needs centroids, and this trains them with
pure DataFrame ops.

Design for scale and determinism:

- **Assignment is shuffle-free.** Centroids are a handful of small
  vectors, so they fold into literal expressions (the same trick as the
  LSH hyperplanes): per row, k squared-distance expressions evaluated
  inside whole-stage codegen, argmin via a fold over ``F.when`` — no
  join, no Python.
- **Update is one map-side-combinable shuffle.** posexplode to
  (cluster, dim, value) and average per cell.  Sums run in DECIMAL so
  partial-aggregation merge order cannot perturb centroid bits — the
  whole training loop is bit-deterministic run-to-run, which the
  driver's hash gate requires of anything downstream of it.  (MLlib's
  denser alternative is treeAggregate of per-partition sum vectors;
  the relational form keeps Catalyst in charge and spills gracefully.)
- **Driver traffic is k x dim floats per iteration** (the centroid
  table), the textbook exception to the no-collect rule; lineage is cut
  each iteration by re-folding centroids to literals, so plans stay
  flat regardless of iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Exact-sum type for centroid updates: float32 inputs cast to double
#: are exact; this decimal keeps ~10 integer digits and 18 fractional.
_SUM_DECIMAL = "decimal(28,18)"


def _sq_dist(vec_col: str, centroid: list[float]) -> F.Column:
    arr = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds ``cluster`` (argmin squared distance; lowest id on ties)."""
    dists = [_sq_dist(vec_col, c) for c in centroids]
    best_d, best_i = dists[0], F.lit(0)
    for i in range(1, len(centroids)):
        cond = dists[i] < best_d
        best_i = F.when(cond, i).otherwise(best_i)
        best_d = F.when(cond, dists[i]).otherwise(best_d)
    return vectors.withColumn("cluster", best_i.cast("int")).withColumn(
        "sq_dist", best_d
    )


def kmeans(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """(assignments, centroids) after ``iters`` Lloyd rounds.

    Seeding is deterministic: the vectors of the k lowest ids.
    """
    dim = len(vectors.select(vec_col).first()[0])
    seed_rows = vectors.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in seed_rows]

    for _ in range(iters):
        assigned = assign_clusters(vectors, centroids, vec_col)
        cells = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("dim", "v")
            )
            .groupBy("cluster", "dim")
            .agg(
                (
                    F.sum(F.col("v").cast("double").cast(_SUM_DECIMAL))
                    / F.count("*")
                )
                .cast("double")
                .alias("mean")
            )
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty cluster: keep
        by_cluster: dict[int, list[float]] = {}
        for r in cells:
            by_cluster.setdefault(r["cluster"], [0.0] * dim)[r["dim"]] = r["mean"]
        for c, vals in by_cluster.items():
            new_centroids[c] = vals
        centroids = new_centroids

    return assign_clusters(vectors, centroids, vec_col), centroids
