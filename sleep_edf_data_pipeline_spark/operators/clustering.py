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
- **Update is one map-side-combinable shuffle, in fixed point.**
  posexplode to (cluster, dim, value), then each value is quantized to
  ``floor(v * 2^28)`` and summed as a plain BIGINT.  Integer sums are
  exact and order-free, so partial-aggregation merge order cannot
  perturb centroid bits — and, unlike a DECIMAL cast (whose
  double→decimal rounding differs between engines: Spark rounds the
  shortest decimal repr, DuckDB scales in binary), ``floor`` of a
  power-of-two scaling is bit-identical in every IEEE-754 engine.
  The quantization error (2^-28 ≈ 4e-9 per value) is far below any
  semantic tolerance for centroid training, and it buys full
  cross-engine reproducibility: the driver's DuckDB oracle re-derives
  the entire training loop bit-for-bit (queries/similarity_queries.py).
- **Driver traffic is k x dim floats per iteration** (the centroid
  table), the textbook exception to the no-collect rule; lineage is cut
  each iteration by re-folding centroids to literals, so plans stay
  flat regardless of iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point scale for centroid updates: 2^28.  Power-of-two scaling
#: of a double is exact, and floor() has no rounding-mode ambiguity, so
#: ``floor(v * FP_SCALE)`` is the same integer in Spark, DuckDB, or any
#: IEEE-754 engine.  Sums stay far inside BIGINT (|v| < 2^10 leaves
#: 2^25 headroom of rows per (cluster, dim) cell before overflow; at
#: larger scales, pre-aggregate per partition or widen to DECIMAL(38,0)).
FP_SCALE = float(1 << 28)


def assign_clusters(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds ``cluster`` (argmin squared distance; lowest id on ties).

    The k distances are one ``transform`` over a single k×dim array
    literal (not k chained ``when`` trees): the same sequential
    ``(a-b)²`` fold per centroid, but the generated code carries one
    loop instead of k unrolled expression copies — an order of
    magnitude less codegen per Lloyd iteration, bit-identical results.
    ``array_position(d, array_min(d))`` returns the FIRST index of the
    minimum, preserving the lowest-id tie-break.
    """
    cent = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    dists = F.transform(
        cent,
        lambda c: F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    tmp = vectors.withColumn("_dists", dists)
    best_d = F.array_min(F.col("_dists"))
    best_i = F.array_position(F.col("_dists"), best_d) - 1
    return (
        tmp.withColumn("cluster", best_i.cast("int"))
        .withColumn("sq_dist", best_d)
        .drop("_dists")
    )


def kmeans(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """(assignments, centroids) after ``iters`` Lloyd rounds.

    Seeding is deterministic: the vectors of the k lowest ids.  Every
    arithmetic step is engine-portable (see module docstring), so the
    whole loop can be replayed as unrolled SQL by any engine.
    """
    # One materialization serves seed + every Lloyd round: without it
    # each iteration re-scans the source (iters+1 full reads).  The
    # cache is released before returning — the returned assignment
    # frame re-reads the source lazily, which its (single) consumer
    # action pays once.
    vectors = vectors.persist()
    seed_rows = vectors.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in seed_rows]
    dim = len(centroids[0])  # from the seed collect — no extra job

    for _ in range(iters):
        assigned = assign_clusters(vectors, centroids, vec_col)
        cells = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("dim", "v")
            )
            .groupBy("cluster", "dim")
            .agg(
                (
                    F.sum(F.floor(F.col("v").cast("double") * FP_SCALE))
                    .cast("double")
                    / (F.lit(FP_SCALE) * F.count("*"))
                ).alias("mean")
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

    vectors.unpersist()
    return assign_clusters(vectors, centroids, vec_col), centroids
