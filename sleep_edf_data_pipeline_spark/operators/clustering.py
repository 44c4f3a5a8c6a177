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

from ..functions.litarrays import lit_double_array_2d

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
    # One-parse nested-array literal (functions/litarrays): PySpark's
    # classic-mode ``F.lit`` on a nested list still recurses into one
    # py4j call per element (~k×dim round-trips of per-call driver
    # overhead); a single parsed expression builds the identical
    # literal tree.  Bit-identical values either way.
    cent = lit_double_array_2d([[float(x) for x in c] for c in centroids])
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


#: Local-training budget: if the training set has at most this many
#: rows (and therefore a few MB of floats), the Lloyd loop runs
#: driver-side in exact fixed-point numpy — one collect instead of
#: ``iters`` Spark jobs whose cost at small scale is pure scheduling
#: + per-round codegen recompilation (each round folds new centroid
#: literals → a fresh janino compile).  This is also the production
#: shape: IVF/PQ codebooks are trained on a bounded sample (FAISS
#: trains on ~O(100k) vectors regardless of corpus size), so the
#: driver path IS the scale path for training; the distributed loop
#: below remains for full-corpus training past the budget.
MAX_LOCAL_TRAIN_ROWS = 65536


def _kmeans_local(rows, k: int, iters: int, id_col: str, vec_col: str):
    """Driver-side Lloyd, bit-identical to the distributed loop.

    Same arithmetic, same order: squared distance is the sequential
    per-dim fold (``acc + (a-b)^2`` accumulated dim by dim — numpy's
    pairwise ``sum`` is deliberately avoided), argmin takes the first
    (lowest) cluster on ties, and the update sums ``floor(v * 2^28)``
    exactly in int64 before a single double division.

    Returns ``(centroids, assignment, sq_dist)`` — the final
    assignment/distance pass included, so the caller needs no further
    Spark job to produce the assignment frame.
    """
    import numpy as np

    ids = np.array([r[id_col] for r in rows])
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    n, dim = x.shape
    order = np.argsort(ids, kind="stable")
    cent = x[order[:k]].copy()
    xq = np.floor(x * FP_SCALE).astype(np.int64)

    def dists():
        d = np.zeros((n, k))
        for i in range(dim):
            diff = x[:, i, None] - cent[None, :, i]
            d += diff * diff
        return d

    for _ in range(iters):
        assign = dists().argmin(axis=1)
        for c in range(k):
            mask = assign == c
            cnt = int(mask.sum())
            if cnt:
                s = np.add.reduce(xq[mask], axis=0)
                cent[c] = s.astype(np.float64) / (FP_SCALE * cnt)
    d = dists()
    assign = d.argmin(axis=1)
    sqd = d[np.arange(n), assign]
    centroids = [[float(v) for v in c] for c in cent]
    return centroids, assign, sqd


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

    Small training sets (≤ ``MAX_LOCAL_TRAIN_ROWS``) train driver-side
    in one collect and return the assignments as a LocalRelation (the
    probe already holds every row, so the final assignment pass is
    numpy too — zero further Spark jobs; the tiny frame broadcasts
    into any downstream join).  Arithmetic is identical bit-for-bit
    in both paths.
    """
    # Probe with limit(budget+1): if the result fits, it IS the whole
    # training set (one job, no count) and the local path trains on it;
    # a truncated probe is discarded and the distributed loop runs.
    probe = vectors.limit(MAX_LOCAL_TRAIN_ROWS + 1).collect()
    if len(probe) <= MAX_LOCAL_TRAIN_ROWS and probe:
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        centroids, assign, sqd = _kmeans_local(
            probe, k, iters, id_col, vec_col
        )
        # fresh StructType — .add() would mutate the frame's cached schema
        schema = StructType(
            list(vectors.schema.fields)
            + [
                StructField("cluster", IntegerType(), False),
                StructField("sq_dist", DoubleType(), False),
            ]
        )
        data = [
            tuple(r) + (int(c), float(d))
            for r, c, d in zip(probe, assign, sqd)
        ]
        # verifySchema=False: rows are rebuilt from a collect + exact
        # python scalars, and per-row verification of 64-float arrays
        # costs more than the training itself.  Few slices: the
        # default (one per core) schedules 32 Python tasks for a
        # frame this size, tripling every downstream action's cost.
        spark = vectors.sparkSession
        local = spark.createDataFrame(
            spark.sparkContext.parallelize(data, 4),
            schema,
            verifySchema=False,
        )
        return local, centroids

    # One materialization serves seed + every Lloyd round: without it
    # each iteration re-scans the source (iters+1 full reads).  The
    # cache is released before returning — the returned assignment
    # frame re-reads the source lazily, which its (single) consumer
    # action pays once.
    vectors = vectors.persist()
    seed_rows = vectors.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in seed_rows]
    dim = len(centroids[0])  # from the seed collect — no extra job

    # Per-round update: ONE wide hash aggregate — dim fixed-point sums
    # + a count per cluster, k groups total.  No posexplode: exploding
    # to (cluster, dim, v) shuffles rows×dim records per round, where
    # this shuffles k×(dim+1) partially-aggregated cells (map-side
    # combine does the rest).  Arithmetic is unchanged bit-for-bit:
    # floor(v·2^28) summed as BIGINT, one double division at the end
    # (Python and Spark IEEE-754 division are the same operation).
    sums = [
        F.sum(
            F.floor(
                F.element_at(F.col(vec_col), i + 1).cast("double") * FP_SCALE
            )
        ).alias(f"s{i}")
        for i in range(dim)
    ]
    for _ in range(iters):
        assigned = assign_clusters(vectors, centroids, vec_col)
        cells = (
            assigned.groupBy("cluster")
            .agg(F.count("*").alias("n"), *sums)
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty cluster: keep
        for r in cells:
            n = r["n"]
            new_centroids[r["cluster"]] = [
                float(r[f"s{i}"]) / (FP_SCALE * n) for i in range(dim)
            ]
        centroids = new_centroids

    vectors.unpersist()
    return assign_clusters(vectors, centroids, vec_col), centroids
