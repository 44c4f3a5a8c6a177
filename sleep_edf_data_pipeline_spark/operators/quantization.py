"""Product quantization (PQ) for embedding compression + ADC search.

The 100 TB problem this solves: a 64-dim float32 embedding column is
256 bytes/row — 25 TB per 100 B rows — and every ANN scan pays that
bandwidth.  PQ (Jegou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011) splits each vector into ``m`` subspaces,
k-means-quantizes each subspace independently, and stores only the
``m`` one-byte centroid codes: 256 bytes → 4 bytes at m=4, a 64×
compression.  Search runs against the *codes* with an Asymmetric
Distance Computation (ADC): per query, precompute an ``m × k`` table
of exact subspace distances query→centroid, then every corpus
distance is ``m`` table lookups + adds — no float vector is ever
re-read.

Spark-first design (mirrors operators/clustering.py):

- **Training** reuses the fixed-point Lloyd loop per subspace
  (``clustering.kmeans`` on a ``slice()`` of the embedding column):
  deterministic seeding, integer centroid sums, engine-replayable.
- **Encoding is shuffle-free codegen.** Codebooks fold to literal
  arrays; per row the argmin over k subspace distances evaluates
  inside whole-stage codegen (``transform`` + ``array_position``),
  exactly like cluster assignment.  The output is ``m`` int codes —
  the compressed corpus.
- **ADC search scans codes, not vectors.**  The per-query distance
  tables are computed driver-side from the collected query vectors
  (``n_queries × m × k`` floats — the textbook small-collect
  exception) with the same sequential left-fold the engines use, then
  shipped as one tiny broadcast frame; the scan side does
  ``element_at`` lookups + adds over the 4-byte codes.  At 1000
  executors this is the difference between re-reading 25 TB of floats
  per query batch and re-reading 400 GB of codes.

Reference scope note: the reference has no vector search; this extends
the engine per the brief (similarity search at scale).  Cited-parity
queries live in queries/quantization_queries.py with a fully unrolled
DuckDB oracle replaying training + encoding + ADC bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.litarrays import lit_double_array_2d

from .clustering import FP_SCALE


def train_pq_codebooks(
    vectors: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train ``m`` per-subspace codebooks of ``k`` centroids each.

    Subspace ``j`` covers dims ``[j*dim/m, (j+1)*dim/m)``; seeding is
    the k lowest ids' subvectors and updates are the same fixed-point
    integer sums as ``clustering.kmeans`` — arithmetic-identical to m
    independent Lloyd runs (which is what the unrolled SQL oracle
    replays), but FUSED: per iteration, all m assignments evaluate in
    one codegen projection and all m×k×(dim/m) centroid cells come
    back from ONE map-side-combinable shuffle, so training costs
    2 collects + ``iters`` aggregations total instead of m×(iters+1)
    jobs.  Driver traffic per iteration is m·k·(dim/m) = k·dim floats.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    vectors = vectors.persist()
    seed_rows = vectors.orderBy(id_col).limit(k).select(vec_col).collect()
    books = [
        [[float(x) for x in r[0][j * sub : (j + 1) * sub]] for r in seed_rows]
        for j in range(m)
    ]
    for _ in range(iters):
        enc = pq_encode(vectors, books, vec_col)
        codes = F.array(*[F.col(f"code_{j}") for j in range(m)])
        subspace = F.floor(F.col("dim") / F.lit(sub)).cast("int")
        cells = (
            enc.select(codes.alias("_codes"), F.posexplode(F.col(vec_col)).alias("dim", "v"))
            .select(
                subspace.alias("subspace"),
                F.element_at("_codes", subspace + 1).alias("cluster"),
                "dim",
                "v",
            )
            .groupBy("subspace", "cluster", "dim")
            .agg(
                (
                    F.sum(F.floor(F.col("v").cast("double") * FP_SCALE))
                    .cast("double")
                    / (F.lit(FP_SCALE) * F.count("*"))
                ).alias("mean")
            )
            .collect()
        )
        new_books = [[list(c) for c in book] for book in books]
        for r in cells:
            j = r["subspace"]
            new_books[j][r["cluster"]][r["dim"] - j * sub] = r["mean"]
        books = new_books
    vectors.unpersist()
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds ``code_j`` int columns: per-subspace nearest-centroid ids.

    Shuffle-free: one codegen projection per subspace — k sequential
    squared-distance folds over a literal k×sub array,
    ``array_position(array_min)`` argmin with lowest-id tie-break.
    """
    out = vectors
    sub = len(codebooks[0][0])
    for j, book in enumerate(codebooks):
        # one-parse literal (functions/litarrays): the element-wise
        # F.lit form cost ~1,000 py4j round-trips per subspace
        cent = lit_double_array_2d(book)
        subvec = F.slice(F.col(vec_col), j * sub + 1, sub)

        def _dist_to(sv):
            # Closure, not a default arg: a 2-parameter lambda would be
            # interpreted by transform() as (element, index).
            return lambda c: F.aggregate(
                F.zip_with(sv, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        dists = F.transform(cent, _dist_to(subvec))
        out = out.withColumn(f"_d{j}", dists).withColumn(
            f"code_{j}",
            (F.array_position(F.col(f"_d{j}"), F.array_min(F.col(f"_d{j}"))) - 1)
            .cast("int"),
        ).drop(f"_d{j}")
    return out


def adc_distance_tables(
    query_vecs: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
) -> list[tuple[int, list[float]]]:
    """(query_id, flattened m*k ADC table) per query, driver-side.

    Each entry ``table[j*k + c] = Σ_i (q[j·sub+i] − codebook[j][c][i])²``
    with a sequential left-fold — the same order Spark's ``aggregate``
    and DuckDB's ``list_sum`` use, so engine-side recomputation of the
    same distance is bit-identical (Python floats are IEEE doubles).
    """
    k = len(codebooks[0])
    sub = len(codebooks[0][0])
    out = []
    for qid, vec in query_vecs:
        table: list[float] = []
        for j, book in enumerate(codebooks):
            q = vec[j * sub : (j + 1) * sub]
            for cent in book:
                acc = 0.0
                for a, b in zip(q, cent):
                    acc += (a - b) * (a - b)
                table.append(acc)
        out.append((qid, table))
    return out


def adc_topk(
    codes: DataFrame,
    query_tables: DataFrame,
    m: int,
    k: int,
    top_k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-``top_k`` per query by ADC distance over the coded corpus.

    ``query_tables``: (query_id, dtable array<double> of length m*k),
    a handful of rows — broadcast.  The scan side reads only the int
    codes; distance = m ``element_at`` lookups + adds, then a per-query
    top-k (local then global, via row_number over the tiny result).
    Ties break on (distance, neighbor id) for determinism.
    """
    from pyspark.sql import Window

    dist = None
    for j in range(m):
        term = F.element_at(
            F.col("dtable"), (F.lit(j * k) + F.col(f"code_{j}") + 1).cast("int")
        )
        dist = term if dist is None else dist + term
    scored = (
        codes.crossJoin(F.broadcast(query_tables))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            dist.alias("_adc"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("_adc"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("_adc", 6).alias("adc_dist"),
            "rank",
        )
    )
