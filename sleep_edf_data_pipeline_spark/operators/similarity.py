"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB design requires:

- **Brute-force cosine top-k** — the correctness baseline: broadcast
  the (small) query set against the corpus, dot products via
  ``zip_with`` + ``aggregate`` higher-order functions (JVM-side, fused
  into the scan), rank per query.  Linear in corpus size, no index.
- **Blocked / LSH paths** — the scale baseline:
  - :func:`ivf_topk` probes only rows whose coarse block (here: an
    existing cluster label; in production a trained quantizer) matches
    the query's — classic IVF pruning, turning a full scan into a
    partition-pruned one.
  - :func:`hyperplane_lsh_buckets` assigns sign-pattern buckets from
    deterministic pseudo-random hyperplanes (seeded 60-bit hashes →
    ±1 components) — candidates share a bucket; collisions
    concentrate near neighbors.

Sums run in array order (sequential fold) so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.litarrays import lit_double_array


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_label_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k: streamed matmul + per-partition partial top-k.

    The scalable exact-ANN shape: the (small, driver-resident) query
    batch rides into an Arrow-batched ``mapInPandas`` closure; each
    corpus partition computes one BLAS ``X @ Qᵀ`` and emits only its
    LOCAL top-k per query, so the shuffle carries O(partitions·k·|Q|)
    candidate rows — never the N·|Q| scored pairs — and a global
    row_number keeps the true top-k (local top-k is lossless for a
    global top-k).  No JVM-interpreted higher-order folds in the hot
    path, no pair frame materialized.

    Ranking uses the 6-digit-rounded similarity with an id tie-break so
    top-k membership is deterministic across engines and runs.
    Returns (query_id, neighbor_id, cosine_sim, rank).

    ``exclude_label_col``: when set, corpus rows sharing the query's
    value in that column are masked out along with the self-match —
    the hard-negative-mining shape (top-k most-similar rows of a
    DIFFERENT class).
    """
    import numpy as np

    qcols = [id_col, vec_col] + ([exclude_label_col] if exclude_label_col else [])
    qrows = queries.select(*qcols).collect()  # query batch: small by contract
    qids = [int(r[0]) for r in qrows]
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qlabels = [r[2] for r in qrows] if exclude_label_col else None

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            labels = (
                pdf[exclude_label_col].to_numpy() if exclude_label_col else None
            )
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            xn = np.sqrt((x * x).sum(axis=1))
            den = np.outer(xn, qnorm)
            sims = np.divide(x @ qmat.T, den, out=np.full_like(den, -np.inf), where=den > 0)
            out_q, out_n, out_s = [], [], []
            kk = min(k, len(ids))
            for j, qid in enumerate(qids):
                raw = sims[:, j].copy()
                raw[ids == qid] = -np.inf  # exclude self-match
                if labels is not None:
                    raw[labels == qlabels[j]] = -np.inf  # same-class mask
                # Local ordering must equal the global (rounded DESC,
                # id ASC) ordering or boundary ties could select a
                # different top-k than the final rank; raw sims are
                # emitted and rounded once JVM-side.
                rounded = np.round(raw, 6)
                order = np.lexsort((ids, -rounded))[:kk]
                keep = order[np.isfinite(raw[order])]
                out_q.extend([qid] * len(keep))
                out_n.extend(ids[keep].tolist())
                out_s.extend(raw[keep].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine_sim": out_s}
            )

    ccols = [id_col, vec_col] + ([exclude_label_col] if exclude_label_col else [])
    candidates = corpus.select(*ccols).mapInPandas(
        score, schema="query_id bigint, neighbor_id bigint, cosine_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        candidates.withColumn("cosine_sim", F.round("cosine_sim", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """IVF-style blocked top-k: probe only the query's coarse block.

    The equi-join on the block key replaces the cross join — at scale
    this is the difference between O(Q·N) and O(Q·N/B) with partition
    pruning on a block-partitioned corpus.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col(block_col).alias("_block"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.col(block_col).alias("_block"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    den = F.col("_qn") * F.col("_cn")
    scored = (
        c.join(F.broadcast(q), "_block")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(
                F.when(den > 0, dot(F.col("_qvec"), F.col("_cvec")) / den), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _plane_components(plane: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane from md5 parity, computed driver-side.

    Same bits as ``hash64(lit(f"{plane}:{d}")) % 2`` (and the DuckDB
    oracle's md5 parity), but folded to Python floats at plan-build
    time: the executed plan carries only literal ±1 doubles instead of
    dim×planes md5 expression nodes (which Catalyst would otherwise
    carry through analysis and codegen — measured seconds of compile
    for 8×64 planes).
    """
    import hashlib

    comps = []
    for d in range(dim):
        h = int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[:15], 16)
        comps.append(1.0 if h % 2 == 0 else -1.0)
    return comps


def hyperplane_lsh_bucket_col(
    vec: Column, n_planes: int = 8, dim: int = 64
) -> Column:
    """Random-hyperplane LSH bucket id as a pure COLUMN expression.

    Hyperplane components are ±1 derived from seeded hashes, so both
    engines (and every run) build identical planes without a
    randomness source.  Being a projection, it composes with
    ``withColumn`` — no (id, bucket) self-join needed to attach
    buckets to the source frame.  Bucket in [0, 2^n_planes).
    """
    bucket: Column = F.lit(0).cast("bigint")
    for p in range(n_planes):
        comps = _plane_components(p, dim)
        proj = F.aggregate(
            F.zip_with(
                vec,
                lit_double_array(comps),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def hyperplane_lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """(id, bucket) frame over :func:`hyperplane_lsh_bucket_col`."""
    return df.select(
        F.col(id_col),
        hyperplane_lsh_bucket_col(F.col(vec_col), n_planes, dim).alias(
            "bucket"
        ),
    )
