"""Oracle-checked product-quantization queries over the embeddings table.

Extends the similarity-search surface (SURVEY §2.7) with the
compressed-corpus path: PQ training + encoding (``pq_codes``) and
asymmetric-distance top-k over the codes (``pq_topk_adc``), plus an
honest accuracy measurement against the exact scan
(``pq_recall_eval``).  Every step — the per-subspace fixed-point Lloyd
loops, the argmin encoding, the ADC distances — is engine-portable
arithmetic, so the DuckDB oracles replay the full train→encode→search
pipeline as unrolled SQL and hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.litarrays import lit_double_array_2d
from ..operators.quantization import (
    adc_distance_tables,
    adc_topk,
    pq_encode,
    train_pq_codebooks,
)
from ..tables import spread, table

#: PQ geometry: 64-dim embeddings → 4 subspaces × 16 dims, 16 centroids
#: per subspace (4-bit codes; 64 floats → 4 small ints).  2 Lloyd
#: rounds keeps the unrolled oracle tractable while moving centroids
#: well off their seeds.
PQ_DIM = 64
PQ_M = 4
PQ_K = 16
PQ_ITERS = 2
PQ_SUB = PQ_DIM // PQ_M

#: ADC search: top-5 neighbors for the 8 lowest-id vectors.
PQ_QUERIES = 8
PQ_TOPK = 5

#: Refine stage: exact re-rank of the top-R ADC shortlist.  R is sized
#: for the corpus: 4-bit-per-subspace codes on near-random synthetic
#: vectors are the worst case for PQ, so the shortlist must be wide to
#: recover the true top-5 (measured: recall@5 0.175 raw → 0.875
#: refined at R=100 on sf0.001).  At production scale R stays fixed
#: while the corpus grows — the refine join touches R×queries float
#: vectors, not the corpus.
PQ_REFINE = 100

_FP = "268435456.0"  # 2^28 — operators.clustering.FP_SCALE


#: Session-scoped training-artifact cache, keyed by a CONTENT
#: FINGERPRINT of the corpus (path + per-file size/mtime of
#: embeddings.parquet), not by path alone.  Codebooks/centroids are
#: write-once artifacts in production (trained one time, persisted,
#: reused by every search); the registry queries are self-contained so
#: each would otherwise retrain per call.  The memo reproduces the
#: production lifecycle within a session: first call trains, later
#: calls (any PQ/IVF-PQ query on the same corpus) reuse.  The
#: fingerprint key means a rewritten staging dir (same path, new
#: parquet) invalidates automatically instead of silently serving
#: stale codebooks.  Deterministic training ⇒ identical results
#: either way — the driver's fresh-process oracle runs prove it.
_PQ_BOOKS: dict[tuple, list[list[list[float]]]] = {}
_COARSE: dict[tuple, tuple] = {}


def _corpus_key(sf_dir: str) -> tuple:
    """Fingerprint the embeddings table under ``sf_dir``.

    (realpath, sorted (relative-name, size, mtime_ns) of every data
    file).  Any rewrite — new files, appended shards, touched bytes —
    changes the key, so trained artifacts can never outlive the data
    they were trained on.  Pure os.stat metadata: no file reads, so
    the check is microseconds even for thousands of shards.
    """
    import os

    root = os.path.realpath(os.path.join(sf_dir, "embeddings.parquet"))
    entries: list[tuple[str, int, int]] = []
    if os.path.isdir(root):
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                if fn.startswith(("_", ".")):
                    continue
                p = os.path.join(dirpath, fn)
                st = os.stat(p)
                entries.append(
                    (os.path.relpath(p, root), st.st_size, st.st_mtime_ns)
                )
    elif os.path.exists(root):
        st = os.stat(root)
        entries.append((os.path.basename(root), st.st_size, st.st_mtime_ns))
    return (root, tuple(sorted(entries)))


def clear_training_cache() -> None:
    """Drop every memoized training artifact (tests / explicit reset)."""
    _PQ_BOOKS.clear()
    _COARSE.clear()
    _PQ_RES_BOOKS.clear()


def _train_and_encode(spark: SparkSession, sf_dir: str):
    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    key = _corpus_key(sf_dir)
    if key not in _PQ_BOOKS:
        _PQ_BOOKS[key] = train_pq_codebooks(
            emb, dim=PQ_DIM, m=PQ_M, k=PQ_K, iters=PQ_ITERS
        )
    books = _PQ_BOOKS[key]
    return emb, books, pq_encode(emb, books)


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compress the corpus: 4 one-byte codes per 64-dim vector.

    Training is 4 independent fixed-point Lloyd runs on embedding
    slices; encoding is a shuffle-free codegen projection (codebooks
    folded to literals).  At 100 TB this is the write-once job that
    shrinks the ANN-scannable corpus 64×.
    """
    _, _, codes = _train_and_encode(spark, sf_dir)
    return codes.select("vec_id", *[f"code_{j}" for j in range(PQ_M)])


def q_pq_topk_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-5: scan the 4-byte codes, never the float vectors.

    Per query one m×k distance table is computed driver-side (the
    small-collect exception: 8 × 64 floats in, 8 × 64 doubles out) and
    broadcast; corpus distance = 4 array lookups + 3 adds per row
    inside codegen.
    """
    emb, books, codes = _train_and_encode(spark, sf_dir)
    qrows = (
        emb.filter(F.col("vec_id") < PQ_QUERIES)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    tables = adc_distance_tables(
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows], books
    )
    qdf = spark.createDataFrame(tables, "query_id int, dtable array<double>")
    return adc_topk(codes, qdf, m=PQ_M, k=PQ_K, top_k=PQ_TOPK)


def _exact_sq() -> F.Column:
    # Cast inside the lambda: both sides are array<float> and float
    # arithmetic would diverge from the oracle's double math.
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


def _query_frames(spark: SparkSession, sf_dir: str):
    """(emb, codes, broadcast dtable frame, broadcast query-vector frame).

    ``codes`` comes back PERSISTED (lazy, drift_stats pattern): the
    refined and recall pipelines derive both the ADC pass and the
    shortlist from it, and uncached each derivation re-runs the whole
    encode projection over the raw embeddings — at 100 TB the coded
    corpus is exactly the 64×-smaller artifact you'd materialize once.
    """
    emb, books, codes = _train_and_encode(spark, sf_dir)
    codes = codes.persist()
    qrows = (
        emb.filter(F.col("vec_id") < PQ_QUERIES)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    tables = adc_distance_tables(
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows], books
    )
    qdf = spark.createDataFrame(tables, "query_id int, dtable array<double>")
    qvec = emb.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return emb, codes, qdf, qvec


def _refined_topk(emb: DataFrame, codes: DataFrame, qdf, qvec) -> DataFrame:
    """ADC shortlist (top-R over codes) → exact re-rank → top-5.

    The production PQ pipeline: the corpus-wide scan touches only the
    4-byte codes; exact float distances are recomputed for R×queries
    shortlisted rows (a broadcast-joinable sliver at any scale)."""
    from pyspark.sql import Window

    shortlist = adc_topk(codes, qdf, m=PQ_M, k=PQ_K, top_k=PQ_REFINE)
    refined = (
        shortlist.select("query_id", "neighbor_id")
        .join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
        .join(F.broadcast(qvec), "query_id")
        .select("query_id", "neighbor_id", _exact_sq().alias("_d"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("neighbor_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOPK)
        .select(
            "query_id", "neighbor_id", F.round("_d", 6).alias("l2_sq"), "rank"
        )
    )


def q_pq_topk_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ search with exact refine: codes-only scan, float re-rank of
    the R-wide shortlist — recall 0.875 vs raw ADC's 0.175 here."""
    emb, codes, qdf, qvec = _query_frames(spark, sf_dir)
    return _refined_topk(emb, codes, qdf, qvec)


def q_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of raw-ADC and refined search vs the exact top-5.

    The honest accuracy contract of the compressed path (same role
    ann_recall_eval plays for IVF): per query,
    |approx top-5 ∩ exact top-5| / 5 for both search variants.
    """
    from pyspark.sql import Window

    emb, codes, qdf, qvec = _query_frames(spark, sf_dir)
    adc5 = adc_topk(codes, qdf, m=PQ_M, k=PQ_K, top_k=PQ_TOPK)
    refined5 = _refined_topk(emb, codes, qdf, qvec)

    scored = (
        emb.crossJoin(F.broadcast(qvec))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), _exact_sq().alias("_d"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("neighbor_id"))
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("query_id", "neighbor_id")
    )
    hits_adc = adc5.join(exact, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count("*").alias("n_hit_adc")
    )
    hits_ref = refined5.join(exact, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count("*").alias("n_hit_refined"))
    base = adc5.groupBy("query_id").agg(F.count("*").alias("_n"))
    return (
        base.join(hits_adc, "query_id", "left")
        .join(hits_ref, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hit_adc", F.lit(0)).cast("int").alias("n_hit_adc"),
            F.coalesce("n_hit_refined", F.lit(0)).cast("int").alias(
                "n_hit_refined"
            ),
            (F.coalesce("n_hit_adc", F.lit(0)) / F.lit(float(PQ_TOPK))).alias(
                "recall_adc"
            ),
            (
                F.coalesce("n_hit_refined", F.lit(0)) / F.lit(float(PQ_TOPK))
            ).alias("recall_refined"),
        )
    )


# --------------------------------------------------------------------------
# DuckDB oracles: unrolled per-subspace Lloyd chains → encode → ADC.
# Mirrors queries/similarity_queries._kmeans_cte_chain, parameterized by
# subspace slice and CTE prefix.
# --------------------------------------------------------------------------


def _subspace_chain(j: int, k: int = PQ_K, iters: int = PQ_ITERS) -> list[str]:
    lo, hi = j * PQ_SUB + 1, (j + 1) * PQ_SUB + 1
    p = f"s{j}_"
    rng = f"range({lo}, {hi})"
    sub_rng = f"range(1, {PQ_SUB + 1})"
    sq = f"list_sum([ (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]) for i in {sub_rng} ])"
    ctes = [
        f"{p}emb AS (\n    SELECT vec_id,"
        f" [CAST(embedding[i] AS DOUBLE) for i in {rng}] AS v\n"
        f"    FROM embeddings\n)",
        f"{p}c0 AS (\n    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)"
        f" AS cluster, v AS c\n    FROM {p}emb ORDER BY vec_id LIMIT {k}\n)",
    ]
    for it in range(iters + 1):
        ctes.append(
            f"{p}d{it} AS (\n    SELECT e.vec_id, e.v, c.cluster, {sq} AS d\n"
            f"    FROM {p}emb e CROSS JOIN {p}c{it} c\n)"
        )
        ctes.append(
            f"{p}a{it} AS (\n    SELECT vec_id, v, cluster, d FROM (\n"
            f"        SELECT *, row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY d, cluster) AS rn FROM {p}d{it}\n"
            f"    ) WHERE rn = 1\n)"
        )
        if it == iters:
            break
        ctes.append(
            f"{p}u{it} AS (\n    SELECT a.cluster, t.i AS dim,\n"
            f"        CAST(SUM(CAST(floor(a.v[t.i] * {_FP}) AS BIGINT))"
            f" AS DOUBLE) / ({_FP} * COUNT(*)) AS m\n"
            f"    FROM {p}a{it} a CROSS JOIN generate_series(1, {PQ_SUB}) AS t(i)\n"
            f"    GROUP BY a.cluster, t.i\n)"
        )
        ctes.append(
            f"{p}g{it} AS (\n    SELECT cluster, list(m ORDER BY dim) AS c"
            f" FROM {p}u{it} GROUP BY cluster\n)"
        )
        ctes.append(
            f"{p}c{it + 1} AS (\n    SELECT p.cluster, COALESCE(g.c, p.c) AS c\n"
            f"    FROM {p}c{it} p LEFT JOIN {p}g{it} g USING (cluster)\n)"
        )
    return ctes


def _codes_cte() -> list[str]:
    ctes: list[str] = []
    for j in range(PQ_M):
        ctes.extend(_subspace_chain(j))
    joins = " ".join(
        f"JOIN s{j}_a{PQ_ITERS} s{j} USING (vec_id)" if j else ""
        for j in range(PQ_M)
    )
    sel = ", ".join(f"s{j}.cluster AS code_{j}" for j in range(1, PQ_M))
    ctes.append(
        f"codes AS (\n    SELECT vec_id, s0.cluster AS code_0, {sel}\n"
        f"    FROM s0_a{PQ_ITERS} s0 {joins}\n)"
    )
    return ctes


def _pq_codes_oracle() -> str:
    cols = ", ".join(f"code_{j}" for j in range(PQ_M))
    return (
        "WITH\n" + ",\n".join(_codes_cte()) + f"\nSELECT vec_id, {cols} FROM codes"
    )




_EXACT_D = (
    f"list_sum([ (q.v[i] - CAST(e.embedding[i] AS DOUBLE))"
    f" * (q.v[i] - CAST(e.embedding[i] AS DOUBLE))"
    f" for i in range(1, {PQ_DIM + 1}) ])"
)


def _adc_ctes() -> list[str]:
    """codes + query + raw-ADC-distance CTEs shared by all search oracles."""
    ctes = _codes_cte()
    ctes.append(
        "q AS (\n    SELECT vec_id AS query_id,"
        f" [CAST(embedding[i] AS DOUBLE) for i in range(1, {PQ_DIM + 1})] AS v\n"
        f"    FROM embeddings WHERE vec_id < {PQ_QUERIES}\n)"
    )
    # dist = sum over subspaces of the query->assigned-centroid subspace
    # distance -- exactly the ADC table entry the Spark side looks up.
    terms = []
    joins = []
    for j in range(PQ_M):
        joins.append(
            f"JOIN s{j}_c{PQ_ITERS} b{j} ON b{j}.cluster = codes.code_{j}"
        )
        terms.append(
            f"list_sum([ (q.v[{j * PQ_SUB} + i] - b{j}.c[i])"
            f" * (q.v[{j * PQ_SUB} + i] - b{j}.c[i])"
            f" for i in range(1, {PQ_SUB + 1}) ])"
        )
    ctes.append(
        "adc AS (\n    SELECT q.query_id, codes.vec_id AS neighbor_id,\n"
        f"        {' + '.join(terms)} AS d\n"
        f"    FROM codes CROSS JOIN q {' '.join(joins)}\n"
        "    WHERE codes.vec_id != q.query_id\n)"
    )
    ctes.append(
        "adc_ranked AS (\n    SELECT query_id, neighbor_id, d,"
        " CAST(row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id)"
        " AS INT) AS rank\n    FROM adc\n)"
    )
    return ctes


def _refined_ctes() -> list[str]:
    """shortlist -> exact re-rank CTEs (appended after _adc_ctes)."""
    return [
        f"shortlist AS (\n    SELECT query_id, neighbor_id FROM adc_ranked"
        f" WHERE rank <= {PQ_REFINE}\n)",
        "refined AS (\n    SELECT s.query_id, s.neighbor_id,"
        f" {_EXACT_D} AS d\n"
        "    FROM shortlist s JOIN embeddings e ON e.vec_id = s.neighbor_id\n"
        "    JOIN q ON q.query_id = s.query_id\n)",
        "refined_ranked AS (\n    SELECT query_id, neighbor_id, d,"
        " CAST(row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id)"
        " AS INT) AS rank\n    FROM refined\n)",
    ]


def _pq_adc_oracle() -> str:
    return (
        "WITH\n"
        + ",\n".join(_adc_ctes())
        + "\nSELECT query_id, neighbor_id, round(d, 6) AS adc_dist, rank"
        + f"\nFROM adc_ranked WHERE rank <= {PQ_TOPK}"
    )


def _pq_refined_oracle() -> str:
    return (
        "WITH\n"
        + ",\n".join(_adc_ctes() + _refined_ctes())
        + "\nSELECT query_id, neighbor_id, round(d, 6) AS l2_sq, rank"
        + f"\nFROM refined_ranked WHERE rank <= {PQ_TOPK}"
    )


def _pq_recall_oracle() -> str:
    ctes = _adc_ctes() + _refined_ctes()
    ctes.append(
        "exact AS (\n    SELECT query_id, neighbor_id FROM (\n"
        "        SELECT q.query_id, e.vec_id AS neighbor_id,\n"
        "            row_number() OVER (PARTITION BY q.query_id ORDER BY\n"
        f"                {_EXACT_D}, e.vec_id) AS rn\n"
        "        FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.query_id\n"
        f"    ) WHERE rn <= {PQ_TOPK}\n)"
    )
    ctes.append(
        f"approx5 AS (\n    SELECT query_id, neighbor_id FROM adc_ranked"
        f" WHERE rank <= {PQ_TOPK}\n)"
    )
    ctes.append(
        f"refined5 AS (\n    SELECT query_id, neighbor_id FROM refined_ranked"
        f" WHERE rank <= {PQ_TOPK}\n)"
    )
    return (
        "WITH\n"
        + ",\n".join(ctes)
        + "\nSELECT b.query_id,"
        " CAST(COALESCE(ha.n, 0) AS INT) AS n_hit_adc,"
        " CAST(COALESCE(hr.n, 0) AS INT) AS n_hit_refined,"
        + f" COALESCE(ha.n, 0) / {float(PQ_TOPK)} AS recall_adc,"
        + f" COALESCE(hr.n, 0) / {float(PQ_TOPK)} AS recall_refined\n"
        "FROM (SELECT query_id, count(*) AS n FROM approx5 GROUP BY query_id) b\n"
        "LEFT JOIN (\n    SELECT a.query_id, count(*) AS n FROM approx5 a"
        " JOIN exact x ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id"
        " GROUP BY a.query_id\n) ha USING (query_id)\n"
        "LEFT JOIN (\n    SELECT r.query_id, count(*) AS n FROM refined5 r"
        " JOIN exact x ON r.query_id = x.query_id AND r.neighbor_id = x.neighbor_id"
        " GROUP BY r.query_id\n) hr USING (query_id)"
    )


QUERIES = {
    "pq_codes": q_pq_codes,
    "pq_topk_adc": q_pq_topk_adc,
    "pq_topk_refined": q_pq_topk_refined,
    "pq_recall_eval": q_pq_recall_eval,
}

ORACLES = {
    "pq_codes": _pq_codes_oracle(),
    "pq_topk_adc": _pq_adc_oracle(),
    "pq_topk_refined": _pq_refined_oracle(),
    "pq_recall_eval": _pq_recall_oracle(),
}


# --------------------------------------------------------------------------
# IVF-PQ: coarse probe + compressed scan + exact refine (the FAISS
# architecture, composed from the engine's own pieces)
# --------------------------------------------------------------------------

#: Coarse quantizer geometry — same constants as kmeans_clusters so the
#: oracle reuses similarity_queries.kmeans_assignment_ctes verbatim.
IVF_K = 8
IVF_ITERS = 3
IVF_NPROBE = 2

#: ADC shortlist width inside the probed cells.
IVFPQ_SHORTLIST = 50


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search: probe the 2 nearest coarse cells, ADC-scan only
    their PQ codes, exact-re-rank the shortlist.

    The full production ANN stack in one plan: the coarse k-means
    assignment prunes the corpus to nprobe/k of its rows *before* the
    compressed scan (at a partitioned 100 TB corpus this is partition
    pruning), the scan reads 4-byte codes, and the float vectors are
    touched only for shortlist × queries rows.  Every stage is the
    engine's own fixed-point arithmetic, so the DuckDB oracle replays
    coarse training + PQ training + probe + ADC + refine end-to-end.
    """
    from ..operators.clustering import kmeans

    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    key = _corpus_key(sf_dir)
    if key not in _COARSE:
        _, centroids = kmeans(emb, k=IVF_K, iters=IVF_ITERS)
        _COARSE[key] = centroids
    coarse = _COARSE[key]
    if key not in _PQ_BOOKS:
        _PQ_BOOKS[key] = train_pq_codebooks(
            emb, dim=PQ_DIM, m=PQ_M, k=PQ_K, iters=PQ_ITERS
        )
    books = _PQ_BOOKS[key]
    return ivfpq_search(spark, emb, coarse, books)


def ivfpq_search(
    spark: SparkSession,
    emb: DataFrame,
    coarse: list,
    books: list,
    nprobe: int = IVF_NPROBE,
    shortlist: int = IVFPQ_SHORTLIST,
) -> DataFrame:
    """The pure ENCODE+SEARCH stage of IVF-PQ under externally supplied
    coarse centroids + PQ codebooks — shared by the monolithic
    ``ivfpq_topk`` above, the persisted-codebook roundtrip
    (queries/ann_roundtrip.py), and the nprobe-recall tuning curve
    (queries/ivf_probe_curve.py, which sweeps ``nprobe`` and, for its
    scaled variant, ``shortlist``)."""
    from ..operators.clustering import assign_clusters

    ranked = ivfpq_adc_ranked(
        spark, emb, coarse, books, nprobe=nprobe, max_rank=shortlist
    )
    return ivfpq_refine(emb, ranked.select("query_id", "neighbor_id"))


def ivfpq_encode(emb: DataFrame, coarse: list, books: list) -> DataFrame:
    """(vec_id, cluster, code_0..code_{m-1}): the assign+PQ-encode pass
    — the write-once artifact a production deployment materializes;
    the probe-curve sweep persists it ONCE and probes it per setting."""
    from ..operators.clustering import assign_clusters

    assigned = assign_clusters(emb, coarse)
    return pq_encode(
        assigned.select("vec_id", "cluster", "embedding"), books
    ).select("vec_id", "cluster", *[f"code_{j}" for j in range(PQ_M)])


def ivfpq_adc_ranked(
    spark: SparkSession,
    emb: DataFrame,
    coarse: list,
    books: list,
    nprobe: int,
    max_rank: int,
    coded: DataFrame | None = None,
    qvecs: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, _rn): the ADC-ordered candidate ranking
    within the nprobe probed cells, cut at ``max_rank``.  Split out of
    ``ivfpq_search`` so the probe-curve sweep can derive BOTH shortlist
    policies (fixed and ∝nprobe) from ONE candidate scan per setting —
    they are just different rank cuts of the same ordering.  Pass a
    prepared (persisted) ``coded`` frame to share the encode pass
    across sweep settings, and the collected ``qvecs`` to share the
    bounded query-vector collect (the sweep would otherwise run the
    identical 8-row collect job once per setting)."""
    if coded is None:
        coded = ivfpq_encode(emb, coarse, books)

    if qvecs is None:
        qrows = (
            emb.filter(F.col("vec_id") < PQ_QUERIES)
            .select("vec_id", "embedding")
            .orderBy("vec_id")
            .collect()
        )
        qvecs = [
            (r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows
        ]
    tables = dict(adc_distance_tables(qvecs, books))

    # Probe selection driver-side, with the oracle's arithmetic: a
    # sequential (q[i]-c[i])^2 fold per coarse centroid, the nprobe
    # smallest by (distance, cluster).
    probes: list[tuple[int, list[float], list[int]]] = []
    for qid, vec in qvecs:
        dists = []
        for ci, cent in enumerate(coarse):
            acc = 0.0
            for a, b in zip(vec, cent):
                acc += (a - b) * (a - b)
            dists.append((acc, ci))
        probed = [ci for _, ci in sorted(dists)[:nprobe]]
        probes.append((qid, tables[qid], probed))
    qdf = spark.createDataFrame(
        probes, "query_id int, dtable array<double>, probed array<int>"
    )

    cand = coded.join(
        F.broadcast(qdf),
        F.array_contains(F.col("probed"), F.col("cluster"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    dist = None
    for j in range(PQ_M):
        term = F.element_at(
            F.col("dtable"), (F.lit(j * PQ_K) + F.col(f"code_{j}") + 1).cast("int")
        )
        dist = term if dist is None else dist + term
    from pyspark.sql import Window

    return (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"), dist.alias("_adc"))
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.asc("_adc"), F.asc("neighbor_id"))
        ))
        .filter(F.col("_rn") <= max_rank)
        .select("query_id", "neighbor_id", "_rn")
    )


def ivfpq_adc_swept(
    spark: SparkSession,
    coarse: list,
    books: list,
    coded: DataFrame,
    qvecs: list[tuple[int, list[float]]],
    sweep: tuple[int, ...],
    shortlist: int,
) -> DataFrame:
    """(nprobe, query_id, neighbor_id, _rn): the per-setting ADC-ordered
    candidate rankings for EVERY sweep setting from ONE scan of the
    coded frame (r13 optimization, guide §2.4).  The probed cell sets
    nest — the top-1 cell is a prefix of the top-2 which is a prefix of
    the top-4, all cut from ONE (distance, cluster)-sorted cell ranking
    per query — so instead of one candidate scan + window per setting,
    scan candidates of the WIDEST setting once, tag each candidate with
    its cell's probe rank, explode it onto the sweep settings whose
    probe width covers that rank, and rank once in a window partitioned
    by (nprobe, query).  Per setting the candidate set, the ADC
    distances, and the (distance, neighbor) ordering are identical to
    :func:`ivfpq_adc_ranked` by construction; rows are cut at
    ``shortlist · nprobe`` (the widest cut any consumer takes).
    """
    tables = dict(adc_distance_tables(qvecs, books))
    max_np = max(sweep)
    # Probe ranking driver-side, once, with the oracle's arithmetic: a
    # sequential (q[i]-c[i])^2 fold per coarse centroid; the probed
    # array is the full (distance, cluster)-sorted top-max_np ranking,
    # so every setting's probe set is a prefix of it.
    probes: list[tuple[int, list[float], list[int]]] = []
    for qid, vec in qvecs:
        dists = []
        for ci, cent in enumerate(coarse):
            acc = 0.0
            for a, b in zip(vec, cent):
                acc += (a - b) * (a - b)
            dists.append((acc, ci))
        probed = [ci for _, ci in sorted(dists)[:max_np]]
        probes.append((qid, tables[qid], probed))
    qdf = spark.createDataFrame(
        probes, "query_id int, dtable array<double>, probed array<int>"
    )

    cand = coded.join(
        F.broadcast(qdf),
        F.array_contains(F.col("probed"), F.col("cluster"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    dist = None
    for j in range(PQ_M):
        term = F.element_at(
            F.col("dtable"), (F.lit(j * PQ_K) + F.col(f"code_{j}") + 1).cast("int")
        )
        dist = term if dist is None else dist + term
    sweep_arr = F.array(*[F.lit(int(s)) for s in sorted(sweep)])
    swept = cand.withColumn(
        "_crank", F.array_position("probed", F.col("cluster")).cast("int")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        dist.alias("_adc"),
        F.explode(
            F.filter(sweep_arr, lambda s: s >= F.col("_crank"))
        ).alias("nprobe"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.asc("_adc"), F.asc("neighbor_id")
    )
    return (
        swept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(shortlist) * F.col("nprobe"))
        .select("nprobe", "query_id", "neighbor_id", "_rn")
    )


def ivfpq_refine(emb: DataFrame, shortlisted: DataFrame) -> DataFrame:
    """Exact re-rank of a (query_id, neighbor_id) shortlist → top-5."""
    from pyspark.sql import Window

    qvec = emb.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    refined = (
        shortlisted.join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
        .join(F.broadcast(qvec), "query_id")
        .select("query_id", "neighbor_id", _exact_sq().alias("_d"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("neighbor_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("query_id", "neighbor_id", F.round("_d", 6).alias("l2_sq"), "rank")
    )


def _ivfpq_oracle() -> str:
    from .similarity_queries import kmeans_assignment_ctes

    coarse_ctes, coarse_final = kmeans_assignment_ctes()
    ctes = list(coarse_ctes) + _codes_cte()
    ctes.append(
        "q AS (\n    SELECT vec_id AS query_id,"
        f" [CAST(embedding[i] AS DOUBLE) for i in range(1, {PQ_DIM + 1})] AS v\n"
        f"    FROM embeddings WHERE vec_id < {PQ_QUERIES}\n)"
    )
    # Probe ranking: distance from each query to every FINAL coarse
    # centroid (c{iters}), 2 smallest by (d, cluster).
    ctes.append(
        "probe AS (\n    SELECT query_id, cluster FROM (\n"
        "        SELECT q.query_id, c.cluster,\n"
        "            row_number() OVER (PARTITION BY q.query_id ORDER BY\n"
        f"                list_sum([ (q.v[i] - c.c[i]) * (q.v[i] - c.c[i])"
        f" for i in range(1, {PQ_DIM + 1}) ]), c.cluster) AS rn\n"
        f"        FROM q CROSS JOIN c{IVF_ITERS} c\n"
        f"    ) WHERE rn <= {IVF_NPROBE}\n)"
    )
    terms = []
    joins = []
    for j in range(PQ_M):
        joins.append(
            f"JOIN s{j}_c{PQ_ITERS} b{j} ON b{j}.cluster = codes.code_{j}"
        )
        terms.append(
            f"list_sum([ (q.v[{j * PQ_SUB} + i] - b{j}.c[i])"
            f" * (q.v[{j * PQ_SUB} + i] - b{j}.c[i])"
            f" for i in range(1, {PQ_SUB + 1}) ])"
        )
    ctes.append(
        "cand AS (\n    SELECT q.query_id, codes.vec_id AS neighbor_id,\n"
        f"        {' + '.join(terms)} AS d\n"
        f"    FROM codes JOIN {coarse_final} asg ON asg.vec_id = codes.vec_id\n"
        f"    JOIN probe p ON p.cluster = asg.cluster\n"
        f"    JOIN q ON q.query_id = p.query_id {' '.join(joins)}\n"
        "    WHERE codes.vec_id != q.query_id\n)"
    )
    ctes.append(
        "short AS (\n    SELECT query_id, neighbor_id FROM (\n"
        "        SELECT query_id, neighbor_id,"
        " row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rn\n"
        f"        FROM cand\n    ) WHERE rn <= {IVFPQ_SHORTLIST}\n)"
    )
    ctes.append(
        "ref AS (\n    SELECT s.query_id, s.neighbor_id,"
        f" {_EXACT_D} AS d\n"
        "    FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id\n"
        "    JOIN q ON q.query_id = s.query_id\n)"
    )
    return (
        "WITH\n"
        + ",\n".join(ctes)
        + "\nSELECT query_id, neighbor_id, round(d, 6) AS l2_sq,"
        " CAST(row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id)"
        " AS INT) AS rank\nFROM ref\n"
        f"QUALIFY rank <= {PQ_TOPK}"
    )


QUERIES["ivfpq_topk"] = q_ivfpq_topk
ORACLES["ivfpq_topk"] = _ivfpq_oracle()


# --------------------------------------------------------------------------
# Residual IVF-PQ (IVFADC, Jegou et al. 2011 §IV): PQ on the residual
# x − coarse_centroid(x), per-(query, cell) ADC tables.
# --------------------------------------------------------------------------

_PQ_RES_BOOKS: dict[tuple, list[list[list[float]]]] = {}


def _coarse_centroid_array(coarse: list[list[float]]) -> F.Column:
    return lit_double_array_2d(coarse)


def _residual_frame(assigned: DataFrame, coarse: list[list[float]]) -> DataFrame:
    cent = _coarse_centroid_array(coarse)
    return assigned.select(
        "vec_id",
        "cluster",
        "embedding",
        F.zip_with(
            F.col("embedding"),
            F.element_at(cent, F.col("cluster") + 1),
            lambda a, b: a.cast("double") - b,
        ).alias("resid"),
    )


def q_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ search: PQ codebooks trained on x − c(x), ADC
    tables computed per (query, probed cell).

    The faithful IVFADC layout: residuals concentrate around the
    origin, so the same 4-bit codebooks spend their resolution on the
    within-cell geometry instead of the cell means (measured recall@5
    at sf0.001: 0.875 residual vs 0.85 non-residual at identical
    bits — the gap widens on clustered real-world embeddings; this
    corpus is near-random, PQ's worst case).  Everything stays
    the engine's fixed-point arithmetic; the oracle replays coarse
    training → residuals → residual-PQ training → encode → probe →
    per-cell ADC → exact refine.
    """
    from pyspark.sql import Window

    from ..operators.clustering import assign_clusters, kmeans

    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    key = _corpus_key(sf_dir)
    if key not in _COARSE:
        _, centroids = kmeans(emb, k=IVF_K, iters=IVF_ITERS)
        _COARSE[key] = centroids
    coarse = _COARSE[key]
    resid = _residual_frame(assign_clusters(emb, coarse), coarse)
    if key not in _PQ_RES_BOOKS:
        _PQ_RES_BOOKS[key] = train_pq_codebooks(
            resid, dim=PQ_DIM, m=PQ_M, k=PQ_K, iters=PQ_ITERS, vec_col="resid"
        )
    books = _PQ_RES_BOOKS[key]
    coded = pq_encode(resid, books, vec_col="resid").select(
        "vec_id", "cluster", *[f"code_{j}" for j in range(PQ_M)]
    )

    qrows = (
        emb.filter(F.col("vec_id") < PQ_QUERIES)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    qvecs = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows]

    # Per query: rank cells by exact distance to the coarse centroid
    # (sequential fold = the oracle's list_sum), take nprobe; per
    # probed cell build the residual-space ADC table for the residual
    # query q − c(cell).
    rows = []
    for qid, vec in qvecs:
        dists = []
        for ci, cent in enumerate(coarse):
            acc = 0.0
            for a, b in zip(vec, cent):
                acc += (a - b) * (a - b)
            dists.append((acc, ci))
        for _, ci in sorted(dists)[:IVF_NPROBE]:
            qr = [a - b for a, b in zip(vec, coarse[ci])]
            (_, tab), = adc_distance_tables([(qid, qr)], books)
            rows.append((qid, ci, tab))
    qdf = spark.createDataFrame(
        rows, "query_id int, cell int, dtable array<double>"
    )

    cand = coded.join(
        F.broadcast(qdf),
        (F.col("cluster") == F.col("cell"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    dist = None
    for j in range(PQ_M):
        term = F.element_at(
            F.col("dtable"), (F.lit(j * PQ_K) + F.col(f"code_{j}") + 1).cast("int")
        )
        dist = term if dist is None else dist + term
    shortlist = (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"), dist.alias("_adc"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.asc("_adc"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("_rn") <= IVFPQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qvec = emb.filter(F.col("vec_id") < PQ_QUERIES).select(
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
    w2 = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("neighbor_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("query_id", "neighbor_id", F.round("_d", 6).alias("l2_sq"), "rank")
    )


def _residual_subspace_chain(j: int, k: int = PQ_K, iters: int = PQ_ITERS) -> list[str]:
    """Per-subspace Lloyd chain over the RESIDUAL frame (CTE ``resid``)."""
    lo = j * PQ_SUB + 1
    p = f"r{j}_"
    sub_rng = f"range(1, {PQ_SUB + 1})"
    slice_expr = f"[v[{lo - 1} + i] for i in {sub_rng}]"
    sq = f"list_sum([ (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]) for i in {sub_rng} ])"
    ctes = [
        f"{p}emb AS (\n    SELECT vec_id, {slice_expr} AS v FROM resid\n)",
        f"{p}c0 AS (\n    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)"
        f" AS cluster, v AS c\n    FROM {p}emb ORDER BY vec_id LIMIT {k}\n)",
    ]
    for it in range(iters + 1):
        ctes.append(
            f"{p}d{it} AS (\n    SELECT e.vec_id, e.v, c.cluster, {sq} AS d\n"
            f"    FROM {p}emb e CROSS JOIN {p}c{it} c\n)"
        )
        ctes.append(
            f"{p}a{it} AS (\n    SELECT vec_id, v, cluster, d FROM (\n"
            f"        SELECT *, row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY d, cluster) AS rn FROM {p}d{it}\n"
            f"    ) WHERE rn = 1\n)"
        )
        if it == iters:
            break
        ctes.append(
            f"{p}u{it} AS (\n    SELECT a.cluster, t.i AS dim,\n"
            f"        CAST(SUM(CAST(floor(a.v[t.i] * {_FP}) AS BIGINT))"
            f" AS DOUBLE) / ({_FP} * COUNT(*)) AS m\n"
            f"    FROM {p}a{it} a CROSS JOIN generate_series(1, {PQ_SUB}) AS t(i)\n"
            f"    GROUP BY a.cluster, t.i\n)"
        )
        ctes.append(
            f"{p}g{it} AS (\n    SELECT cluster, list(m ORDER BY dim) AS c"
            f" FROM {p}u{it} GROUP BY cluster\n)"
        )
        ctes.append(
            f"{p}c{it + 1} AS (\n    SELECT p.cluster, COALESCE(g.c, p.c) AS c\n"
            f"    FROM {p}c{it} p LEFT JOIN {p}g{it} g USING (cluster)\n)"
        )
    return ctes


def _ivfpq_residual_oracle() -> str:
    from .similarity_queries import kmeans_assignment_ctes

    coarse_ctes, coarse_final = kmeans_assignment_ctes()
    ctes = list(coarse_ctes)
    ctes.append(
        f"resid AS (\n    SELECT a.vec_id, a.cluster,"
        f" [a.v[i] - c.c[i] for i in range(1, {PQ_DIM + 1})] AS v\n"
        f"    FROM {coarse_final} a JOIN c{IVF_ITERS} c USING (cluster)\n)"
    )
    for j in range(PQ_M):
        ctes.extend(_residual_subspace_chain(j))
    joins = " ".join(
        f"JOIN r{j}_a{PQ_ITERS} r{j} USING (vec_id)" if j else ""
        for j in range(PQ_M)
    )
    sel = ", ".join(f"r{j}.cluster AS code_{j}" for j in range(1, PQ_M))
    ctes.append(
        f"codes AS (\n    SELECT vec_id, s.cluster AS cell,"
        f" r0.cluster AS code_0, {sel}\n"
        f"    FROM r0_a{PQ_ITERS} r0 {joins}\n"
        f"    JOIN (SELECT vec_id, cluster FROM {coarse_final}) s USING (vec_id)\n)"
    )
    ctes.append(
        "q AS (\n    SELECT vec_id AS query_id,"
        f" [CAST(embedding[i] AS DOUBLE) for i in range(1, {PQ_DIM + 1})] AS v\n"
        f"    FROM embeddings WHERE vec_id < {PQ_QUERIES}\n)"
    )
    ctes.append(
        "probe AS (\n    SELECT query_id, cluster AS cell FROM (\n"
        "        SELECT q.query_id, c.cluster,\n"
        "            row_number() OVER (PARTITION BY q.query_id ORDER BY\n"
        f"                list_sum([ (q.v[i] - c.c[i]) * (q.v[i] - c.c[i])"
        f" for i in range(1, {PQ_DIM + 1}) ]), c.cluster) AS rn\n"
        f"        FROM q CROSS JOIN c{IVF_ITERS} c\n"
        f"    ) WHERE rn <= {IVF_NPROBE}\n)"
    )
    # ADC in residual space: ((q - cell_centroid) - book_centroid)^2,
    # left-associated exactly as the driver-side table build.
    terms = []
    joins2 = []
    for j in range(PQ_M):
        off = j * PQ_SUB
        joins2.append(
            f"JOIN r{j}_c{PQ_ITERS} b{j} ON b{j}.cluster = codes.code_{j}"
        )
        terms.append(
            f"list_sum([ (q.v[{off} + i] - cc.c[{off} + i] - b{j}.c[i])"
            f" * (q.v[{off} + i] - cc.c[{off} + i] - b{j}.c[i])"
            f" for i in range(1, {PQ_SUB + 1}) ])"
        )
    ctes.append(
        "adc AS (\n    SELECT q.query_id, codes.vec_id AS neighbor_id,\n"
        f"        {' + '.join(terms)} AS d\n"
        "    FROM codes JOIN probe p ON p.cell = codes.cell\n"
        f"    JOIN q ON q.query_id = p.query_id\n"
        f"    JOIN c{IVF_ITERS} cc ON cc.cluster = codes.cell {' '.join(joins2)}\n"
        "    WHERE codes.vec_id != q.query_id\n)"
    )
    ctes.append(
        "short AS (\n    SELECT query_id, neighbor_id FROM (\n"
        "        SELECT query_id, neighbor_id,"
        " row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rn\n"
        f"        FROM adc\n    ) WHERE rn <= {IVFPQ_SHORTLIST}\n)"
    )
    ctes.append(
        "ref AS (\n    SELECT s.query_id, s.neighbor_id,"
        f" {_EXACT_D} AS d\n"
        "    FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id\n"
        "    JOIN q ON q.query_id = s.query_id\n)"
    )
    return (
        "WITH\n"
        + ",\n".join(ctes)
        + "\nSELECT query_id, neighbor_id, round(d, 6) AS l2_sq,"
        " CAST(row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id)"
        " AS INT) AS rank\nFROM ref\n"
        f"QUALIFY rank <= {PQ_TOPK}"
    )


QUERIES["ivfpq_residual_topk"] = q_ivfpq_residual_topk
ORACLES["ivfpq_residual_topk"] = _ivfpq_residual_oracle()
