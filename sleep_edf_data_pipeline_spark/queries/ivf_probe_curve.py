"""Round-12: IVF-PQ nprobe-recall tuning curve.

Every production IVF deployment publishes this table before choosing
an operating point: recall@k against exact ground truth as a function
of how many coarse cells each query probes.  ``ann_recall_eval`` /
``pq_recall_eval`` measure single operating points; this query sweeps
``nprobe`` ∈ {1, 2, 4} over the SAME trained index (the memoized
coarse k-means + PQ codebooks behind the driver-green ``ivfpq_topk``)
and emits one row per setting — the recall-vs-cost frontier (cost is
``nprobe``/IVF_K of the corpus scanned, by construction).

Determinism: every per-setting top-5 set reuses the already
hash-green ivfpq ranking discipline (round-6 distances, (d, neighbor)
tie-breaks), recall hits are exact set-intersection COUNTS, and the
only float output is one division of exact integers per row.

WHAT THE MEASURED TABLE ACTUALLY SHOWS (and why that is the point):
each row carries BOTH shortlist policies, derived from ONE ADC-ranked
candidate scan per setting (they are different rank cuts of the same
ordering — ``ivfpq_adc_ranked`` + two cheap exact refines):

- ``recall_fixed_shortlist`` — the production pipeline's fixed
  IVFPQ_SHORTLIST=50 cut — is NOT monotone: 0.650/0.625/0.575 at
  sf0.1 for nprobe 1/2/4.  Widening the probe adds candidates whose
  LOSSY ADC distances (m=4, k=16 codewords) spuriously beat true
  neighbors', displacing them from the shortlist BEFORE the exact
  re-rank sees them — the classic shortlist-truncation effect.
- ``recall_scaled_shortlist`` — shortlist = 50·nprobe — restores
  monotone gains (0.650/0.800/0.825 at sf0.1): candidate coverage can
  only grow when the cut grows with the probe.

The operational takeaway the table exists to surface: scale the
shortlist with nprobe (or raise codebook resolution); the test pins
both measured curves so the tradeoff stays visible.

Scale shape (100 TB): the sweep multiplies only the CANDIDATE scan
(nprobe/IVF_K of the codes table per setting — the same fraction the
production query would pay at that setting); training, encode, and
the ground-truth pass are shared once across the sweep.  Ground truth
is the bounded PQ_QUERIES×corpus exact scan the recall family already
uses — the audit's one corpus-scale term, constant in ``nprobe``.

Reference scope: no ANN surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's
similarity family per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.clustering import kmeans
from ..operators.quantization import train_pq_codebooks
from ..tables import spread, table
from .quantization_queries import (
    _COARSE,
    _EXACT_D,
    _PQ_BOOKS,
    _codes_cte,
    _corpus_key,
    _exact_sq,
    IVF_ITERS,
    IVF_K,
    IVFPQ_SHORTLIST,
    PQ_DIM,
    PQ_ITERS,
    PQ_K,
    PQ_M,
    PQ_QUERIES,
    PQ_SUB,
    PQ_TOPK,
    ivfpq_adc_swept,
    ivfpq_encode,
)

#: The sweep — 1 cell (cheapest), the production setting (2), and the
#: diminishing-returns point (4 of IVF_K=8 cells = half the corpus).
NPROBE_SWEEP = (1, 2, 4)


def q_ivfpq_probe_recall_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    key = _corpus_key(sf_dir)
    if key not in _COARSE:
        _, centroids = kmeans(emb, k=IVF_K, iters=IVF_ITERS)
        _COARSE[key] = centroids
    if key not in _PQ_BOOKS:
        _PQ_BOOKS[key] = train_pq_codebooks(
            emb, dim=PQ_DIM, m=PQ_M, k=PQ_K, iters=PQ_ITERS
        )
    coarse, books = _COARSE[key], _PQ_BOOKS[key]

    # ONE bounded query-vector collect serves the ground-truth pass
    # AND every sweep setting (r12 optimization: the sweep previously
    # re-ran the identical 8-row collect job once per setting).
    qrows = (
        emb.filter(F.col("vec_id") < PQ_QUERIES)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    qvecs = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows]

    # exact ground truth, once (shared across the sweep)
    qvec = emb.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(qvec))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _exact_sq().alias("_d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("_d"), F.asc("neighbor_id")
    )
    # r13 (guide §5): no persist+count — the truth frame has exactly
    # ONE consumer (the broadcast side of the hits join below), so the
    # eager materialization job bought no reuse; the broadcast build
    # executes the subtree once either way.
    truth = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("query_id", "neighbor_id")
    )

    # encode ONCE (the write-once production artifact); r13
    # optimization (guide §2.4): the three per-setting candidate scans
    # probed the SAME persisted coded frame with only nprobe differing
    # — the probed cell sets nest, so ONE tagged scan of the widest
    # setting + ONE window partitioned by (nprobe, query) replaces
    # three scans, three windows, and three persist+count
    # materializations.  Per setting the candidate set, ADC distances
    # and (distance, neighbor) ordering are unchanged by construction
    # (see ivfpq_adc_swept), so every emitted count is identical.
    # r13 (guide §5): the r12 persist+count of the coded frame bought
    # reuse across THREE per-setting candidate scans; after the swept
    # fusion there is exactly ONE scan, so the encode subtree now
    # inlines into the ranked materialization below — one job fewer,
    # one corpus-scale cache fewer, same single execution.
    coded = ivfpq_encode(emb, coarse, books)
    ranked = ivfpq_adc_swept(
        spark,
        coarse,
        books,
        coded=coded,
        qvecs=qvecs,
        sweep=NPROBE_SWEEP,
        shortlist=IVFPQ_SHORTLIST,
    ).persist()
    ranked.count()  # materialize: both policy cuts below reuse it

    # The production FIXED shortlist (which measurably LOSES recall as
    # nprobe widens — displacement) and the corrected shortlist ∝
    # nprobe (monotone, the fix the fixed rows motivate) are different
    # rank CUTS of the same per-setting ordering.  r12 optimization:
    # the six per-(policy, setting) refine subplans collapse into ONE
    # tagged union → ONE exact refine → ONE window partitioned by
    # (policy, nprobe, query) → ONE conditional aggregation — the
    # per-group ranking is unchanged, so the per-setting top-5 sets
    # (and every emitted count) are identical by construction.  The
    # swept frame is already cut at shortlist·nprobe (the scaled cut);
    # the fixed policy takes the narrower fixed cut of the same rows.
    parts = []
    for policy, cut in (
        ("fixed", F.col("_rn") <= IVFPQ_SHORTLIST),
        ("scaled", F.lit(True)),
    ):
        parts.append(
            ranked.filter(cut).select(
                "query_id",
                "neighbor_id",
                F.col("nprobe").cast("int").alias("nprobe"),
                F.lit(policy).alias("policy"),
            )
        )
    shortlist = parts[0]
    for p in parts[1:]:
        shortlist = shortlist.unionByName(p)
    refined = (
        shortlist.join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
        .join(F.broadcast(qvec), "query_id")
        .select(
            "policy", "nprobe", "query_id", "neighbor_id",
            _exact_sq().alias("_d"),
        )
    )
    w5 = Window.partitionBy("policy", "nprobe", "query_id").orderBy(
        F.asc("_d"), F.asc("neighbor_id")
    )
    top5 = (
        refined.withColumn("rank", F.row_number().over(w5))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("policy", "nprobe", "query_id", "neighbor_id")
    )
    hits = top5.join(
        F.broadcast(truth.withColumn("_hit", F.lit(1))),
        ["query_id", "neighbor_id"],
        "left",
    )
    denom = float(PQ_QUERIES * PQ_TOPK)
    is_fixed = F.col("policy") == "fixed"
    is_hit = F.col("_hit").isNotNull()
    return (
        hits.groupBy("nprobe")
        .agg(
            F.count(F.when(is_fixed, 1)).cast("bigint").alias(
                "n_results_fixed"
            ),
            F.count(F.when(is_fixed & is_hit, 1)).cast("bigint").alias(
                "n_hits_fixed"
            ),
            F.count(F.when((~is_fixed) & is_hit, 1)).cast("bigint").alias(
                "n_hits_scaled"
            ),
        )
        .select(
            "nprobe",
            F.lit(PQ_QUERIES).cast("bigint").alias("n_queries"),
            "n_results_fixed",
            "n_hits_fixed",
            (F.col("n_hits_fixed").cast("double") / F.lit(denom)).alias(
                "recall_fixed_shortlist"
            ),
            "n_hits_scaled",
            (F.col("n_hits_scaled").cast("double") / F.lit(denom)).alias(
                "recall_scaled_shortlist"
            ),
            (F.lit(float(1.0)) * F.col("nprobe") / F.lit(float(IVF_K))).alias(
                "corpus_fraction_scanned"
            ),
        )
        .orderBy("nprobe")
    )


def _oracle() -> str:
    from .similarity_queries import kmeans_assignment_ctes

    coarse_ctes, coarse_final = kmeans_assignment_ctes()
    ctes = list(coarse_ctes) + _codes_cte()
    ctes.append(
        "q AS (\n    SELECT vec_id AS query_id,"
        f" [CAST(embedding[i] AS DOUBLE) for i in range(1, {PQ_DIM + 1})] AS v\n"
        f"    FROM embeddings WHERE vec_id < {PQ_QUERIES}\n)"
    )
    # every coarse cell ranked per query; the sweep slices by rank
    ctes.append(
        "probe_rank AS (\n"
        "    SELECT q.query_id, c.cluster,\n"
        "        row_number() OVER (PARTITION BY q.query_id ORDER BY\n"
        f"            list_sum([ (q.v[i] - c.c[i]) * (q.v[i] - c.c[i])"
        f" for i in range(1, {PQ_DIM + 1}) ]), c.cluster) AS rn\n"
        f"    FROM q CROSS JOIN c{IVF_ITERS} c\n)"
    )
    sweep_vals = ", ".join(str(np) for np in NPROBE_SWEEP)
    ctes.append(f"sweep AS (SELECT unnest([{sweep_vals}]) AS np)")
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
        "cand AS (\n    SELECT s.np, q.query_id, codes.vec_id AS neighbor_id,\n"
        f"        {' + '.join(terms)} AS d\n"
        f"    FROM codes JOIN {coarse_final} asg ON asg.vec_id = codes.vec_id\n"
        "    JOIN probe_rank p ON p.cluster = asg.cluster\n"
        "    JOIN sweep s ON p.rn <= s.np\n"
        "    JOIN q ON q.query_id = p.query_id "
        + " ".join(joins)
        + "\n    WHERE codes.vec_id != q.query_id\n)"
    )
    # ADC rank once per (np, query); the two shortlist policies are
    # just different rank cuts of the same ordering
    ctes.append(
        "cand_ranked AS (\n    SELECT np, query_id, neighbor_id,"
        " row_number() OVER (PARTITION BY np, query_id"
        " ORDER BY d, neighbor_id) AS rn\n    FROM cand\n)"
    )
    tops = []
    for name, limit in (
        ("fixed", str(IVFPQ_SHORTLIST)),
        ("scaled", f"{IVFPQ_SHORTLIST} * np"),
    ):
        ctes.append(
            f"ref_{name} AS (\n    SELECT s.np, s.query_id, s.neighbor_id,"
            f" {_EXACT_D} AS d\n"
            f"    FROM cand_ranked s"
            " JOIN embeddings e ON e.vec_id = s.neighbor_id\n"
            f"    JOIN q ON q.query_id = s.query_id\n"
            f"    WHERE s.rn <= {limit}\n)"
        )
        ctes.append(
            f"top_{name} AS (\n    SELECT np, query_id, neighbor_id FROM (\n"
            "        SELECT np, query_id, neighbor_id,"
            " row_number() OVER (PARTITION BY np, query_id"
            " ORDER BY d, neighbor_id) AS rn\n"
            f"        FROM ref_{name}\n    ) WHERE rn <= {PQ_TOPK}\n)"
        )
        tops.append(name)
    ctes.append(
        "truth AS (\n    SELECT query_id, neighbor_id FROM (\n"
        "        SELECT q.query_id, e.vec_id AS neighbor_id,"
        " row_number() OVER (PARTITION BY q.query_id"
        f" ORDER BY {_EXACT_D}, e.vec_id) AS rn\n"
        "        FROM embeddings e CROSS JOIN q\n"
        "        WHERE e.vec_id != q.query_id\n"
        f"    ) WHERE rn <= {PQ_TOPK}\n)"
    )
    denom = float(PQ_QUERIES * PQ_TOPK)
    for name in tops:
        ctes.append(
            f"agg_{name} AS (\n    SELECT t.np,"
            " CAST(count(*) AS BIGINT) AS n_results,\n"
            "        CAST(sum(CASE WHEN tr.neighbor_id IS NOT NULL"
            " THEN 1 ELSE 0 END) AS BIGINT) AS n_hits\n"
            f"    FROM top_{name} t LEFT JOIN truth tr\n"
            "      ON tr.query_id = t.query_id"
            " AND tr.neighbor_id = t.neighbor_id\n"
            "    GROUP BY t.np\n)"
        )
    return (
        "WITH\n"
        + ",\n".join(ctes)
        + "\nSELECT f.np AS nprobe,"
        f" CAST({PQ_QUERIES} AS BIGINT) AS n_queries,\n"
        "       f.n_results AS n_results_fixed,\n"
        "       f.n_hits AS n_hits_fixed,\n"
        f"       CAST(f.n_hits AS DOUBLE) / {denom}"
        " AS recall_fixed_shortlist,\n"
        "       s.n_hits AS n_hits_scaled,\n"
        f"       CAST(s.n_hits AS DOUBLE) / {denom}"
        " AS recall_scaled_shortlist,\n"
        f"       1.0 * f.np / {float(IVF_K)} AS corpus_fraction_scanned\n"
        "FROM agg_fixed f JOIN agg_scaled s ON s.np = f.np\n"
        "ORDER BY f.np"
    )


QUERIES = {
    "ivfpq_probe_recall_curve": q_ivfpq_probe_recall_curve,
}

ORACLES = {
    "ivfpq_probe_recall_curve": _oracle(),
}
