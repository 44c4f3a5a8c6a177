"""Round-10: k-center coreset selection (Gonzalez farthest-point).

Data-curation pipelines select REPRESENTATIVE subsets of an embedding
corpus — for labeling budgets, eval-set construction, and
diversity-preserving downsampling (coreset selection; Sener & Savarese
ICLR 2018 use exactly this greedy for active learning).  The classic
2-approximation for the k-center objective is the Gonzalez (1985)
farthest-point greedy: seed with one point, then repeatedly add the
point FARTHEST from the chosen set.  The registry's selection family
(stratified / deterministic / priority / importance sampling) is all
probability-proportional; this adds the geometric cover the others
cannot express.

Distributed shape (100 TB): k − 1 rounds, each ONE corpus pass —
``d2min``/assignment fold against the single NEW center (a broadcast
64-literal array in codegen), then a ``TakeOrdered(1)`` argmax.
Driver state is exactly k quantized centers (bounded by construction,
the SQ8-stats pattern); the per-round frame is persisted and
materialized so round t never re-runs rounds 1..t−1 (the iterative
k-core/BFS loop discipline).  No joins, no windows, no corpus-sized
collects anywhere.

Exactness: embeddings quantize once to integer micros
(``round(x·1e6)`` — the repo's established exact-recovery guard), so
every distance is an exact BIGINT (dims·(2e6)² ≈ 2.6e14 < 2⁶³) and
argmax ties break on ``vec_id``; assignment ties keep the
earlier-selected center (strict ``<`` update).  Both engines run
identical integer arithmetic — no float anywhere after quantization.

Reference scope: no embedding surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's
selection family per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.litarrays import lit_int_array
from ..tables import table

#: Number of centers (bounded driver state: K rows of 64 ints).
K_CENTERS = 8

#: Quantization scale (micros — exact integer recovery per the repo's
#: round(x*1e6) guard).
_Q = 1_000_000

#: Embedding dimensionality of the corpus table.
_DIM = 64


def _qvec(col):
    return F.transform(
        col, lambda x: F.round(x.cast("double") * _Q).cast("bigint")
    )


def _d2(qv, center):
    diffs = F.zip_with(qv, center, lambda a, b: (a - b) * (a - b))
    return F.aggregate(
        diffs, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )


def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _qvec(F.col("embedding")).alias("qv")
    )
    seed = emb.orderBy("vec_id").limit(1).collect()[0]  # deterministic seed
    centers = [(0, seed["vec_id"], 0, list(seed["qv"]))]

    def _center_arr(rank: int):
        # The new center rides in as a CONSTANT-FOLDED literal array:
        # ConstantFolding collapses the 64 int literals into one
        # Literal(ArrayData) that codegen attaches through the
        # references array, so the generated source — and therefore
        # the compiled-class cache hit — is identical across rounds,
        # while the former broadcast 1-row frame paid a driver
        # createDataFrame + BroadcastExchange (~0.4-0.5 s) per round
        # (r12 optimization: 8-round loop measured ~2x faster with the
        # literal form, identical assignments).
        return lit_int_array(centers[rank][3])

    state = (
        emb.select(
            "vec_id",
            "qv",
            _d2(F.col("qv"), _center_arr(0)).alias("d2min"),
            F.lit(0).alias("best"),
        )
        .persist()
    )
    prev: DataFrame | None = None
    for rank in range(1, K_CENTERS):
        # ONE job per round: the TakeOrdered argmax also materializes
        # this round's persisted state (the persist sits in its
        # lineage), so no separate count() pass is needed — the loop
        # discipline (round t never re-runs rounds 1..t−1) still holds
        # because every later consumer reads the cache.
        far = (
            state.orderBy(F.desc("d2min"), F.asc("vec_id")).limit(1).collect()
        )[0]
        if prev is not None:
            prev.unpersist()
        centers.append((rank, far["vec_id"], far["d2min"], list(far["qv"])))
        d2new = _d2(F.col("qv"), _center_arr(rank))
        prev, state = state, state.select(
            "vec_id",
            "qv",
            F.least("d2min", d2new).alias("d2min"),
            F.when(d2new < F.col("d2min"), F.lit(rank))
            .otherwise(F.col("best"))
            .alias("best"),
        ).persist()

    assigned = state.groupBy("best").agg(
        F.count("*").cast("bigint").alias("n_assigned"),
        F.max("d2min").alias("max_d2"),
    )
    chosen = spark.createDataFrame(
        [(r, v, d) for r, v, d, _ in centers],
        "center_rank INT, vec_id BIGINT, sel_d2 BIGINT",
    )
    return (
        chosen.join(
            F.broadcast(assigned.withColumnRenamed("best", "center_rank")),
            "center_rank",
            "left",
        )
        .select(
            "center_rank",
            "vec_id",
            "sel_d2",
            F.coalesce("n_assigned", F.lit(0).cast("bigint")).alias(
                "n_assigned"
            ),
            F.coalesce("max_d2", F.lit(0).cast("bigint")).alias("max_d2"),
        )
    )


def _oracle() -> str:
    qv = (
        "[CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) "
        "for i in range(1, 65)]"
    )
    d2 = (
        "CAST(list_sum([(p.qv[i] - c.qv[i]) * (p.qv[i] - c.qv[i]) "
        "for i in range(1, 65)]) AS BIGINT)"
    )
    parts = [
        f"WITH q AS (SELECT vec_id, {qv} AS qv FROM embeddings)",
        "c0 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1)",
        f"""d0 AS (
    SELECT p.vec_id, p.qv, {d2} AS d2min, 0 AS best
    FROM q p, c0 c)""",
    ]
    sel = ["SELECT 0 AS center_rank, vec_id, CAST(0 AS BIGINT) AS sel_d2 FROM c0"]
    for r in range(1, K_CENTERS):
        parts.append(
            f"""c{r} AS (
    SELECT vec_id, qv, d2min FROM d{r - 1}
    ORDER BY d2min DESC, vec_id LIMIT 1)"""
        )
        parts.append(
            f"""d{r} AS (
    SELECT p.vec_id, p.qv,
           least(p.d2min, {d2}) AS d2min,
           CASE WHEN {d2} < p.d2min THEN {r} ELSE p.best END AS best
    FROM d{r - 1} p, c{r} c)"""
        )
        sel.append(
            f"SELECT {r} AS center_rank, vec_id, CAST(d2min AS BIGINT)"
            f" AS sel_d2 FROM c{r}"
        )
    parts.append(
        f"""assigned AS (
    SELECT best, CAST(count(*) AS BIGINT) AS n_assigned,
           CAST(max(d2min) AS BIGINT) AS max_d2
    FROM d{K_CENTERS - 1} GROUP BY best)"""
    )
    parts.append(
        "chosen AS (" + "\nUNION ALL\n".join(sel) + ")"
    )
    body = ",\n".join(parts)
    return f"""{body}
SELECT ch.center_rank, ch.vec_id, ch.sel_d2,
       CAST(coalesce(a.n_assigned, 0) AS BIGINT) AS n_assigned,
       CAST(coalesce(a.max_d2, 0) AS BIGINT) AS max_d2
FROM chosen ch LEFT JOIN assigned a ON a.best = ch.center_rank
"""


ORACLE_KCENTER_CORESET = _oracle()

QUERIES = {
    "kcenter_coreset": q_kcenter_coreset,
}

ORACLES = {
    "kcenter_coreset": ORACLE_KCENTER_CORESET,
}
