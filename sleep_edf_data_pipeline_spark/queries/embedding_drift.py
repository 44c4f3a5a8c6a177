"""Round-7: drift in EMBEDDING space — per-label centroid shift.

Completes the drift-monitoring family along its third axis: PSI/KS
watch the text-length distribution, CUSUM watches a value series in
time, and this watches the embedding distribution — "has one label's
(or source's) region of embedding space moved away from the corpus?",
the check a training-data pipeline runs before trusting a new batch of
encoder outputs.

The statistic is the cosine between each label's centroid and the
global centroid.  Cosine is scale-invariant, so the vector counts
cancel and the whole computation runs on EXACT integer component sums:
each component is quantized once to micro-units
(``round(x·1e6)`` → BIGINT — the engine's standard float discipline),
per-(label, dim) sums are order-free BIGINTs, and the three cross
products Σ s_l·g, Σ s_l², Σ g² run in DECIMAL(38,0) (int128 — HUGEINT
in the oracle).  Headroom bound (dim-aware: the SUM over D dims eats
into the 38 digits too): safe while D · (max component sum)² < 1e38,
i.e. component sums up to ~3e17 at D=1024 — about 3e11 vectors per
label at 1e6 micro-units and |x|≤1.  Past ~300 G vectors/label,
pre-divide the component sums by a fixed power of ten on BOTH engines
(cosine is scale-invariant; identical integer truncation keeps the
engines bit-equal).  One double division + two sqrt at the end,
identical expression shape on both engines → bit-stable.

Scale shape: ONE corpus pass (posexplode + map-side-combinable sum)
reduces 100 TB of vectors to |labels|×|dims| rows; everything after
runs on that grid (the global sums aggregate FROM it — no second
corpus pass; the per-dim global frame is a broadcast join).

Reference parity: no embedding surface exists in the reference;
extends SURVEY §2.7's training-data operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table

#: int128 for the cross products (HUGEINT in the oracle).
_D = "decimal(38,0)"


def centroid_grid(emb: DataFrame) -> DataFrame:
    """(label, dim, s, n) micro-quantized component-sum grid — the
    algebraic partial the streaming twin (streaming/embedding_drift.py)
    folds across micro-batches."""
    comp = emb.select(
        "label",
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "label",
        "dim",
        F.round(F.col("x").cast("double") * 1e6).cast("bigint").alias("xm"),
    )
    return comp.groupBy("label", "dim").agg(
        F.sum("xm").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )


def drift_from_grid(grid: DataFrame) -> DataFrame:
    """Per-label centroid cosine vs global from a (label, dim, s, n)
    grid — the shared tail of the batch query and the streaming
    monitor."""
    # persisted: the |labels|×|dims| grid feeds BOTH the per-label side
    # and the global rollup — without the cache the upstream pass runs
    # twice (plan-pinned via InMemoryTableScan).  Lazy persist: both
    # consumers run inside the terminal job, the cache fills at first
    # use (same pattern as q_psi_drift_by_source's hist).
    per = grid.persist()
    glob = per.groupBy("dim").agg(F.sum("s").cast("bigint").alias("g"))
    return (
        per.join(F.broadcast(glob), "dim")
        .groupBy("label")
        .agg(
            F.max("n").alias("n_vecs"),
            F.sum(F.col("s").cast(_D) * F.col("g").cast(_D)).alias("num"),
            F.sum(F.col("s").cast(_D) * F.col("s").cast(_D)).alias("a2"),
            F.sum(F.col("g").cast(_D) * F.col("g").cast(_D)).alias("g2"),
        )
        .select(
            F.col("label").cast("int").alias("label"),
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            (
                F.col("num").cast("double")
                / (
                    F.sqrt(F.col("a2").cast("double"))
                    * F.sqrt(F.col("g2").cast("double"))
                )
            ).alias("cos_to_global"),
        )
    )


def q_embedding_drift_by_label(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return drift_from_grid(centroid_grid(table(spark, sf_dir, "embeddings")))


ORACLE_EMBEDDING_DRIFT_BY_LABEL = """
WITH comp AS (
    SELECT label, dim - 1 AS dim,
           CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS xm
    FROM (
        SELECT label, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings
    )
),
per AS (
    SELECT label, dim, CAST(sum(xm) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n
    FROM comp GROUP BY label, dim
),
gsum AS (
    SELECT dim, CAST(sum(s) AS BIGINT) AS g FROM per GROUP BY dim
)
SELECT CAST(p.label AS INT) AS label,
       CAST(max(p.n) AS BIGINT) AS n_vecs,
       CAST(sum(CAST(p.s AS HUGEINT) * CAST(gl.g AS HUGEINT)) AS DOUBLE)
           / (sqrt(CAST(sum(CAST(p.s AS HUGEINT) * CAST(p.s AS HUGEINT))
                        AS DOUBLE))
              * sqrt(CAST(sum(CAST(gl.g AS HUGEINT) * CAST(gl.g AS HUGEINT))
                          AS DOUBLE)))
           AS cos_to_global
FROM per p JOIN gsum gl USING (dim)
GROUP BY p.label
"""


QUERIES = {
    "embedding_drift_by_label": q_embedding_drift_by_label,
}

ORACLES = {
    "embedding_drift_by_label": ORACLE_EMBEDDING_DRIFT_BY_LABEL,
}
