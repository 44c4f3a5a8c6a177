"""Round-12: Johnson-Lindenstrauss sign projection + distortion audit.

Dimensionality reduction is the standard pre-ANN compression for
embedding corpora (project 64-dim float vectors to 16 dims, THEN
build the index): the JL lemma bounds pairwise-distance distortion,
and a ±1 sign matrix (Achlioptas 2003) attains it with integer-only
arithmetic.  The family's sign projections already exist here as
similarity HASHES (simhash, hyperplane LSH — 1 bit per projection);
this query adds the full-magnitude PROJECTION and, in the repo's
measured-contract style (`ann_recall_eval`, `sq_recall_eval`,
`lsh_neardup_recall*`), the honest-accuracy row: the measured
distance-distortion histogram of the projection on a deterministic
bounded pair sample.

Determinism / cross-engine float discipline (the verify-skill rules):

- the 64×16 sign matrix is derived from md5 parity of "i,j" — a pure
  function both the Spark expressions and the oracle SQL are generated
  FROM, so the two engines share it by construction;
- vector components are quantized ONCE to integer micros
  (round(x·1e6) as BIGINT); every projection and squared distance is
  then EXACT BIGINT arithmetic (|y_j| ≤ 64·4e6·1e6 ≈ 2.6e14, safely
  inside int64 even squared pairwise: ≤ 16·(2·2.6e14)²... distances
  are summed as the audit's D_proj ≤ 16·(5.3e8 µ)² — computed in
  BIGINT after dividing? no: squared deltas stay ≤ ~1.1e18 < 2^63);
- the ratio D_proj / (d'·D_orig) — expectation 1 under E[(Σ±x)²]=‖x‖²
  — is ONE double division of exact BIGINTs, floored to micros
  (floor has no rounding mode; round() half-ties diverge cross-engine);
- bands and counts are integers; per-band min/max/avg derive from the
  floored micro ratios, each with at most one final double division.

Scale shape (100 TB): the projection itself is a shuffle-free
whole-stage-codegen projection (16 fixed ±-sums per row) applied
corpus-wide in production; the AUDIT runs on the deterministic
``vec_id < JL_SAMPLE`` slice (filter pushed to the parquet scan), so
its cost is constant in the corpus — same discipline as
``lsh_neardup_recall_sampled``.

Reference scope: no embedding surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's
similarity family per the build brief.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import spread, table

#: Input / output dimensionality of the sign projection.
JL_D = 64
JL_DP = 16

#: Audit sample: all pairs among the first JL_SAMPLE vec_ids (the
#: deterministic bounded slice — 2,016 pairs).
JL_SAMPLE = 64


def _sign(i: int, j: int) -> int:
    """±1 from md5 parity of "i,j" — shared by both engines."""
    return 1 if hashlib.md5(f"{i},{j}".encode()).digest()[0] % 2 == 0 else -1


#: The full 64×16 sign matrix, materialized once at import.
SIGNS = [[_sign(i, j) for j in range(JL_DP)] for i in range(JL_D)]


def _micros() -> F.Column:
    return F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(1e6)).cast("bigint"),
    )


#: The sign matrix as ONE 2-D array literal (row j = projection j's
#: 64 signs), so the whole projection is a single nested fold.
#:
#: r12 optimization (guide §1.2 step 2, applied to the DRIVER): built
#: as ONE ``F.expr`` parse instead of 1,024 ``F.lit(...).cast(...)``
#: Column objects — each python Column op is a py4j round-trip, and
#: the element-wise form cost ~2.5 s of pure query-CONSTRUCTION time
#: per run (measured build=2.7 s vs exec=0.55 s).  The parsed
#: expression tree is identical: integer ``L``-suffixed literals are
#: BIGINT, so analysis, folding and generated code do not change.
def _sign_matrix() -> F.Column:
    rows = ", ".join(
        "array(" + ", ".join(f"{SIGNS[i][j]}L" for i in range(JL_D)) + ")"
        for j in range(JL_DP)
    )
    return F.expr(f"array({rows})")


def _projected(df: DataFrame) -> DataFrame:
    """vec_id, xm (micro-quantized vector), ys (its JL_DP exact-BIGINT
    sign projections).

    Expression shape matters here: ONE ``transform`` over the 2-D
    sign-matrix literal, each row folded with ``zip_with``+``aggregate``
    — not 16 separate fold columns and not 16×64 inlined ±element_at
    terms.  Both rejected forms were measured as FIXED FLOORS at every
    scale (the inlined form ~7 s: Janino recompiles ~1,000-term
    whole-stage code per run; 16 separate HOF columns ~2.8 s: Catalyst
    re-analyzes 16 lambda trees); the single nested fold runs the
    identical exact-BIGINT arithmetic at ~0.5 s end-to-end."""
    ys = F.transform(
        _sign_matrix(),
        lambda srow: F.aggregate(
            F.zip_with(F.col("xm"), srow, lambda x, s: x * s),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ),
    )
    return df.select("vec_id", _micros().alias("xm")).select(
        "vec_id", "xm", ys.alias("ys")
    )


def q_jl_distortion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    sample = emb.filter(F.col("vec_id") < JL_SAMPLE).select(
        "vec_id", "embedding"
    )
    # one feature frame carrying BOTH representations; ONE broadcast
    # self-join scores both distances per pair (a second join on the
    # pair key would only re-pay stage/compile floors)
    feat = _projected(sample)
    a = feat.alias("a")
    b = feat.alias("b")

    def _sq_dist(left: str, right: str) -> F.Column:
        return F.aggregate(
            F.zip_with(
                F.col(left), F.col(right), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )

    d_orig = _sq_dist("a.xm", "b.xm")
    d_proj = _sq_dist("a.ys", "b.ys")

    # ratio = D_proj / (d' · D_orig); expectation 1.  One double
    # division of exact BIGINTs, floored to micros.
    ratio_micro = F.floor(
        F.col("d_proj").cast("double")
        / (F.lit(float(JL_DP)) * F.col("d_orig").cast("double"))
        * F.lit(1e6)
    ).cast("bigint")
    scored = (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(d_orig.alias("d_orig"), d_proj.alias("d_proj"))
        .filter(F.col("d_orig") > 0)
        .select(ratio_micro.alias("rm"))
    )
    band = F.floor(F.col("rm").cast("double") / F.lit(50_000.0)).cast("int")
    return (
        scored.groupBy(band.alias("ratio_band"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.min("rm").alias("min_ratio_micro"),
            F.max("rm").alias("max_ratio_micro"),
            (F.sum("rm").cast("double") / F.count("*").cast("double")).alias(
                "avg_ratio"
            ),
        )
        .select(
            "ratio_band",
            "n_pairs",
            "min_ratio_micro",
            "max_ratio_micro",
            (F.col("avg_ratio") / F.lit(1e6)).alias("avg_ratio"),
        )
        .orderBy("ratio_band")
    )


def _proj_sql_terms(side: str) -> str:
    """y_j columns for the oracle, generated from the SAME sign matrix."""
    cols = []
    for j in range(JL_DP):
        terms = " + ".join(
            f"{'' if SIGNS[i][j] == 1 else '-'}xm[{i + 1}]"
            for i in range(JL_D)
        )
        cols.append(f"({terms}) AS y{j}")
    return ", ".join(cols)


ORACLE_JL_DISTORTION_AUDIT = f"""
WITH s AS (
    SELECT vec_id,
           list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))
               AS xm
    FROM embeddings WHERE vec_id < {JL_SAMPLE}
),
proj AS (
    SELECT vec_id, {_proj_sql_terms('s')}
    FROM s
),
pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ({" + ".join(f"(a.xm[{i + 1}] - b.xm[{i + 1}]) * (a.xm[{i + 1}] - b.xm[{i + 1}])" for i in range(JL_D))})
               AS d_orig
    FROM s a JOIN s b ON a.vec_id < b.vec_id
),
pp AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ({" + ".join(f"(a.y{j} - b.y{j}) * (a.y{j} - b.y{j})" for j in range(JL_DP))})
               AS d_proj
    FROM proj a JOIN proj b ON a.vec_id < b.vec_id
),
scored AS (
    SELECT CAST(floor(CAST(d_proj AS DOUBLE)
                      / ({float(JL_DP)} * CAST(d_orig AS DOUBLE)) * 1e6)
                AS BIGINT) AS rm
    FROM pairs JOIN pp USING (id_a, id_b)
    WHERE d_orig > 0
)
SELECT CAST(floor(CAST(rm AS DOUBLE) / 50000.0) AS INT) AS ratio_band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       min(rm) AS min_ratio_micro,
       max(rm) AS max_ratio_micro,
       (CAST(sum(rm) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / 1e6
           AS avg_ratio
FROM scored
GROUP BY ratio_band
ORDER BY ratio_band
"""

QUERIES = {
    "jl_distortion_audit": q_jl_distortion_audit,
}

ORACLES = {
    "jl_distortion_audit": ORACLE_JL_DISTORTION_AUDIT,
}
