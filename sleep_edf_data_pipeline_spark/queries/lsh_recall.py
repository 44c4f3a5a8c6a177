"""Round-11: LSH near-dup recall — the honest-accuracy contract for
the banded MinHash candidate generator.

The ANN family publishes recall-vs-exact rows (`ann_recall_eval`,
`pq_recall_eval`, `sq_recall_eval`); the near-dup family's banded LSH
had no such row — its driver checks prove the VERIFY stage exact, but
the probabilistic candidate stage's miss rate was only implied by
theory.  This query measures it: per exact-Jaccard band, the fraction
of TRUE near-dup pairs (1-gram Jaccard ≥ 0.6, computed via the
LOSSLESS prefix-filter join — no sampling, no all-pairs) that the
banded pass (k=16, 4 bands × 4 rows, the production parameters of
``minhash_lsh_neardups``) actually surfaces.

Theory row to compare against: P(candidate | J=s) = 1 − (1 − s⁴)⁴ —
≈ 0.43 at s = 0.6 rising to 1 at s = 1.0 — so LOW recall in the 0.6
band is the expected S-curve shape, not a bug; what the row guards is
the curve's level (a broken band key or permutation would crater it).

Composition, not new kernels: the denominator is the verified
``ngram_jaccard_join`` prefix-filter kernel at n=1/θ=0.6, the
numerator the verified ``minhash_lsh_dedup`` pipeline — both already
driver-green standalone, so a recall regression localizes to the
composition.  Plan: the two pair frames join on the pair key
(co-partitioned pair-key shuffle; pair counts are output-bound, the
corpus is never re-scanned).

Reference scope: no near-dup surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's dedup
family per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import PERM_P, perm_coeffs
from ..operators.dedup import minhash_lsh_dedup, ngram_jaccard_join
from ..tables import spread, table

#: Production LSH parameters (mirrors ``minhash_lsh_neardups``).
LSH_K = 16
LSH_BANDS = 4
LSH_ROWS = 4
THRESHOLD = 0.6

_H64 = "CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"
_COEFFS = perm_coeffs(LSH_K)


def q_lsh_neardup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    truth = ngram_jaccard_join(
        docs, "doc_id", "text", n=1, threshold=THRESHOLD
    )
    # r12 optimization (guide §1.2): the numerator only ever meets the
    # truth side, whose pairs ALREADY satisfy exact Jaccard ≥ θ under
    # the identical token-hash sets and round-6 comparison the verify
    # stage would re-run — so verified ∩ truth = candidates ∩ truth and
    # the verify stage (two pair-scale set joins + array_intersect per
    # candidate + the collect_set half of the signature agg) is an
    # identity here.  ``candidates_only`` skips it; the recall rows are
    # unchanged by construction, and the standalone
    # ``minhash_lsh_neardups`` contract keeps its full verify.
    lsh = minhash_lsh_dedup(
        docs,
        "doc_id",
        "text",
        k=LSH_K,
        shingle_n=1,
        bands=LSH_BANDS,
        rows_per_band=LSH_ROWS,
        threshold=THRESHOLD,
        candidates_only=True,
    ).select("id_a", "id_b", F.lit(1).alias("rec"))
    j = truth.join(lsh, ["id_a", "id_b"], "left")
    band = F.floor(F.col("jaccard") * F.lit(10.0)).cast("int")
    return (
        j.groupBy(band.alias("jaccard_band"))
        .agg(
            F.count("*").cast("bigint").alias("n_true_pairs"),
            F.sum(F.coalesce(F.col("rec"), F.lit(0)))
            .cast("bigint")
            .alias("n_recovered"),
        )
        .select(
            "jaccard_band",
            "n_true_pairs",
            "n_recovered",
            (
                F.col("n_recovered").cast("double")
                / F.col("n_true_pairs").cast("double")
            ).alias("recall"),
        )
        .orderBy("jaccard_band")
    )


# The numerator CTEs restate the verified minhash_lsh_neardups oracle
# (1-gram shingles); the denominator is brute-force 1-gram Jaccard —
# the prefix filter is lossless, so brute force IS the same set.
ORACLE_LSH_NEARDUP_RECALL = f"""
WITH t AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS words
    FROM documents
),
sets AS (
    SELECT doc_id, list_distinct(words) AS s FROM t
),
truth AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE),
                 6) AS jaccard
    FROM sets a JOIN sets b ON a.doc_id < b.doc_id
),
truth_th AS (SELECT * FROM truth WHERE jaccard >= {THRESHOLD}),
base AS (
    SELECT doc_id,
           list_transform(words, s -> {_H64.format(s="s")}) AS hs
    FROM t
),
sigs AS (
    SELECT doc_id,
           [{", ".join(f"list_min(list_transform(hs, h -> (CAST({a} AS BIGINT) * (h % {PERM_P}) + {b}) % {PERM_P}))" for a, b in _COEFFS)}] AS sig
    FROM base
),
bands AS (
    SELECT doc_id, b AS band_idx,
           md5(array_to_string(sig[b * {LSH_ROWS} + 1 : b * {LSH_ROWS} + {LSH_ROWS}], ',')) AS band_hash
    FROM sigs CROSS JOIN unnest(range(0, {LSH_BANDS})) AS tt(b)
),
cands AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b USING (band_idx, band_hash)
    WHERE a.doc_id < b.doc_id
),
joined AS (
    SELECT t.jaccard,
           CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END AS rec
    FROM truth_th t LEFT JOIN cands c
      ON c.id_a = t.id_a AND c.id_b = t.id_b
)
SELECT CAST(floor(jaccard * 10.0) AS INT) AS jaccard_band,
       CAST(count(*) AS BIGINT) AS n_true_pairs,
       CAST(sum(rec) AS BIGINT) AS n_recovered,
       CAST(sum(rec) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
FROM joined
GROUP BY jaccard_band
ORDER BY jaccard_band
"""

QUERIES = {
    "lsh_neardup_recall": q_lsh_neardup_recall,
}

ORACLES = {
    "lsh_neardup_recall": ORACLE_LSH_NEARDUP_RECALL,
}
