"""Round-12: sampled-truth LSH recall — the 100 TB-runnable audit.

``lsh_neardup_recall`` (queries/lsh_recall.py) measures the banded
MinHash generator's per-Jaccard-band recall against the LOSSLESS
prefix-filter truth set — right for the sf0.1 contract, but the truth
side is pair-output-bound (its decade row records 10.09×), so the
audit itself cannot run at corpus scale (VERDICT r11 item 4).

This variant keeps the SAME banded numerator and replaces the truth
universe with a deterministic fixed-size doc sample, the
``bpe_encode_sample`` discipline (md5-ranked top-N — a TakeOrdered,
never a global sort):

- **Sample key = the doc's minimum per-word md5** — i.e. the first
  MinHash permutation in disguise.  Near-duplicate docs at J ≥ θ share
  their min-hashed word with probability ≥ θ, so ranking by the key
  keeps dup clusters ADJACENT and the top-N cut preserves true-pair
  density instead of scattering clusters the way a doc_id-keyed sample
  would (P(co-sampled) = r² per pair).  Ties (identical key — usually
  actual near-dups) break on doc_id.
- **Both stages run only on the N sampled docs**: the truth side's
  prefix-filter join and the banded candidate join are now bounded by
  N² regardless of corpus size; the only corpus-scale work left is the
  single scan + top-N that SELECTS the sample (same shape as
  ``bpe_encode_sample``).  Per-pair recall is unchanged by sampling —
  band-hash equality depends only on the two docs themselves.

Estimator honesty: the content-keyed sample is biased TOWARD pairs
that share their min word (exactly the pairs banding recovers most
easily), so the sampled recall upper-bounds the exact form's in
expectation; the row is a scale-safe REGRESSION GUARD for the band
key/permutation plumbing (a broken generator still craters it), while
the exact form remains the calibration row at contract scale.
tests/test_lsh_recall_sampled.py pins the sampled-vs-exact agreement
at test scale.

Reference scope: no near-dup surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's dedup
family per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import PERM_P as _PERM_P
from ..operators.dedup import minhash_lsh_dedup, ngram_jaccard_join, tokens
from ..tables import spread, table
from .lsh_recall import (
    LSH_BANDS,
    LSH_K,
    LSH_ROWS,
    THRESHOLD,
    _COEFFS,
    _H64,
)

#: Fixed audit-sample size — the knob that makes the truth side
#: corpus-size-independent.  250 is a true subsample at every test SF
#: (documents: 500/500/5000) while keeping hundreds of true pairs.
SAMPLE_DOCS = 250


def _sampled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    words = tokens(F.col("text"))
    # min per-word md5 = MinHash permutation #0 as a hex string; the
    # coalesce('') keeps a no-word doc's NULL key from diverging on
    # engine NULL-ordering defaults (Spark: first; DuckDB: last).
    mk = F.coalesce(
        F.array_min(F.transform(words, lambda s: F.md5(s))), F.lit("")
    )
    return (
        docs.select("doc_id", "text", mk.alias("mk"))
        .orderBy("mk", "doc_id")  # TakeOrderedAndProject, not a sort
        .limit(SAMPLE_DOCS)
        .select("doc_id", "text")
    )


def q_lsh_neardup_recall_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    sample = _sampled_docs(spark, sf_dir).persist()
    sample.count()  # materialize once; feeds BOTH stages below
    truth = ngram_jaccard_join(
        sample, "doc_id", "text", n=1, threshold=THRESHOLD
    )
    # candidates_only: the verify stage is an identity against the
    # truth side (same token-hash sets, same round-6 cut) — see
    # queries/lsh_recall.py for the equivalence argument.
    lsh = minhash_lsh_dedup(
        sample,
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


# Identical CTE chain to the exact form's oracle, applied to the
# md5-min-keyed top-N sample instead of the full corpus.
ORACLE_LSH_NEARDUP_RECALL_SAMPLED = f"""
WITH t0 AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS words
    FROM documents
),
keyed AS (
    SELECT doc_id, words,
           coalesce(list_min(list_transform(words, s -> md5(s))), '') AS mk
    FROM t0
),
t AS (
    SELECT doc_id, words FROM keyed ORDER BY mk, doc_id LIMIT {SAMPLE_DOCS}
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
           [{", ".join(f"list_min(list_transform(hs, h -> (CAST({a} AS BIGINT) * (h % {_PERM_P}) + {b}) % {_PERM_P}))" for a, b in _COEFFS)}] AS sig
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
    "lsh_neardup_recall_sampled": q_lsh_neardup_recall_sampled,
}

ORACLES = {
    "lsh_neardup_recall_sampled": ORACLE_LSH_NEARDUP_RECALL_SAMPLED,
}
