"""Round-11: Kneser-Ney smoothed bigram LM surprisal per document.

The LM-scoring family has add-one smoothing (``bigram_lm_surprisal``)
and raw unigram log-probs (``unigram_logprob_scores``); production
perplexity filters (CCNet's KenLM stage; Wenzek et al. 2020) use
KNESER-NEY smoothing, whose two ideas add-one lacks: absolute
discounting (subtract a fixed D from every seen count, so mass scales
with TYPE counts, not token counts) and the continuation distribution
(back off to "how many distinct contexts does w follow?" rather than
raw unigram frequency — the classic "San Francisco" argument:
"Francisco" is frequent but follows only one context, so it should be
a poor backoff candidate).

    P_KN(w | ctx) = ( max(c(ctx,w) − D, 0)
                      + D · N1+(ctx,·) · P_cont(w) ) / c(ctx)
    P_cont(w)     = N1+(·,w) / N1+(·,·)

with D = 0.75 (Chen & Goodman 1999's standard fixed discount — exactly
representable in binary, so the discounted numerator is exact).

Cross-engine float discipline (the ``bigram_lm_surprisal`` precedent):
every probability is a short FIXED-ORDER chain of correctly-rounded
double ops over exact BIGINT counts, computed ONCE per distinct bigram
type; the per-type surprisal is quantized to integer micro-nats
(``round(−ln P · 1e6)`` as BIGINT), so the per-doc aggregation sums
integers — order-free and bit-stable; the only remaining float op is
one final division per doc.

Scale shape (100 TB): ONE corpus pass builds the per-doc bigram
histogram (map-side combinable); bigram counts, context totals, both
continuation-type counts and the type total all aggregate FROM that
histogram (types, not tokens); the scored type table joins back onto
the per-doc histogram with NO pinned broadcast hint (ADVICE r11) — AQE
broadcasts it while it fits and, at a vocabulary scale where the type
table outgrows a broadcast, the same join co-partitions on gram: the
plan degrades to one extra shuffle, never to a corpus re-scan or an
executor OOM.  The only pinned broadcast is the 1-row n1_all total.

Reference scope: no LM-scoring surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's
text-analysis family per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import tokens, word_shingles
from ..tables import spread, table

#: Absolute discount (Chen & Goodman 1999). 0.75 = 3/4, exact in binary.
KN_DISCOUNT = 0.75


def q_kn_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= 2
    )
    # ONE corpus pass: the per-doc bigram histogram; everything else
    # aggregates from it (persisted + materialized — the dsir lesson).
    hist = (
        toks.select(
            "doc_id", F.explode(word_shingles(F.col("w"), 2)).alias("gram")
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    hist.count()
    gram_counts = hist.groupBy("gram").agg(
        F.sum("cnt").cast("bigint").alias("c_gram")
    )
    split = F.split(F.col("gram"), " ")
    typed = gram_counts.select(
        "gram",
        "c_gram",
        split.getItem(0).alias("ctx"),
        split.getItem(1).alias("nxt"),
    ).persist()
    typed.count()
    # token totals + continuation TYPE count per context
    ctx_stats = typed.groupBy("ctx").agg(
        F.sum("c_gram").cast("bigint").alias("c_ctx"),
        F.count("*").cast("bigint").alias("n1_ctx"),
    )
    # distinct-left-context count per continuation word
    cont_counts = typed.groupBy("nxt").agg(
        F.count("*").cast("bigint").alias("n1_w")
    )
    n1_all = typed.agg(F.count("*").cast("bigint").alias("n1_all"))

    d = F.lit(KN_DISCOUNT)
    p_cont = F.col("n1_w").cast("double") / F.col("n1_all").cast("double")
    num = (
        F.greatest(F.col("c_gram").cast("double") - d, F.lit(0.0))
        + d * F.col("n1_ctx").cast("double") * p_cont
    )
    p_kn = num / F.col("c_ctx").cast("double")
    # ADVICE r11: no broadcast hints on the type-table joins —
    # ctx_stats, cont_counts and scored are all vocabulary- or
    # bigram-type-sized and a pinned broadcast would OOM at corpus
    # scale; AQE broadcasts them while they fit and degrades to a
    # co-partitioned shuffle when they don't (the docstring's claim,
    # now true).  Only n1_all (exactly 1 row) keeps its pin.
    scored = (
        typed.join(ctx_stats, "ctx")
        .join(cont_counts, "nxt")
        .crossJoin(F.broadcast(n1_all))
        .select(
            "gram",
            F.round(-F.log(p_kn) * F.lit(1e6))
            .cast("bigint")
            .alias("sur_micro"),
        )
    )
    return (
        hist.join(scored, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("sur_micro")).alias("_s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (
                F.col("_s").cast("double")
                / (F.lit(1e6) * F.col("n_bigrams").cast("double"))
            ).alias("mean_kn_surprisal"),
        )
    )


ORACLE_KN_BIGRAM_SURPRISAL = f"""
WITH w AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
    FROM documents
    WHERE len(regexp_split_to_array(lower(text), '\\s+')) >= 2
),
grams AS (
    SELECT doc_id,
           unnest([w[i] || ' ' || w[i + 1] for i in range(1, len(w))]) AS gram
    FROM w
),
gram_counts AS (
    SELECT gram, CAST(count(*) AS BIGINT) AS c_gram FROM grams GROUP BY gram
),
typed AS (
    SELECT gram, c_gram,
           split_part(gram, ' ', 1) AS ctx,
           split_part(gram, ' ', 2) AS nxt
    FROM gram_counts
),
ctx_stats AS (
    SELECT ctx, CAST(sum(c_gram) AS BIGINT) AS c_ctx,
           CAST(count(*) AS BIGINT) AS n1_ctx
    FROM typed GROUP BY ctx
),
cont_counts AS (
    SELECT nxt, CAST(count(*) AS BIGINT) AS n1_w FROM typed GROUP BY nxt
),
n1_all AS (SELECT CAST(count(*) AS BIGINT) AS n1_all FROM typed),
scored AS (
    SELECT t.gram,
           CAST(round(-ln(
               (greatest(CAST(t.c_gram AS DOUBLE) - {KN_DISCOUNT}, 0.0)
                + {KN_DISCOUNT} * CAST(cs.n1_ctx AS DOUBLE)
                  * (CAST(cc.n1_w AS DOUBLE) / CAST(na.n1_all AS DOUBLE)))
               / CAST(cs.c_ctx AS DOUBLE)) * 1e6, 0) AS BIGINT)
               AS sur_micro
    FROM typed t
    JOIN ctx_stats cs ON cs.ctx = t.ctx
    JOIN cont_counts cc ON cc.nxt = t.nxt
    CROSS JOIN n1_all na
)
SELECT k.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(s.sur_micro) AS DOUBLE)
           / (1e6 * CAST(count(*) AS DOUBLE)) AS mean_kn_surprisal
FROM grams k JOIN scored s USING (gram)
GROUP BY k.doc_id
"""

QUERIES = {
    "kn_bigram_surprisal": q_kn_bigram_surprisal,
}

ORACLES = {
    "kn_bigram_surprisal": ORACLE_KN_BIGRAM_SURPRISAL,
}
