"""Round-10: exact vocabulary-coverage curve (OOV planning table).

Tokenizer and vocabulary sizing starts from one table: per source,
what fraction of token OCCURRENCES does a top-k type vocabulary
cover (equivalently 1 − OOV rate) for the candidate k's.  The
registry has the growth curve (Heaps, ``vocab_growth_curve``) and
top tokens; this is the coverage/OOV axis, exact.

Scalable shape: ranking a vocabulary by frequency and cumulating it
naively is a vocabulary-sized ordered window per source.  Instead the
curve folds from the COUNT-OF-COUNTS histogram: (source, freq) →
(#types, Σocc) — its cardinality is the number of DISTINCT frequency
values, O(√tokens) for any Zipf-ish corpus (distinct counts c with
Σc = N is maximized by 1+2+…+m = N) — then one small per-source
window ordered by freq DESC gives cumulative types/occurrences, and
each candidate k resolves EXACTLY inside its crossing class:
``covered(k) = cum_occ − (cum_types − k)·freq`` (all types in a class
share the same freq, so a partial class contributes linearly — no
approximation).  All BIGINT; one division at the end.

Plan: one corpus pass to the (source, tok) grid (the ``source_vocab``
shuffle), a map-side-combinable count-of-counts reduction, then
everything is histogram-sized.  The per-source window partitions on
source over the √N-bounded class frame.

Reference scope: extends SURVEY §2.7's tokenizer family per the build
brief; no such surface in the reference
(blaiseclarke/sleep-edf-data-pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import spread, table
from .tokenizer_apply import source_vocab

#: Candidate vocabulary sizes.
KS = (100, 1000, 10000)


def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    vocab = source_vocab(docs)  # (source, tok, freq)
    cc = vocab.groupBy("source", "freq").agg(
        F.count("*").cast("bigint").alias("types"),
        F.sum("freq").cast("bigint").alias("occ"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("freq"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("source")
    cum = cc.select(
        "source",
        "freq",
        "types",
        F.sum("types").over(w).cast("bigint").alias("cum_types"),
        F.sum("occ").over(w).cast("bigint").alias("cum_occ"),
        F.sum("types").over(w_all).cast("bigint").alias("tot_types"),
        F.sum("occ").over(w_all).cast("bigint").alias("tot_occ"),
    )
    ks = spark.createDataFrame([(k,) for k in KS], "k bigint")
    crossed = cum.join(F.broadcast(ks), F.col("cum_types") >= F.col("k"))
    exact_cross = crossed.filter(
        F.col("cum_types") - F.col("types") < F.col("k")
    ).select(
        "source",
        "k",
        "tot_types",
        "tot_occ",
        (
            F.col("cum_occ")
            - (F.col("cum_types") - F.col("k")) * F.col("freq")
        ).alias("covered_occ"),
    )
    # sources whose whole vocabulary is smaller than k: fully covered
    small = (
        cum.groupBy("source")
        .agg(
            F.max("tot_types").alias("tot_types"),
            F.max("tot_occ").alias("tot_occ"),
        )
        .crossJoin(F.broadcast(ks))
        .filter(F.col("tot_types") < F.col("k"))
        .select(
            "source", "k", "tot_types", "tot_occ",
            F.col("tot_occ").alias("covered_occ"),
        )
    )
    out = exact_cross.unionByName(small)
    return out.select(
        "source",
        F.col("k").cast("bigint").alias("k"),
        "tot_types",
        "tot_occ",
        "covered_occ",
        (
            F.col("covered_occ").cast("double")
            / F.col("tot_occ").cast("double")
        ).alias("coverage"),
    )


ORACLE_VOCAB_COVERAGE_CURVE = f"""
WITH toks AS (
    SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
    FROM documents
),
vocab AS (
    SELECT source, tok, CAST(count(*) AS BIGINT) AS freq
    FROM toks WHERE length(tok) >= 1 GROUP BY source, tok
),
cc AS (
    SELECT source, freq,
           CAST(count(*) AS BIGINT) AS types,
           CAST(sum(freq) AS BIGINT) AS occ
    FROM vocab GROUP BY source, freq
),
cum AS (
    SELECT source, freq, types,
           CAST(sum(types) OVER (PARTITION BY source ORDER BY freq DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_types,
           CAST(sum(occ) OVER (PARTITION BY source ORDER BY freq DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_occ,
           CAST(sum(types) OVER (PARTITION BY source) AS BIGINT) AS tot_types,
           CAST(sum(occ) OVER (PARTITION BY source) AS BIGINT) AS tot_occ
    FROM cc
),
ks AS (SELECT unnest([{", ".join(str(k) for k in KS)}]) AS k),
exact_cross AS (
    SELECT source, CAST(k AS BIGINT) AS k, tot_types, tot_occ,
           cum_occ - (cum_types - k) * freq AS covered_occ
    FROM cum JOIN ks ON cum_types >= k AND cum_types - types < k
),
small AS (
    SELECT t.source, CAST(ks.k AS BIGINT) AS k, t.tot_types, t.tot_occ,
           t.tot_occ AS covered_occ
    FROM (
        SELECT source, max(tot_types) AS tot_types, max(tot_occ) AS tot_occ
        FROM cum GROUP BY source
    ) t CROSS JOIN ks
    WHERE t.tot_types < ks.k
),
unioned AS (
    SELECT * FROM exact_cross UNION ALL SELECT * FROM small
)
SELECT source, k, tot_types, tot_occ,
       CAST(covered_occ AS BIGINT) AS covered_occ,
       CAST(covered_occ AS DOUBLE) / CAST(tot_occ AS DOUBLE) AS coverage
FROM unioned
"""


QUERIES = {
    "vocab_coverage_curve": q_vocab_coverage_curve,
}

ORACLES = {
    "vocab_coverage_curve": ORACLE_VOCAB_COVERAGE_CURVE,
}
