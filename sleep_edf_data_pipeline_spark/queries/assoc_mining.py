"""Word-association mining: skip-gram co-occurrence with PMI scoring.

The word2vec/phrase-detection data-prep statistic (Mikolov et al.
2013; Church & Hanks 1990): for every unordered token pair observed
within a ±``PMI_WINDOW`` skip-gram window, pointwise mutual
information of the pair against the endpoint marginals of the SAME
pair stream::

    pmi(a, b) = ln( c(a,b) * N / (c(a) * c(b)) )

with ``N`` the total pair observations and ``c(a)`` the number of
pair observations with ``a`` as an endpoint (so the score is standard
PMI up to a corpus-wide constant — ranking-equivalent, and every term
is an exact BIGINT count).

Scale shape (the whole point at 100 TB):

- Pair generation is ONE join-free corpus pass: the per-doc skip-gram
  pair array is built JVM-side with nested ``transform`` over index
  sequences (no posexplode self-join on doc_id, which would shuffle
  the token stream twice and join it against itself), then a single
  explode feeds a map-side-combinable ``groupBy(pair)``.
- Everything downstream of ``pair_counts`` runs on the VOCABULARY
  domain, not the corpus: marginals re-aggregate the persisted pair
  table, ``N`` is a 1-row agg of it, and both attach back by
  broadcast (a pair-vocab table is bounded by vocab², in practice
  vocab-sized after the min-count cut; at a scale where it is not,
  the dsir-style hashed-histogram trick applies).
- The global cut is ``orderBy().limit()`` → TakeOrderedAndProject;
  the rank window orders the surviving 64 rows only.
- Cross-engine float discipline: the log ratio is quantized to
  integer micro-nats from identical BIGINT products (decimal(38,0)
  intermediates so ``c_ab·N`` cannot overflow at any corpus size),
  and the reported double is ONE division of that integer — the
  engine's standard order-free recipe (see bigram_lm_surprisal).

Reference parity: none — the reference's warehouse has no text
surface; this extends SURVEY §2.7's training-data inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import tokens
from ..tables import spread, table

#: Skip-gram window: pairs (w[i], w[i+d]) for d = 1..PMI_WINDOW.
PMI_WINDOW = 3
#: Pairs rarer than this carry no stable signal and are cut BEFORE
#: the marginal joins (the classic PMI low-frequency pathology).
PMI_MIN_COUNT = 5
#: Report the top-N pairs by PMI.
PMI_TOP = 64

_PAIRS_EXPR = f"""
flatten(transform(sequence(1, least({PMI_WINDOW}, size(w) - 1)), d ->
    transform(sequence(0, size(w) - 1 - d), i ->
        concat_ws(' ', least(w[i], w[i + d]), greatest(w[i], w[i + d])))))
"""


def q_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-64 skip-gram token pairs by PMI (micro-nat exact)."""
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    w = docs.select(tokens(F.col("text")).alias("w")).filter(F.size("w") >= 2)
    # ONE corpus pass; persisted because three consumers re-aggregate
    # it (the pair frame itself, the endpoint marginals, and N).
    pair_counts = (
        w.select(F.explode(F.expr(_PAIRS_EXPR)).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("c_ab"))
        .persist()
    )
    pair_counts.count()
    n = pair_counts.agg(F.sum("c_ab").cast("bigint").alias("n"))
    # Persisted: joined twice (t1 and t2 endpoints) — without the
    # cache the vocab re-aggregation subtree runs once per consumer.
    marginals = (
        pair_counts.select(
            F.explode(F.split(F.col("pair"), " ")).alias("tok"), "c_ab"
        )
        .groupBy("tok")
        .agg(F.sum("c_ab").cast("bigint").alias("c_tok"))
        .persist()
    )
    marginals.count()
    _d = "decimal(38,0)"
    scored = (
        pair_counts.filter(F.col("c_ab") >= PMI_MIN_COUNT)
        .withColumn("t1", F.split(F.col("pair"), " ").getItem(0))
        .withColumn("t2", F.split(F.col("pair"), " ").getItem(1))
        .join(
            F.broadcast(marginals.withColumnRenamed("c_tok", "c_t1")),
            F.col("t1") == F.col("tok"),
        )
        .drop("tok")
        .join(
            F.broadcast(marginals.withColumnRenamed("c_tok", "c_t2")),
            F.col("t2") == F.col("tok"),
        )
        .drop("tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "pmi_micro",
            F.round(
                F.log(
                    (F.col("c_ab").cast(_d) * F.col("n").cast(_d)).cast(
                        "double"
                    )
                    / (F.col("c_t1").cast(_d) * F.col("c_t2").cast(_d)).cast(
                        "double"
                    )
                )
                * F.lit(1e6)
            ).cast("bigint"),
        )
    )
    top = scored.orderBy(
        F.desc("pmi_micro"), F.asc("t1"), F.asc("t2")
    ).limit(PMI_TOP)
    return (
        top.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("pmi_micro"), F.asc("t1"), F.asc("t2"))
            ),
        )
        .select(
            "t1",
            "t2",
            "c_ab",
            (F.col("pmi_micro").cast("double") / F.lit(1e6)).alias("pmi"),
            "rank",
        )
    )


ORACLE_PMI_COOCCURRENCE = f"""
WITH w AS (
    SELECT regexp_split_to_array(lower(text), '\\s+') AS w
    FROM documents
    WHERE len(regexp_split_to_array(lower(text), '\\s+')) >= 2
),
pairs AS (
    SELECT unnest(
        [least(w[i], w[i + 1]) || ' ' || greatest(w[i], w[i + 1])
         for i in range(1, len(w))]) AS pair
    FROM w
    UNION ALL
    SELECT unnest(
        [least(w[i], w[i + 2]) || ' ' || greatest(w[i], w[i + 2])
         for i in range(1, len(w) - 1)]) AS pair
    FROM w
    UNION ALL
    SELECT unnest(
        [least(w[i], w[i + 3]) || ' ' || greatest(w[i], w[i + 3])
         for i in range(1, len(w) - 2)]) AS pair
    FROM w
),
pair_counts AS (
    SELECT pair, CAST(count(*) AS BIGINT) AS c_ab FROM pairs GROUP BY pair
),
total AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n FROM pair_counts),
marginals AS (
    SELECT tok, CAST(sum(c_ab) AS BIGINT) AS c_tok
    FROM (
        SELECT unnest(regexp_split_to_array(pair, ' ')) AS tok, c_ab
        FROM pair_counts
    )
    GROUP BY tok
),
scored AS (
    SELECT split_part(pair, ' ', 1) AS t1,
           split_part(pair, ' ', 2) AS t2,
           c_ab,
           CAST(round(ln(
               CAST(CAST(c_ab AS HUGEINT) * CAST(n AS HUGEINT) AS DOUBLE)
               / CAST(CAST(m1.c_tok AS HUGEINT) * CAST(m2.c_tok AS HUGEINT)
                      AS DOUBLE)) * 1e6, 0) AS BIGINT) AS pmi_micro
    FROM pair_counts
    CROSS JOIN total
    JOIN marginals m1 ON m1.tok = split_part(pair, ' ', 1)
    JOIN marginals m2 ON m2.tok = split_part(pair, ' ', 2)
    WHERE c_ab >= {PMI_MIN_COUNT}
),
ranked AS (
    SELECT t1, t2, c_ab,
           CAST(pmi_micro AS DOUBLE) / 1e6 AS pmi,
           CAST(row_number() OVER (
               ORDER BY pmi_micro DESC, t1 ASC, t2 ASC) AS INT) AS rank
    FROM scored
)
SELECT t1, t2, c_ab, pmi, rank FROM ranked WHERE rank <= {PMI_TOP}
"""


QUERIES = {"pmi_cooccurrence": q_pmi_cooccurrence}
ORACLES = {"pmi_cooccurrence": ORACLE_PMI_COOCCURRENCE}
