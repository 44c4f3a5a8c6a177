"""Round-6 LLM-data operators: tokenizer induction, bigram LM, hard negatives.

Three additions to the training-data surface, each oracle-checked:

- ``bpe_merge_pairs`` — the statistics pass of byte-pair-encoding
  tokenizer training (Sennrich et al. 2016): adjacent character-pair
  frequencies over the corpus, weighted by word frequency.  The smart
  plan aggregates the WORD VOCABULARY first (map-side-combinable
  groupBy over tokens — the 100 TB corpus collapses to its distinct
  words) and only then explodes each distinct word's character pairs
  weighted by its count, so the pair explode runs over the vocabulary,
  not the corpus.  Top-64 merge candidates, count-desc / pair-asc.
- ``bigram_lm_surprisal`` — per-doc mean conditional surprisal under
  an add-one-smoothed corpus bigram LM:
  ``ln((c(ctx) + V) / (c(ctx,w) + 1))`` per observed bigram.  One gram
  pass builds the bigram count table; the context table aggregates
  FROM it (no second corpus pass); surprisal is quantized to integer
  micro-nats so per-doc sums are order-free BIGINTs (the engine's
  standard cross-engine float discipline, see unigram_logprob_scores).
- ``hard_negatives`` — contrastive-training data mining: for each
  query vector, the top-5 most-similar corpus vectors with a
  DIFFERENT label (the self-match mask generalized to a class mask).
  Runs on the streamed-BLAS brute-force path
  (operators/similarity.py:brute_force_topk with
  ``exclude_label_col``): per-partition local top-k, shuffle carries
  O(partitions·k·|Q|) candidates, never the scored pair matrix.

Reference parity: none of these exist in the reference (its warehouse
stops at SQL aggregates); they extend SURVEY §2.7's training-data
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..operators.dedup import tokens, word_shingles
from ..operators.similarity import (
    brute_force_topk,
    dot,
    hyperplane_lsh_bucket_col,
    norm,
)
from ..tables import spread, table

#: Top merge candidates reported by the BPE statistics pass.
BPE_TOP = 64
#: Hard-negative mining: query batch and per-query depth.
HN_QUERIES = 10
HN_TOP_K = 5


# --------------------------------------------------------------------------
# bpe_merge_pairs
# --------------------------------------------------------------------------


def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent char-pair counts over the vocab, weighted by word freq."""
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .filter(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    pairs = vocab.select(
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substr(tok, i, 2))")
        ).alias("pair"),
    )
    top = (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(BPE_TOP)
    )
    # rank over the already-truncated 64-row frame: orderBy+limit
    # compiles to TakeOrderedAndProject (per-partition top-64 merged on
    # the driver), so no global single-partition sort of the full pair
    # space ever exists; the window below orders 64 rows.
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("pair_count"), F.asc("pair"))),
    ).select("pair", "pair_count", "rank")


ORACLE_BPE_MERGE_PAIRS = f"""
WITH vocab AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS freq
    FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
        FROM documents
    )
    WHERE length(tok) >= 2
    GROUP BY tok
),
pairs AS (
    SELECT unnest([substr(tok, i, 2) for i in range(1, length(tok))]) AS pair,
           freq
    FROM vocab
),
ranked AS (
    SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count,
           CAST(row_number() OVER (ORDER BY sum(freq) DESC, pair ASC) AS INT)
               AS rank
    FROM pairs GROUP BY pair
)
SELECT pair, pair_count, rank FROM ranked WHERE rank <= {BPE_TOP}
"""


# --------------------------------------------------------------------------
# bigram_lm_surprisal
# --------------------------------------------------------------------------


def q_bigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean add-one-smoothed bigram surprisal (micro-nat exact).

    Docs with < 2 tokens contribute no bigrams and are absent from the
    output (no shingle fallback — a conditional LM needs a context).
    The bigram count table is ONE map-side-combinable corpus pass; the
    context-count table aggregates from it; V is the distinct unigram
    vocabulary of the same docs.  Surprisal rides a broadcast join
    back onto the per-doc gram stream (the bigram vocab is bounded and
    small next to the corpus; at a scale where it is not, the same
    dsir-style per-doc histogram trick applies).
    """
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= 2
    )
    # ONE corpus pass: the per-doc gram histogram.  Every downstream
    # frame (bigram counts, context counts, vocabulary, final per-doc
    # sum) aggregates from hist, which is persisted+materialized so
    # the tokenize→shingle subtree runs once instead of once per
    # consumer (the dsir lesson: broadcast subtrees defeat exchange
    # reuse).  V (distinct unigrams) is derivable from the gram parts:
    # every token of a ≥2-token doc appears in some bigram.
    hist = (
        toks.select(
            "doc_id", F.explode(word_shingles(F.col("w"), 2)).alias("gram")
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    hist.count()
    gram_counts = hist.groupBy("gram").agg(F.sum("cnt").alias("c_gram"))
    ctx_counts = (
        gram_counts.withColumn(
            "ctx", F.split(F.col("gram"), " ").getItem(0)
        )
        .groupBy("ctx")
        .agg(F.sum("c_gram").alias("c_ctx"))
    )
    v = (
        hist.select(F.explode(F.split(F.col("gram"), " ")).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    sur = (
        gram_counts.withColumn("ctx", F.split(F.col("gram"), " ").getItem(0))
        .join(F.broadcast(ctx_counts), "ctx")
        .crossJoin(F.broadcast(v))
        .select(
            "gram",
            F.round(
                F.log(
                    (F.col("c_ctx") + F.col("v")).cast("double")
                    / (F.col("c_gram") + F.lit(1)).cast("double")
                )
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("sur_micro"),
        )
    )
    return (
        hist.join(F.broadcast(sur), "gram")
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
            ).alias("mean_surprisal"),
        )
    )


ORACLE_BIGRAM_LM_SURPRISAL = """
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
ctx_counts AS (
    SELECT split_part(gram, ' ', 1) AS ctx,
           CAST(sum(c_gram) AS BIGINT) AS c_ctx
    FROM gram_counts GROUP BY ctx
),
vocab AS (
    SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
    FROM (SELECT unnest(w) AS tok FROM w)
),
sur AS (
    SELECT g.gram,
           CAST(round(ln(CAST(cc.c_ctx + vv.v AS DOUBLE)
                         / CAST(g.c_gram + 1 AS DOUBLE)) * 1e6, 0) AS BIGINT)
               AS sur_micro
    FROM gram_counts g
    JOIN ctx_counts cc ON cc.ctx = split_part(g.gram, ' ', 1)
    CROSS JOIN vocab vv
)
SELECT k.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(s.sur_micro) AS DOUBLE)
           / (1e6 * CAST(count(*) AS DOUBLE)) AS mean_surprisal
FROM grams k JOIN sur s USING (gram)
GROUP BY k.doc_id
"""


# --------------------------------------------------------------------------
# hard_negatives
# --------------------------------------------------------------------------


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most-similar different-label vectors per query vector."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < HN_QUERIES)
    return brute_force_topk(
        emb, queries, k=HN_TOP_K, exclude_label_col="label"
    )


_DOT = (
    "list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)"
    " for i in range(1, len(a.embedding) + 1)])"
)
_NORM_A = (
    "sqrt(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)"
    " for i in range(1, len(a.embedding) + 1)]))"
)
_NORM_B = (
    "sqrt(list_sum([CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)"
    " for i in range(1, len(b.embedding) + 1)]))"
)

ORACLE_HARD_NEGATIVES = f"""
WITH scored AS (
    SELECT
        a.vec_id AS query_id,
        b.vec_id AS neighbor_id,
        round({_DOT} / nullif({_NORM_A} * {_NORM_B}, 0), 6) AS cosine_sim
    FROM embeddings AS a
    JOIN embeddings AS b
      ON a.label != b.label AND a.vec_id != b.vec_id
    WHERE a.vec_id < {HN_QUERIES}
),
ranked AS (
    SELECT *,
        CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC
        ) AS INT) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank
FROM ranked WHERE rank <= {HN_TOP_K}
"""


# --------------------------------------------------------------------------
# cdc_chunks
# --------------------------------------------------------------------------

#: CDC window size (tokens) and boundary divisor: a window's seeded
#: hash ≡ 0 (mod divisor) marks a chunk boundary, so chunks average
#: CDC_DIVISOR tokens with content-determined edges.
CDC_K = 4
CDC_DIVISOR = 16


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (Rabin-style rolling-window boundaries).

    Fixed-size chunking (``document_chunks``) shifts every boundary
    when one token is inserted, defeating chunk-level dedup; CDC cuts
    where ``hash(window) % divisor == 0``, so an edit only moves the
    boundaries inside its own neighborhood — the standard trick from
    dedup storage systems, applied to corpus prep.  All logic is
    integer/hash (seeded md5-60bit % divisor), so the oracle replays
    it bit-for-bit.  One token pass: posexplode the k-token windows,
    keep boundary ends (interior only), union the per-doc sentinel
    boundary at n, then spans via lag — the islands pattern.

    Output: (doc_id, chunk_idx, start_tok, end_tok, n_tokens),
    positions 1-based inclusive.
    """
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "doc_id", tokens(F.col("text")).alias("w")
    ).withColumn("n", F.size("w"))
    wins = toks.filter(F.col("n") >= CDC_K).select(
        "doc_id",
        "n",
        F.posexplode(word_shingles(F.col("w"), CDC_K)).alias("pos0", "gram"),
    )
    interior = (
        wins.withColumn("bpos", F.col("pos0") + CDC_K)
        .filter(F.col("bpos") < F.col("n"))
        .filter(hash64(F.col("gram"), seed="cdc") % CDC_DIVISOR == 0)
        .select("doc_id", "bpos")
    )
    sentinel = toks.select("doc_id", F.col("n").alias("bpos"))
    bounds = interior.unionByName(sentinel)
    w = Window.partitionBy("doc_id").orderBy("bpos")
    return (
        bounds.withColumn("chunk_idx", F.row_number().over(w))
        .withColumn(
            "start_tok",
            F.coalesce(F.lag("bpos").over(w) + 1, F.lit(1)).cast("int"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            "start_tok",
            F.col("bpos").cast("int").alias("end_tok"),
            (F.col("bpos") - F.col("start_tok") + 1)
            .cast("int")
            .alias("n_tokens"),
        )
    )


_CDC_GRAM = f"array_to_string(list_slice(w, e - {CDC_K - 1}, e), ' ')"

ORACLE_CDC_CHUNKS = f"""
WITH t AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
    FROM documents
),
tt AS (SELECT doc_id, w, len(w) AS n FROM t),
interior AS (
    SELECT doc_id, e AS bpos
    FROM (
        SELECT doc_id, w, n, unnest(range({CDC_K}, n)) AS e FROM tt
        WHERE n >= {CDC_K}
    )
    WHERE ({hash64_sql(_CDC_GRAM, seed="cdc")}) % {CDC_DIVISOR} = 0
),
bounds AS (
    SELECT doc_id, bpos FROM interior
    UNION ALL
    SELECT doc_id, n AS bpos FROM tt
),
spans AS (
    SELECT doc_id,
           CAST(row_number() OVER win AS INT) AS chunk_idx,
           CAST(coalesce(lag(bpos) OVER win + 1, 1) AS INT) AS start_tok,
           CAST(bpos AS INT) AS end_tok
    FROM bounds
    WINDOW win AS (PARTITION BY doc_id ORDER BY bpos)
)
SELECT doc_id, chunk_idx, start_tok, end_tok,
       CAST(end_tok - start_tok + 1 AS INT) AS n_tokens
FROM spans
"""


# --------------------------------------------------------------------------
# token_entropy_by_source
# --------------------------------------------------------------------------


def q_token_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon token entropy (corpus-diversity metric).

    ``H = ln N − (Σ c·ln c) / N`` over the source's token counts —
    collapsed sources (one token repeated) score 0, diverse sources
    approach ln(vocab).  Cross-engine discipline: ``ln c`` is
    quantized once to integer micro-nats per DISTINCT (source, token)
    and weighted by the exact BIGINT count, so the Σ is order-free;
    ``ln N`` is quantized the same way; the only float ops after
    quantization are one division and one subtraction (IEEE-exact).
    One map-side-combinable token pass; everything after runs on the
    per-source vocabulary histogram.
    """
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    counts = (
        docs.select(
            "source", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    per_source = counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.sum(
            (F.round(F.log(F.col("c").cast("double")) * 1e6).cast("bigint"))
            * F.col("c").cast("bigint")
        ).alias("_clnc_micro"),
    )
    ln_n_micro = F.round(
        F.log(F.col("n_tokens").cast("double")) * 1e6
    ).cast("bigint")
    return per_source.select(
        "source",
        "n_tokens",
        "n_distinct",
        (
            (
                ln_n_micro.cast("double")
                - F.col("_clnc_micro").cast("double")
                / F.col("n_tokens").cast("double")
            )
            / F.lit(1e6)
        ).alias("entropy_nats"),
    ).orderBy("source")


ORACLE_TOKEN_ENTROPY_BY_SOURCE = r"""
WITH counts AS (
    SELECT source, tok, CAST(count(*) AS BIGINT) AS c
    FROM (
        SELECT source,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        FROM documents
    )
    GROUP BY source, tok
),
per_source AS (
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(CAST(round(ln(CAST(c AS DOUBLE)) * 1e6, 0) AS BIGINT) * c)
                AS BIGINT) AS clnc_micro
    FROM counts GROUP BY source
)
SELECT source, n_tokens, n_distinct,
       (CAST(CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e6, 0) AS BIGINT)
             AS DOUBLE)
        - CAST(clnc_micro AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 1e6
           AS entropy_nats
FROM per_source
ORDER BY source
"""


def q_hard_negatives_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard negatives, LSH-bucketed: the 100 TB path for the miner.

    ``hard_negatives`` scans the whole corpus per query batch (the
    recall baseline).  This twin restricts candidates to vectors in
    the query's random-hyperplane LSH bucket (the deterministic seeded
    planes from ``lsh_buckets`` — oracle-shared machinery), then ranks
    different-label candidates by exact cosine.  At scale the probe
    touches |corpus| / 2^n_planes of the data per query instead of all
    of it; recall follows the LSH collision probability, which is what
    the bucketed trade buys.  Deterministic end to end, so unlike most
    ANN indexes it is fully oracle-checked.
    """
    from .similarity_queries import _DIM, _N_PLANES

    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    # bucket is a pure projection (hyperplane_lsh_bucket_col) — the
    # old (vec_id, bucket) self-join shuffled the corpus to re-attach
    # a column computable in the scan
    embb = emb.withColumn(
        "bucket",
        hyperplane_lsh_bucket_col(
            F.col("embedding"), n_planes=_N_PLANES, dim=_DIM
        ),
    )
    q = embb.filter(F.col("vec_id") < HN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_qv"),
        F.col("label").alias("_qlabel"),
        F.col("bucket").alias("_qbucket"),
        norm(F.col("embedding")).alias("_qn"),
    )
    c = embb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("_cv"),
        F.col("label").alias("_clabel"),
        F.col("bucket").alias("_cbucket"),
        norm(F.col("embedding")).alias("_cn"),
    )
    den = F.col("_qn") * F.col("_cn")
    cos = F.when(den > 0, dot(F.col("_qv"), F.col("_cv")) / den)
    scored = (
        c.join(F.broadcast(q), F.col("_cbucket") == F.col("_qbucket"))
        .filter(
            (F.col("_clabel") != F.col("_qlabel"))
            & (F.col("neighbor_id") != F.col("query_id"))
        )
        .withColumn("cosine_sim", F.round(cos, 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HN_TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _oracle_hard_negatives_lsh() -> str:
    from .similarity_queries import _N_PLANES, _proj_sql

    proj_cols = ",\n".join(
        f"        {_proj_sql(p)} AS p{p}" for p in range(_N_PLANES)
    )
    bucket_expr = " + ".join(
        f"CASE WHEN p{p} > 0 THEN {2**p} ELSE 0 END" for p in range(_N_PLANES)
    )
    return f"""
WITH proj AS (
    SELECT vec_id,
{proj_cols}
    FROM embeddings
),
buckets AS (SELECT vec_id, CAST({bucket_expr} AS BIGINT) AS bucket FROM proj),
scored AS (
    SELECT a.vec_id AS query_id,
           b.vec_id AS neighbor_id,
           round({_DOT} / nullif({_NORM_A} * {_NORM_B}, 0), 6) AS cosine_sim
    FROM embeddings a
    JOIN buckets ba ON ba.vec_id = a.vec_id
    JOIN buckets bb ON bb.bucket = ba.bucket
    JOIN embeddings b ON b.vec_id = bb.vec_id
    WHERE a.vec_id < {HN_QUERIES}
      AND a.label != b.label AND a.vec_id != b.vec_id
),
ranked AS (
    SELECT *,
        CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC
        ) AS INT) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank
FROM ranked WHERE rank <= {HN_TOP_K}
"""


QUERIES = {
    "bpe_merge_pairs": q_bpe_merge_pairs,
    "bigram_lm_surprisal": q_bigram_lm_surprisal,
    "hard_negatives": q_hard_negatives,
    "hard_negatives_lsh": q_hard_negatives_lsh,
    "cdc_chunks": q_cdc_chunks,
    "token_entropy_by_source": q_token_entropy_by_source,
}

ORACLES = {
    "bpe_merge_pairs": ORACLE_BPE_MERGE_PAIRS,
    "bigram_lm_surprisal": ORACLE_BIGRAM_LM_SURPRISAL,
    "hard_negatives": ORACLE_HARD_NEGATIVES,
    "hard_negatives_lsh": _oracle_hard_negatives_lsh(),
    "cdc_chunks": ORACLE_CDC_CHUNKS,
    "token_entropy_by_source": ORACLE_TOKEN_ENTROPY_BY_SOURCE,
}
