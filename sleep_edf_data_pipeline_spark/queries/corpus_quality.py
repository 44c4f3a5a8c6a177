"""Corpus-quality / data-selection queries for the LLM-training surface.

Adds the data-*selection* layer on top of the existing filters:

- ``bloom_decontaminate`` — the exact benchmark-overlap join behind an
  8 KB Bloom-bitset prefilter (operators/bloom.py): same output as
  ``decontaminate_overlap`` (the oracle *is* the exact join — bloom
  false negatives are impossible), but the corpus-side scan probes a
  fixed-size literal bitset instead of broadcasting the gram strings.
- ``decontaminate_auto`` — the registered DEFAULT decontamination
  path: measures the eval-gram set (one bounded approx-distinct
  pre-pass) and picks the exact broadcast join below the broadcast
  budget, the bloom prefilter above it.  Same oracle as both
  variants; the switch is a physical-plan choice only.
- ``dsir_importance_weights`` — Data Selection via Importance
  Resampling (Xie et al., NeurIPS 2023): per-document log-likelihood
  ratio between a target distribution (here ``lang = 'en'``) and the
  raw corpus over hashed bigram buckets.  All probabilities are exact
  integer ratios; log-ratios are quantized to integer micro-nats
  (``round(ln(r)·1e6)``) so per-doc sums are order-free BIGINTs —
  bit-stable in any engine.
- ``unigram_logprob_scores`` — CCNet-style LM quality proxy: mean
  negative log-probability per token under the corpus's own unigram
  LM, same micro-nat quantization.
- ``importance_resample`` — deterministic Bernoulli sampling with
  P(keep) ∝ document length, decided by a *pure integer* comparison
  (``hash·maxc < n_chars·2^20``) — reproducible shard-by-shard with
  no float boundary anywhere.
- ``length_bucket_packing`` — padding-waste accounting for fixed
  power-of-two batch buckets (the sequence-bucketing efficiency
  metric for training dataloaders).
- ``corpus_shuffle_order`` — deterministic global training order:
  hash-derived shard + in-shard position, the engine-reproducible
  equivalent of a seeded shuffle.

Everything is built-ins (zero UDFs); per-doc reductions are
map-side-combinable groupBys; the only broadcast sides are
fixed-size by construction (4096 LLR buckets, the token vocabulary,
one scalar row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..operators.bloom import build_bloom, with_bloom_probe
from ..operators.dedup import tokens, word_shingles
from ..tables import spread, table
from .training_data import (
    _GRAMS_SQL,
    DECONTAM_N,
    EVAL_MOD,
    ORACLE_DECONTAMINATE_OVERLAP,
)

#: DSIR hashed-feature space (buckets for bigram counts).
DSIR_BUCKETS = 4096

#: importance_resample: probability granularity 2^20 (exact integers).
RESAMPLE_SCALE = 1 << 20

#: Training shards for the deterministic global shuffle.
N_SHARDS = 8

#: Sequence-length batch buckets (power-of-two tops; corpus docs are
#: 10-99 tokens).
LENGTH_BUCKETS = (16, 32, 64, 128)


# --------------------------------------------------------------------------
# bloom_decontaminate
# --------------------------------------------------------------------------


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination with a Bloom-prefiltered confirm join.

    Two-phase: (1) every train gram probes an 8 KB bitset of the eval
    split's grams inside codegen — no join, no shuffle; (2) only
    maybe-hits enter the exact confirm join (false positives die
    there, false negatives cannot exist), then counts re-merge with
    the clean rows.  Output ≡ ``decontaminate_overlap`` — same oracle.

    At 100 TB: phase 1's cost is a constant-size literal probe per
    gram; phase 2's join input shrinks from the whole corpus to the
    contamination rate (~% of rows), so the broadcast-join cost stops
    scaling with the corpus entirely.
    """
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), DECONTAM_N))
        ).alias("gram"),
    )
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_grams = grams.filter(is_eval).select("gram").distinct()
    train = grams.filter(~is_eval)

    words, nbits = build_bloom(eval_grams, "gram")
    maybe = with_bloom_probe(train, words, nbits, F.col("gram"))

    # Single pass: _maybe rides the join condition, so bloom-negative
    # grams fall straight through as non-matches (no second scan, no
    # union) while the hash probe itself only ever runs for maybe-hits.
    ev = F.broadcast(
        eval_grams.select(F.col("gram").alias("_ev_gram"), F.lit(1).alias("_hit"))
    )
    hit = maybe.join(
        ev, F.col("_maybe") & (F.col("gram") == F.col("_ev_gram")), "left"
    )
    return (
        hit.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated"),
        )
        .withColumn("drop_doc", F.col("n_contaminated") > 0)
    )


# Lossless by construction: the oracle is the exact join.
ORACLE_BLOOM_DECONTAMINATE = ORACLE_DECONTAMINATE_OVERLAP


#: Auto-switch cut-over: above this many (approx) distinct eval grams
#: the gram strings stop being an acceptable broadcast for the exact
#: confirm join (~100 B/gram in the JVM hash relation: ~40 B of gram
#: text + UnsafeRow + hash-map overhead → ~100 MB at the threshold)
#: and the fixed-size bloom bitset becomes the right prefilter.  Below
#: it the exact broadcast join wins on every scale measured locally
#: (SCALING.md: bloom loses to exact at sf0.1, 10×, AND 100× — the
#: bitset only pays once the *strings* are too big to ship).
AUTO_BLOOM_MAX_BROADCAST_GRAMS = 1_000_000


def q_decontaminate_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with a measured size-based plan switch.

    VERDICT r5: ``bloom_decontaminate`` is slower than the exact
    broadcast join at every locally measurable scale — its win regime
    is an eval-gram set too large to broadcast as strings, which one
    box cannot reach.  This entry makes the weak variant unreachable
    by default: ONE cheap bounded pre-pass (approx_count_distinct over
    the eval split — the small side by construction) picks the plan:

    - eval grams ≤ AUTO_BLOOM_MAX_BROADCAST_GRAMS → exact broadcast
      confirm join (``decontaminate_overlap``), the measured local
      winner;
    - above → bloom-prefiltered confirm join
      (``bloom_decontaminate``), whose probe side is a fixed 8 KB
      bitset no matter how many grams the eval split holds.

    Both branches share the same oracle (bloom false negatives are
    impossible; false positives die in the confirm join), so the
    switch can never change results — only the plan.
    tests/test_round6_plans.py pins branch selection on both sides of
    the threshold.
    """
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    n_eval_grams = (
        docs.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(
            F.explode(
                F.array_distinct(
                    word_shingles(tokens(F.col("text")), DECONTAM_N)
                )
            ).alias("gram")
        )
        .agg(F.approx_count_distinct("gram").alias("n"))
        .collect()[0]["n"]
    )
    if n_eval_grams <= AUTO_BLOOM_MAX_BROADCAST_GRAMS:
        from .training_data import q_decontaminate_overlap

        return q_decontaminate_overlap(spark, sf_dir)
    return q_bloom_decontaminate(spark, sf_dir)


# --------------------------------------------------------------------------
# dsir_importance_weights
# --------------------------------------------------------------------------


def _bigrams(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        "lang",
        F.explode(word_shingles(tokens(F.col("text")), 2)).alias("gram"),
    )


def dsir_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, n_grams, total_llr, avg_llr) — see q_dsir_importance_weights.

    Takes any frame with (doc_id, lang, text); reused by the corpus
    build DAG on its post-dedup frame.

    The expensive work (tokenize → shingle → hash the whole corpus)
    happens ONCE: everything aggregates from the per-doc bucket
    histogram ``hist`` (≤4096 rows per doc, far smaller than the gram
    stream), and both consumers of ``hist`` — the per-bucket count
    table and the final per-doc sum — share the identical
    (doc_id, lang, bucket) aggregation subtree, so Spark reuses one
    exchange instead of re-exploding the corpus per branch (the r04
    plan exploded it three times; measured 8.7 s → ~2 s at scale10).
    """
    grams = _bigrams(docs).withColumn(
        "bucket", hash64(F.col("gram")) % DSIR_BUCKETS
    )
    # persist + materialize: the LLR table is built as a BROADCAST
    # (its own job), which defeats exchange reuse — unpersisted, the
    # corpus explodes once per consumer.  hist is O(docs × 4096) —
    # far smaller than the gram stream — and the cache is released by
    # the caller like every other constructor persist (bench/corpus
    # DAG call clearCache between queries).
    hist = (
        grams.groupBy("doc_id", "lang", "bucket")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    hist.count()
    per_bucket = hist.groupBy("bucket").agg(
        F.sum("c").alias("cr"),
        F.sum(F.when(F.col("lang") == "en", F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("ct"),
    )
    totals = per_bucket.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    b = F.lit(DSIR_BUCKETS).cast("bigint")
    llr_micro = F.round(
        F.log(
            ((F.col("ct") + 1) * (F.col("nr") + b)).cast("double")
            / ((F.col("cr") + 1) * (F.col("nt") + b)).cast("double")
        )
        * F.lit(1e6)
    ).cast("bigint")
    llr = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket", llr_micro.alias("llr_micro")
    )
    return (
        hist.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.col("c") * F.col("llr_micro")).alias("_s"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("_s").cast("double") / F.lit(1e6)).alias("total_llr"),
            (
                F.col("_s").cast("double")
                / (F.lit(1e6) * F.col("n_grams").cast("double"))
            ).alias("avg_llr"),
        )
    )


def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR: per-doc importance = Σ log(p_target/p_raw) over hashed
    bigram features (target = English docs), in integer micro-nats.

    Plan: one corpus pass explodes bigrams; two map-side-combinable
    groupBys build the 4096-bucket count tables; the per-bucket LLR
    frame broadcasts back; one groupBy(doc_id) sums BIGINT micro-nats.
    Laplace-smoothed probabilities are exact integer ratios, so the
    ln() argument is a bit-identical double in every engine.
    """
    return dsir_weights(spread(table(spark, sf_dir, "documents"), "doc_id"))


_BIGRAMS_SQL = """
    SELECT doc_id, lang, gram FROM (
        SELECT doc_id, lang,
               unnest(CASE WHEN len(w) >= 2
                   THEN [array_to_string(w[i:i + 1], ' ')
                         FOR i IN range(1, len(w))]
                   ELSE [array_to_string(w, ' ')] END) AS gram
        FROM (SELECT doc_id, lang,
                     regexp_split_to_array(lower(text), '\\s+') AS w
              FROM documents)
    )
"""

ORACLE_DSIR_IMPORTANCE_WEIGHTS = f"""
WITH grams AS (
    SELECT doc_id, lang,
           {hash64_sql("gram")} % {DSIR_BUCKETS} AS bucket
    FROM ({_BIGRAMS_SQL})
),
raw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM grams GROUP BY bucket),
tgt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM grams
        WHERE lang = 'en' GROUP BY bucket),
totals AS (
    SELECT CAST(count(*) AS BIGINT) AS nr,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nt
    FROM grams
),
llr AS (
    SELECT r.bucket,
           CAST(round(ln(
               CAST((COALESCE(t.ct, 0) + 1) * (s.nr + {DSIR_BUCKETS}) AS DOUBLE)
               / CAST((r.cr + 1) * (s.nt + {DSIR_BUCKETS}) AS DOUBLE)
           ) * 1e6, 0) AS BIGINT) AS llr_micro
    FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN totals s
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(l.llr_micro) AS DOUBLE) / 1e6 AS total_llr,
       CAST(sum(l.llr_micro) AS DOUBLE)
           / (1e6 * CAST(count(*) AS DOUBLE)) AS avg_llr
FROM grams g JOIN llr l USING (bucket)
GROUP BY g.doc_id
"""


# --------------------------------------------------------------------------
# unigram_logprob_scores
# --------------------------------------------------------------------------


def unigram_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, mean_nll) — see q_unigram_logprob_scores."""
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = toks.agg(F.count("*").alias("n_total"))
    sur = (
        counts.crossJoin(F.broadcast(total))
        .select(
            "tok",
            F.round(
                F.log(F.col("n_total").cast("double") / F.col("c").cast("double"))
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("sur_micro"),
        )
    )
    return (
        toks.join(F.broadcast(sur), "tok")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("sur_micro").alias("_s"))
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("_s").cast("double")
                / (F.lit(1e6) * F.col("n_tokens").cast("double"))
            ).alias("mean_nll"),
        )
    )


def q_unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per-token surprisal under the corpus unigram LM.

    The CCNet-style quality proxy without an external model: frequent
    tokens are cheap, rare tokens expensive; each token's surprisal
    ``ln(N/count)`` is quantized once to integer micro-nats and the
    per-doc mean is an exact BIGINT sum divided once — order-free.
    The vocabulary frame broadcasts (it is the corpus's distinct
    tokens — bounded and tiny relative to the corpus).
    """
    return unigram_scores(spread(table(spark, sf_dir, "documents"), "doc_id"))


ORACLE_UNIGRAM_LOGPROB_SCORES = """
WITH toks AS (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
    FROM documents
),
counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
sur AS (
    SELECT tok,
           CAST(round(ln(CAST(t.n_total AS DOUBLE) / CAST(c.c AS DOUBLE))
                * 1e6, 0) AS BIGINT) AS sur_micro
    FROM counts c CROSS JOIN total t
)
SELECT k.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(s.sur_micro) AS DOUBLE)
           / (1e6 * CAST(count(*) AS DOUBLE)) AS mean_nll
FROM toks k JOIN sur s USING (tok)
GROUP BY k.doc_id
"""


# --------------------------------------------------------------------------
# importance_resample
# --------------------------------------------------------------------------


def q_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli resampling with P(keep) ∝ doc length.

    The keep decision is a pure integer comparison —
    ``(hash % 2^20) · max_chars < n_chars · 2^20`` — so the sample is
    bit-reproducible in any engine and restartable at any scale (no
    RNG state, no float threshold).  Expected kept fraction per doc =
    n_chars / max_chars.
    """
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    maxc = docs.agg(F.max("n_chars").alias("maxc"))
    u = hash64(F.col("doc_id").cast("string"), seed="resample") % RESAMPLE_SCALE
    return (
        docs.crossJoin(F.broadcast(maxc))
        .filter(
            u * F.col("maxc").cast("bigint")
            < F.col("n_chars").cast("bigint") * RESAMPLE_SCALE
        )
        .select("doc_id", "n_chars", "lang", "source")
    )


ORACLE_IMPORTANCE_RESAMPLE = f"""
WITH m AS (SELECT max(n_chars) AS maxc FROM documents)
SELECT doc_id, n_chars, lang, source
FROM documents CROSS JOIN m
WHERE ({hash64_sql("CAST(doc_id AS VARCHAR)", seed="resample")} % {RESAMPLE_SCALE})
      * CAST(maxc AS BIGINT)
      < CAST(n_chars AS BIGINT) * {RESAMPLE_SCALE}
"""


# --------------------------------------------------------------------------
# length_bucket_packing
# --------------------------------------------------------------------------


def q_length_bucket_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste accounting for power-of-two sequence buckets.

    Each doc lands in the smallest bucket whose capacity covers its
    token count; per bucket the fill ratio (= 1 − padding waste at
    batch size 1) is an exact integer ratio divided once.  The
    dataloader-efficiency metric sequence bucketing optimizes.
    """
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    n = F.size(tokens(F.col("text")))
    bucket = F.when(n <= LENGTH_BUCKETS[0], LENGTH_BUCKETS[0])
    for top in LENGTH_BUCKETS[1:]:
        bucket = bucket.when(n <= top, top)
    bucket = bucket.otherwise(LENGTH_BUCKETS[-1])
    return (
        docs.select(bucket.alias("bucket_top"), n.alias("_n"))
        .groupBy("bucket_top")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n").cast("bigint").alias("total_tokens"),
        )
        .select(
            "bucket_top",
            "n_docs",
            "total_tokens",
            (
                F.col("total_tokens").cast("double")
                / (F.col("n_docs") * F.col("bucket_top")).cast("double")
            ).alias("fill_ratio"),
        )
    )


_BUCKET_CASE = (
    f"CASE WHEN n <= {LENGTH_BUCKETS[0]} THEN {LENGTH_BUCKETS[0]} "
    + " ".join(
        f"WHEN n <= {top} THEN {top}" for top in LENGTH_BUCKETS[1:]
    )
    + f" ELSE {LENGTH_BUCKETS[-1]} END"
)

ORACLE_LENGTH_BUCKET_PACKING = f"""
WITH sized AS (
    SELECT len(regexp_split_to_array(lower(text), '\\s+')) AS n FROM documents
),
bucketed AS (SELECT {_BUCKET_CASE} AS bucket_top, n FROM sized)
SELECT CAST(bucket_top AS INT) AS bucket_top,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(sum(n) AS DOUBLE) / CAST(count(*) * bucket_top AS DOUBLE)
           AS fill_ratio
FROM bucketed
GROUP BY bucket_top
"""


# --------------------------------------------------------------------------
# corpus_shuffle_order
# --------------------------------------------------------------------------


def q_corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training order: shard + in-shard position.

    The engine-reproducible seeded shuffle: shard = keyed hash mod
    N_SHARDS (a single corpus-wide repartition-by-hash at scale);
    position = rank by an independent keyed hash within the shard.
    No RNG, no driver state — any engine reproduces the exact order,
    which is what makes checkpoint-resume and multi-epoch replays
    auditable.

    No spread(): the very next operator is the shard hash exchange,
    which redistributes regardless — a pre-repartition would be a
    second full shuffle of the corpus for nothing.
    """
    docs = table(spark, sf_dir, "documents")
    key = F.col("doc_id").cast("string")
    shard = (hash64(key, seed="shard") % N_SHARDS).cast("int")
    order = hash64(key, seed="order")
    w = Window.partitionBy("shard").orderBy(F.asc("_order"), F.asc("doc_id"))
    return (
        docs.select(
            "doc_id", shard.alias("shard"), order.alias("_order")
        )
        .withColumn("position", F.row_number().over(w))
        .select("doc_id", "shard", "position")
    )


_SHARD_SQL = f"{hash64_sql('CAST(doc_id AS VARCHAR)', seed='shard')} % {N_SHARDS}"
_ORDER_SQL = hash64_sql("CAST(doc_id AS VARCHAR)", seed="order")

ORACLE_CORPUS_SHUFFLE_ORDER = f"""
SELECT doc_id,
       CAST({_SHARD_SQL} AS INT) AS shard,
       CAST(row_number() OVER (
           PARTITION BY {_SHARD_SQL} ORDER BY {_ORDER_SQL}, doc_id
       ) AS INT) AS position
FROM documents
"""


QUERIES = {
    "bloom_decontaminate": q_bloom_decontaminate,
    "decontaminate_auto": q_decontaminate_auto,
    "dsir_importance_weights": q_dsir_importance_weights,
    "unigram_logprob_scores": q_unigram_logprob_scores,
    "importance_resample": q_importance_resample,
    "length_bucket_packing": q_length_bucket_packing,
    "corpus_shuffle_order": q_corpus_shuffle_order,
}

ORACLES = {
    "bloom_decontaminate": ORACLE_BLOOM_DECONTAMINATE,
    "decontaminate_auto": ORACLE_BLOOM_DECONTAMINATE,
    "dsir_importance_weights": ORACLE_DSIR_IMPORTANCE_WEIGHTS,
    "unigram_logprob_scores": ORACLE_UNIGRAM_LOGPROB_SCORES,
    "importance_resample": ORACLE_IMPORTANCE_RESAMPLE,
    "length_bucket_packing": ORACLE_LENGTH_BUCKET_PACKING,
    "corpus_shuffle_order": ORACLE_CORPUS_SHUFFLE_ORDER,
}
