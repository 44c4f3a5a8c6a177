"""Corpus quality filtering and n-gram statistics over the documents table.

The filter battery a production LLM-training pipeline runs before
tokenization — Gopher-style rule flags, canonical-survivor exact dedup,
bigram language statistics, length histograms, stopword profiles — each
as pure Catalyst built-ins (split/explode/aggregate), no Python in any
plan.  Complements queries/text_queries.py (language ID, quality
scores, fingerprints) and queries/dedup_queries.py (near-dup families):
those *measure*; these *decide and filter*.

All ratio outputs are round(·, 6) on exact operands (decimal or bigint
sums ÷ counts) so the driver's hash gate is bit-stable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import spread, table

#: Gopher-style rule thresholds (Rae et al. 2021, arXiv:2112.11446 —
#: adapted to the synthetic corpus's scale).
MIN_TOKENS = 30
MAX_TOKENS = 100_000
MIN_MEAN_TOK_LEN = 2.0
MAX_MEAN_TOK_LEN = 12.0
STOPWORDS = ("the", "a", "of", "to", "and", "in")


def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rule flags + overall pass/fail.

    One projection, zero shuffles: every rule is a scalar expression
    over the token array.  The `passes` column is what a 100 TB filter
    job would push into the parquet scan of the next stage.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    # Mean token length over the original text: exact bigint arithmetic
    # (total chars minus separators) ÷ token count, rounded once.
    sep_chars = n_tokens - 1
    tok_chars = F.length(F.col("text")) - sep_chars
    mean_tok_len = F.round(
        tok_chars.cast("double") / n_tokens.cast("double"), 6
    )
    stop_hits = F.size(F.array_intersect(toks, F.array(*map(F.lit, STOPWORDS))))
    ok_len = (n_tokens >= MIN_TOKENS) & (n_tokens <= MAX_TOKENS)
    ok_tok = (mean_tok_len >= MIN_MEAN_TOK_LEN) & (mean_tok_len <= MAX_MEAN_TOK_LEN)
    ok_stop = stop_hits >= 1
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.cast("int").alias("n_tokens"),
        mean_tok_len.alias("mean_tok_len"),
        stop_hits.cast("int").alias("n_stopword_kinds"),
        ok_len.alias("ok_length"),
        ok_tok.alias("ok_token_shape"),
        ok_stop.alias("ok_stopwords"),
        (ok_len & ok_tok & ok_stop).alias("passes"),
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

ORACLE_GOPHER_QUALITY_FLAGS = f"""
WITH base AS (
    SELECT doc_id, lang,
           string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars
    FROM documents
),
feat AS (
    SELECT doc_id, lang,
           CAST(n_tokens AS INT) AS n_tokens,
           round(CAST(n_chars - (n_tokens - 1) AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE), 6) AS mean_tok_len,
           CAST(len(list_intersect(toks, [{_STOP_SQL}])) AS INT)
               AS n_stopword_kinds
    FROM base
)
SELECT doc_id, lang, n_tokens, mean_tok_len, n_stopword_kinds,
       (n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS}) AS ok_length,
       (mean_tok_len >= {MIN_MEAN_TOK_LEN} AND mean_tok_len <= {MAX_MEAN_TOK_LEN})
           AS ok_token_shape,
       (n_stopword_kinds >= 1) AS ok_stopwords,
       ((n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS})
        AND (mean_tok_len >= {MIN_MEAN_TOK_LEN} AND mean_tok_len <= {MAX_MEAN_TOK_LEN})
        AND n_stopword_kinds >= 1) AS passes
FROM feat
"""


def q_dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup removal keeping the lowest doc_id per content hash.

    The *filter* counterpart of dedup_queries.q_dedup_exact (which
    reports groups): one shuffle on md5(text), survivors picked by
    row_number — per-group state never leaves the executor.
    """
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("content_hash").orderBy(F.asc("doc_id"))
    return (
        docs.withColumn("content_hash", F.md5(F.col("text")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "content_hash")
    )


ORACLE_DEDUP_CANONICAL_DOCS = """
SELECT doc_id, lang, source, content_hash FROM (
    SELECT doc_id, lang, source, md5(text) AS content_hash,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
    FROM documents
) WHERE rn = 1
"""


def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word bigrams per language (count DESC, bigram ASC).

    Bigrams via transform over an index sequence (codegen, no Python),
    one explode, one map-side-combining count, top-k per language by
    window rank — the exact heavy-hitters path; swap in the count-min
    sketch only when the bigram key space stops fitting the shuffle.
    """
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split(F.col("text"), " ")
    idx = F.sequence(F.lit(0), F.size(toks) - 2)
    bigrams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1))
    )
    counted = (
        docs.filter(F.size(toks) >= 2)
        .select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
        .select("lang", "bigram", "n", "rank")
    )


ORACLE_BIGRAM_COUNTS = """
WITH toks AS (
    SELECT lang, string_split(text, ' ') AS arr FROM documents
    WHERE len(string_split(text, ' ')) >= 2
),
pairs AS (
    SELECT lang, arr[i] || ' ' || arr[i + 1] AS bigram
    FROM toks, UNNEST(range(1, len(arr))) AS t(i)
),
counted AS (
    SELECT lang, bigram, count(*) AS n FROM pairs GROUP BY lang, bigram
)
SELECT lang, bigram, n, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY lang ORDER BY n DESC, bigram ASC) AS INT) AS rank
    FROM counted
) WHERE rank <= 20
"""


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram: 100-char buckets (capped), per source.

    The size-profile every ingestion run reports; a single map-side-
    combining aggregate on a computed key.
    """
    docs = table(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 100), F.lit(19)).cast("int")
    return (
        docs.groupBy("source", bucket.alias("len_bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


ORACLE_LENGTH_HISTOGRAM = """
SELECT source,
       CAST(least(floor(n_chars / 100), 19) AS INT) AS len_bucket,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents
GROUP BY source, least(floor(n_chars / 100), 19)
"""


def q_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level stopword share per language.

    Token-level explode → two exact bigint counts per language; the
    ratio divides once at the end.  The explode is the honest cost: at
    100 TB this is the same shape as tokenizer throughput accounting.
    """
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    toks = F.explode(F.split(F.col("text"), " ")).alias("tok")
    flat = docs.select("lang", toks)
    is_stop = F.col("tok").isin(*STOPWORDS)
    return flat.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.sum(is_stop.cast("bigint")).alias("n_stop_tokens"),
        F.round(
            F.sum(is_stop.cast("bigint")).cast("double") / F.count("*"), 6
        ).alias("stop_ratio"),
    )


ORACLE_STOPWORD_PROFILE = f"""
WITH flat AS (
    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT lang,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN tok IN ({_STOP_SQL}) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stop_tokens,
       round(CAST(sum(CASE WHEN tok IN ({_STOP_SQL}) THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS stop_ratio
FROM flat
GROUP BY lang
"""


def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF probe against brute-force ground truth.

    The engine evaluating its own index: both top-k sets come from the
    registered similarity queries, joined on (query, neighbor); recall
    is an exact count ratio per query.  Cheap by construction — k·Q
    rows on either side.
    """
    from .similarity_queries import TOP_K, q_cosine_topk_bruteforce, q_cosine_topk_ivf

    exact = q_cosine_topk_bruteforce(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("exact_neighbor")
    )
    approx = q_cosine_topk_ivf(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("ivf_neighbor")
    )
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (F.col("exact_neighbor") == F.col("ivf_neighbor")),
        "left",
    ).select(exact.query_id, F.col("ivf_neighbor").isNotNull().alias("hit"))
    return hits.groupBy("query_id").agg(
        F.count("*").cast("int").alias("k"),
        F.sum(F.col("hit").cast("bigint")).alias("n_hits"),
        F.round(
            F.sum(F.col("hit").cast("bigint")).cast("double") / F.lit(TOP_K), 6
        ).alias("recall"),
    )


def _topk_cte(block_join: str) -> str:
    from .similarity_queries import (
        _DOT,
        _NORM_A,
        _NORM_B,
        N_QUERIES,
        TOP_K,
    )

    return f"""
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY round({_DOT} / nullif({_NORM_A} * {_NORM_B}, 0), 6)
                       DESC, b.vec_id ASC
               ) AS INT) AS rank
        FROM embeddings a JOIN embeddings b
          ON {block_join} a.vec_id != b.vec_id
        WHERE a.vec_id < {N_QUERIES}
    ) WHERE rank <= {TOP_K}
"""


def _ann_recall_oracle() -> str:
    from .similarity_queries import TOP_K

    return f"""
WITH exact AS ({_topk_cte("")}),
ivf AS ({_topk_cte("a.label = b.label AND")})
SELECT e.query_id,
       CAST(count(*) AS INT) AS k,
       CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       round(CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / {TOP_K}, 6) AS recall
FROM exact e
LEFT JOIN ivf i
  ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
GROUP BY e.query_id
"""


QUERIES = {
    "gopher_quality_flags": q_gopher_quality_flags,
    "dedup_canonical_docs": q_dedup_canonical_docs,
    "bigram_counts": q_bigram_counts,
    "length_histogram": q_length_histogram,
    "stopword_profile": q_stopword_profile,
    "ann_recall_eval": q_ann_recall_eval,
}

ORACLES = {
    "gopher_quality_flags": ORACLE_GOPHER_QUALITY_FLAGS,
    "dedup_canonical_docs": ORACLE_DEDUP_CANONICAL_DOCS,
    "bigram_counts": ORACLE_BIGRAM_COUNTS,
    "length_histogram": ORACLE_LENGTH_HISTOGRAM,
    "stopword_profile": ORACLE_STOPWORD_PROFILE,
    "ann_recall_eval": _ann_recall_oracle(),
}


def q_regex_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex pre-tokenization stats per document.

    The GPT-2-style pre-tokenizer split (letter runs | digit runs |
    single non-alnum), reduced to the regex subset Java and RE2 share,
    via ``regexp_extract_all`` — the whitespace tokenizer's sibling
    (text_queries.q_token_stats) for corpora where punctuation and
    numerals matter.  Pure codegen projection + one aggregate-free
    select; zero shuffles.
    """
    docs = table(spark, sf_dir, "documents")
    arr = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    n_word = F.size(F.filter(arr, lambda x: x.rlike("^[a-z]+$")))
    n_num = F.size(F.filter(arr, lambda x: x.rlike("^[0-9]+$")))
    return docs.select(
        "doc_id",
        F.size(arr).cast("int").alias("n_bpe_tokens"),
        n_word.cast("int").alias("n_word_tokens"),
        n_num.cast("int").alias("n_number_tokens"),
        (F.size(arr) - n_word - n_num).cast("int").alias("n_punct_tokens"),
    )


ORACLE_REGEX_TOKEN_STATS = r"""
WITH t AS (
    SELECT doc_id,
           regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]') AS arr
    FROM documents
)
SELECT doc_id,
       CAST(len(arr) AS INT) AS n_bpe_tokens,
       CAST(len(list_filter(arr, x -> regexp_matches(x, '^[a-z]+$'))) AS INT)
           AS n_word_tokens,
       CAST(len(list_filter(arr, x -> regexp_matches(x, '^[0-9]+$'))) AS INT)
           AS n_number_tokens,
       CAST(len(arr)
            - len(list_filter(arr, x -> regexp_matches(x, '^[a-z]+$')))
            - len(list_filter(arr, x -> regexp_matches(x, '^[0-9]+$'))) AS INT)
           AS n_punct_tokens
FROM t
"""


def q_deterministic_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-domain downsampling with a content-addressed coin flip.

    Per-source keep-rates (the over-represented source keeps 10%),
    decided by ``md5(doc_id)`` bucket — reproducible across engines,
    runs and partitionings, unlike ``sample()``/``TABLESAMPLE`` RNG.
    This is how a 100 TB pipeline downsamples once and gets the same
    corpus forever; the whole decision is a shuffle-free projection,
    aggregated here per source for the report.
    """
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ds"))), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = F.when(F.col("source") == "src0", 10).otherwise(50)
    kept = (bucket < rate).cast("bigint")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(kept).alias("n_sampled"),
        F.round(F.sum(kept).cast("double") / F.count("*"), 6).alias("sample_rate"),
    )


ORACLE_DETERMINISTIC_DOWNSAMPLE = """
WITH flags AS (
    SELECT source,
           CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ds'), 1, 8)
                          AS BIGINT) % 100
                     < (CASE WHEN source = 'src0' THEN 10 ELSE 50 END)
                THEN 1 ELSE 0 END AS kept
    FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(kept) AS BIGINT) AS n_sampled,
       round(CAST(sum(kept) AS DOUBLE) / count(*), 6) AS sample_rate
FROM flags
GROUP BY source
"""


def q_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy context-window packing of chunks into 2048-token bins.

    The concat-then-cut packing every pre-training run applies after
    chunking: within a shard (source), chunks are laid out in stable
    (doc_id, chunk_idx) order and a running token count assigns each
    chunk to ``floor(tokens_before / 2048)``.  One shuffle (partition
    by shard) and a running-sum window — per-shard sequentiality is
    the real-world contract, so shard count bounds parallelism, not
    corpus size.
    """
    from .corpus_prep import q_document_chunks

    chunks = q_document_chunks(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    w = (
        Window.partitionBy("source")
        .orderBy(F.asc("doc_id"), F.asc("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum("n_tokens").over(w)
    return (
        chunks.join(F.broadcast(docs), "doc_id")
        .withColumn(
            "bin_id",
            F.floor((running - F.col("n_tokens")) / F.lit(2048)).cast("int"),
        )
        .select("source", "doc_id", "chunk_idx", "n_tokens", "bin_id")
    )


def _context_packing_oracle() -> str:
    from .corpus_prep import ORACLE_DOCUMENT_CHUNKS

    return f"""
WITH chunks AS ({ORACLE_DOCUMENT_CHUNKS}),
joined AS (
    SELECT d.source, c.doc_id, c.chunk_idx, c.n_tokens
    FROM chunks c JOIN documents d ON c.doc_id = d.doc_id
)
SELECT source, doc_id, chunk_idx, n_tokens,
       CAST(floor((sum(n_tokens) OVER (
                PARTITION BY source
                ORDER BY doc_id ASC, chunk_idx ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) - n_tokens) / 2048) AS INT) AS bin_id
FROM joined
"""


QUERIES["regex_token_stats"] = q_regex_token_stats
QUERIES["deterministic_downsample"] = q_deterministic_downsample
QUERIES["context_packing"] = q_context_packing
ORACLES["regex_token_stats"] = ORACLE_REGEX_TOKEN_STATS
ORACLES["deterministic_downsample"] = ORACLE_DETERMINISTIC_DOWNSAMPLE
ORACLES["context_packing"] = _context_packing_oracle()
