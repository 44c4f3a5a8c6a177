"""Round-9: WordPiece-style greedy longest-match-first subword encode.

The tokenizer family so far is merge-based: ``bpe_merge_pairs`` trains
BPE, ``bpe_encode_stats``/``bpe_encode_sample`` apply the merge table.
This adds the OTHER industrial subword-inference algorithm — greedy
maximal munch (WordPiece inference, Devlin et al. 2019; the linear-time
formulation is Song et al. 2021 "Fast WordPiece Tokenization"): at each
position take the LONGEST vocabulary piece that matches, never
revisiting.  Simplifications kept deterministic and engine-portable:
no ``##`` continuation marker (SentencePiece-style flat vocabulary) and
a single-character fallback (the byte-fallback analog), so every word
always segments and there is no UNK path.

Vocabulary: the top ``WP_PIECES`` character n-grams (lengths 2..4) of
the corpus words by (count DESC, gram ASC) — a deterministic total
order, so both engines derive the identical vocabulary.  Training is a
gram-explode + hash-groupBy + ``TakeOrdered`` (top-K never sorts the
full gram table); the collected vocabulary (≤ a few KB) folds into the
encode projection as per-length literal arrays.

Encode: ONE fold per word over its character positions
(``F.aggregate`` with a (pos, n_pieces) struct — the JVM higher-order
path, no Python).  Each step either skips (position already consumed)
or advances by the longest matching piece (4 → 3 → 2 → 1-char
fallback).  The DuckDB oracle replays the identical fold with
``list_reduce`` over the identical SQL-derived vocabulary, so the
match is bit-exact including the greedy tie behavior.

Scale shape (100 TB): two corpus passes (train the vocabulary, apply
it) — the tokenizer-train/apply lifecycle ``bpe_encode_stats`` already
established; both are scan + map-side-combinable aggregations, the
apply side shuffles only the per-source partials.  No joins, no
windows, no per-row Python.

Reference scope: no tokenizer surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.7's
tokenizer family per the build brief's text-analysis mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import tokens
from ..tables import spread, table

#: Vocabulary size (multi-char pieces; single chars are the implicit
#: fallback tier).  120 keeps the oracle's per-step list_contains cheap
#: while giving the greedy matcher real length-4/3/2 competition.
WP_PIECES = 120

#: Piece lengths considered (longest first at match time).
WP_LENS = (4, 3, 2)


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), "doc_id").select(
        "source", "text"
    )
    return docs.select(
        "source",
        F.explode(
            F.filter(tokens(F.col("text")), lambda x: x != F.lit(""))
        ).alias("w"),
    )


def train_wordpiece_vocab(words: DataFrame) -> list[str]:
    """Top-``WP_PIECES`` character n-grams (lengths 2..4) of the word
    stream by (count DESC, gram ASC).

    The gram explode is linear in corpus characters; the groupBy
    combines map-side; the top-K is a ``TakeOrdered`` (limit after
    orderBy), so nothing global ever sorts.  Ties cannot occur — the
    gram string disambiguates — so the vocabulary is a deterministic
    function of the corpus.
    """
    w = F.col("w")
    per_len = [
        F.when(
            F.length(w) >= L,
            F.transform(
                F.sequence(F.lit(1), F.length(w) - L + 1),
                # closure factory: a 1-arg lambda, so Spark never
                # passes the array index (verify-skill gotcha)
                (lambda ll: lambda j: w.substr(j, F.lit(ll)))(L),
            ),
        ).otherwise(F.array().cast("array<string>"))
        for L in WP_LENS
    ]
    grams = words.select(F.explode(F.flatten(F.array(*per_len))).alias("g"))
    top = (
        grams.groupBy("g")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("g"))
        .limit(WP_PIECES)
        .collect()
    )
    return [r["g"] for r in top]


def _encode_state(vocab: list[str]) -> Column:
    """The greedy fold: (pos, np) over the word's character positions,
    vocabulary folded to per-length literal arrays."""
    by_len = {
        L: [g for g in vocab if len(g) == L] for L in WP_LENS
    }
    lits = {
        L: (
            F.array(*[F.lit(g) for g in gs])
            if gs
            else F.array().cast("array<string>")
        )
        for L, gs in by_len.items()
    }
    w = F.col("w")
    init = F.struct(
        F.lit(1).cast("int").alias("pos"), F.lit(0).cast("int").alias("np")
    )

    def step(acc: Column, i: Column) -> Column:
        pos = acc.getField("pos")
        np = acc.getField("np")

        def adv(l: int) -> Column:
            return F.struct(
                (pos + F.lit(l)).cast("int").alias("pos"),
                (np + F.lit(1)).cast("int").alias("np"),
            )

        out = F.when(i < pos, acc)
        for L in WP_LENS:
            out = out.when(
                F.array_contains(lits[L], w.substr(pos, F.lit(L))), adv(L)
            )
        return out.otherwise(adv(1))

    return F.aggregate(F.sequence(F.lit(1), F.length(w)), init, step)


def encode_stats_from_pieces(
    words: DataFrame, vocab: list[str]
) -> DataFrame:
    """The pure APPLY stage: per-source greedy-encode statistics under
    an externally supplied piece list — shared by the monolithic query
    below and the persisted-artifact roundtrip
    (queries/tokenizer_roundtrip.py), whose value-hash equality proves
    the artifact carried the vocabulary losslessly.  The per-length
    membership arrays are order-insensitive, so the caller's piece
    order is irrelevant."""
    st = _encode_state(vocab)
    per_word = words.select(
        "source",
        st.getField("np").cast("bigint").alias("np"),
        F.length("w").cast("bigint").alias("nc"),
    )
    return per_word.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum("np").cast("bigint").alias("n_pieces"),
        F.sum(F.when(F.col("np") == 1, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("single_piece_words"),
        F.sum("nc").cast("bigint").alias("n_chars"),
        F.round(F.sum("np").cast("double") / F.count("*"), 6).alias(
            "avg_pieces_per_word"
        ),
        F.round(F.sum("nc").cast("double") / F.sum("np"), 6).alias(
            "avg_chars_per_piece"
        ),
    )


def q_wordpiece_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _words(spark, sf_dir)
    vocab = train_wordpiece_vocab(words)
    return encode_stats_from_pieces(words, vocab)


_LENS_SQL = ", ".join(str(L) for L in WP_LENS)

# NOTE: the encode fold is replayed as a recursive-CTE walk over
# per-position advance widths (encoding each DISTINCT word once) —
# DuckDB 1.0 mis-binds lambda references to CROSS JOINed columns, so a
# list_reduce over a joined vocabulary silently matches wrong pieces;
# the recursive form avoids lambdas entirely (the bpe_encode_sample
# oracle precedent) and is semantically the same greedy maximal munch.
ORACLE_WORDPIECE_ENCODE_STATS = f"""
WITH RECURSIVE words AS (
    SELECT source, t.x AS w
    FROM documents,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x != '')) AS t(x)
),
grams AS (
    SELECT substr(w, CAST(o.j AS INT), CAST(ll.L AS INT)) AS g
    FROM words,
         unnest([{_LENS_SQL}]) AS ll(L),
         unnest(range(1, greatest(len(w) - ll.L + 1, 0) + 1)) AS o(j)
),
vocab AS (
    SELECT g FROM (SELECT g, count(*) AS c FROM grams GROUP BY g)
    QUALIFY row_number() OVER (ORDER BY c DESC, g ASC) <= {WP_PIECES}
),
dwords AS (
    SELECT DISTINCT w FROM words
),
positions AS (
    SELECT dw.w, CAST(o.j AS INT) AS pos,
        CASE
            WHEN substr(dw.w, CAST(o.j AS INT), 4) IN
                 (SELECT g FROM vocab WHERE len(g) = 4) THEN 4
            WHEN substr(dw.w, CAST(o.j AS INT), 3) IN
                 (SELECT g FROM vocab WHERE len(g) = 3) THEN 3
            WHEN substr(dw.w, CAST(o.j AS INT), 2) IN
                 (SELECT g FROM vocab WHERE len(g) = 2) THEN 2
            ELSE 1 END AS adv
    FROM dwords dw, unnest(range(1, len(dw.w) + 1)) AS o(j)
),
walk AS (
    SELECT w, CAST(1 AS INT) AS pos, CAST(0 AS INT) AS np FROM dwords
    UNION ALL
    SELECT r.w, CAST(r.pos + p.adv AS INT), CAST(r.np + 1 AS INT)
    FROM walk r JOIN positions p ON p.w = r.w AND p.pos = r.pos
),
enc0 AS (
    SELECT w, max(np) AS np FROM walk GROUP BY w
),
enc AS (
    SELECT words.source, enc0.np, len(words.w) AS nc
    FROM words JOIN enc0 ON enc0.w = words.w
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(np) AS BIGINT) AS n_pieces,
       CAST(sum(CASE WHEN np = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS single_piece_words,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       round(CAST(sum(np) AS DOUBLE) / count(*), 6) AS avg_pieces_per_word,
       round(CAST(sum(nc) AS DOUBLE) / sum(np), 6) AS avg_chars_per_piece
FROM enc GROUP BY source
"""


QUERIES = {
    "wordpiece_encode_stats": q_wordpiece_encode_stats,
}

ORACLES = {
    "wordpiece_encode_stats": ORACLE_WORDPIECE_ENCODE_STATS,
}
