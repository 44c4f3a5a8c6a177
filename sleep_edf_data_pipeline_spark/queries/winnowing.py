"""Winnowing fingerprints (MOSS) + fingerprint-overlap near-dups.

Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting" (SIGMOD 2003) — the rolling-hash fingerprint SAMPLER
behind MOSS: hash every K-word gram, slide a W-hash window, and keep
the minimum hash of each window (rightmost position on ties).  The
selected set is ~2/(W+1) of all grams yet carries a GUARANTEE the
whole-doc hash (``doc_fingerprints``) and random sampling lack: any
two documents sharing a word run of at least W+K-1 (= 8 here) words
share at least one selected fingerprint.  That makes the selected set
a lossless-at-threshold index for substring-level near-dup detection
at a fraction of ``duplicate_spans``'s full-gram shuffle width.

Engine-parity trick: "min hash, ties to the RIGHTMOST position" is a
composite argmin no single aggregate expresses the same way in Spark
and DuckDB, so both rank a single packed integer
``(gh % 2^39) * 2^20 + (2^20 - 1 - pos % 2^20)`` — min(key) IS (min
truncated hash, then max pos), bit-identical in both engines, and the
fingerprint hash unpacks with one integer div.  The position term is
MODULAR, so a doc beyond 2^20 grams wraps the tie-break cycle instead
of corrupting the packing: past the wrap, WHICH of several equal-hash
positions wins a tie changes (identically in both engines) but the
min-hash selection — and with it the guarantee — is untouched.

Scale shape: one shuffle on doc_id feeds both per-doc windows (the
W-frame min and the gram count share the partitioning); frames are
W-bounded rows, never corpus-sized.  The near-dup pass is the
standard bucket-join — group selected fingerprints by hash, drop
hashes in > MAXDF docs (the MOSS "too common → boilerplate" drop,
which is also the skew guard: no fingerprint bucket can exceed MAXDF
rows, so the self-join is output-bounded, no all-pairs blowup), then
count shared fingerprints per pair.

Reference parity: no fingerprint surface exists in the reference
(2,184-LoC dbt/DuckDB sleep pipeline); extends SURVEY §2.7's dedup
family between ``doc_fingerprints`` (whole-doc hash, position-blind)
and ``duplicate_spans`` (every gram shuffled, position-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..operators.dedup import tokens, word_shingles
from ..tables import spread, table

#: Gram width (words) and winnow window (grams): guarantee threshold
#: is WINNOW_W + WINNOW_K - 1 = 8 shared words.
WINNOW_K = 4
WINNOW_W = 5

#: Packed-key radix: key = (gh % HMOD) * POSCAP + (POSCAP - pos).
#: Max key = 2^59 + 2^20 — comfortably inside a signed int64 in both
#: engines.
POSCAP = 2**20
HMOD = 2**39

#: MOSS common-fingerprint drop: a fingerprint in more than MAXDF
#: docs is boilerplate, not a near-dup signal — and the cap bounds
#: every self-join bucket at MAXDF rows (skew guard).
MAXDF = 64


def selected_from(docs: DataFrame, *extra_cols: str) -> DataFrame:
    """Distinct winnowed fingerprints of a (doc_id, text, ...) frame:
    (doc_id, n_grams, minkey) plus any per-doc-constant ``extra_cols``
    carried through (e.g. ``source`` for the per-source rollup)."""
    grams = (
        docs.select("doc_id", *extra_cols, tokens(F.col("text")).alias("w"))
        .select(
            "doc_id",
            *extra_cols,
            F.posexplode(word_shingles(F.col("w"), WINNOW_K)).alias(
                "pos0", "gram"
            ),
        )
        .select(
            "doc_id",
            *extra_cols,
            (F.col("pos0") + 1).alias("pos"),
            hash64(F.col("gram"), seed="winnow").alias("gh"),
        )
    )
    w_doc = Window.partitionBy("doc_id")
    w_win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), 0)
    )
    keyed = grams.select(
        "doc_id",
        *extra_cols,
        "pos",
        (
            (F.col("gh") % F.lit(HMOD)) * F.lit(POSCAP)
            + (F.lit(POSCAP - 1) - F.col("pos") % F.lit(POSCAP))
        ).alias("key"),
    ).withColumn("n_grams", F.count("*").over(w_doc))
    # Full windows end at pos in [W, n_grams]; a doc with fewer than W
    # grams gets the single all-gram window ending at its last pos.
    return (
        keyed.withColumn("minkey", F.min("key").over(w_win))
        .filter(F.col("pos") >= F.least(F.lit(WINNOW_W), F.col("n_grams")))
        .select("doc_id", *extra_cols, "n_grams", "minkey")
        .distinct()
    )


def _selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct winnowed fingerprints: (doc_id, n_grams, minkey)."""
    return selected_from(spread(table(spark, sf_dir, "documents"), "doc_id"))


def winnowing_partials(docs: DataFrame) -> DataFrame:
    """Per-source ALGEBRAIC partial sums of the per-doc winnowing
    profile — the shared kernel of ``q_winnowing_source_stats`` and
    the streaming monitor.  Winnowing is doc-local, so as long as
    documents arrive whole these sums merge by plain addition over any
    batching: one row per source with BIGINT n_docs / n_grams /
    n_windows / n_fingerprints."""
    per_doc = (
        selected_from(docs, "source")
        .groupBy("doc_id", "source", "n_grams")
        .agg(F.countDistinct("minkey").alias("n_fp"))
    )
    n_windows = F.greatest(F.col("n_grams") - F.lit(WINNOW_W - 1), F.lit(1))
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_grams").cast("bigint").alias("n_grams"),
        F.sum(n_windows).cast("bigint").alias("n_windows"),
        F.sum("n_fp").cast("bigint").alias("n_fingerprints"),
    )


def stats_from_partials(grid: DataFrame) -> DataFrame:
    """Presentation tail over the per-source partial sums (shared by
    the batch query and the streaming monitor's answer path)."""
    return grid.select(
        "source",
        "n_docs",
        "n_grams",
        "n_windows",
        "n_fingerprints",
        # single BIGINT/BIGINT divisions, unrounded (verify gotcha)
        (F.col("n_fingerprints").cast("double") / F.col("n_windows")).alias(
            "density"
        ),
        (F.col("n_fingerprints").cast("double") / F.col("n_docs")).alias(
            "fp_per_doc"
        ),
    )


def q_winnowing_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source winnowing fingerprint profile (index-sizing table).

    The corpus-level rollup of ``winnowing_fingerprints``: how many
    fingerprints a source contributes to the near-dup index and its
    selection density (≈ 2/(W+1) on healthy text; materially lower =
    repetitive/boilerplate-heavy source).  Same single corpus pass as
    the per-doc form plus one source-grain hash agg.
    """
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    return stats_from_partials(winnowing_partials(docs.select("doc_id", "source", "text")))


def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc winnowed-fingerprint counts + selection density.

    Density should hover near the paper's expected 2/(W+1) = 0.333;
    a doc near 1.0 has no repeated structure, near 1/W is highly
    repetitive — a quality signal for free.
    """
    sel = _selected(spark, sf_dir)
    n_windows = F.greatest(
        F.col("n_grams") - F.lit(WINNOW_W - 1), F.lit(1)
    ).cast("int")
    return (
        sel.groupBy("doc_id", "n_grams")
        .agg(F.countDistinct("minkey").cast("bigint").alias("n_fingerprints"))
        .select(
            "doc_id",
            F.col("n_grams").cast("int").alias("n_grams"),
            n_windows.alias("n_windows"),
            "n_fingerprints",
            # single BIGINT/INT division, emitted unrounded: identical
            # integers divided once are bit-identical across engines,
            # while round(x, 6) can land on a half-tie (e.g. odd/640)
            # the two engines resolve differently (see verify skill).
            (F.col("n_fingerprints").cast("double") / n_windows).alias(
                "density"
            ),
        )
    )


def q_winnowing_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc pairs sharing >= 2 winnowed fingerprints (MOSS match step).

    By the winnowing guarantee the candidate set covers every pair
    sharing two disjoint 8-word runs; fingerprints in > MAXDF docs
    are dropped as boilerplate before pairing.

    Join-free single pass: the per-hash doc count is a window over the
    fp_hash partition (not a count-filter-join, which would consume —
    and recompute — the winnow subtree twice), and pairs explode from
    a per-hash sorted doc list whose width the MAXDF filter bounds
    BEFORE collect_set runs, so no aggregation buffer can exceed MAXDF
    elements even on boilerplate-heavy corpora.  The fp_hash window
    and the fp_hash groupBy share one exchange.
    """
    fps = (
        _selected(spark, sf_dir)
        .select("doc_id", F.expr(f"minkey div {POSCAP}").alias("fp_hash"))
        .distinct()
    )
    w_hash = Window.partitionBy("fp_hash")
    lists = (
        fps.withColumn("_nd", F.count("*").over(w_hash))
        .filter((F.col("_nd") >= 2) & (F.col("_nd") <= MAXDF))
        .groupBy("fp_hash")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("_ds"))
    )
    left = lists.select(
        "_ds", F.posexplode("_ds").alias("_i", "doc_a")
    )
    pairs = left.select(
        "doc_a",
        F.explode(
            F.slice("_ds", F.col("_i") + 2, F.size("_ds"))
        ).alias("doc_b"),
    )
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


_GRAMS_SQL = f"""
toks AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
    FROM documents
),
grams AS (
    SELECT doc_id, u['p'] AS pos,
           {hash64_sql("u['g']", seed="winnow")} AS gh
    FROM (
        SELECT doc_id,
               unnest(CASE WHEN len(w) >= {WINNOW_K} THEN
                   [{{'p': CAST(i AS BIGINT),
                      'g': array_to_string(w[i:i + {WINNOW_K - 1}], ' ')}}
                    FOR i IN range(1, len(w) - {WINNOW_K} + 2)]
               ELSE
                   [{{'p': CAST(1 AS BIGINT),
                      'g': array_to_string(w, ' ')}}]
               END) AS u
        FROM toks
    )
),
keyed AS (
    SELECT doc_id, pos,
           (gh % {HMOD}) * {POSCAP} + ({POSCAP - 1} - pos % {POSCAP}) AS key,
           count(*) OVER (PARTITION BY doc_id) AS n_grams
    FROM grams
),
sel AS (
    SELECT DISTINCT doc_id, n_grams, minkey FROM (
        SELECT doc_id, pos, n_grams,
               min(key) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW
               ) AS minkey
        FROM keyed
    )
    WHERE pos >= least({WINNOW_W}, n_grams)
)
"""

ORACLE_WINNOWING_FINGERPRINTS = f"""
WITH {_GRAMS_SQL}
SELECT doc_id,
       CAST(n_grams AS INT) AS n_grams,
       CAST(greatest(n_grams - {WINNOW_W - 1}, 1) AS INT) AS n_windows,
       CAST(count(DISTINCT minkey) AS BIGINT) AS n_fingerprints,
       CAST(count(DISTINCT minkey) AS DOUBLE)
           / greatest(n_grams - {WINNOW_W - 1}, 1) AS density
FROM sel
GROUP BY doc_id, n_grams
"""

ORACLE_WINNOWING_NEARDUPS = f"""
WITH {_GRAMS_SQL},
fps AS (
    SELECT DISTINCT doc_id, minkey // {POSCAP} AS fp_hash FROM sel
),
eligible AS (
    SELECT fp_hash FROM fps
    GROUP BY fp_hash
    HAVING count(DISTINCT doc_id) BETWEEN 2 AND {MAXDF}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fps a
JOIN eligible USING (fp_hash)
JOIN fps b USING (fp_hash)
WHERE a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
HAVING count(*) >= 2
"""

ORACLE_WINNOWING_SOURCE_STATS = f"""
WITH {_GRAMS_SQL},
per_doc AS (
    SELECT s.doc_id, d.source, s.n_grams,
           count(DISTINCT s.minkey) AS n_fp
    FROM sel s JOIN documents d USING (doc_id)
    GROUP BY s.doc_id, d.source, s.n_grams
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_grams) AS BIGINT) AS n_grams,
       CAST(sum(greatest(n_grams - {WINNOW_W - 1}, 1)) AS BIGINT)
           AS n_windows,
       CAST(sum(n_fp) AS BIGINT) AS n_fingerprints,
       CAST(sum(n_fp) AS DOUBLE)
           / CAST(sum(greatest(n_grams - {WINNOW_W - 1}, 1)) AS BIGINT)
           AS density,
       CAST(sum(n_fp) AS DOUBLE) / CAST(count(*) AS BIGINT) AS fp_per_doc
FROM per_doc
GROUP BY source
"""

QUERIES = {
    "winnowing_fingerprints": q_winnowing_fingerprints,
    "winnowing_neardups": q_winnowing_neardups,
    "winnowing_source_stats": q_winnowing_source_stats,
}

ORACLES = {
    "winnowing_fingerprints": ORACLE_WINNOWING_FINGERPRINTS,
    "winnowing_neardups": ORACLE_WINNOWING_NEARDUPS,
    "winnowing_source_stats": ORACLE_WINNOWING_SOURCE_STATS,
}
