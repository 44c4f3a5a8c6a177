"""Round-9: composed corpus keep/drop verdict (the C4/Gopher filter report).

Every published corpus build (C4, Gopher/MassiveText, RefinedWeb,
Dolma) ends its filter cascade with one per-document verdict row:
keep or drop, and WHY — the artifact operators actually audit when a
source's yield collapses.  The registry had every individual signal
(quality rules, exact dedup, line-level boilerplate) but not the
composed verdict; this query is the composition, exercising the
engine's ability to run several corpus passes and reconcile them at
the document grain.

Signals composed (each already oracle-verified standalone):

- ``ok_quality``  — the Gopher rule conjunction
  (``corpus_filters.q_gopher_quality_flags``'s ``passes``);
- ``is_exact_dup`` — not the canonical survivor of the md5 content
  group (lowest doc_id wins, the registry-wide survivor convention);
- ``is_boilerplate`` — more than half the document's lines are
  cross-document duplicate lines (``line_dedup.q_line_dedup_stats``;
  the threshold compare is EXACT integer math: 2·n_removed > n_lines,
  no float ratio anywhere).

``reason`` is the standard bitmask (1=quality, 2=duplicate,
4=boilerplate); ``keep`` ⇔ reason == 0.

Scale shape (100 TB): three corpus passes (a pure projection, a
content-hash window, the line-dedup pass) — each is the signal's
algorithmic floor and prunes to different columns, so caching a
fact-wide frame would lose (corpus-pass-audit posture); the
reconciliation joins are at the reduced document grain, co-keyed on
doc_id.  The oracle nests the standalone oracles as CTEs, so the
composition can never drift from the parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table
from .corpus_filters import ORACLE_GOPHER_QUALITY_FLAGS, q_gopher_quality_flags
from .line_dedup import ORACLE_LINE_DEDUP_STATS, q_line_dedup_stats


def q_corpus_keep_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    quality = q_gopher_quality_flags(spark, sf_dir).select(
        "doc_id", F.col("passes").alias("ok_quality")
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text")).alias("_h")
    )
    w = Window.partitionBy("_h")
    dup = docs.select(
        "doc_id",
        (F.min("doc_id").over(w) != F.col("doc_id")).alias("is_exact_dup"),
    )
    boiler = q_line_dedup_stats(spark, sf_dir).select(
        "doc_id",
        (2 * F.col("n_removed") > F.col("n_lines")).alias("is_boilerplate"),
    )
    v = quality.join(dup, "doc_id").join(boiler, "doc_id")
    reason = (
        F.when(~F.col("ok_quality"), 1).otherwise(0)
        + F.when(F.col("is_exact_dup"), 2).otherwise(0)
        + F.when(F.col("is_boilerplate"), 4).otherwise(0)
    ).cast("int")
    return v.select(
        "doc_id",
        "ok_quality",
        "is_exact_dup",
        "is_boilerplate",
        reason.alias("reason"),
        (reason == 0).alias("keep"),
    )


ORACLE_CORPUS_KEEP_VERDICT = f"""
WITH q AS ({ORACLE_GOPHER_QUALITY_FLAGS}),
l AS ({ORACLE_LINE_DEDUP_STATS}),
d AS (
    SELECT doc_id,
           (min(doc_id) OVER (PARTITION BY md5(text)) != doc_id)
               AS is_exact_dup
    FROM documents
)
SELECT q.doc_id,
       q.passes AS ok_quality,
       d.is_exact_dup,
       (2 * l.n_removed > l.n_lines) AS is_boilerplate,
       CAST((CASE WHEN NOT q.passes THEN 1 ELSE 0 END)
            + (CASE WHEN d.is_exact_dup THEN 2 ELSE 0 END)
            + (CASE WHEN 2 * l.n_removed > l.n_lines THEN 4 ELSE 0 END)
            AS INT) AS reason,
       (q.passes AND NOT d.is_exact_dup
        AND 2 * l.n_removed <= l.n_lines) AS keep
FROM q JOIN d USING (doc_id) JOIN l USING (doc_id)
"""

QUERIES = {
    "corpus_keep_verdict": q_corpus_keep_verdict,
}

ORACLES = {
    "corpus_keep_verdict": ORACLE_CORPUS_KEEP_VERDICT,
}
