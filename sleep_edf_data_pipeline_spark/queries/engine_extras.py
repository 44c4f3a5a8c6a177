"""Round-6 session-2 additions: communities, incremental views, mixtures, NFC.

Four operator classes new to the engine, each oracle-checked:

- ``label_propagation_communities`` — community detection over the part
  co-purchase graph by deterministic synchronous mode-LPA
  (operators/components.py:label_propagation): 3 fixed rounds, ties to
  the smallest label, replayed bit-for-bit by an unrolled-SQL oracle
  (the PageRank/k-means contract).
- ``incremental_customer_summary`` — incremental materialized-view
  maintenance (plans/incremental.py): the per-customer order summary
  computed as two independent algebraic partials (base < cutoff, delta
  ≥ cutoff) folded by re-aggregation.  The oracle is the full
  recompute, so the driver row IS the proof that fold == rebuild; the
  versioned-table refresh flow (stored summary + delta batch only) is
  exercised in tests/test_engine_extras.py.
- ``temperature_mixture_weights`` — UniMax-style temperature sampling
  weights (τ = 0.5): per-source shares ∝ n_tokens^τ flatten the source
  mixture toward uniform without the inversion a hard uniform target
  causes for tiny sources (compare ``domain_mixture_weights``).  Each
  source's √n is quantized once to integer micro-units so the
  normalizing total is an order-free BIGINT sum; the final division
  happens once in double.
- ``normalize_text_nfc`` — Unicode NFC normalization + whitespace
  canonicalization, the corpus-prep step that must precede any
  hash-keyed dedup (composed vs decomposed "é" would otherwise defeat
  exact dedup).  NFC runs in an Arrow-batched pandas UDF (no built-in
  Spark NFC); everything around it is codegen.  Output is md5-keyed so
  the oracle (DuckDB ``nfc_normalize``) value-checks the exact
  normalized bytes without shipping full texts through the driver.

Reference parity: none of these exist in the reference (its dbt models
rebuild from scratch; no graph/community, mixture, or normalization
surface) — they extend SURVEY §2.7.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..operators.components import label_propagation
from ..operators.dedup import tokens
from ..plans.incremental import (
    finish_order_summary,
    merge_partials,
    order_summary_partial,
)
from ..tables import spread, table
from .graph_stats import _copurchase_edges

LPA_ITERS = 3

#: Token budget allocated across sources by the temperature weights.
#: The mixture temperature itself is τ = 0.5 — realized as F.sqrt in
#: q_temperature_mixture_weights (sqrt is IEEE-correctly-rounded and
#: cross-engine exact, unlike a general pow(x, τ)); changing τ means
#: changing that expression AND the oracle together.
MIX_TOKEN_BUDGET = 1_000_000

#: Incremental-view cutoff: orders before it are the "stored" base
#: partial, the rest the freshly-ingested delta batch.
INC_CUTOFF = "1997-01-01"


# --------------------------------------------------------------------------
# label_propagation_communities
# --------------------------------------------------------------------------


def q_label_propagation_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-part community after 3 synchronous mode-LPA rounds."""
    edges = _copurchase_edges(spark, sf_dir)  # both directions, distinct
    labels = label_propagation(edges, iters=LPA_ITERS, mirror=False)
    return labels.select(
        F.col("node").alias("part"),
        F.col("label").cast("bigint").alias("community"),
    )


def _lpa_ctes(iters: int = LPA_ITERS) -> list[str]:
    """The shared unrolled-LPA CTE chain (edges, l0 .. l{iters})."""
    ctes = [
        """edges AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
)""",
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)",
    ]
    for it in range(iters):
        ctes.append(
            f"""l{it + 1} AS (
    SELECT node, label FROM (
        SELECT e.dst AS node, l.label,
               row_number() OVER (
                   PARTITION BY e.dst
                   ORDER BY count(*) DESC, l.label ASC
               ) AS rn
        FROM edges e JOIN l{it} l ON e.src = l.node
        GROUP BY e.dst, l.label
    ) WHERE rn = 1
)"""
        )
    return ctes


def _lpa_oracle(iters: int = LPA_ITERS) -> str:
    return (
        "WITH\n"
        + ",\n".join(_lpa_ctes(iters))
        + f"\nSELECT node AS part, CAST(label AS BIGINT) AS community"
        f" FROM l{iters}"
    )


# --------------------------------------------------------------------------
# community_quality
# --------------------------------------------------------------------------


def q_community_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community size / internal edges / degree mass / modularity.

    The QA report for the LPA partition: each community's Newman
    modularity term ``e_c/m − (d_c/2m)²`` — positive means denser than
    the configuration-model expectation.  With both-direction edges,
    ``e2_c`` (directed in-community count) and ``d_c`` (directed
    out-count from members) make the term ``e2_c/m2 − (d_c/m2)²``
    where ``m2 = Σ d_c``.  Cross-engine float discipline: the term is
    emitted as ONE division of exact integers —
    ``(e2·m2 − d²) / m2²``, cross-products in int128
    (DECIMAL(38,0) / HUGEINT) — so both engines divide identical
    values (no FMA-contraction exposure, no BIGINT overflow).

    Plan shape: edges and labels persist (each is consumed twice); the
    per-community stats frame persists, so the 1-row ``m2`` total
    re-reads that tiny cache, not the corpus.
    """
    edges = _copurchase_edges(spark, sf_dir).persist()
    labels = label_propagation(
        edges, iters=LPA_ITERS, mirror=False
    ).persist()
    src_lab = labels.select(
        F.col("node").alias("src"), F.col("label").alias("_sl")
    )
    dst_lab = labels.select(
        F.col("node").alias("dst"), F.col("label").alias("_dl")
    )
    deg = (
        edges.join(src_lab, "src")
        .groupBy(F.col("_sl").alias("community"))
        .agg(F.count("*").alias("degree_sum"))
    )
    internal = (
        edges.join(src_lab, "src")
        .join(dst_lab, "dst")
        .filter(F.col("_sl") == F.col("_dl"))
        .groupBy(F.col("_sl").alias("community"))
        .agg(F.count("*").alias("internal_directed"))
    )
    sizes = labels.groupBy(F.col("label").alias("community")).agg(
        F.count("*").alias("n_nodes")
    )
    stats = (
        sizes.join(deg, "community")
        .join(internal, "community", "left")
        .withColumn(
            "internal_directed",
            F.coalesce(F.col("internal_directed"), F.lit(0)).cast("bigint"),
        )
        .withColumn("degree_sum", F.col("degree_sum").cast("bigint"))
        .withColumn("n_nodes", F.col("n_nodes").cast("bigint"))
        .persist()
    )
    m2 = stats.agg(F.sum("degree_sum").alias("_m2"))
    return stats.crossJoin(F.broadcast(m2)).select(
        F.col("community").cast("bigint").alias("community"),
        "n_nodes",
        "internal_directed",
        "degree_sum",
        (
            # cross-products in DECIMAL(38,0) (HUGEINT in the oracle):
            # e2·m2 passes BIGINT range once the directed edge count
            # exceeds ~3e9 (TPC-H sf≈50) — int128 keeps the numerator
            # exact at any graph size
            (
                F.col("internal_directed").cast("decimal(38,0)")
                * F.col("_m2").cast("decimal(38,0)")
                - F.col("degree_sum").cast("decimal(38,0)")
                * F.col("degree_sum").cast("decimal(38,0)")
            ).cast("double")
            / (F.col("_m2").cast("double") * F.col("_m2").cast("double"))
        ).alias("modularity_term"),
    )


def _community_quality_oracle(iters: int = LPA_ITERS) -> str:
    ctes = _lpa_ctes(iters) + [
        f"labeled AS (SELECT node, label FROM l{iters})",
        """deg AS (
    SELECT l.label AS community, CAST(count(*) AS BIGINT) AS degree_sum
    FROM edges e JOIN labeled l ON e.src = l.node GROUP BY l.label
)""",
        """internal AS (
    SELECT a.label AS community, CAST(count(*) AS BIGINT) AS e2
    FROM edges e
    JOIN labeled a ON e.src = a.node
    JOIN labeled b ON e.dst = b.node
    WHERE a.label = b.label
    GROUP BY a.label
)""",
        """sizes AS (
    SELECT label AS community, CAST(count(*) AS BIGINT) AS n_nodes
    FROM labeled GROUP BY label
)""",
        "m2 AS (SELECT CAST(sum(degree_sum) AS BIGINT) AS m2 FROM deg)",
    ]
    return (
        "WITH\n"
        + ",\n".join(ctes)
        + """
SELECT CAST(s.community AS BIGINT) AS community,
       s.n_nodes,
       CAST(COALESCE(i.e2, 0) AS BIGINT) AS internal_directed,
       d.degree_sum,
       CAST(CAST(COALESCE(i.e2, 0) AS HUGEINT) * m2.m2
            - CAST(d.degree_sum AS HUGEINT) * d.degree_sum
            AS DOUBLE)
           / (CAST(m2.m2 AS DOUBLE) * CAST(m2.m2 AS DOUBLE))
           AS modularity_term
FROM sizes s
JOIN deg d ON d.community = s.community
LEFT JOIN internal i ON i.community = s.community
CROSS JOIN m2
"""
    )


# --------------------------------------------------------------------------
# incremental_customer_summary
# --------------------------------------------------------------------------


def q_incremental_customer_summary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fold base + delta algebraic partials; oracle = full recompute."""
    orders = table(spark, sf_dir, "orders")
    cutoff = F.lit(INC_CUTOFF).cast("timestamp")
    base = order_summary_partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = order_summary_partial(
        orders.filter(F.col("o_orderdate") >= cutoff)
    )
    merged = merge_partials(
        [base, delta],
        keys=["o_custkey"],
        sum_cols=["n_orders", "spend"],
        max_cols=["max_price", "last_order"],
        min_cols=["min_price"],
    )
    return finish_order_summary(merged)


ORACLE_INCREMENTAL_CUSTOMER_SUMMARY = """
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_spend,
       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS max_price,
       CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS min_price,
       max(o_orderdate) AS last_order,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg_spend
FROM orders
GROUP BY o_custkey
"""


# --------------------------------------------------------------------------
# temperature_mixture_weights
# --------------------------------------------------------------------------


def q_temperature_mixture_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source τ=0.5 sampling shares + token allocation at a budget."""
    docs = table(spark, sf_dir, "documents")
    per_source = (
        docs.select(
            "source",
            F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
        )
        .groupBy("source")
        .agg(F.sum("n_tok").alias("n_tokens"))
    )
    # √n quantized once to integer micro-units: the normalizer is an
    # order-free BIGINT sum (sqrt is IEEE-correctly-rounded, identical
    # cross-engine; perfect squares quantize exactly, so no half-ties).
    scaled = per_source.withColumn(
        "s_micro",
        F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1e6)
        .cast("bigint"),
    )
    # Normalizer as a GLOBAL window over the aggregated frame — |rows|
    # = |sources| (bounded domain metadata), so the single-partition
    # window is safe by construction, and unlike a broadcast 1-row
    # cross join it cannot re-execute the corpus-scan subtree (the
    # dsir lesson: broadcast subtrees defeat exchange reuse — a
    # second 100 TB pass just to compute the total).
    scaled = scaled.withColumn(
        "_total_micro", F.sum("s_micro").over(Window.partitionBy())
    )
    return scaled.select(
        "source",
        "n_tokens",
        F.round(
            F.col("s_micro").cast("double") / F.col("_total_micro"), 6
        ).alias("temp_share"),
        F.expr(
            f"CAST((CAST({MIX_TOKEN_BUDGET} AS BIGINT) * s_micro)"
            " div _total_micro AS BIGINT)"
        ).alias("budget_tokens"),
    )


ORACLE_TEMPERATURE_MIXTURE_WEIGHTS = f"""
WITH per_source AS (
    SELECT source,
           CAST(sum(len(regexp_split_to_array(lower(text), '\\s+')))
                AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
scaled AS (
    SELECT source, n_tokens,
           CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6, 0) AS BIGINT)
               AS s_micro
    FROM per_source
),
totals AS (SELECT CAST(sum(s_micro) AS BIGINT) AS total_micro FROM scaled)
SELECT source, n_tokens,
       round(CAST(s_micro AS DOUBLE) / total_micro, 6) AS temp_share,
       CAST((CAST({MIX_TOKEN_BUDGET} AS BIGINT) * s_micro) // total_micro
            AS BIGINT) AS budget_tokens
FROM scaled, totals
"""


# --------------------------------------------------------------------------
# normalize_text_nfc
# --------------------------------------------------------------------------


# StringType() object (not "string" DDL): DDL parsing would demand an
# active SparkSession at import time, breaking registry.collect() in
# sessionless processes.
@F.pandas_udf(StringType())
def _nfc_udf(texts: pd.Series) -> pd.Series:
    import unicodedata

    return texts.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


def q_normalize_text_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC + whitespace canonicalization; md5-keyed normalized bytes.

    The whitespace class is the explicit ``[ \\t\\n\\r\\f]`` (NOT
    ``\\s``: Java regex counts U+000B as ``\\s``, RE2 does not — the
    explicit class is engine-identical).  ``changed`` marks docs the
    canonicalization altered at all.
    """
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    cleaned = F.trim(
        F.regexp_replace(_nfc_udf(F.col("text")), "[ \t\n\r\f]+", " ")
    )
    return docs.select(
        "doc_id",
        F.length(cleaned).cast("int").alias("n_chars_norm"),
        (cleaned != F.col("text")).alias("changed"),
        F.md5(F.encode(cleaned, "UTF-8")).alias("norm_md5"),
    )


ORACLE_NORMALIZE_TEXT_NFC = r"""
SELECT doc_id,
       CAST(length(cleaned) AS INT) AS n_chars_norm,
       cleaned != text AS changed,
       md5(cleaned) AS norm_md5
FROM (
    SELECT doc_id, text,
           trim(regexp_replace(nfc_normalize(text),
                               '[ \t\n\r\f]+', ' ', 'g')) AS cleaned
    FROM documents
)
"""


QUERIES = {
    "label_propagation_communities": q_label_propagation_communities,
    "community_quality": q_community_quality,
    "incremental_customer_summary": q_incremental_customer_summary,
    "temperature_mixture_weights": q_temperature_mixture_weights,
    "normalize_text_nfc": q_normalize_text_nfc,
}

ORACLES = {
    "label_propagation_communities": _lpa_oracle(),
    "community_quality": _community_quality_oracle(),
    "incremental_customer_summary": ORACLE_INCREMENTAL_CUSTOMER_SUMMARY,
    "temperature_mixture_weights": ORACLE_TEMPERATURE_MIXTURE_WEIGHTS,
    "normalize_text_nfc": ORACLE_NORMALIZE_TEXT_NFC,
}
