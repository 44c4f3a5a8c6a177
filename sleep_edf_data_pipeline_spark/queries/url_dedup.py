"""Round-8: URL-canonicalization dedup (CCNet/RefinedWeb stage 1).

The one standard pre-training dedup stage the registry lacked: fold
each record's URL to a canonical key (operators/urls.py — fragment /
scheme / host-case / www / trailing-slash / tracking-param folds,
params sorted) and keep one survivor per key — run BEFORE content
MinHash, because it is a pure map + hash-groupBy and removes the bulk
of crawl-level duplication for the cost of a string kernel.

The test corpus has no URL column, so the RAW url is synthesized
deterministically from ``documents`` as a shared column expression
(same text in the oracle): every group of three consecutive doc_ids
shares the content identity g = doc_id div 3 (host shard, path,
kept params all derive from g) while the individual members differ
ONLY in canonicalization-foldable ways — scheme by parity, WWW./host
case by residue, trailing slash, a tracking param, a fragment, and
unsorted param order.  A canonicalizer that misses any fold splits a
group and changes n_copies/n_raw_variants — the oracle catches it
value-for-value.

Scale shape: map + groupBy(canonical) — identical to exact content
dedup; no joins, no windows, broadcast nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.urls import canonicalize_url
from ..tables import table


def _synth_raw_url(df: DataFrame) -> DataFrame:
    """Deterministic raw-URL column over documents (see module doc)."""
    d = F.col("doc_id")
    g = F.expr("doc_id div 3")
    scheme = F.when(d % 2 == 0, "http://").otherwise("https://")
    www = F.when(d % 4 == 0, "WWW.").otherwise("")
    host_lc = F.concat(F.lit("cdn"), (g % 4).cast("string"),
                       F.lit(".example.com"))
    host = F.when(d % 3 == 0, F.upper(host_lc)).otherwise(host_lc)
    path = F.concat(F.lit("/docs/"), g.cast("string"))
    slash = F.when(d % 5 == 0, "/").otherwise("")
    tracker = F.when(d % 2 == 0, "utm_source=feed").otherwise("ref=tw")
    qs = F.concat_ws(
        "&", tracker, F.concat(F.lit("page="), (g % 10).cast("string")),
        F.lit("b=1"),
    )
    frag = F.when(d % 6 == 0, "#frag").otherwise("")
    return df.withColumn(
        "url",
        F.concat(scheme, www, host, path, slash, F.lit("?"), qs, frag),
    )


def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _synth_raw_url(
        table(spark, sf_dir, "documents").select("doc_id")
    )
    return (
        docs.withColumn("canonical_url", canonicalize_url(F.col("url")))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("kept_id"),
            F.count("*").cast("bigint").alias("n_copies"),
            F.countDistinct("url").cast("bigint").alias("n_raw_variants"),
        )
        .filter(F.col("n_copies") >= 2)
    )


#: The oracle mirrors both the synthesis and the canonicalizer fold
#: for fold; DuckDB list lambdas handle the param filter+sort.
ORACLE_URL_CANONICAL_DEDUP = """
WITH raw AS (
    SELECT doc_id,
        (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END)
        || (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END)
        || (CASE WHEN doc_id % 3 = 0
            THEN upper('cdn' || CAST((doc_id // 3) % 4 AS VARCHAR)
                 || '.example.com')
            ELSE 'cdn' || CAST((doc_id // 3) % 4 AS VARCHAR)
                 || '.example.com' END)
        || '/docs/' || CAST(doc_id // 3 AS VARCHAR)
        || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
        || '?'
        || (CASE WHEN doc_id % 2 = 0 THEN 'utm_source=feed'
                 ELSE 'ref=tw' END)
        || '&page=' || CAST((doc_id // 3) % 10 AS VARCHAR) || '&b=1'
        || (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)
        AS url
    FROM documents
),
parts AS (
    SELECT doc_id, url,
        regexp_extract(regexp_replace(url, '#.*', ''), '^([^?]*)', 1)
            AS base,
        regexp_extract(regexp_replace(url, '#.*', ''), '\\?(.*)$', 1)
            AS qs
    FROM raw
),
hp AS (
    SELECT doc_id, url, qs,
        regexp_replace(base, '^https?://', '') AS rest
    FROM parts
),
canon AS (
    SELECT doc_id, url,
        regexp_replace(lower(regexp_extract(rest, '^([^/]*)', 1)),
                       '^www\\.', '')
        || regexp_replace(
               regexp_extract(rest, '^[^/]*(/.*)?$', 1), '/$', '')
        || (CASE WHEN cq = '' THEN '' ELSE '?' || cq END)
        AS canonical_url
    FROM (
        SELECT doc_id, url, rest,
            array_to_string(
                list_sort(list_filter(string_split(qs, '&'),
                    p -> p <> '' AND NOT regexp_matches(p,
                        '^(utm_[^=]*|fbclid|gclid|ref|mc_eid)='))),
                '&') AS cq
        FROM hp
    )
)
SELECT canonical_url,
       min(doc_id) AS kept_id,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(count(DISTINCT url) AS BIGINT) AS n_raw_variants
FROM canon
GROUP BY canonical_url
HAVING count(*) >= 2
"""


def q_host_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl audit (the RefinedWeb/FineWeb domain table): doc
    count, distinct canonical URLs, URL-dup rate, and corpus share per
    canonical HOST.

    The scale argument for running URL dedup FIRST: this table is what
    a pipeline operator reads to see which hosts contribute mostly
    duplicates (mirrors, CDNs) before paying for content MinHash.  Two
    aggregations, both on the host key (one shuffle + a broadcast of
    the 1-row total); dup_rate and corpus share are single divisions
    of exact BIGINTs.
    """
    docs = _synth_raw_url(
        table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    canon = with_canonical_host(docs)
    # persisted (drift_stats pattern, lazy): `per` feeds BOTH the
    # output and the 1-row total — uncached, the corpus would be
    # scanned twice (once inside the broadcast branch)
    per = canon.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("cu").cast("bigint").alias("n_canonical_urls"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    ).persist()
    return profile_from_per(per)


def with_canonical_host(df: DataFrame) -> DataFrame:
    """Add (cu, host) to a frame carrying a raw ``url`` column — the
    canonicalization head shared by the batch profile and the
    streaming monitor (streaming/hosts.py)."""
    return df.withColumn(
        "cu", canonicalize_url(F.col("url"))
    ).withColumn("host", F.regexp_extract("cu", r"^([^/?]*)", 1))


def profile_from_per(per: DataFrame) -> DataFrame:
    """Profile tail shared with the streaming monitor: dup rate and
    corpus share as single divisions of exact BIGINTs over the per-host
    grid (host, n_docs, n_canonical_urls, n_chars)."""
    tot = per.agg(F.sum("n_docs").cast("bigint").alias("tot_docs"))
    return per.crossJoin(F.broadcast(tot)).select(
        "host",
        "n_docs",
        "n_canonical_urls",
        "n_chars",
        ((F.col("n_docs") - F.col("n_canonical_urls")).cast("double")
         / F.col("n_docs").cast("double")).alias("url_dup_rate"),
        (F.col("n_docs").cast("double") / F.col("tot_docs").cast("double"))
        .alias("doc_share"),
    )


#: Same synthesis + canonicalization as the dedup oracle, rolled up to
#: the host grain.
ORACLE_HOST_DEDUP_PROFILE = """
WITH raw AS (
    SELECT doc_id, n_chars,
        (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END)
        || (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END)
        || (CASE WHEN doc_id % 3 = 0
            THEN upper('cdn' || CAST((doc_id // 3) % 4 AS VARCHAR)
                 || '.example.com')
            ELSE 'cdn' || CAST((doc_id // 3) % 4 AS VARCHAR)
                 || '.example.com' END)
        || '/docs/' || CAST(doc_id // 3 AS VARCHAR)
        || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
        || '?'
        || (CASE WHEN doc_id % 2 = 0 THEN 'utm_source=feed'
                 ELSE 'ref=tw' END)
        || '&page=' || CAST((doc_id // 3) % 10 AS VARCHAR) || '&b=1'
        || (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)
        AS url
    FROM documents
),
parts AS (
    SELECT doc_id, n_chars,
        regexp_extract(regexp_replace(url, '#.*', ''), '^([^?]*)', 1)
            AS base,
        regexp_extract(regexp_replace(url, '#.*', ''), '\\?(.*)$', 1)
            AS qs
    FROM raw
),
hp AS (
    SELECT doc_id, n_chars, qs,
        regexp_replace(base, '^https?://', '') AS rest
    FROM parts
),
canon AS (
    SELECT doc_id, n_chars,
        regexp_replace(lower(regexp_extract(rest, '^([^/]*)', 1)),
                       '^www\\.', '')
        || regexp_replace(
               regexp_extract(rest, '^[^/]*(/.*)?$', 1), '/$', '')
        || (CASE WHEN cq = '' THEN '' ELSE '?' || cq END)
        AS cu
    FROM (
        SELECT doc_id, n_chars, rest,
            array_to_string(
                list_sort(list_filter(string_split(qs, '&'),
                    p -> p <> '' AND NOT regexp_matches(p,
                        '^(utm_[^=]*|fbclid|gclid|ref|mc_eid)='))),
                '&') AS cq
        FROM hp
    )
),
per AS (
    SELECT regexp_extract(cu, '^([^/?]*)', 1) AS host,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT cu) AS BIGINT) AS n_canonical_urls,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM canon GROUP BY 1
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot_docs FROM per)
SELECT host, n_docs, n_canonical_urls, n_chars,
       CAST(n_docs - n_canonical_urls AS DOUBLE) / CAST(n_docs AS DOUBLE)
           AS url_dup_rate,
       CAST(n_docs AS DOUBLE) / CAST(tot_docs AS DOUBLE) AS doc_share
FROM per CROSS JOIN tot
"""


QUERIES = {
    "url_canonical_dedup": q_url_canonical_dedup,
    "host_dedup_profile": q_host_dedup_profile,
}

ORACLES = {
    "url_canonical_dedup": ORACLE_URL_CANONICAL_DEDUP,
    "host_dedup_profile": ORACLE_HOST_DEDUP_PROFILE,
}
