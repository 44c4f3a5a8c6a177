"""Rank-based corpus selection: per-domain top-decile quality cut.

The CCNet-style selection step the quality family was missing: score
every document with an exact integer quality metric, rank WITHIN its
source domain, and keep the top 10% per domain — so no domain is
wiped out by a global threshold (the same reason `stratified_sample`
caps per group).

Determinism: the score is pure BIGINT arithmetic (alpha-token count
scaled by 1e6, integer-divided by token count — no float ratio), the
rank order is totally tie-broken by doc_id, and percent_rank's
(rank−1)/(n−1) is an exact small-integer fraction in double, so the
0.1 cut compares identically in any IEEE engine.

Scale shape: one hash-partition on source (the natural selection unit)
carrying only (doc_id, source, two BIGINTs) — text never shuffles; the
scoring projection is codegen higher-order functions on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table


def q_quality_decile_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks).cast("bigint")
    alpha = F.size(
        F.filter(toks, lambda t: t.rlike("^[a-z]+$"))
    ).cast("bigint")
    # integer division via `div`: a double division + BIGINT cast would
    # truncate in Spark but round in DuckDB (known cross-engine trap)
    scored = docs.select(
        "doc_id",
        "source",
        (alpha * F.lit(1_000_000).cast("bigint")).alias("a_scaled"),
        n_toks.alias("n_toks"),
    ).select(
        "doc_id",
        "source",
        F.expr("a_scaled div n_toks").alias("qscore"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("qscore"), F.asc("doc_id")
    )
    return (
        scored.select(
            "doc_id", "source", "qscore",
            F.percent_rank().over(w).alias("pr"),
        )
        .filter(F.col("pr") <= 0.1)
    )


ORACLE_QUALITY_DECILE_SELECT = """
WITH scored AS (
    SELECT doc_id, source,
           (CAST(len(list_filter(string_split(text, ' '),
                                 t -> regexp_full_match(t, '[a-z]+')))
                 AS BIGINT) * 1000000)
           // CAST(len(string_split(text, ' ')) AS BIGINT) AS qscore
    FROM documents
)
SELECT doc_id, source, qscore,
       percent_rank() OVER (PARTITION BY source
                            ORDER BY qscore DESC, doc_id ASC) AS pr
FROM scored
QUALIFY pr <= 0.1
"""


QUERIES = {"quality_decile_select": q_quality_decile_select}
ORACLES = {"quality_decile_select": ORACLE_QUALITY_DECILE_SELECT}


#: Per-document token cap for the overlap matrix (see docstring).
OVERLAP_MAX_TOKENS = 2048


def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise content overlap between sources (Jaccard over
    distinct 3-gram sets) — the corpus-curation view that says which
    feeds are re-scrapes of each other.

    Plan: ONE corpus pass — ``groupBy(gram).collect_set(source)``
    (map-side combinable; each partial set is bounded by the SOURCE
    count, a handful, so the shuffle carries each gram string once
    with a tiny array).  Source pairs are then expanded INSIDE the
    per-gram array with codegen higher-order functions — no self-join
    ever touches the gram set (the r04 plan shuffled the full gram
    stream twice more for distinct + join and re-ran the explode per
    consumer; this one is persisted at the histogram, ~2.5× faster at
    sf0.1 and ~5× at scale10).  Per-source set sizes broadcast back
    for the inclusion-exclusion union; Jaccard = one double division
    of exact BIGINTs.

    DOCUMENTED CAP: only the first ``OVERLAP_MAX_TOKENS`` (2048)
    tokens of each document contribute 3-grams — overlap beyond a
    document's first ~2k tokens is invisible to this matrix (mirrored
    in the oracle).  The cap bounds the per-document explode for the
    pathological single-giant-document case; the join itself does not
    need it.  For full-document overlap, raise the constant — cost is
    linear in total tokens.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # one shuffle on gram; collect_set dedups (source, gram) for free
    # and its partial aggregates are bounded by the source count
    per_gram = (
        docs.select(
            "source",
            F.explode(
                F.transform(
                    F.slice(toks, 1, OVERLAP_MAX_TOKENS),
                    lambda _t, i: F.concat_ws(
                        " ", F.slice(toks, i + 1, 3)
                    ),
                )
            ).alias("gram"),
        )
        .filter(F.size(F.split(F.col("gram"), " ")) == 3)
        .groupBy("gram")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .persist()  # two consumers below; released via clearCache
    )
    per_gram.count()
    sizes = (
        per_gram.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n_grams"))
    )
    # (src_a < src_b) pairs expanded inside the sorted array:
    # element i pairs with every later element — codegen, no join
    n_srcs = F.size("srcs")
    inter = (
        per_gram.filter(n_srcs >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("srcs"),
                        lambda x, i: F.transform(
                            F.slice(F.col("srcs"), i + 2, n_srcs),
                            lambda y: F.struct(
                                x.alias("src_a"), y.alias("src_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n_grams").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n_grams").alias("n_b")))
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


ORACLE_SOURCE_OVERLAP_MATRIX = f"""
WITH toks AS (
    SELECT source, string_split(text, ' ') AS t FROM documents
),
grams AS (
    SELECT DISTINCT source,
           concat_ws(' ', t[i], t[i+1], t[i+2]) AS gram
    FROM toks, LATERAL (
        SELECT unnest(range(1, least(len(t) - 1, {OVERLAP_MAX_TOKENS + 1}))) AS i
    )
    WHERE i + 2 <= len(t)
),
sizes AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM grams GROUP BY source
),
inter AS (
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(count(*) AS BIGINT) AS n_common
    FROM grams a JOIN grams b USING (gram)
    WHERE a.source < b.source
    GROUP BY 1, 2
)
SELECT src_a, src_b, n_common,
       CAST(n_common AS DOUBLE)
       / CAST(sa.n_grams + sb.n_grams - n_common AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.source = inter.src_a
JOIN sizes sb ON sb.source = inter.src_b
"""


QUERIES["source_overlap_matrix"] = q_source_overlap_matrix
ORACLES["source_overlap_matrix"] = ORACLE_SOURCE_OVERLAP_MATRIX


def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostic for the events stream's user_id key.

    Before a 100 TB job shuffles on a key, this is the question: how
    concentrated is it?  One output row: distinct keys, total rows,
    the heaviest key's max/avg ratio, the row share held by the top 1%
    of keys, and the exact Gini coefficient of the key histogram —
    Gini = 2·Σ(i·x_(i))/(n·Σx) − (n+1)/n over counts sorted ascending
    (row_number rank), every sum a BIGINT, one double division per
    metric.

    NO per-key rank is ever materialized (the r04 plan's global
    ``Window.orderBy`` single-partition sort — the exact bottleneck
    this query exists to diagnose — is gone): keys tied at the same
    count occupy a CONSECUTIVE rank block, so both rank aggregates
    collapse onto the distinct-count histogram:

    - Σ cnt·rk over a tie block of m keys starting after s_prev keys
      is cnt·(m·s_prev + m(m+1)/2), exact in BIGINT;
    - the top-1% cut at rank t keeps greatest(0, least(m, s_prev+m−t))
      keys of the block, each contributing cnt rows.

    The exclusive cumulative s_prev over the histogram needs no global
    window either: counts bucket by decimal digit length (a
    data-independent total-order-preserving split, ≤19 buckets), the
    intra-bucket running sum is a PARTITIONED window, and the ≤19
    exclusive bucket offsets come from a broadcast theta-join.  Every
    stage is parallel; the fact shuffles once (user_id), the histogram
    once (cnt).
    """
    ev = table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    # the distinct-count histogram is tiny and feeds every downstream
    # stage — persisted (lazy) so the fact shuffles into it once
    # (uncached, each consumer re-ran the per-key count: 4 fact scans)
    hist = per_key.groupBy("cnt").agg(F.count("*").cast("bigint").alias("m"))
    hist = hist.withColumn(
        "bkt", F.length(F.col("cnt").cast("string"))
    ).persist()
    wb = (
        Window.partitionBy("bkt")
        .orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = hist.select(
        "cnt",
        "m",
        "bkt",
        F.coalesce(F.sum("m").over(wb), F.lit(0)).cast("bigint").alias("c_in"),
    )
    btot = hist.groupBy("bkt").agg(F.sum("m").cast("bigint").alias("bm"))
    boff = (
        btot.alias("a")
        .join(
            F.broadcast(btot.alias("b")),
            F.col("b.bkt") < F.col("a.bkt"),
            "left",
        )
        .groupBy(F.col("a.bkt").alias("bkt"))
        .agg(F.coalesce(F.sum("b.bm"), F.lit(0)).cast("bigint").alias("c_bk"))
    )
    cum = intra.join(F.broadcast(boff), "bkt").select(
        "cnt", "m", (F.col("c_in") + F.col("c_bk")).alias("s_prev")
    )
    # Σ cnt·rk over the tie block: ranks s_prev+1 .. s_prev+m.
    # m·(m+1) is a product of consecutive integers — `div 2` is exact.
    block_w = F.col("cnt") * (
        F.col("m") * F.col("s_prev")
        + F.expr("(m * (m + 1)) div 2").cast("bigint")
    )
    # The top-1% cut only needs the GLOBAL key count, which a cheap
    # count over per_key provides — broadcasting it in lets every
    # metric (including the top-1% sum) ride ONE aggregate over cum,
    # so the fact scans twice (same as the oracle), not three times.
    nk = per_key.agg(F.count("*").cast("bigint").alias("n_keys"))
    in_top = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(
            F.col("m"),
            F.col("s_prev") + F.col("m") - F.expr("(n_keys * 99) div 100"),
        ),
    )
    base = cum.crossJoin(F.broadcast(nk)).agg(
        F.max("n_keys").alias("n_keys"),
        F.sum(F.col("cnt") * F.col("m")).alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        F.sum(block_w).alias("weighted"),
        F.sum(F.col("cnt") * in_top).alias("top1pct_rows"),
    )
    n, tot = F.col("n_keys"), F.col("total_rows")
    return base.select(
        n.alias("n_keys"),
        tot.alias("total_rows"),
        (
            (F.col("max_cnt") * n).cast("double") / tot.cast("double")
        ).alias("max_over_avg"),
        (
            F.col("top1pct_rows").cast("double") / tot.cast("double")
        ).alias("top1pct_share"),
        (
            (F.lit(2).cast("bigint") * F.col("weighted")).cast("double")
            / (n * tot).cast("double")
            - (n + F.lit(1).cast("bigint")).cast("double") / n.cast("double")
        ).alias("gini"),
    )


ORACLE_KEY_SKEW_REPORT = """
WITH per_key AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY user_id
),
ranked AS (
    SELECT cnt,
           CAST(row_number() OVER (ORDER BY cnt, user_id) AS BIGINT) AS rk
    FROM per_key
),
base AS (
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS total_rows,
           max(cnt) AS max_cnt,
           CAST(sum(cnt * rk) AS BIGINT) AS weighted
    FROM ranked
),
top AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS top1pct_rows
    FROM ranked, base
    WHERE rk > (n_keys * 99) // 100
)
SELECT n_keys,
       total_rows,
       CAST(max_cnt * n_keys AS DOUBLE) / CAST(total_rows AS DOUBLE)
           AS max_over_avg,
       CAST(top1pct_rows AS DOUBLE) / CAST(total_rows AS DOUBLE)
           AS top1pct_share,
       CAST(2 * weighted AS DOUBLE) / CAST(n_keys * total_rows AS DOUBLE)
       - CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE) AS gini
FROM base, top
"""


QUERIES["key_skew_report"] = q_key_skew_report
ORACLES["key_skew_report"] = ORACLE_KEY_SKEW_REPORT


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers per event type: |value − median| > 3·1.4826·MAD.

    The stddev z-score (`value_outliers`) breaks down when the
    outliers themselves inflate the spread; median/MAD doesn't.  Exact
    cross-engine: values quantize to BIGINT (2^20), the median of
    integers interpolates to an exact .0/.5 double in both engines
    (doubled → BIGINT), deviations stay integer, and the 1.4826·3
    consistency cut becomes the integer comparison
    ``dev2·20000 > 44478·mad4`` (dev2 = 2·|q−med|, mad4 = 4·MAD).
    robust_z is one division of exact BIGINTs.

    Plan: two exact-percentile aggregates over the (small) per-type
    stats path, each broadcast back onto the fact — the fact itself
    never shuffles.  (At 100 TB swap `percentile` for the
    `approx_quantiles_price`-style sketch; the exact form is the
    oracle-checkable variant.)
    """
    ev = table(spark, sf_dir, "events")
    q = F.floor(F.col("value") * F.lit(1 << 20)).cast("bigint")
    vals = ev.select("event_id", "event_type", "value", q.alias("q"))
    # med persisted (lazy): both deviation passes (the MAD aggregate
    # and the output filter) broadcast it — uncached each pass re-ran
    # the per-type median over a fresh fact scan (4 scans; now 3, the
    # two deviation passes themselves being the algorithmic minimum
    # without caching the fact-sized frame)
    med = vals.groupBy("event_type").agg(
        (F.percentile("q", F.lit(0.5)) * 2).cast("bigint").alias("med2")
    ).persist()
    devs = vals.join(F.broadcast(med), "event_type").withColumn(
        "dev2", F.abs(F.col("q") * 2 - F.col("med2"))
    )
    mad = devs.groupBy("event_type").agg(
        (F.percentile("dev2", F.lit(0.5)) * 2).cast("bigint").alias("mad4")
    )
    return (
        devs.join(F.broadcast(mad), "event_type")
        .filter(
            F.col("dev2") * F.lit(20000).cast("bigint")
            > F.lit(44478).cast("bigint") * F.col("mad4")
        )
        .select(
            "event_id",
            "event_type",
            "value",
            (
                (F.col("dev2") * F.lit(20000)).cast("double")
                / (F.lit(14826).cast("bigint") * F.col("mad4")).cast("double")
            ).alias("robust_z"),
        )
    )


ORACLE_MAD_OUTLIERS = """
WITH vals AS (
    SELECT event_id, event_type, value,
           CAST(floor(value * 1048576) AS BIGINT) AS q
    FROM events
),
med AS (
    SELECT event_type,
           CAST(quantile_cont(q, 0.5) * 2 AS BIGINT) AS med2
    FROM vals GROUP BY event_type
),
devs AS (
    SELECT v.event_id, v.event_type, v.value,
           abs(v.q * 2 - m.med2) AS dev2
    FROM vals v JOIN med m USING (event_type)
),
mad AS (
    SELECT event_type,
           CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
    FROM devs GROUP BY event_type
)
SELECT d.event_id, d.event_type, d.value,
       CAST(d.dev2 * 20000 AS DOUBLE) / CAST(14826 * m.mad4 AS DOUBLE)
           AS robust_z
FROM devs d JOIN mad m USING (event_type)
WHERE d.dev2 * 20000 > 44478 * m.mad4
"""


QUERIES["mad_outliers"] = q_mad_outliers
ORACLES["mad_outliers"] = ORACLE_MAD_OUTLIERS


#: percentile_approx accuracy for the MAD sketch: rank error ≤ n/acc,
#: and any group smaller than acc is stored exactly (the sketch only
#: starts compressing past `acc` values), so test scales are exact.
MAD_SKETCH_ACCURACY = 50_000


def q_mad_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of ``mad_outliers``: identical flag semantics,
    but median and MAD come from ``percentile_approx`` (GK sketch,
    mergeable, bounded state) instead of exact ``percentile`` — the
    exact form buffers every group's values in one aggregation buffer,
    which is an OOM at billions of rows per event_type; the sketch
    caps per-group state at O(accuracy) regardless of group size.

    No oracle by design (sketch results are engine-specific): the
    contract test asserts the flagged set stays within the sketch's
    rank-error bound of the exact twin's
    (``tests/test_sketch_tolerance.py``).  percentile_approx returns
    an observed value (no interpolation), so med2/mad4 stay exact
    BIGINTs and the threshold comparison is the same integer test.
    """
    ev = table(spark, sf_dir, "events")
    q = F.floor(F.col("value") * F.lit(1 << 20)).cast("bigint")
    vals = ev.select("event_id", "event_type", "value", q.alias("q"))
    acc = F.lit(MAD_SKETCH_ACCURACY)
    # med persisted: same double-consumer shape as the exact twin
    med = vals.groupBy("event_type").agg(
        (F.percentile_approx("q", F.lit(0.5), acc) * 2)
        .cast("bigint")
        .alias("med2")
    ).persist()
    devs = vals.join(F.broadcast(med), "event_type").withColumn(
        "dev2", F.abs(F.col("q") * 2 - F.col("med2"))
    )
    mad = devs.groupBy("event_type").agg(
        (F.percentile_approx("dev2", F.lit(0.5), acc) * 2)
        .cast("bigint")
        .alias("mad4")
    )
    return (
        devs.join(F.broadcast(mad), "event_type")
        .filter(
            F.col("dev2") * F.lit(20000).cast("bigint")
            > F.lit(44478).cast("bigint") * F.col("mad4")
        )
        .select(
            "event_id",
            "event_type",
            "value",
            (
                (F.col("dev2") * F.lit(20000)).cast("double")
                / (F.lit(14826).cast("bigint") * F.col("mad4")).cast("double")
            ).alias("robust_z"),
        )
    )


def q_mad_outliers_approx_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The REGISTERED form (round 11, the heavy_hitters_cms
    precedent): ONE summary row reconciling the sketch-thresholded
    flag set against the exact twin's — flag counts, disagreement
    count, the worst disagreeing event's distance from the z=3.0
    boundary, both contract bounds, and the within_bound flag — so
    the rows-only driver record carries the tolerance contract
    (disagreements only on |robust_z − 3.0| < 0.1 boundary events,
    at most max(2, n_exact/50) of them).

    Deliberately runs BOTH paths; a production caller wanting only
    the sketch flags uses ``q_mad_outliers_approx`` above.
    """
    # Reconcile via UNION + hash agg, not a full-outer join: a
    # full-outer of two flag sets cannot broadcast (both sides keep
    # unmatched rows → Spark forces a sort-merge join), while the
    # union groupBy is one map-side-combinable exchange over the same
    # reduced rows — cheaper AND it keeps the round-5 plan pin (no
    # fact-scale SortMergeJoin in the mad family).
    ex = q_mad_outliers(spark, sf_dir).select(
        "event_id",
        F.col("robust_z").alias("z"),
        F.lit(1).alias("is_exact"),
        F.lit(0).alias("is_approx"),
    )
    ap = q_mad_outliers_approx(spark, sf_dir).select(
        "event_id",
        F.col("robust_z").alias("z"),
        F.lit(0).alias("is_exact"),
        F.lit(1).alias("is_approx"),
    )
    per_event = (
        ex.unionByName(ap)
        .groupBy("event_id")
        .agg(
            F.sum("is_exact").alias("n_ex"),
            F.sum("is_approx").alias("n_ap"),
            F.max("z").alias("z"),
        )
    )
    disagree = (F.col("n_ex") + F.col("n_ap")) == 1
    boundary_dist = F.abs(F.col("z") - F.lit(3.0))
    agg = per_event.agg(
        F.sum("n_ex").cast("bigint").alias("n_exact_flags"),
        F.sum("n_ap").cast("bigint").alias("n_approx_flags"),
        F.sum(disagree.cast("int")).cast("bigint").alias("n_disagree"),
        F.coalesce(
            F.max(F.when(disagree, boundary_dist)), F.lit(0.0)
        ).alias("max_boundary_dist"),
    )
    count_bound = F.greatest(
        F.lit(2.0), F.col("n_exact_flags").cast("double") / F.lit(50.0)
    )
    return agg.select(
        "n_exact_flags",
        "n_approx_flags",
        "n_disagree",
        F.round("max_boundary_dist", 4).alias("max_boundary_dist"),
        F.lit(0.1).alias("dist_bound"),
        F.round(count_bound, 1).alias("count_bound"),
        (
            (F.col("n_disagree").cast("double") <= count_bound)
            & (F.col("max_boundary_dist") < F.lit(0.1))
        ).alias("within_bound"),
    )


QUERIES["mad_outliers_approx"] = q_mad_outliers_approx_verdict
