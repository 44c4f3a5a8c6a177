"""Distribution-drift statistics: PSI per source, exact two-sample KS.

The monitoring layer a production training-data pipeline runs before
mixing a new source or shipping a new snapshot: has the document-length
distribution drifted?  Two classic tests, both made hash-exact:

- ``psi_drift_by_source`` — Population Stability Index of every
  source's doc-length distribution against the whole corpus, over
  10 equi-depth bins.  Bin thresholds are EXACT integer order
  statistics (smallest length with ``10·cum ≥ i·N`` — no float
  interpolation), Laplace-smoothed shares, and the ``(a−e)·ln(a/e)``
  terms are computed as exact-BIGINT cross-products times a micro-nat
  quantized log, so the per-source sum is order-free.
- ``ks_two_sample`` — the exact Kolmogorov-Smirnov statistic between
  two sources: ``max |F_a − F_b|`` evaluated as the integer
  ``max |cum_a·N_b − cum_b·N_a|`` over the merged value domain, one
  division at the end.

Scale shape: ONE corpus pass builds the per-(source, length) histogram
(map-side combinable, persisted); every cumulative/threshold step runs
over the VALUE DOMAIN (distinct lengths).  That domain is bounded by
the MAX document length — not O(10) — so the prefix sums run through
``_bucketed_cumsum`` (digit-length buckets + broadcast offsets, the
``key_skew_report`` decomposition), never an unpartitioned ordered
window: even a corpus with millions of distinct lengths keeps every
window partitioned.

Reference parity: no drift surface exists in the reference; extends
SURVEY §2.7's training-data operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

#: PSI bin count (industry-standard decile binning).
PSI_BINS = 10
#: The fixed source pair for the registered KS query.
KS_A, KS_B = "src0", "src1"


def _length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, length) doc counts — the one corpus pass."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy(
        "source", F.col("n_chars").alias("len")
    ).agg(F.count("*").alias("c"))


def _bucketed_cumsum(df: DataFrame, key: str, cols: list[str]) -> DataFrame:
    """Inclusive prefix sums of non-negative ``cols`` over ascending
    ``key`` — with no ordered window over an UNBOUNDED domain.

    The round-6 CUSUM lesson generalized (see the skew study in
    SCALING.md): an ``ORDER BY len`` cumulative over the value domain
    is "bounded by the distinct-length domain", but that bound is the
    MAX DOCUMENT LENGTH, not O(10) — at web scale with unclamped
    lengths it is one task sorting up to millions of tiny rows.  The
    decomposition is the same one ``key_skew_report`` uses: bucket the
    non-negative integer key by decimal digit LENGTH (total-order
    preserving, ≤19 buckets, data-independent), run the cumulative as
    a PARTITIONED window inside each bucket, then add exclusive bucket
    offsets.

    The offsets side is deliberately cheap: per-bucket totals are read
    BACK OFF the intra-bucket cumulative (``max`` of an inclusive
    prefix sum of non-negative values is the bucket total — that's the
    one exchange the window already paid for, reused), and the ≤19-row
    totals frame takes its exclusive prefix and grand total from an
    unpartitioned ordered window that is bounded BY CONSTRUCTION
    (decimal digit-length of a bigint has ≤19 values, data-independent
    — unlike the length-domain window this helper exists to replace).
    One broadcast join replaces the earlier theta-join + three
    broadcast exchanges; same values, ~half the jobs.

    Returns ``df``'s columns plus ``cum_<c>`` (inclusive prefix sum)
    and ``tot_<c>`` (global total) for each requested column — all
    exact BIGINTs, so the rewrite is value-identical to the naive
    ordered window the oracles still use.
    """
    d = df.withColumn("_bkt", F.length(F.col(key).cast("string")))
    wb = (
        Window.partitionBy("_bkt")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = d.select(
        "*",
        *[F.sum(c).over(wb).cast("bigint").alias(f"_in_{c}") for c in cols],
    )
    btot = intra.groupBy("_bkt").agg(
        *[F.max(f"_in_{c}").alias(f"_bm_{c}") for c in cols]
    )
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    boff = btot.select(
        "_bkt",
        *[
            F.coalesce(F.sum(f"_bm_{c}").over(w_off), F.lit(0))
            .cast("bigint")
            .alias(f"_off_{c}")
            for c in cols
        ],
        *[
            F.sum(f"_bm_{c}").over(w_tot).cast("bigint").alias(f"tot_{c}")
            for c in cols
        ],
    )
    return intra.join(F.broadcast(boff), "_bkt").select(
        *df.columns,
        *[
            (F.col(f"_in_{c}") + F.col(f"_off_{c}"))
            .cast("bigint")
            .alias(f"cum_{c}")
            for c in cols
        ],
        *[f"tot_{c}" for c in cols],
    )


def q_psi_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist WITHOUT an eager materialization job: all three consumers
    # (global hist, binning, source grid) run inside the terminal job,
    # and the cache fills at first use — one corpus pass either way,
    # one fewer Spark job (~0.3 s of local stage floor).
    hist = _length_hist(spark, sf_dir).persist()

    glob = hist.groupBy("len").agg(F.sum("c").cast("bigint").alias("gc"))
    # cumulative over the ordered VALUE DOMAIN via the digit-bucketed
    # decomposition — never an unpartitioned ordered window (the
    # length domain is bounded by MAX length, not O(10))
    cum = _bucketed_cumsum(glob, "len", ["gc"]).select(
        "len", F.col("cum_gc").alias("cum"), F.col("tot_gc").alias("n")
    )
    deciles = spark.range(1, PSI_BINS).select(F.col("id").alias("i"))
    # threshold i = smallest len with cum ≥ ceil(i·N/B), as integers:
    # 10·cum ≥ i·N
    thresholds = (
        cum.crossJoin(F.broadcast(deciles))
        .filter(F.lit(PSI_BINS) * F.col("cum") >= F.col("i") * F.col("n"))
        .groupBy("i")
        .agg(F.min("len").alias("t"))
    )
    # bin(len) = #{ thresholds < len } ∈ 0..9
    binned = (
        hist.join(F.broadcast(thresholds), F.col("len") > F.col("t"), "left")
        .groupBy("source", "len", "c")
        .agg(F.count("t").alias("bin"))
    )
    src_bins = binned.groupBy("source", "bin").agg(
        F.sum("c").cast("bigint").alias("sc")
    ).persist()
    glob_bins = src_bins.groupBy("bin").agg(
        F.sum("sc").cast("bigint").alias("gb")
    )
    # r13 optimization (guide §2.4): the source axis of the grid comes
    # from the (≤ sources×10-row, persisted) src_bins rollup instead of
    # a second distinct pass over the corpus histogram — every source
    # has at least one length row, hence at least one bin row, so the
    # source sets are identical — and the per-source totals ``ns`` ride
    # the same aggregation (sum over the bins present equals the
    # windowed sum over the zero-padded grid: absent bins contribute
    # 0), replacing the per-source window over the grid.  One fewer
    # hist scan, one fewer exchange, one fewer window; every (source,
    # bin, sc, gb, ns, n) tuple is unchanged.
    sources = src_bins.groupBy("source").agg(
        F.sum("sc").cast("bigint").alias("ns")
    )
    grid = (
        sources
        .crossJoin(F.broadcast(spark.range(PSI_BINS).select(F.col("id").alias("bin"))))
        .join(F.broadcast(src_bins), ["source", "bin"], "left")
        .withColumn("sc", F.coalesce(F.col("sc"), F.lit(0)).cast("bigint"))
        .join(F.broadcast(glob_bins), "bin", "left")
        .withColumn("gb", F.coalesce(F.col("gb"), F.lit(0)).cast("bigint"))
    )
    # global doc total from the 10-row bin rollup (broadcast scalar) —
    # not a Window.partitionBy() global window over the source grid
    glob_tot = glob_bins.agg(F.sum("gb").cast("bigint").alias("n"))
    grid = (
        grid.crossJoin(F.broadcast(glob_tot))
        .withColumn("ap", F.col("sc") + 1)          # Laplace-smoothed
        .withColumn("aq", F.col("ns") + PSI_BINS)
        .withColumn("ep", F.col("gb") + 1)
        .withColumn("eq", F.col("n") + PSI_BINS)
    )
    # ln of a ratio of exact integers, quantized once to micro-nats;
    # the (a−e) factor is the exact cross-product difference.  The
    # cross-products and the term sum run in DECIMAL(38,0) (int128 —
    # HUGEINT in the oracle): at web scale ap·eq reaches ~1e14 and the
    # term ~1e21, past BIGINT range; the decimal sum stays exact and
    # order-free.  The log ARGUMENT stays a double ratio (magnitude-
    # safe by construction — it's a probability ratio).
    _d = "decimal(38,0)"
    l_micro = F.round(
        F.log(
            (F.col("ap").cast(_d) * F.col("eq").cast(_d)).cast("double")
            / (F.col("ep").cast(_d) * F.col("aq").cast(_d)).cast("double")
        )
        * 1e6
    ).cast("bigint")
    term = (
        F.col("ap").cast(_d) * F.col("eq").cast(_d)
        - F.col("ep").cast(_d) * F.col("aq").cast(_d)
    ).cast(_d) * l_micro.cast(_d)
    return (
        grid.withColumn("_t", term)
        .groupBy("source", "aq", "eq")
        .agg(
            (F.col("aq") - PSI_BINS).alias("n_docs"),
            F.sum("_t").alias("_s"),
        )
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            (
                F.col("_s").cast("double")
                / (
                    F.col("aq").cast("double")
                    * F.col("eq").cast("double")
                    * F.lit(1e6)
                )
            ).alias("psi"),
        )
    )


ORACLE_PSI_DRIFT_BY_SOURCE = f"""
WITH hist AS (
    SELECT source, n_chars AS len, CAST(count(*) AS BIGINT) AS c
    FROM documents GROUP BY source, n_chars
),
gl AS (SELECT len, CAST(sum(c) AS BIGINT) AS gc FROM hist GROUP BY len),
cum AS (
    SELECT len, gc,
           CAST(sum(gc) OVER (ORDER BY len
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
           CAST(sum(gc) OVER () AS BIGINT) AS n
    FROM gl
),
thresholds AS (
    SELECT i, min(len) AS t
    FROM cum CROSS JOIN (SELECT unnest(range(1, {PSI_BINS})) AS i)
    WHERE {PSI_BINS} * cum >= i * n
    GROUP BY i
),
binned AS (
    SELECT h.source, h.len, h.c, CAST(count(t.t) AS BIGINT) AS bin
    FROM hist h LEFT JOIN thresholds t ON h.len > t.t
    GROUP BY h.source, h.len, h.c
),
src_bins AS (
    SELECT source, bin, CAST(sum(c) AS BIGINT) AS sc
    FROM binned GROUP BY source, bin
),
glob_bins AS (
    SELECT bin, CAST(sum(sc) AS BIGINT) AS gb FROM src_bins GROUP BY bin
),
grid AS (
    SELECT s.source, b.bin,
           CAST(COALESCE(sb.sc, 0) AS BIGINT) AS sc,
           CAST(COALESCE(gb.gb, 0) AS BIGINT) AS gb
    FROM (SELECT DISTINCT source FROM hist) s
    CROSS JOIN (SELECT unnest(range(0, {PSI_BINS})) AS bin) b
    LEFT JOIN src_bins sb ON sb.source = s.source AND sb.bin = b.bin
    LEFT JOIN glob_bins gb ON gb.bin = b.bin
),
sm AS (
    SELECT source, bin, sc, gb,
           CAST(sum(sc) OVER (PARTITION BY source) AS BIGINT) AS ns,
           CAST(sum(sc) OVER () AS BIGINT) AS n
    FROM grid
),
terms AS (
    SELECT source,
           ns + {PSI_BINS} AS aq,
           n + {PSI_BINS} AS eq,
           CAST((sc + 1) * (n + {PSI_BINS}) - (gb + 1) * (ns + {PSI_BINS})
                AS HUGEINT)
           * CAST(round(ln(CAST((sc + 1) * (n + {PSI_BINS}) AS DOUBLE)
                           / CAST((gb + 1) * (ns + {PSI_BINS}) AS DOUBLE))
                        * 1e6, 0) AS HUGEINT) AS t
    FROM sm
)
SELECT source,
       CAST(aq - {PSI_BINS} AS BIGINT) AS n_docs,
       CAST(sum(t) AS DOUBLE)
           / (CAST(aq AS DOUBLE) * CAST(eq AS DOUBLE) * 1e6) AS psi
FROM terms
GROUP BY source, aq, eq
"""


def psi_between(ref_hist: DataFrame, probe_hist: DataFrame) -> float:
    """PSI of a probe length-histogram against a reference histogram.

    Both inputs are ``(len, c)`` frames (any extra columns ignored).
    Same integer discipline as ``psi_drift_by_source``: thresholds are
    exact reference order statistics, Laplace smoothing, int128 term
    cross-products, one double division at the end.  Used by the
    streaming drift monitor (streaming/drift.py) to score each
    micro-batch BEFORE folding it into the reference; everything runs
    on the value domain, so the returned scalar costs one tiny job.
    """
    # r13 optimization (guide §2.4): ONE tagged pair histogram instead
    # of two per-side subplans.  The reference and probe sides were
    # each aggregated, threshold-joined and binned in their own subtree
    # (two broadcast joins, four aggregations); a union tagged with
    # (rc, pc) count columns runs the domain aggregation, the
    # threshold join and the binning ONCE for both sides — per side the
    # per-bin sums are unchanged (the tag columns are summed
    # independently), so the PSI value is bit-identical.
    pair = (
        ref_hist.select(
            "len", F.col("c").alias("rc"), F.lit(0).cast("bigint").alias("pc")
        )
        .unionByName(
            probe_hist.select(
                "len",
                F.lit(0).cast("bigint").alias("rc"),
                F.col("c").alias("pc"),
            )
        )
        .groupBy("len")
        .agg(
            F.sum("rc").cast("bigint").alias("rc"),
            F.sum("pc").cast("bigint").alias("pc"),
        )
    )
    # same digit-bucketed decomposition as the registered query — the
    # streaming monitor's reference histogram grows with the stream's
    # length domain too.  The cumulative runs over the pair frame's
    # rc column; rows with rc = 0 (probe-only lengths) add nothing to
    # the prefix sums, so the thresholds equal the reference-only form.
    wall = Window.partitionBy()
    cum = _bucketed_cumsum(pair, "len", ["rc"]).select(
        "len", F.col("cum_rc").alias("cum"), F.col("tot_rc").alias("n")
    )
    spark = ref_hist.sparkSession
    deciles = spark.range(1, PSI_BINS).select(F.col("id").alias("i"))
    thresholds = (
        cum.crossJoin(F.broadcast(deciles))
        .filter(F.lit(PSI_BINS) * F.col("cum") >= F.col("i") * F.col("n"))
        .groupBy("i")
        .agg(F.min("len").alias("t"))
    )

    both_bins = (
        pair.join(F.broadcast(thresholds), F.col("len") > F.col("t"), "left")
        .groupBy("len", "rc", "pc")
        .agg(F.count("t").alias("bin"))
        .groupBy("bin")
        .agg(
            F.sum("rc").cast("bigint").alias("e"),
            F.sum("pc").cast("bigint").alias("a"),
        )
    )

    bins = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    grid = (
        bins.join(F.broadcast(both_bins), "bin", "left")
        .withColumn("e", F.coalesce(F.col("e"), F.lit(0)).cast("bigint"))
        .withColumn("a", F.coalesce(F.col("a"), F.lit(0)).cast("bigint"))
        .withColumn("en", F.sum("e").over(wall) + PSI_BINS)
        .withColumn("an", F.sum("a").over(wall) + PSI_BINS)
    )
    _d = "decimal(38,0)"
    ap, ep = F.col("a") + 1, F.col("e") + 1
    l_micro = F.round(
        F.log(
            (ap.cast(_d) * F.col("en").cast(_d)).cast("double")
            / (ep.cast(_d) * F.col("an").cast(_d)).cast("double")
        )
        * 1e6
    ).cast("bigint")
    term = (
        ap.cast(_d) * F.col("en").cast(_d)
        - ep.cast(_d) * F.col("an").cast(_d)
    ) * l_micro.cast(_d)
    row = (
        grid.withColumn("_t", term)
        .groupBy("an", "en")
        .agg(F.sum("_t").alias("_s"))
        .select(
            (
                F.col("_s").cast("double")
                / (
                    F.col("an").cast("double")
                    * F.col("en").cast("double")
                    * F.lit(1e6)
                )
            ).alias("psi")
        )
        .collect()
    )
    return float(row[0]["psi"]) if row else 0.0


def pair_hist(hist: DataFrame, a: str = KS_A, b: str = KS_B) -> DataFrame:
    """(len, ca, cb) two-source histogram from a (source, len, c) one.

    Algebraic in ``c`` (a sum), so partial histograms folded across
    micro-batches produce the identical pair table — the property the
    streaming twin (streaming/ks.py) relies on.
    """
    return (
        hist.filter(F.col("source").isin(a, b))
        .groupBy("len")
        .agg(
            F.sum(F.when(F.col("source") == a, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("ca"),
            F.sum(F.when(F.col("source") == b, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("cb"),
        )
    )


def ks_from_pair(pair: DataFrame) -> DataFrame:
    """Exact KS statistic from a (len, ca, cb) pair histogram —
    the shared tail of the batch query and the streaming monitor."""
    # both cumulatives and both totals ride ONE bucketed prefix scan —
    # no unpartitioned ordered window over the length domain
    cum = _bucketed_cumsum(pair, "len", ["ca", "cb"]).select(
        F.col("cum_ca").alias("cuma"),
        F.col("cum_cb").alias("cumb"),
        F.col("tot_ca").alias("na"),
        F.col("tot_cb").alias("nb"),
    )
    diff = F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
    return (
        cum.withColumn("_d", diff)
        .groupBy("na", "nb")
        .agg(F.max("_d").cast("bigint").alias("ks_scaled"))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            "ks_scaled",
            (
                F.col("ks_scaled").cast("double")
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("ks_stat"),
        )
    )


def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact KS statistic between two sources' length distributions."""
    return ks_from_pair(pair_hist(_length_hist(spark, sf_dir)))


ORACLE_KS_TWO_SAMPLE = f"""
WITH hist AS (
    SELECT source, n_chars AS len, CAST(count(*) AS BIGINT) AS c
    FROM documents
    WHERE source IN ('{KS_A}', '{KS_B}')
    GROUP BY source, n_chars
),
pair AS (
    SELECT len,
           CAST(sum(CASE WHEN source = '{KS_A}' THEN c ELSE 0 END) AS BIGINT)
               AS ca,
           CAST(sum(CASE WHEN source = '{KS_B}' THEN c ELSE 0 END) AS BIGINT)
               AS cb
    FROM hist GROUP BY len
),
cum AS (
    SELECT
        CAST(sum(ca) OVER (ORDER BY len
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cuma,
        CAST(sum(cb) OVER (ORDER BY len
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cumb,
        CAST(sum(ca) OVER () AS BIGINT) AS na,
        CAST(sum(cb) OVER () AS BIGINT) AS nb
    FROM pair
)
SELECT na AS n_a, nb AS n_b,
       CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS ks_scaled,
       CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE)
           / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks_stat
FROM cum
GROUP BY na, nb
"""


#: Fixed-point scale for CUSUM value quantization (2^20).
CUSUM_SCALE = 1 << 20


def quantize_events(events: DataFrame) -> DataFrame:
    """(event_type, day, ts, event_id, q): the exact CUSUM input."""
    return events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        F.floor(F.col("value") * F.lit(CUSUM_SCALE)).cast("bigint").alias("q"),
    )


def cusum_day_partials(qev: DataFrame) -> DataFrame:
    """(event_type, day, bsum, bcnt) — the ALGEBRAIC partial the batch
    decomposition and the streaming fold both run on: summing partials
    over any split of the data gives bit-identical buckets."""
    _d = "decimal(38,0)"
    return qev.groupBy("event_type", "day").agg(
        F.sum(F.col("q").cast(_d)).cast(_d).alias("bsum"),
        F.count("*").cast(_d).alias("bcnt"),
    )


def cusum_day_changepoint(buckets: DataFrame) -> DataFrame:
    """Day-resolution CUSUM change point from accumulated partials.

    ``S'_d = n·cum_d − i_d·total`` over whole-day prefixes — what a
    streaming monitor can answer exactly from its folded state (the
    within-day row order is not reconstructable from partials, so the
    streaming twin reports at day granularity by design).
    """
    _d = "decimal(38,0)"
    wt = Window.partitionBy("event_type").orderBy("day")
    pre = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = Window.partitionBy("event_type")
    cur = buckets.select(
        "event_type",
        "day",
        F.sum("bsum").over(pre).cast(_d).alias("cum"),
        F.sum("bcnt").over(pre).cast(_d).alias("i"),
        F.sum("bsum").over(whole).cast(_d).alias("total"),
        F.sum("bcnt").over(whole).cast(_d).alias("n"),
    ).select(
        "event_type",
        "day",
        "n",
        (F.col("n") * F.col("cum") - F.col("i") * F.col("total"))
        .cast(_d)
        .alias("s"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s")).desc(), F.asc("day")
    )
    return (
        cur.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.col("day").alias("changepoint_day"),
            (
                F.abs(F.col("s")).cast("double")
                / (
                    F.col("n").cast("double")
                    * F.col("n").cast("double")
                    * F.lit(float(CUSUM_SCALE))
                )
            ).alias("peak_shift"),
        )
    )


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point per event type — SEQUENTIAL drift detection.

    The third drift test next to PSI/KS: those compare distributions;
    CUSUM finds WHEN a series shifted.  Per event type, the classic
    statistic is ``S_i = Σ_{j≤i}(x_j − μ)`` with the change point at
    ``argmax |S_i|``.  Multiplying through by n removes the division:
    ``S'_i = n·cum_i − i·total`` — every term an exact integer on the
    2^20-quantized values, carried in DECIMAL(38,0) so n·cum cannot
    overflow at web scale.  The peak is reported normalized
    (|S'|/(n²·2^20), the mean-shift magnitude in value units) — one
    double division of exact integers.

    Plan — the distributed prefix-scan decomposition.  event_type has
    a HANDFUL of values, so a naive per-type ordered window puts one
    type's entire stream (billions of rows at 100 TB) in one sorted
    task — exactly the skew mode the 135× events measurement exposed
    (26.8× wall).  Instead the series is segmented by calendar day:

    1. one map-side-combinable groupBy(type, day) → per-bucket
       (Σq, count) partials,
    2. per-bucket OFFSETS (prefix sums over buckets-before) via a
       window over the tiny (type, day) domain, broadcast back,
    3. the within-bucket cumsum/rownum windows partition on
       (type, day) — thousands of parallel partitions, each a
       bounded slice of one day,
    4. the global argmax = per-bucket argmax (same partitioning, no
       new exchange) → per-type argmax over the ~bucket-count rows,
       all under the single total order (|S'| desc, ts, event_id).

    Every quantity stays an exact integer (int128 carriers), so the
    decomposition is bit-identical to the single-walk form the oracle
    runs — the segmentation changes the PLAN, never the values.
    """
    _d = "decimal(38,0)"
    ev = quantize_events(table(spark, sf_dir, "events"))
    buckets = cusum_day_partials(ev)
    wt = Window.partitionBy("event_type").orderBy("day")
    before = wt.rowsBetween(Window.unboundedPreceding, -1)
    whole = Window.partitionBy("event_type")
    offsets = buckets.select(
        "event_type",
        "day",
        F.coalesce(F.sum("bsum").over(before), F.lit(0)).cast(_d).alias("cum0"),
        F.coalesce(F.sum("bcnt").over(before), F.lit(0)).cast(_d).alias("i0"),
        F.sum("bsum").over(whole).cast(_d).alias("total"),
        F.sum("bcnt").over(whole).cast(_d).alias("n"),
    )
    wb = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    frame = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = ev.select(
        "event_type",
        "day",
        "ts",
        "event_id",
        F.sum(F.col("q").cast(_d)).over(frame).cast(_d).alias("lcum"),
        F.row_number().over(wb).cast(_d).alias("li"),
    )
    cur = local.join(F.broadcast(offsets), ["event_type", "day"]).select(
        "event_type",
        "day",
        "ts",
        "event_id",
        "n",
        (
            F.col("n") * (F.col("cum0") + F.col("lcum"))
            - (F.col("i0") + F.col("li")) * F.col("total")
        )
        .cast(_d)
        .alias("s"),
    )
    # Per-bucket argmax shares the (type, day) partitioning — no new
    # exchange; the cross-bucket argmax then ranks ~one row per day.
    wrb = Window.partitionBy("event_type", "day").orderBy(
        F.abs(F.col("s")).desc(), F.asc("ts"), F.asc("event_id")
    )
    per_bucket = cur.withColumn("rb", F.row_number().over(wrb)).filter(
        F.col("rb") == 1
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s")).desc(), F.asc("ts"), F.asc("event_id")
    )
    return (
        per_bucket.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.col("ts").alias("changepoint_ts"),
            (
                F.abs(F.col("s")).cast("double")
                / (
                    F.col("n").cast("double")
                    * F.col("n").cast("double")
                    * F.lit(float(CUSUM_SCALE))
                )
            ).alias("peak_shift"),
        )
    )


ORACLE_CUSUM_CHANGEPOINT = f"""
WITH q AS (
    SELECT event_type, ts, event_id,
           CAST(floor(value * {CUSUM_SCALE}) AS BIGINT) AS q
    FROM events
    WHERE value IS NOT NULL
),
cur AS (
    SELECT event_type, ts, event_id,
           CAST(sum(q) OVER (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
               AS cum,
           CAST(row_number() OVER (PARTITION BY event_type
                                   ORDER BY ts, event_id) AS HUGEINT) AS i,
           CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT) AS n,
           CAST(sum(q) OVER (PARTITION BY event_type) AS HUGEINT) AS total
    FROM q
),
s AS (
    SELECT event_type, ts, event_id, n,
           CAST(n * cum - i * total AS HUGEINT) AS s
    FROM cur
),
ranked AS (
    SELECT event_type, ts, n, s,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY abs(s) DESC, ts, event_id) AS r
    FROM s
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       ts AS changepoint_ts,
       CAST(abs(s) AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * {float(CUSUM_SCALE)})
           AS peak_shift
FROM ranked
WHERE r = 1
"""


QUERIES = {
    "psi_drift_by_source": q_psi_drift_by_source,
    "ks_two_sample": q_ks_two_sample,
    "cusum_changepoint": q_cusum_changepoint,
}

ORACLES = {
    "psi_drift_by_source": ORACLE_PSI_DRIFT_BY_SOURCE,
    "ks_two_sample": ORACLE_KS_TWO_SAMPLE,
    "cusum_changepoint": ORACLE_CUSUM_CHANGEPOINT,
}
