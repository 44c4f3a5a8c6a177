"""Round-9: distributed Pareto frontier (skyline) over price × quantity.

The classic multi-criteria operator (Börzsönyi et al., ICDE 2001 —
the ``SKYLINE OF`` clause): the non-dominated set of lineitem offers,
minimizing ``l_extendedprice`` while maximizing ``l_quantity``.  An
offer is on the frontier iff no other offer is cheaper-or-equal AND
bigger-or-equal with at least one strict — the "best price for the
volume" curve a procurement query walks.

The 2-D skyline reduces to a PREFIX MAX: keep the per-price best
quantity, order by price, and a point survives iff its quantity
strictly exceeds the running max over all cheaper prices.  A naive
Spark translation is a global ordered window — every distinct price
in ONE task (the verify-skill anti-pattern).  This plan uses the
repo's calendar-decomposition trick (``peak_concurrent_sessions``)
generalized to value-range buckets:

1. prices bucket into ``N_BUCKETS`` equal ranges against a broadcast
   1-row min/max stats frame computed from the RAW scan (the
   zorder/host pattern — no driver collect, no subtree recompute);
2. ONE corpus shuffle: `repartition("bkt")`.  ``cents`` determines
   ``bkt``, so `HashPartitioning(bkt)` satisfies the clustered
   distribution of EVERY downstream step — the per-(price, qty)
   count, the per-price argmax window (`partitionBy(bkt, cents)`),
   the within-bucket running max (`partitionBy(bkt)`), and the
   per-bucket maxima aggregate — each becomes a sort or hash-agg on
   the already-clustered partitions, zero further corpus exchanges
   (r10 rewrite of the r9 4-exchange plan; oracle unchanged);
3. the ACROSS-bucket prefix is the max of per-bucket maxima — a
   window over ≤ ``N_BUCKETS`` rows, the only unpartitioned spec in
   the plan and bounded by a constant, broadcast-joined back;
4. effective prefix = greatest(within-bucket, preceding-bucket) —
   exact, order-free integer arithmetic.

Prices are handled in exact cents: the DOUBLE column stores 2-decimal
values, so ``round(x · 100) → BIGINT`` recovers the integer exactly —
the ``round()`` is load-bearing on BOTH engines (Spark CASTs doubles
by truncation, DuckDB by rounding; an unguarded cast diverges on the
~half of rows whose ×100 representation error is negative).  Every
comparison is then integer; the output divides back to DOUBLE once.

Reference scope: no multi-criteria surface in the reference
(blaiseclarke/sleep-edf-data-pipeline); extends SURVEY §2.6's
relational breadth per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

#: Price-range buckets for the decomposed prefix max.  The cross-
#: bucket pass is a window over this many rows — constant, never
#: corpus-sized.
N_BUCKETS = 256


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No spread(): the bkt repartition below already widens the narrow
    # local scan (spread-then-repartition would shuffle the corpus
    # twice for the same effect), and the stats agg is a straight
    # scan-side fold.
    li = table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    stats = li.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    part = (
        li.crossJoin(F.broadcast(stats))
        .select(
            "cents",
            "qty",
            F.expr(f"(cents - lo) * {N_BUCKETS} div (hi - lo + 1)").alias(
                "bkt"
            ),
        )
        .repartition("bkt")
    )
    pq = part.groupBy("bkt", "cents", "qty").agg(
        F.count("*").cast("bigint").alias("c")
    )
    # cents determines bkt, so this partitioning is semantically
    # per-cents; declaring bkt first lets the one repartition satisfy
    # the window's required distribution.
    w_price = Window.partitionBy("bkt", "cents").orderBy(F.desc("qty"))
    per_price = (
        pq.withColumn("_rn", F.row_number().over(w_price))
        .filter(F.col("_rn") == 1)
        .select("bkt", "cents", F.col("qty").alias("q"), "c")
    )

    w_in = (
        Window.partitionBy("bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # persist the reduced per-price frame: two consumers (the bucket-
    # maxima prefix side and the re-attach join's left side) would
    # each re-run the scan + repartition + windows otherwise.  Grain
    # is one row per distinct price — bounded by the price DOMAIN
    # cardinality, not the corpus.  Lazy persist; the bench/driver
    # clear caches between queries (registry posture).
    bucketed = per_price.withColumn(
        "prev_in", F.max("q").over(w_in)
    ).persist()

    bmax = bucketed.groupBy("bkt").agg(F.max("q").alias("bq"))
    # <= N_BUCKETS rows: the one unpartitioned window, constant-bounded
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bmax.select("bkt", F.max("bq").over(w_b).alias("prev_b"))

    joined = bucketed.join(F.broadcast(prefix), "bkt")
    prevmax = F.greatest(
        F.coalesce(F.col("prev_in"), F.lit(-1).cast("bigint")),
        F.coalesce(F.col("prev_b"), F.lit(-1).cast("bigint")),
    )
    return (
        joined.filter(F.col("q") > prevmax)
        .select(
            (F.col("cents").cast("double") / F.lit(100.0)).alias("price"),
            F.col("q").alias("quantity"),
            F.col("c").alias("n_offers"),
        )
    )


ORACLE_PARETO_FRONTIER = """
WITH li AS (
    SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
           CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem
),
pq AS (
    SELECT cents, qty, CAST(count(*) AS BIGINT) AS c
    FROM li GROUP BY cents, qty
),
per_price AS (
    SELECT cents, qty AS q, c FROM (
        SELECT *, row_number() OVER (
            PARTITION BY cents ORDER BY qty DESC) AS rn
        FROM pq)
    WHERE rn = 1
),
sky AS (
    SELECT cents, q, c,
           max(q) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
    FROM per_price
)
SELECT CAST(cents AS DOUBLE) / 100.0 AS price,
       q AS quantity,
       c AS n_offers
FROM sky WHERE pm IS NULL OR q > pm
"""


QUERIES = {
    "pareto_frontier": q_pareto_frontier,
}

ORACLES = {
    "pareto_frontier": ORACLE_PARETO_FRONTIER,
}
