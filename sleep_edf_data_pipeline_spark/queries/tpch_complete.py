"""TPC-H completion: the 8 query shapes not yet in the suite.

Q4/Q6/Q10/Q11/Q12/Q14/Q16/Q20 analogues, adapted to the test schema
(no partsupp / l_commitdate / l_receiptdate / l_shipmode — supply
stats derive from lineitem, lateness from ``l_shipdate − o_orderdate``,
ship-mode from a deterministic quantity bucketing).  With these, every
one of the 22 TPC-H query *shapes* has a registered analogue.

Reference parity: the reference delegates all relational SQL of this
class to DuckDB/Snowflake (warehouse/duckdb_client.py:74-111); here
each shape is a native Catalyst plan with the join strategy a
1000-executor run needs — dim joins broadcast, fact-fact joins
shuffling once on their key, EXISTS/NOT-IN decorrelated to
semi/anti-joins, nested aggregates computed as grouped frames joined
back rather than correlated subqueries.

Float determinism: monetary sums in DECIMAL(18,2) (exact, order-free);
ratios computed once on exact operands then round(·, 6) — the
repo-wide contract (queries/__init__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(18,2)")


_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def _rev() -> Column:
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )


def _ts(s: str) -> Column:
    return F.lit(s).cast("timestamp_ntz")


# --- Q4: order-priority checking (EXISTS → left-semi join) -----------------

def q_priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority in 1997Q1 having a >30-day-late line.

    Q4's EXISTS decorrelates to a left-semi join: the equi key
    (orderkey) drives the shuffle and the lateness predicate rides
    along as a residual join condition, so Spark never materializes
    the match rows.  The quarter filter pushes into the orders scan
    (PushedFilters), shrinking the semi-join's left side before any
    exchange.
    """
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_PRIORITY_ORDER_COUNTS = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- Q6: forecasting revenue change (pure scan + agg) ----------------------

def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue delta if mid-band discounts were dropped (1997 ships).

    The simplest TPC-H plan and the purest pushdown test: every
    predicate (shipdate range, discount band, quantity cap) reaches
    the parquet scan, the projection prunes to 4 columns, and one
    partial+final agg produces a single row — zero joins, one
    exchange of one row per task.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


ORACLE_FORECAST_REVENUE = """
SELECT
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
    count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# --- Q10: returned-item reporting (top 20 by revenue) ----------------------

def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in 1997H2.

    Q10's plan: the quarter filter shrinks orders before the orderkey
    shuffle; lineitem keeps only R-flag rows (both filters pushed);
    customer+nation are dim-side broadcasts onto the aggregated
    per-customer revenue (one row per customer — never fact-scale).
    Total order (revenue DESC, custkey) before LIMIT keeps the top-20
    set deterministic under ties.
    """
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-07-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        rev.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            "c_acctbal",
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


ORACLE_RETURNED_ITEM_CUSTOMERS = f"""
SELECT c_custkey, c_name, revenue, c_acctbal, n_name AS nation
FROM (
    SELECT o_custkey, CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_custkey
) r
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q11: important stock (grouped value vs global-fraction threshold) -----

def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose supply value from nations 0-4 exceeds 2× the mean.

    Q11's nested aggregate (HAVING value > SELECT sum(...)*fraction)
    becomes: one partkey-grouped exact sum, a 1-row global re-agg
    broadcast back, and a filter — no correlated subquery, no second
    fact scan.  Supply value derives from lineitem (no partsupp in
    this schema): revenue shipped by suppliers of the chosen nations.
    TPC-H's 0.0001/SF fraction is scale-dependent; 2× the per-part
    mean keeps the selectivity meaningful at every SF.  Both compare
    operands are exact decimal sums cast once to double, so the
    comparison is bit-identical cross-engine.
    """
    supp = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    by_part = li.groupBy("l_partkey").agg(
        F.sum(_rev()).alias("__value_dec")
    )
    total = by_part.agg(
        F.sum("__value_dec").cast("double").alias("__total"),
        F.count("*").alias("__n_parts"),
    )
    return (
        by_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("__value_dec").cast("double") * F.col("__n_parts")
            > F.lit(2.0) * F.col("__total")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("__value_dec").cast("double").alias("supply_value"),
        )
        .orderBy(F.desc("supply_value"), "partkey")
    )


ORACLE_IMPORTANT_STOCK = f"""
WITH by_part AS (
    SELECT l_partkey, sum({_REV}) AS value_dec
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
    GROUP BY l_partkey
)
SELECT CAST(l_partkey AS INT) AS partkey,
       CAST(value_dec AS DOUBLE) AS supply_value
FROM by_part
WHERE CAST(value_dec AS DOUBLE) * (SELECT count(*) FROM by_part)
      > 2.0 * (SELECT CAST(sum(value_dec) AS DOUBLE) FROM by_part)
ORDER BY supply_value DESC, partkey
"""


# --- Q12: shipping buckets vs priority (conditional pivot-agg) -------------

def q_shipping_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High/low-priority late-line counts per quantity-derived bucket.

    Q12's shape with l_shipmode synthesized as a deterministic
    quantity bucketing (FAST ≤ 16 < REG ≤ 33 < BULK): the IN-filter
    keeps two buckets, 'late' is shipdate > orderdate + 60 days, and
    the two CASE-sums fold into one map-side-combining aggregate after
    the single orderkey shuffle.
    """
    li = table(spark, sf_dir, "lineitem").withColumn(
        "ship_bucket",
        F.when(F.col("l_quantity") <= 16, "FAST")
        .when(F.col("l_quantity") <= 33, "REG")
        .otherwise("BULK"),
    ).filter(F.col("ship_bucket").isin("FAST", "BULK"))
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


ORACLE_SHIPPING_PRIORITY_BUCKETS = """
SELECT ship_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM (
    SELECT l_orderkey, l_shipdate,
           CASE WHEN l_quantity <= 16 THEN 'FAST'
                WHEN l_quantity <= 33 THEN 'REG'
                ELSE 'BULK' END AS ship_bucket
    FROM lineitem
) l
JOIN orders ON l_orderkey = o_orderkey
WHERE ship_bucket IN ('FAST', 'BULK')
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY ship_bucket
ORDER BY ship_bucket
"""


# --- Q14: promotion effect (conditional ratio over broadcast join) ---------

def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROMO parts' share of March-1997 revenue, in percent.

    Q14: part broadcasts onto the month-filtered lineitem, both
    conditional sums land in one aggregate, and the percentage is one
    division on exact decimal operands, rounded to the repo's 6-digit
    contract.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast("decimal(18,2)"))).alias("__promo"),
        F.sum(_rev()).alias("__total"),
    )
    return agg.select(
        F.round(
            F.lit(100.0) * F.col("__promo").cast("double")
            / F.col("__total").cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        F.col("__promo").cast("double").alias("promo_revenue"),
    )


ORACLE_PROMO_REVENUE_SHARE = f"""
SELECT
    round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
          / CAST(sum({_REV}) AS DOUBLE), 6) AS promo_revenue_pct,
    CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV}
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


# --- Q16: supplier diversity per part group (anti-join + distinct agg) -----

def q_part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) group, excluding
    negative-balance suppliers and one brand.

    Q16's shape: the NOT-IN complaint filter decorrelates to a
    broadcast left-anti join on the (tiny) excluded-supplier set; the
    part dim broadcasts onto lineitem's (partkey, suppkey) projection;
    count(DISTINCT) runs as Spark's two-phase distinct-aggregate —
    partial dedup before the group shuffle, never a global distinct.
    """
    bad_supp = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 9, 17, 25, 33, 41, 49))
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE_PART_SUPPLIER_DIVERSITY = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 9, 17, 25, 33, 41, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- Q20: dominant suppliers of small parts (nested-agg semi-join) ---------

def q_dominant_small_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping >50% of some SMALL part's 1997 volume.

    Q20's nested-aggregate EXISTS becomes two grouped frames joined on
    partkey — per-(supplier, part) 1997 quantity vs per-part total —
    then a left-semi join projects qualifying suppliers.  Quantities
    sum exactly in DECIMAL so the 50% comparison is engine-stable;
    the part-type filter broadcasts into both aggregates' inputs.
    """
    small = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "SMALL")
        .select("p_partkey")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", _dec("l_quantity").alias("__q"))
    )
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("__q").alias("__pair_qty")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum("__q").alias("__part_qty")
    )
    dominant = per_pair.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("__pk")
    ).filter(
        F.col("__pair_qty") * F.lit(2).cast("decimal(18,2)") > F.col("__part_qty")
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        supp.join(
            dominant.select("l_suppkey").distinct(),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


ORACLE_DOMINANT_SMALL_PART_SUPPLIERS = """
WITH li AS (
    SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(18,2)) AS q
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
),
per_pair AS (
    SELECT l_partkey, l_suppkey, sum(q) AS pair_qty
    FROM li GROUP BY l_partkey, l_suppkey
),
per_part AS (
    SELECT l_partkey, sum(q) AS part_qty
    FROM li GROUP BY l_partkey
)
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (
    SELECT DISTINCT pp.l_suppkey
    FROM per_pair pp
    JOIN per_part pt ON pp.l_partkey = pt.l_partkey
    WHERE pp.pair_qty * CAST(2 AS DECIMAL(18,2)) > pt.part_qty)
ORDER BY s_suppkey
"""


QUERIES = {
    "priority_order_counts": q_priority_order_counts,
    "forecast_revenue": q_forecast_revenue,
    "returned_item_customers": q_returned_item_customers,
    "important_stock": q_important_stock,
    "shipping_priority_buckets": q_shipping_priority_buckets,
    "promo_revenue_share": q_promo_revenue_share,
    "part_supplier_diversity": q_part_supplier_diversity,
    "dominant_small_part_suppliers": q_dominant_small_part_suppliers,
}

ORACLES = {
    "priority_order_counts": ORACLE_PRIORITY_ORDER_COUNTS,
    "forecast_revenue": ORACLE_FORECAST_REVENUE,
    "returned_item_customers": ORACLE_RETURNED_ITEM_CUSTOMERS,
    "important_stock": ORACLE_IMPORTANT_STOCK,
    "shipping_priority_buckets": ORACLE_SHIPPING_PRIORITY_BUCKETS,
    "promo_revenue_share": ORACLE_PROMO_REVENUE_SHARE,
    "part_supplier_diversity": ORACLE_PART_SUPPLIER_DIVERSITY,
    "dominant_small_part_suppliers": ORACLE_DOMINANT_SMALL_PART_SUPPLIERS,
}
