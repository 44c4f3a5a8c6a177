"""Oracle-checked relational coverage beyond the reference's own SQL.

SURVEY §2.6 lists the operator classes the reference does NOT use
(semi/anti joins, distinct aggregation, rollup/cube, set ops, top-k,
approximate aggregates, regex/JSON functions).  The engine exposes them
as Spark built-ins, exercised here on the TPC-H-ish test tables with
DuckDB oracles.

Float determinism: monetary aggregates are summed in DECIMAL (exact
integer arithmetic — order-independent, bit-identical across engines)
and only cast to DOUBLE at the end; averages divide the exact decimal
sum by the exact count.  See queries/__init__ docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(18,2)")


# --- TPC-H Q1-style pricing summary (filter + hash agg + having-free) -------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-filter + grouped sums/averages/count with exact decimal sums."""
    li = table(spark, sf_dir, "lineitem")
    disc = F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    charge = F.lit(1).cast("decimal(18,2)") + _dec("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * disc).cast("double").alias("sum_disc_price"),
            F.sum(_dec("l_extendedprice") * disc * charge)
            .cast("double")
            .alias("sum_charge"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count("l_quantity"), 6
            ).alias("avg_qty"),
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double")
                / F.count("l_extendedprice"),
                6,
            ).alias("avg_price"),
            F.round(
                F.sum(_dec("l_discount")).cast("double") / F.count("l_discount"), 6
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT
    l_returnflag,
    l_linestatus,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS sum_disc_price,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
        AS sum_charge,
    round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        / count(l_quantity), 6) AS avg_qty,
    round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        / count(l_extendedprice), 6) AS avg_price,
    round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        / count(l_discount), 6) AS avg_disc,
    count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- TPC-H Q3-style top-k join (3-way join + agg + deterministic top-10) ----

def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, grouped revenue, deterministic top-10.

    The customer side is a small dimension → broadcast; the orderkey
    tie-break makes LIMIT deterministic.
    """
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz")
    )
    disc = F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    return (
        li.join(
            orders.join(
                F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner"
            ),
            li.l_orderkey == orders.o_orderkey,
            "inner",
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_dec("l_extendedprice") * disc).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_TOP_REVENUE_ORDERS = """
SELECT
    l_orderkey,
    o_orderdate,
    o_orderpriority,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- TPC-H Q5-style multi-join chain (snowflake join + agg) ----------------

def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem revenue per nation.

    The dimension chain (region→nation→customer) stays broadcast; only
    the orders⋈lineitem fact join shuffles — the plan a 100 TB run
    needs.
    """
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    disc = F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    dims = (
        cust.join(
            F.broadcast(
                nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            ),
            cust.c_nationkey == nation.n_nationkey,
        )
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * disc).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


ORACLE_REGIONAL_REVENUE = """
SELECT
    r_name,
    n_name,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS revenue,
    count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --- Left outer join + count-including-zero (TPC-H Q13 pattern) ------------

def q_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every customer with their order count (zeros kept)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


ORACLE_ORDERS_PER_CUSTOMER = """
SELECT c_custkey, c_name, count(o_orderkey) AS order_count
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


# --- Semi / anti joins ------------------------------------------------------

def q_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


ORACLE_CUSTOMERS_WITH_URGENT_ORDERS = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


ORACLE_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# --- Rollup / cube ----------------------------------------------------------

def q_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP with exact decimal sums and grouping-null totals."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


ORACLE_LINEITEM_ROLLUP = """
SELECT
    l_returnflag,
    l_linestatus,
    count(*) AS n_rows,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over status × priority."""
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("sum_total"),
    )


ORACLE_ORDERS_CUBE = """
SELECT
    o_orderstatus,
    o_orderpriority,
    count(*) AS n_orders,
    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- Set operations ---------------------------------------------------------

def q_nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer vs supplier nation keysets."""
    cust_nations = (
        table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    )
    supp_nations = (
        table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    )
    both = cust_nations.intersect(supp_nations).withColumn("src", F.lit("both"))
    cust_only = cust_nations.exceptAll(supp_nations).withColumn(
        "src", F.lit("customer_only")
    )
    supp_only = supp_nations.exceptAll(cust_nations).withColumn(
        "src", F.lit("supplier_only")
    )
    return both.unionByName(cust_only).unionByName(supp_only)


ORACLE_NATION_SET_OPS = """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS src FROM (SELECT * FROM c INTERSECT SELECT * FROM s)
UNION ALL
SELECT nationkey, 'customer_only' AS src FROM (SELECT * FROM c EXCEPT SELECT * FROM s)
UNION ALL
SELECT nationkey, 'supplier_only' AS src FROM (SELECT * FROM s EXCEPT SELECT * FROM c)
"""


# --- Distinct aggregation ----------------------------------------------------

def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct aggregation per group."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


ORACLE_DISTINCT_COUNTS = """
SELECT
    l_returnflag,
    count(DISTINCT l_partkey) AS n_parts,
    count(DISTINCT l_suppkey) AS n_suppliers,
    count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_returnflag
"""


def q_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (no oracle: sketch-specific).

    The scale path for distinct counting at 100 TB; the exact twin
    (q_distinct_counts) is the correctness anchor.  This is the
    PRODUCTION path (one sketch agg, no exact pass); the REGISTERED
    entry is the verdict form below (round 11, the heavy_hitters_cms
    precedent) so its rows-only driver record carries the contract.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_n_parts")
    )


#: HLL++ relative standard deviation requested above.
APPROX_DISTINCT_RSD = 0.01


def q_approx_distinct_parts_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The REGISTERED form: HLL++ estimate NEXT TO the exact distinct
    count, absolute error, and the 3·rsd (floor ±2) within_bound flag
    per group — deliberately runs the exact twin (one distinct agg);
    production callers wanting only estimates use the function above.
    """
    est = q_approx_distinct_parts(spark, sf_dir)
    exact = q_distinct_counts(spark, sf_dir).select("l_returnflag", "n_parts")
    j = est.join(exact, "l_returnflag")
    err = F.abs(F.col("approx_n_parts") - F.col("n_parts"))
    bound = F.greatest(
        F.lit(2.0),
        F.lit(3 * APPROX_DISTINCT_RSD) * F.col("n_parts").cast("double"),
    )
    return j.select(
        "l_returnflag",
        "approx_n_parts",
        "n_parts",
        err.cast("bigint").alias("abs_err"),
        F.lit(3 * APPROX_DISTINCT_RSD).alias("rel_bound_3rsd"),
        (err.cast("double") <= bound).alias("within_bound"),
    ).orderBy("l_returnflag")


# --- Multi-fact snowflake join (TPC-H Q9 pattern) ---------------------------

def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part ⋈ supplier ⋈ lineitem ⋈ orders ⋈ nation profit per nation/year.

    Both dimension chains (part-filter, supplier→nation) broadcast;
    the only shuffle joins the two fact tables on orderkey, then one
    hash agg.  This is the canonical 100 TB plan: facts shuffle once,
    dims never do.
    """
    part = table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    sn = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    amount = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    ) - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


ORACLE_PRODUCT_PROFIT = """
SELECT
    n_name AS nation,
    CAST(year(o_orderdate) AS BIGINT) AS o_year,
    CAST(sum(
        CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))
    ) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


# --- GROUPING SETS (beyond rollup/cube) -------------------------------------

def q_shipping_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: two orthogonal single-column groupings +
    grand total in one pass, with grouping_id to disambiguate."""
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT
            l_returnflag,
            l_linestatus,
            CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
            count(*) AS n_rows,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


ORACLE_SHIPPING_GROUPING_SETS = """
SELECT
    l_returnflag,
    l_linestatus,
    CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
    count(*) AS n_rows,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


# --- Ranking top-N per group ------------------------------------------------

def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number top-3 per customer by totalprice, orderkey tie-break."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


ORACLE_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
    SELECT
        o_custkey, o_orderkey, o_totalprice,
        CAST(row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
        ) AS INT) AS rn
    FROM orders
)
WHERE rn <= 3
"""


# --- Scalar function showcase ----------------------------------------------

def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / string ops / coalesce / nullif / between / in / case / abs."""
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("name_md5"),
        F.upper(F.col("c_mktsegment")).alias("seg_upper"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
        F.length(F.col("c_name")).cast("bigint").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("~")).alias(
            "seg_or_tilde"
        ),
        F.col("c_acctbal").between(0, 5000).alias("is_mid_balance"),
        F.col("c_mktsegment").isin("MACHINERY", "AUTOMOBILE").alias("is_industrial"),
        F.abs(F.col("c_acctbal")).alias("abs_balance"),
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("healthy")
        .alias("balance_tier"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("nonneg_balance"),
    )


ORACLE_SCALAR_FUNCTIONS = """
SELECT
    c_custkey,
    md5(c_name) AS name_md5,
    upper(c_mktsegment) AS seg_upper,
    substr(c_name, 1, 8) AS name_prefix,
    CAST(length(c_name) AS BIGINT) AS name_len,
    lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
    coalesce(nullif(c_mktsegment, 'BUILDING'), '~') AS seg_or_tilde,
    c_acctbal BETWEEN 0 AND 5000 AS is_mid_balance,
    c_mktsegment IN ('MACHINERY', 'AUTOMOBILE') AS is_industrial,
    abs(c_acctbal) AS abs_balance,
    CASE
        WHEN c_acctbal < 0 THEN 'overdrawn'
        WHEN c_acctbal < 1000 THEN 'low'
        ELSE 'healthy'
    END AS balance_tier,
    greatest(c_acctbal, CAST(0.0 AS DOUBLE)) AS nonneg_balance
FROM customer
"""



def q_priority_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — multiset semantics.

    The bag variants keep multiplicity (how many MORE 'open' orders of
    each priority than 'finished', and the common multiset), which the
    distinct set ops of nation_set_ops cannot express.  Spark plans
    these as a single aggregation computing per-row multiplicities —
    no join, one shuffle each.
    """
    orders = table(spark, sf_dir, "orders")
    open_p = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    done_p = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    surplus = (
        open_p.exceptAll(done_p)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .withColumn("src", F.lit("except_all"))
    )
    common = (
        open_p.intersectAll(done_p)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .withColumn("src", F.lit("intersect_all"))
    )
    return surplus.unionByName(common).select("src", "o_orderpriority", "n")


ORACLE_PRIORITY_SET_OPS_ALL = """
WITH open_p AS (
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
),
done_p AS (
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
),
surplus AS (
    SELECT 'except_all' AS src, o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM open_p EXCEPT ALL SELECT * FROM done_p)
    GROUP BY o_orderpriority
),
common AS (
    SELECT 'intersect_all' AS src, o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM open_p INTERSECT ALL SELECT * FROM done_p)
    GROUP BY o_orderpriority
)
SELECT src, o_orderpriority, n FROM surplus
UNION ALL
SELECT src, o_orderpriority, n FROM common
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "regional_revenue": q_regional_revenue,
    "orders_per_customer": q_orders_per_customer,
    "customers_with_urgent_orders": q_customers_with_urgent_orders,
    "customers_without_orders": q_customers_without_orders,
    "lineitem_rollup": q_lineitem_rollup,
    "orders_cube": q_orders_cube,
    "nation_set_ops": q_nation_set_ops,
    "priority_set_ops_all": q_priority_set_ops_all,
    "distinct_counts": q_distinct_counts,
    "approx_distinct_parts": q_approx_distinct_parts_verdict,
    "top_orders_per_customer": q_top_orders_per_customer,
    "scalar_functions": q_scalar_functions,
    "product_profit": q_product_profit,
    "shipping_grouping_sets": q_shipping_grouping_sets,
}

ORACLES = {
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "top_revenue_orders": ORACLE_TOP_REVENUE_ORDERS,
    "regional_revenue": ORACLE_REGIONAL_REVENUE,
    "orders_per_customer": ORACLE_ORDERS_PER_CUSTOMER,
    "customers_with_urgent_orders": ORACLE_CUSTOMERS_WITH_URGENT_ORDERS,
    "customers_without_orders": ORACLE_CUSTOMERS_WITHOUT_ORDERS,
    "lineitem_rollup": ORACLE_LINEITEM_ROLLUP,
    "orders_cube": ORACLE_ORDERS_CUBE,
    "nation_set_ops": ORACLE_NATION_SET_OPS,
    "priority_set_ops_all": ORACLE_PRIORITY_SET_OPS_ALL,
    "distinct_counts": ORACLE_DISTINCT_COUNTS,
    "top_orders_per_customer": ORACLE_TOP_ORDERS_PER_CUSTOMER,
    "scalar_functions": ORACLE_SCALAR_FUNCTIONS,
    "product_profit": ORACLE_PRODUCT_PROFIT,
    "shipping_grouping_sets": ORACLE_SHIPPING_GROUPING_SETS,
}
