"""Breadth coverage: ranking-function suite, fuzzy string dedup,
unpivot, scalar subqueries.

Rounds out operator classes adjacent to SURVEY §2.6's gap list:
the full SQL ranking-function family, edit-distance fuzzy matching
(the string-similarity cousin of the dedup suite — vocabulary-level
near-dup detection for training corpora), wide→long unpivot, and
scalar-subquery filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table


# --- Ranking / distribution window functions --------------------------------

def q_window_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / lead / first+nth value frames.

    All over one (custkey, totalprice desc, orderkey) window — a single
    sort, every ranking family member in one pass.
    """
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).cast("bigint").alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w_frame).alias("top_orderkey"),
        F.nth_value("o_orderkey", 2).over(w_frame).alias("second_orderkey"),
    )


ORACLE_WINDOW_FUNCTION_SUITE = """
SELECT
    o_custkey,
    o_orderkey,
    o_totalprice,
    CAST(ntile(4) OVER w AS BIGINT) AS price_quartile,
    round(percent_rank() OVER w, 6) AS pct_rank,
    round(cume_dist() OVER w, 6) AS cume,
    lead(o_orderkey, 1) OVER w AS next_orderkey,
    first_value(o_orderkey) OVER wf AS top_orderkey,
    nth_value(o_orderkey, 2) OVER wf AS second_orderkey
FROM orders
WINDOW
    w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC),
    wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# --- Fuzzy string dedup (edit distance + lossless length blocking) ----------

def q_fuzzy_name_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-level fuzzy dedup: distinct part names within
    Levenshtein distance 2.

    Lossless blocking: a pair within edit distance d differs in length
    by at most d, so the length-window join condition never drops a
    qualifying pair.  The distinct-name frame is vocabulary-sized
    (≪ corpus), so the self-join broadcasts; the edit-distance kernel
    is JVM-side ``levenshtein``.
    """
    names = (
        table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    a = names.select(F.col("name").alias("name_a"), F.length("name").alias("_la"))
    b = names.select(F.col("name").alias("name_b"), F.length("name").alias("_lb"))
    return (
        a.join(
            F.broadcast(b),
            (F.col("name_a") < F.col("name_b"))
            & (F.col("_lb") >= F.col("_la") - 2)
            & (F.col("_lb") <= F.col("_la") + 2),
        )
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("edit_dist") <= 2)
        .select("name_a", "name_b", "edit_dist")
    )


ORACLE_FUZZY_NAME_DEDUP = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT
    a.name AS name_a,
    b.name AS name_b,
    CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist
FROM names a
JOIN names b
  ON a.name < b.name
 AND length(b.name) BETWEEN length(a.name) - 2 AND length(a.name) + 2
WHERE levenshtein(a.name, b.name) <= 2
"""


# --- Unpivot (wide → long) --------------------------------------------------

def q_part_attributes_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot numeric part attributes into (attr, val) long form."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "attr", "val")


ORACLE_PART_ATTRIBUTES_UNPIVOT = """
SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val FROM part
"""


# --- Scalar subquery --------------------------------------------------------

def q_above_average_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price (scalar subquery filter).

    Expressed as actual correlated-free scalar subquery SQL so Catalyst
    plans the subquery (one reduction + broadcast of the scalar), not a
    hand-materialized literal.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM _orders_sq
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM _orders_sq)
        """
    )


ORACLE_ABOVE_AVERAGE_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
"""


def q_scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history: customer priority-state validity intervals.

    The dimension-history build every warehouse runs: treat each
    customer's order stream as a change log of their priority state,
    collapse CONSECUTIVE same-priority orders into one interval
    (gaps-and-islands via the two-row_number difference — a pure
    integer group key), and emit [valid_from, valid_to) ranges where
    valid_to is the next interval's start (NULL = current row).

    One customer-key shuffle; both row_numbers and the interval bounds
    ride the same partitioning (the window chain shares one exchange —
    the pinned pattern from operators/islands.py).  Interval bounds
    are raw timestamps selected by min/max — no arithmetic, exact.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    )
    wc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey", "o_orderpriority").orderBy(
        "o_orderdate", "o_orderkey"
    )
    runs = orders.withColumn(
        "run_id", F.row_number().over(wc) - F.row_number().over(wp)
    )
    spans = runs.groupBy("o_custkey", "o_orderpriority", "run_id").agg(
        F.min("o_orderdate").alias("valid_from"),
        # Unique per span (orderkeys are unique): the tiebreaker that
        # keeps the lead() order total when two spans share a date.
        F.min("o_orderkey").alias("first_key"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    wn = Window.partitionBy("o_custkey").orderBy("valid_from", "first_key")
    return spans.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        "valid_from",
        F.lead("valid_from").over(wn).alias("valid_to"),
        "n_orders",
        (F.lead("valid_from").over(wn).isNull()).alias("is_current"),
    )


ORACLE_SCD2_CUSTOMER_PRIORITY = """
WITH runs AS (
    SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey)
           - row_number() OVER (PARTITION BY o_custkey, o_orderpriority
                                ORDER BY o_orderdate, o_orderkey) AS run_id
    FROM orders
),
spans AS (
    SELECT o_custkey, o_orderpriority, run_id,
           min(o_orderdate) AS valid_from,
           min(o_orderkey) AS first_key,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM runs
    GROUP BY o_custkey, o_orderpriority, run_id
)
SELECT o_custkey AS custkey,
       o_orderpriority AS priority,
       valid_from,
       lead(valid_from) OVER w AS valid_to,
       n_orders,
       (lead(valid_from) OVER w IS NULL) AS is_current
FROM spans
WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from, first_key)
"""


QUERIES = {
    "scd2_customer_priority": q_scd2_customer_priority,
    "window_function_suite": q_window_function_suite,
    "fuzzy_name_dedup": q_fuzzy_name_dedup,
    "part_attributes_unpivot": q_part_attributes_unpivot,
    "above_average_orders": q_above_average_orders,
}

ORACLES = {
    "scd2_customer_priority": ORACLE_SCD2_CUSTOMER_PRIORITY,
    "window_function_suite": ORACLE_WINDOW_FUNCTION_SUITE,
    "fuzzy_name_dedup": ORACLE_FUZZY_NAME_DEDUP,
    "part_attributes_unpivot": ORACLE_PART_ATTRIBUTES_UNPIVOT,
    "above_average_orders": ORACLE_ABOVE_AVERAGE_ORDERS,
}
