"""Second extension batch for the delegated-SQL surface (S): interval
range frames, distribution window functions, ordered string
aggregation, pivot/conditional aggregation, exact mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query


@query(
    "w3_range_interval_frame",
    """
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS orders_last_30d
    FROM orders
    """,
    survey="W3,F6",
)
def w3_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with an interval bound over event time (orders in
    the trailing 30 days per customer) — the value-based frame spec
    rowsBetween can't express; exact integer counts."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               COUNT(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS orders_last_30d
        FROM orders
        """
    )


@query(
    "w1_ntile_percent_rank",
    """
    SELECT c_custkey,
           CAST(NTILE(4) OVER w AS INTEGER) AS acctbal_quartile,
           PERCENT_RANK() OVER w AS acctbal_pct_rank
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    survey="W1",
)
def w1_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile bucketing + percent
    rank (exact integer-ratio double) under a total order."""
    customer = read_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        F.ntile(4).over(w).alias("acctbal_quartile"),
        F.percent_rank().over(w).alias("acctbal_pct_rank"),
    )


@query(
    "a13_string_agg_nations",
    """
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    survey="A10,F12,U1",
)
def a13_string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG) — deterministic via the
    explicit ORDER BY; Spark side sorts the collected array before
    joining (collect_list order is partition-dependent, array_sort
    makes it canonical)."""
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            )
        )
    )


@query(
    "a14_pivot_event_counts",
    """
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'view') AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
    survey="A5,A10,P9",
)
def a14_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (long→wide reshape; the
    fixed list keeps the schema static — required for any pivot at
    scale and for the oracle's conditional-aggregation twin)."""
    ev = read_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .count()
        .na.fill(0, kinds)
    )


@query(
    "q7_nation_pair_volume",
    """
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS yr,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name <> n2.n_name
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
    survey="J3,J5,J6,A7",
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year — 5-way join
    with a nation self-pairing inequality, grouped exact-decimal
    revenue."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    from hfcommunity_spark.operators.relational import DEC, dec

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), supplier.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), customer.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q22_idle_rich_customers",
    """
    SELECT substring(c_name, 10, 1) AS name_digit,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY name_digit
    """,
    survey="J2,U3,A7,F12",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders,
    grouped by a name substring — scalar subquery + anti join +
    substring bucketing composed."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT substring(c_name, 10, 1) AS name_digit,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_bal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY name_digit
        """
    )


@query(
    "a15_exact_mode_per_segment",
    """
    SELECT c_mktsegment, o_orderpriority AS top_priority, n FROM (
      SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY COUNT(*) DESC, o_orderpriority
             ) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderpriority
    ) WHERE rn = 1
    """,
    survey="A4,W1,W4",
)
def a15_exact_mode_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode (most frequent order priority per segment) with a
    total-order tie-break — the argmax-per-group pattern."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    counts = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("top_priority"),
            "n",
        )
    )
