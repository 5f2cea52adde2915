"""Extended relational inventory: as-of / range joins (SURVEY §2.3
J10), cube / grouping sets (§2.4 A11), lead analytics (§2.5 W2), JSON
projection (§2.9 F4/F12), the watermark split as a query (§2.2 P2),
and two classic multi-join benchmark shapes (TPC-H Q3/Q5 analogs) that
give the bench real join/agg weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query
from hfcommunity_spark.operators.skew import maybe_broadcast
from hfcommunity_spark.operators.relational import DEC, dec, dsum


@query(
    "j10_asof_last_view_before_purchase",
    """
    SELECT p.event_id, p.user_id, MAX(v.ts) AS last_view_ts
    FROM events p LEFT JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
    survey="J10,W3",
)
def j10_asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase paired with the user's most recent
    view at-or-before it.  The oracle is the naive inequality join;
    the Spark plan is the scalable union+window formulation — one sort
    per user partition, no range-join blowup (this is the idiomatic
    100 TB as-of)."""
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("last_view_ts", last_view)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "last_view_ts")
    )


@query(
    "j10_range_join_value_buckets",
    """
    SELECT b.label, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN (VALUES ('0-100', 0.0, 100.0), ('100-250', 100.0, 250.0),
                 ('250-500', 250.0, 500.0)) b(label, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.label
    """,
    survey="J10,J9",
)
def j10_range_join_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join against a broadcast bucket dim — the
    inequality-join building block; at scale the small side is always
    the broadcast side so the fact never shuffles."""
    ev = read_table(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [("0-100", 0.0, 100.0), ("100-250", 100.0, 250.0),
         ("250-500", 250.0, 500.0)],
        ["label", "lo", "hi"],
    )
    return (
        ev.join(
            F.broadcast(buckets),
            (ev.value >= buckets.lo) & (ev.value < buckets.hi),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )


@query(
    "a11_cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    survey="A11",
)
def a11_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over two dimensions (all 4 grouping sets)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "a11_grouping_sets",
    """
    SELECT r_name, n_name, COUNT(*) AS n
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), ())
    """,
    survey="A11",
)
def a11_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (region-only, nation-only, grand total)
    via the SQL surface — Spark SQL parses/plans it natively."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    read_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    read_table(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT r_name, n_name, COUNT(*) AS n
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        """
    )


@query(
    "w2_lead_next_order_gap",
    """
    SELECT o_custkey, o_orderkey,
           LEAD(o_orderkey) OVER w AS next_orderkey,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          CAST(LEAD(o_orderdate) OVER w AS DATE))
                AS INTEGER) AS gap_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    survey="W2",
)
def w2_lead_next_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() analytic: next order + day gap per customer."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.datediff(
            F.lead(F.to_date("o_orderdate")).over(w), F.to_date("o_orderdate")
        ).alias("gap_days"),
    )


@query(
    "f4_json_projection",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
    survey="F4,F12",
)
def f4_json_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured projection: JSON string column → typed field
    (the from_json/get_json_object view over card_data/full_data blobs,
    SURVEY §1.1)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@query(
    "p2_watermark_split_counts",
    """
    SELECT (o_orderdate >= TIMESTAMP '1998-01-01') AS is_fresh,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders WHERE o_orderdate IS NOT NULL
    GROUP BY is_fresh
    """,
    survey="P2,U3",
)
def p2_watermark_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-load watermark split as a query, via the actual
    etl.incremental utility (fresh = full re-extract path, stale =
    partial-update path; databaseImport.py:608)."""
    from hfcommunity_spark.etl.incremental import split_by_watermark

    # NULL order dates are excluded on BOTH sides (the etl utility
    # classifies them fresh, the oracle's GROUP BY would give them a
    # NULL group), and an empty split emits NO row — GROUP BY
    # semantics, so a degenerate all-fresh dataset agrees too
    # (round-6 review finding)
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    wm = F.lit("1998-01-01").cast("timestamp")
    fresh, stale = split_by_watermark(orders, wm, ts_col="o_orderdate")

    def _count(df: DataFrame, flag: bool) -> DataFrame:
        return (
            df.agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.count_distinct("o_custkey").alias("n_customers"),
            )
            .select(F.lit(flag).alias("is_fresh"), "n_orders", "n_customers")
            .filter(F.col("n_orders") > 0)
        )

    return _count(fresh, True).unionByName(_count(stale, False))


@query(
    "sub_correlated_scalar",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                                    AS DOUBLE) / COUNT(*)
                       FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
    survey="J2,A7,P12",
)
def sub_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (customers above their nation's mean
    balance) through the SQL surface — Catalyst decorrelates it into
    an aggregate + join (RewriteCorrelatedScalarSubquery, SURVEY §4.2),
    exactly what MariaDB's optimizer did for the reference."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                                        AS DOUBLE) / COUNT(*)
                           FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "sub_having_vs_global_avg",
    """
    SELECT n_name, n_customers FROM (
      SELECT n_name, COUNT(*) AS n_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    ) WHERE n_customers > (SELECT COUNT(*) FROM customer)
                          / (SELECT COUNT(*) FROM nation)
    """,
    survey="A4,J3,U2",
)
def sub_having_vs_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING against uncorrelated scalar subqueries (nations with an
    above-average customer count) — integer-exact comparison."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    read_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT n_name, n_customers FROM (
          SELECT n_name, COUNT(*) AS n_customers
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name
        ) WHERE n_customers > (SELECT COUNT(*) FROM customer)
                              / (SELECT COUNT(*) FROM nation)
        """
    )


@query(
    "f12_scalar_function_sweep",
    """
    SELECT o_orderkey,
           upper(substring(o_orderpriority, 1, 1)) AS prio_code,
           lower(o_orderstatus) AS status_lc,
           replace(o_orderpriority, '-', '_') AS prio_norm,
           lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_padded,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           o_orderdate + INTERVAL 30 DAY AS due_date
    FROM orders
    """,
    survey="F12,F6,P1",
)
def f12_scalar_function_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General string/date scalar-function surface (the delegated
    MariaDB SQL capability, reference README.md:5): substring, case
    mapping, replace, padding, date part extraction, interval math —
    all whole-stage-codegen built-ins."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_code"),
        F.lower("o_orderstatus").alias("status_lc"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias(
            "prio_norm"
        ),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("key_padded"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
    )


@query(
    "ri_orphan_audit",
    """
    SELECT
      (SELECT COUNT(*) FROM lineitem
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
        AS orphan_lineitems,
      (SELECT COUNT(*) FROM orders
       WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
        AS orphan_orders
    """,
    survey="J2,U3,S13",
)
def ri_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit as a query: left-anti orphan counts
    must be zero for a consistent snapshot — the Spark replacement for
    MariaDB FK enforcement (SURVEY §1.3; schema.fk_violations is the
    generic form over the 17-table FK metadata)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    a = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    b = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    return a.crossJoin(b)


@query(
    "q3_unshipped_revenue_topk",
    """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    survey="J3,A4,O1,P12",
)
def q3_unshipped_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-table join, selective filters on both fact
    sides (pushed to the scans), grouped revenue, top-10."""
    customer = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_supplier_nation_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    survey="J3,J4,J9,A7",
)
def q5_supplier_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table snowflake join with a co-nationality
    constraint — the broad-join stress shape for the bench."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (supplier.s_nationkey == customer.c_nationkey),
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )
