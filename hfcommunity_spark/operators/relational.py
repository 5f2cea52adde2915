"""Declared relational query inventory (SURVEY.md §2.12).

Each query exists in two forms with identical column names and
bit-identical values:
- a Spark DataFrame builder (idiomatic: declarative plan, broadcast
  hints on dims, Catalyst does pushdown/pruning/reordering), and
- a DuckDB oracle SQL string.

Determinism rules (driver hash-compares values):
- Money/measure aggregates run in exact DECIMAL(18,2) arithmetic and
  cast to DOUBLE at the end → bit-identical across engines regardless
  of partial-agg order.  Raw (unaggregated) doubles and MIN/MAX of
  doubles are already bit-stable.
- Anything under a LIMIT or a rank carries a total-order tie-break.

Reference provenance for each shape is cited as
``databaseImport.py:<line>`` / ``docs/metrics.html:<line>`` per
SURVEY.md §2 (the reference delegates the query surface to MariaDB SQL,
reference README.md:5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query
from hfcommunity_spark.operators.skew import maybe_broadcast

DEC = "decimal(18,2)"


def dec(c: str) -> Column:
    """Exact fixed-point view of a 2-decimal measure column."""
    return F.col(c).cast(DEC)


def dsum(c: str) -> Column:
    """Deterministic SUM of a 2-decimal double column: exact decimal
    accumulation, final cast to double (same bits in Spark and DuckDB)."""
    return F.sum(dec(c)).cast("double")


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@query(
    "a7_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="A7,A10,P12",
)
def a7_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped sums/avgs with filter pushdown.
    Reference analog: AVG-per-group metric docs/metrics.html:194-198."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount")))
        .cast("double")
        .alias("sum_disc_price"),
        (dsum("l_quantity") / n).alias("avg_qty"),
        (dsum("l_extendedprice") / n).alias("avg_price"),
        n.alias("count_order"),
    )


@query(
    "a4_topk_customers_by_orders",
    """
    SELECT c.c_custkey, c.c_name, COUNT(*) AS order_cnt
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY order_cnt DESC, c_custkey
    LIMIT 10
    """,
    survey="A4,O2,J3",
)
def a4_topk_customers_by_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Most active organization' metric shape (docs/metrics.html:83-93):
    join + groupBy + count + top-10.  customer joins via the size-
    gated hint (it scales with SF — skew.maybe_broadcast);
    Catalyst compiles orderBy+limit to TakeOrderedAndProject (heap
    top-k, no full sort)."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return (
        orders.join(maybe_broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
        .orderBy(F.desc("order_cnt"), F.asc("c_custkey"))
        .limit(10)
    )


_BUCKET_SQL = """
    CASE WHEN cnt = 1 THEN '1'
         WHEN cnt BETWEEN 2 AND 5 THEN '2-5'
         WHEN cnt BETWEEN 6 AND 10 THEN '6-10'
         WHEN cnt BETWEEN 11 AND 15 THEN '11-15'
         WHEN cnt BETWEEN 16 AND 50 THEN '16-50'
         ELSE '>50' END
"""


@query(
    "a5_histogram_orders_per_customer",
    f"""
    SELECT {_BUCKET_SQL} AS bucket, COUNT(*) AS n_customers
    FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey)
    GROUP BY bucket
    """,
    survey="A5",
)
def a5_histogram_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Width-bucket histogram — same bucket edges as the reference's
    repos-by-#files metric (docs/metrics.html:268-288)."""
    orders = read_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    bucket = (
        F.when(F.col("cnt") == 1, "1")
        .when(F.col("cnt").between(2, 5), "2-5")
        .when(F.col("cnt").between(6, 10), "6-10")
        .when(F.col("cnt").between(11, 15), "11-15")
        .when(F.col("cnt").between(16, 50), "16-50")
        .otherwise(">50")
    )
    return per_cust.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@query(
    "a6_ratio_customers_with_orders",
    """
    SELECT CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS DOUBLE)
           / CAST((SELECT COUNT(*) FROM customer) AS DOUBLE) * 100 AS pct_with_orders
    """,
    survey="A6",
)
def a6_ratio_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gauge metric shape: '% repos with discussions'
    (docs/metrics.html:305-321)."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    num = orders.agg(F.count_distinct("o_custkey").alias("n_with"))
    den = customer.agg(F.count(F.lit(1)).alias("n_all"))
    return num.crossJoin(den).select(
        (F.col("n_with").cast("double") / F.col("n_all").cast("double") * 100).alias(
            "pct_with_orders"
        )
    )


@query(
    "a8_null_partition_count",
    """
    SELECT (NULLIF(o_orderpriority, '1-URGENT') IS NOT NULL) AS has_value,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
    survey="A8,P8",
)
def a8_null_partition_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yes/no null-partition count — paperswithcode_id metric shape
    (docs/metrics.html:126-151)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
        .isNotNull()
        .alias("has_value")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "a9_count_distinct",
    "SELECT COUNT(DISTINCT o_custkey) AS n_active_customers FROM orders",
    survey="A9",
)
def a9_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct on a key (dedup-on-key semantics, D1 analog)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.agg(F.count_distinct("o_custkey").alias("n_active_customers"))


@query(
    "a12_sketch_tolerance",
    """
    SELECT COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS hll_ok,
           TRUE AS pct_ok
    FROM events
    """,
    survey="A12",
)
def a12_sketch_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches (HyperLogLog++ distinct, percentile_approx
    quantile) asserted against EXACT values within their documented
    error bounds, so the driver can hash-check them: the exact distinct
    count is emitted verbatim, and the sketch outputs are reduced to
    within-tolerance booleans (TRUE on both engines when the sketch
    honours its error contract).  rsd=0.01 → we allow 5x slack (5%);
    percentile_approx(accuracy=10000) must land between the exact p40
    and p60.  At 100 TB the sketches are the only affordable plan —
    this query keeps them honest against the exact path at test scale.
    """
    events = read_table(spark, sf_dir, "events")
    li = read_table(spark, sf_dir, "lineitem")
    dist = events.agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
    ).select(
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("hll_ok"),
    )
    pct = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
        F.expr(
            "percentile(l_extendedprice, array(0.40, 0.60))"
        ).alias("p_exact"),
    ).select(
        (
            (F.col("p50_approx") >= F.col("p_exact")[0])
            & (F.col("p50_approx") <= F.col("p_exact")[1])
        ).alias("pct_ok")
    )
    return dist.crossJoin(pct)


@query(
    "a11_rollup_customers",
    """
    SELECT r_name, n_name, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    survey="A11,J4",
)
def a11_rollup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP over the region→nation hierarchy."""
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@query(
    "j3_orders_per_nation",
    """
    SELECT n_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    survey="J3,J9,A4",
)
def j3_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtype⋈supertype backbone join shape (model⋈repository,
    databaseImport.py:206) generalized: fact⋈dim⋈dim with broadcast
    dims."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        orders.join(maybe_broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_revenue"),
        )
    )


@query(
    "j4_customers_per_region",
    """
    SELECT r_name, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    survey="J4",
)
def j4_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop bridge join (tags_in_repo shape, databaseImport.py:200-203)."""
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "j5_self_join_nation_pairs",
    """
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
    """,
    survey="J5",
)
def j5_self_join_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join (commit_parents edge-list shape,
    databaseImport.py:236-239)."""
    nation = read_table(spark, sf_dir, "nation")
    a = nation.alias("a")
    b = nation.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_name") < F.col("b.n_name")),
    ).select(
        F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b")
    )


@query(
    "j6_theta_join_acctbal",
    """
    SELECT n_name, COUNT(*) AS n_pairs
    FROM supplier s
    JOIN customer c ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n_name
    """,
    survey="J6",
)
def j6_theta_join_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality (theta) join — 'discussions not by the repo owner'
    metric shape (docs/metrics.html:191-214)."""
    supplier = read_table(spark, sf_dir, "supplier")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        supplier.join(
            customer,
            (supplier.s_nationkey == customer.c_nationkey)
            & (supplier.s_acctbal > customer.c_acctbal),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "j2_semi_join_customers_with_orders",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    survey="J2",
)
def j2_semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi existence check (merge_commit_oid validation shape,
    databaseImport.py:480-488)."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "u3_anti_join_customers_without_orders",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    survey="U3",
)
def u3_anti_join_customers_without_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Left-anti — the incremental-load stale/fresh split
    (databaseImport.py:608,:619)."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "j7_composite_key_first_line",
    """
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l
    JOIN (SELECT l_orderkey, MIN(l_linenumber) AS l_linenumber
          FROM lineitem GROUP BY l_orderkey) f
      ON l.l_orderkey = f.l_orderkey AND l.l_linenumber = f.l_linenumber
    GROUP BY l_returnflag
    """,
    survey="J7,W4",
)
def j7_composite_key_first_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key equi join (discussion_event⋈discussion on
    (num, repo_id), databaseImport.py:250).

    Single-shuffle shape: instead of groupBy-min + join back (two
    lineitem shuffles), one window partitioned on the composite key —
    rank()==1 keeps every row tied at MIN(l_linenumber), exactly the
    join-back semantics (the synthetic key is not unique).

    Measured caveat: at sf0.1 the join-back variant is ~25% faster
    locally because AQE broadcasts the per-order min side (~150k rows)
    and the fact never shuffles — but that broadcast dies at real
    scale (one row per order), leaving two full fact shuffles; the
    window's single shuffle + sort is the plan that survives 100×.

    r14 profile (VERDICT r13 ask #5 — why ~1.0 s in-suite): NOT
    positional (1.02 s under a FULL-inventory anneal, same as the
    annealed-30 regime); the plan is already minimal — 4-column
    pruned scan (88 ms alone), WindowGroupLimit applied BOTH sides of
    the single exchange (rank-1 ties filtered map-side before the
    shuffle, Spark 4's rank-limit pushdown) — and the residual ~0.8 s
    is the sort+shuffle+window machinery's per-stage fixed cost on
    600k local rows (join-back re-measured 0.70 s, still rejected)."""
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(F.asc("l_linenumber"))
    return (
        li.withColumn("rn", F.rank().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
    )


@query(
    "j8_left_outer_order_stats",
    """
    SELECT c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           COUNT(DISTINCT c_custkey) AS n_customers,
           COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END)
             AS n_without_orders,
           CAST(COUNT(o_orderkey) AS DOUBLE)
             / CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) AS avg_orders_per_customer
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    survey="J8",
)
def j8_left_outer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + null-count ('% repos with discussions' gauge,
    docs/metrics.html:153-183)."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    j = customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
    return j.groupBy("c_mktsegment").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.count_distinct("c_custkey").alias("n_customers"),
        F.count_distinct(
            F.when(F.col("o_orderkey").isNull(), F.col("c_custkey"))
        ).alias("n_without_orders"),
        (
            F.count("o_orderkey").cast("double")
            / F.count_distinct("c_custkey").cast("double")
        ).alias("avg_orders_per_customer"),
    )


# ---------------------------------------------------------------------------
# Windows (SURVEY §2.5)
# ---------------------------------------------------------------------------


@query(
    "w1_top3_customers_per_nation",
    """
    SELECT n_name, c_name, c_acctbal, rnk FROM (
      SELECT n_name, c_name, c_acctbal,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ) AS INTEGER) AS rnk
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rnk <= 3
    """,
    survey="W1",
)
def w1_top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number (generalized top-10-orgs metric,
    docs/metrics.html:244-266)."""
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_name", "c_acctbal", "rnk")
    )


@query(
    "w2_lag_event_value_delta",
    """
    SELECT user_id, event_id,
           value - LAG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS value_delta
    FROM events
    """,
    survey="W2",
)
def w2_lag_event_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic over an event-time series (commits time-series
    shape, databaseImport.py:226)."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
    )


@query(
    "w3_running_spend_per_customer",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
    survey="W3",
)
def w3_running_spend_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running frame aggregate (running insertions/deletions per repo
    shape). Exact decimal accumulation keeps both engines bit-equal."""
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "w4_latest_order_per_customer",
    """
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           o_orderdate AS latest_orderdate
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
      ) AS rn FROM orders
    ) WHERE rn = 1
    """,
    survey="W4",
)
def w4_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last per group — 'latest commit per repo' (the sha column
    of repository, databaseImport.py:194, is exactly this)."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
        )
    )


# ---------------------------------------------------------------------------
# Sorts / limits (SURVEY §2.6) and set ops (§2.7)
# ---------------------------------------------------------------------------


@query(
    "o1_top_lineitems_by_price",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    survey="O1",
)
def o1_top_lineitems_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort+limit → TakeOrderedAndProject (source-pushed sort+limit
    analog, databaseImport.py:597)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@query(
    "o3_order_offset_page",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 5 OFFSET 5
    """,
    survey="O3",
)
def o3_order_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT + OFFSET pagination."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(5)
        .limit(5)
    )


@query(
    "u2_intersect_nations",
    """
    SELECT n_name FROM nation WHERE n_nationkey IN (
      SELECT c_nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    """,
    survey="U2",
)
def u2_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of key sets, resolved to names."""
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    keys = customer.select(F.col("c_nationkey").alias("k")).intersect(
        supplier.select(F.col("s_nationkey").alias("k"))
    )
    return nation.join(keys, nation.n_nationkey == keys.k, "left_semi").select(
        "n_name"
    )


@query(
    "u2_except_nations",
    """
    SELECT n_name FROM nation WHERE n_nationkey IN (
      SELECT c_nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
    )
    """,
    survey="U2",
)
def u2_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT of key sets (nations with customers but no suppliers)."""
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    keys = customer.select(F.col("c_nationkey").alias("k")).subtract(
        supplier.select(F.col("s_nationkey").alias("k"))
    )
    return nation.join(keys, nation.n_nationkey == keys.k, "left_semi").select(
        "n_name"
    )


# ---------------------------------------------------------------------------
# Scalar functions / projections / predicates (SURVEY §2.2, §2.9)
# ---------------------------------------------------------------------------


@query(
    "f1_sha2_surrogate_key",
    """
    SELECT doc_id,
           sha256(lang || '_' || CAST(doc_id AS VARCHAR)) AS surrogate_id
    FROM documents
    """,
    survey="F1",
)
def f1_sha2_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic SHA-256 surrogate key over concatenated natural
    keys with literal '_' separator — byte-exact reproduction of
    repo_file.id = sha256(repo_id + '_' + filename)
    (databaseImport.py:309,:419,:501)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        # F.concat, not concat_ws: '||' in the oracle NULL-propagates,
        # concat_ws silently drops NULLs — a NULL lang would hash to a
        # non-NULL key on one side only (round-6 review finding)
        F.sha2(
            F.concat(
                F.col("lang"), F.lit("_"), F.col("doc_id").cast("string")
            ),
            256,
        ).alias("surrogate_id"),
    )


@query(
    "f2_prefixed_ids",
    """
    SELECT c_custkey, 'customers/' || c_name AS prefixed_id FROM customer
    """,
    survey="F2",
)
def f2_prefixed_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-plural id prefixing ('models/' + id, databaseImport.py:604)."""
    customer = read_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey", F.concat(F.lit("customers/"), F.col("c_name")).alias("prefixed_id")
    )


@query(
    "f6_orders_per_month",
    """
    SELECT date_trunc('month', o_orderdate) AS order_month, COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
    survey="F6",
)
def f6_orders_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-floor date math — the reference's watermark computation
    (limit_date month-floor, databaseImport.py:866)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month")
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "p8_case_normalization",
    """
    SELECT CASE WHEN o_orderstatus IN ('P') THEN NULL
                ELSE o_orderstatus END AS status_norm,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
    survey="P8",
)
def p8_case_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE value normalization — gated tri-state → NULL
    (databaseImport.py:721-723)."""
    orders = read_table(spark, sf_dir, "orders")
    norm = F.when(F.col("o_orderstatus").isin("P"), F.lit(None)).otherwise(
        F.col("o_orderstatus")
    )
    return orders.groupBy(norm.alias("status_norm")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "p10_oversize_text_guard",
    """
    SELECT doc_id,
           CASE WHEN LENGTH(text) >= 300
                THEN 'The diff of this file is too large to store it'
                ELSE text END AS text_stored
    FROM documents
    """,
    survey="P10,F5",
)
def p10_oversize_text_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oversize-payload sentinel replacement (1 MiB diff guard,
    databaseImport.py:412-416; threshold scaled to fixture sizes)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(
            F.length("text") >= 300,
            F.lit("The diff of this file is too large to store it"),
        )
        .otherwise(F.col("text"))
        .alias("text_stored"),
    )


@query(
    "p12_q6_revenue_pushdown",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    survey="P12,F11",
)
def p12_q6_revenue_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: conjunctive predicates pushed to the parquet scan
    (verify PushedFilters in .explain), tiny projection, scalar agg."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )
