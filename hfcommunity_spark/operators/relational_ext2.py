"""Second extension batch for the delegated-SQL surface (S): interval
range frames, distribution window functions, ordered string
aggregation, pivot/conditional aggregation, exact mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query
from hfcommunity_spark.operators.skew import maybe_broadcast


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
    rank (exact integer-ratio double) under a total order.

    ``ntile``/``percent_rank`` are total-order BY SEMANTICS, but the
    naive ``Window.orderBy(...)`` plan moves the whole table through
    ONE task — the last single-partition sort in the repo (VERDICT r6
    "What's wrong" #1).  Both functions are pure functions of
    (rank, n), and rank DECOMPOSES: bucket ``c_acctbal`` by whole
    dollars (the value domain is [-999.99, 9999.99] → ≤11k cells,
    bounded by the DOMAIN, not the row count), take per-bucket counts
    with one map-side-combined aggregate, turn them into per-bucket
    below-counts driver-side (an ≤11k-row collect, the same
    bounded-by-construction discipline as the k-means codebook), and
    break ties WITHIN a bucket cell with a fine-grained partitioned
    window — the ``t_source_relative_quality_filter`` histogram
    pattern (textops.py:759) applied to a global order.  Then
    ``rank = below + row_number`` and::

        percent_rank = (rank - 1) / (n - 1)
        ntile(4)     = first r0 tiles take q+1 rows, rest take q,
                       where (q, r0) = divmod(n, 4)

    Same declared semantics and oracle; per-task work bounded at any
    scale.  No value can straddle buckets (equal acctbals share a
    bucket), so cross-bucket ties cannot exist."""
    customer = read_table(spark, sf_dir, "customer")
    bkt_col = F.floor(F.col("c_acctbal")).cast("long")
    rows = (
        customer.groupBy(bkt_col.alias("bkt"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # bounded: ≤11k whole-dollar cells by value domain
    )
    # TPC-H c_acctbal is NOT NULL; the decomposition leans on that
    # (a NULL bkt would TypeError in sorted() and silently drop rows
    # at the inner join below) — fail loudly if the domain assumption
    # ever breaks instead of corrupting ranks (ADVICE r7)
    null_cnt = sum(r.cnt for r in rows if r.bkt is None)
    if null_cnt:
        raise ValueError(
            f"w1_ntile_percent_rank: {null_cnt} rows with NULL "
            "c_acctbal — histogram rank decomposition requires a "
            "NOT NULL order key"
        )
    hist = sorted((r.bkt, r.cnt) for r in rows)
    n = sum(c for _, c in hist)
    below_rows, acc = [], 0
    for b, c in hist:
        below_rows.append((b, acc))
        acc += c
    cum = spark.createDataFrame(below_rows, "bkt long, below long")
    q, r0 = divmod(n, 4)
    cut = r0 * (q + 1)  # last rank served by the (q+1)-sized tiles
    w_tie = Window.partitionBy("bkt").orderBy("c_acctbal", "c_custkey")
    ranked = (
        customer.withColumn("bkt", bkt_col)
        .join(F.broadcast(cum), "bkt")
        .withColumn("rk", F.col("below") + F.row_number().over(w_tie))
    )
    # integer DIV keeps both branches exact; the q=0 edge (n < 4)
    # never reaches the second branch (cut = n there)
    ntile = F.when(
        F.col("rk") <= cut,
        F.expr(f"(rk + {q}) DIV {q + 1}"),
    ).otherwise(F.expr(f"{r0} + (rk - {cut} + {max(q, 1)} - 1) DIV {max(q, 1)}"))
    pct = F.when(
        F.lit(n) > 1,
        (F.col("rk") - 1).cast("double") / F.lit(n - 1),
    ).otherwise(F.lit(0.0))
    return ranked.select(
        "c_custkey",
        ntile.cast("int").alias("acctbal_quartile"),
        pct.alias("acctbal_pct_rank"),
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
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                    AS DOUBLE) / COUNT(*)
                           FROM customer WHERE c_acctbal > 0)
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
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                        AS DOUBLE) / COUNT(*)
                               FROM customer WHERE c_acctbal > 0)
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
        orders.join(maybe_broadcast(customer), orders.o_custkey == customer.c_custkey)
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


def _dsum(col) -> F.Column:
    """Exact decimal accumulation, one final double cast (registry
    float discipline)."""
    return F.sum(col.cast("decimal(18,2)")).cast("double")


@query(
    "q4_priority_late_ship",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    survey="J2,A4,P12",
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: no commit/receipt dates in the
    synthetic lineitem — "late" is shipping >60 days after the order):
    EXISTS decorrelates to a left-semi join on l_orderkey, then a
    per-priority count.  Semi join shuffles only the key + date
    columns; the agg partial-aggregates map-side."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"]
           > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q10_returned_revenue_topk",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    survey="A4,J3,J4,O1",
)
def q10_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returned items, top 20 customers.
    Broadcast nation; the returnflag filter pushes to the lineitem
    scan; top-k via orderBy().limit() → TakeOrderedAndProject."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = read_table(spark, sf_dir, "nation")
    from hfcommunity_spark.operators.relational import DEC, dec

    rev = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue_ratio",
    """
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                 ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                  AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    survey="A6,J3,F11",
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promo revenue share).  Both accumulations are exact
    DECIMAL; the single double division at the end is deterministic
    cross-engine.  part is the broadcast side."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    from hfcommunity_spark.operators.relational import DEC, dec

    rev = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


Q18_QTY = 300


@query(
    "q18_large_order_customers",
    f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {Q18_QTY}
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate
    """,
    survey="J2,A7,W4",
)
def q18_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume orders): HAVING subquery decorrelates
    to a pre-aggregated semi join — the per-order quantity rollup
    partial-aggregates before its shuffle, and the surviving key set
    is small enough that AQE turns the IN into a broadcast semi."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > Q18_QTY)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"),
                F.col("l_orderkey") == F.col("bk"), "left_semi")
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
    )


@query(
    "w5_funnel_conversion",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(first_view) AS BIGINT) AS n_viewed,
           CAST(COUNT(CASE WHEN first_click > first_view THEN 1 END)
                AS BIGINT) AS n_clicked_after_view,
           CAST(COUNT(CASE WHEN first_purchase > first_click
                            AND first_click > first_view THEN 1 END)
                AS BIGINT) AS n_full_funnel
    FROM firsts
    """,
    survey="A5,P9,W4",
)
def w5_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel conversion (view → click → purchase, strictly
    ordered by each user's FIRST occurrence of each step) — the
    product-analytics staple, done as one conditional-MIN rollup per
    user plus a global count: two shuffles, both partial-aggregated
    map-side, no self-joins and no per-step passes over events."""
    ev = read_table(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_ts("view").alias("first_view"),
        first_ts("click").alias("first_click"),
        first_ts("purchase").alias("first_purchase"),
    )
    clicked = F.col("first_click") > F.col("first_view")
    purchased = (F.col("first_purchase") > F.col("first_click")) & clicked
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("n_viewed"),
        F.count(F.when(clicked, 1)).alias("n_clicked_after_view"),
        F.count(F.when(purchased, 1)).alias("n_full_funnel"),
    )


@query(
    "q13_customer_order_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    survey="J8,A4,A5",
)
def q13_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution; the comment
    anti-pattern filter adapted to the synthetic schema as "ignore
    urgent orders").  The LEFT OUTER join keeps zero-order customers —
    ``COUNT(o_orderkey)`` counts only matched rows, so they land in
    the ``c_count = 0`` histogram bucket.  Both aggregations
    partial-aggregate map-side; the second one's key space (distinct
    order counts per customer) is tiny, so the final shuffle is a few
    dozen rows per partition.  Reference parity: the reference
    delegates distribution queries like this to MariaDB
    (``extractor/databaseImport.py`` builds the tables, the published
    metrics layer issues the SQL); this is the same semantics declared
    Spark-side."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


A16_PCTS = (25, 50, 75, 90)

# Bounded-collect cap for the pass-1 value histogram: TPC-H's
# (5 segments × ~11k whole-dollar cells) ≈ 55k at ANY scale factor
# (the domain, not the rows, bounds it); 250k gives >4x headroom
# while keeping the worst-case driver transfer ~tens of MB.
A16_HIST_CELL_MAX = 250_000


@query(
    "a16_exact_percentiles",
    f"""
    WITH ranked AS (
      SELECT c_mktsegment, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal) AS rk,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer
    )
    SELECT c_mktsegment,
           CAST(p AS INTEGER) AS pct,
           c_acctbal AS pct_value
    FROM ranked
    JOIN (VALUES {", ".join(f"({p})" for p in A16_PCTS)}) pcts(p)
      ON rk = (n * p + 99) // 100
    ORDER BY c_mktsegment, pct
    """,
    survey="A7,A5,W1,F11",
)
def a16_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete percentiles of account balance per market
    segment (value at rank ``ceil(p*n/100)``, pure integer rank
    arithmetic — no interpolation, so no cross-engine float boundary).

    Scale shape — the ``w1_ntile_percent_rank`` histogram discipline
    applied to quantiles: the naive plan sorts every segment's whole
    partition (``row_number`` over millions of rows per segment at
    100 TB).  Exact rank decomposes through the value histogram
    instead: pass 1 is one map-side-combined count per (segment,
    whole-dollar cell) — ≤5 × 11k rows, bounded by the VALUE DOMAIN,
    not the row count — collected to locate each target rank's cell
    and its within-cell offset; pass 2 reads ONLY the ≤|segments| ×
    |percentiles| target cells (a pushed IN-filter on the bucket
    expression), ranks within those bounded cells, and picks the
    offset row.  No value straddles cells (equal balances share a
    cell), so the within-cell rank is exact."""
    customer = read_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal"
    )
    bkt_col = F.floor(F.col("c_acctbal")).cast("long")
    rows = (
        customer.groupBy("c_mktsegment", bkt_col.alias("bkt"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        # bounded by segments x whole-dollar DOMAIN cells, not rows —
        # but the domain is data, so cap the transfer (limit, not a
        # post-hoc check: a pathological domain never reaches the
        # driver) and fail loudly over it, the QUOTIENT_LOCAL_EDGE_MAX
        # bounded-collect discipline (ADVICE r9)
        .limit(A16_HIST_CELL_MAX + 1)
        .collect()
    )
    if len(rows) > A16_HIST_CELL_MAX:
        raise ValueError(
            "a16_exact_percentiles: histogram exceeds "
            f"{A16_HIST_CELL_MAX} (segment, whole-dollar) cells — the "
            "value domain is too wide/fine for a single-level "
            "histogram; coarsen the cell expression (e.g. floor to "
            "$100) or add a second bucketing level before the rank "
            "decomposition"
        )
    if any(r.bkt is None for r in rows):
        raise ValueError(
            "a16_exact_percentiles: NULL c_acctbal — the histogram "
            "rank decomposition requires a NOT NULL value column"
        )
    # the second pass joins on the segment with null-UNSAFE equality,
    # so a NULL segment would silently drop its percentile rows while
    # the oracle emits them — fail loudly instead (round-9 review;
    # TPC-H c_mktsegment is NOT NULL, this guards regenerated data)
    if any(r.c_mktsegment is None for r in rows):
        raise ValueError(
            "a16_exact_percentiles: NULL c_mktsegment — the two-pass "
            "plan requires a NOT NULL segment key"
        )
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append((r.bkt, r.cnt))
    targets = []  # (segment, bkt, pct, rank_within_cell)
    for seg, hist in by_seg.items():
        hist.sort()
        n = sum(c for _, c in hist)
        for p in A16_PCTS:
            rk = (n * p + 99) // 100  # ceil(n*p/100), integer-exact
            below = 0
            for b, c in hist:
                if below + c >= rk:
                    targets.append((seg, b, p, rk - below))
                    break
                below += c
    tgt = spark.createDataFrame(
        targets, "c_mktsegment string, bkt long, pct int, r long"
    )
    w = Window.partitionBy("c_mktsegment", "bkt", "pct").orderBy(
        "c_acctbal"
    )
    return (
        customer.withColumn("bkt", bkt_col)
        .join(F.broadcast(tgt), ["c_mktsegment", "bkt"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == F.col("r"))
        .select(
            "c_mktsegment", F.col("pct"),
            F.col("c_acctbal").alias("pct_value"),
        )
        .orderBy("c_mktsegment", "pct")
    )


Q15_FROM, Q15_TO = "1996-01-01", "1996-04-01"


@query(
    "q15_top_supplier_revenue",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '{Q15_FROM}'
        AND l_shipdate < DATE '{Q15_TO}'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
    survey="A7,J3,O2,F11",
)
def q15_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier by quarterly revenue — the view +
    correlated MAX subquery form).  Revenue accumulates in exact
    DECIMAL, so the equality against the maximum is exact arithmetic,
    not a float boundary (ties all surface, as the spec requires).
    The MAX is a one-row scalar aggregate broadcast back over the
    per-supplier frame — never a global window; the supplier
    dimension broadcasts onto the tiny surviving set."""
    from hfcommunity_spark.operators.relational import DEC, dec

    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_TO).cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
            ).alias("total_rev")
        )
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), rev["total_rev"] == top["max_rev"])
        .join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select(
            "s_suppkey", "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q21_LATE_DAYS = 60


@query(
    "q21_suppliers_kept_waiting",
    f"""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    survey="J2,J5,J8,A4,O1",
)
def q21_suppliers_kept_waiting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21 (suppliers who were the SOLE late supplier on a
    multi-supplier finished order; "late" adapted to shipping more
    than 60 days after the order date, the q4 convention
    — the synthetic lineitem has no commit/receipt dates).

    Spark-first shape: the classic correlated EXISTS / NOT EXISTS pair
    re-expressed as per-order distinct-supplier sets — ``n_supp``
    (suppliers on the order) and ``n_late_supp`` (suppliers that
    shipped late) — computed as a WINDOW over the single
    lineitem⋈orders pass (``size(collect_set(..))`` per order group),
    so the join subtree executes ONCE: a row qualifies iff it was
    late, ``n_supp >= 2`` and ``n_late_supp = 1`` (its supplier is
    necessarily THE late one).  The groupBy-then-semi-join-back
    formulation re-executed the whole join once per branch (two
    lineitem scans, no ReusedExchange); this is one orderkey shuffle
    for the window plus the tiny s_name rollup, and order groups are
    bounded (≤7 lineitems), so window state never skews.  The
    supplier dimension broadcasts."""
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late_cut = F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    # lineitems of finished orders, flagged late/on-time in one pass
    lo = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate") > late_cut).alias("is_late"),
    )
    w = Window.partitionBy("l_orderkey")
    waiting = lo.select(
        "l_suppkey", "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(
                F.when(F.col("is_late"), F.col("l_suppkey"))
            ).over(w)
        ).alias("n_late_supp"),
    ).filter(
        F.col("is_late")
        & (F.col("n_supp") >= 2)
        & (F.col("n_late_supp") == 1)
    )
    return (
        waiting.join(F.broadcast(s), waiting["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@query(
    "w6_retention_cohorts",
    """
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
      GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN first_day f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
           CAST(day_offset AS INTEGER) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM activity GROUP BY cohort_day, day_offset
    """,
    survey="A5,F6,J3",
)
def w6_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort triangle: users grouped by first-seen day, and
    for each later day-offset, how many of the cohort were active.
    Cohort assignment is one user-keyed rollup; the activity join is
    user-keyed (the cohort frame is one row per user — broadcastable
    at dim scale, hash-join co-partitioned beyond); the DISTINCT caps
    each (user, day) at one row before the final count shuffle."""
    ev = read_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = (
        ev.join(first_day, "user_id")
        .select(
            "user_id", "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day"))
            .alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.col("cohort_day").cast("string").alias("cohort_day"), "day_offset"
    ).agg(F.count(F.lit(1)).alias("n_active_users"))


# --- rolling-window anomaly detection (round 5) --------------------

ANOM_LOOKBACK = 20   # trailing frame width (rows), current row excluded
ANOM_Z = 2.5         # |z| threshold

_ANOMALY_ORACLE = f"""
    WITH m AS (
      SELECT event_id, event_type, ts,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS micro
      FROM events
      -- NULL values carry no measurement: excluded from scoring AND
      -- from the trailing frame (otherwise cnt counts them while the
      -- sums skip them, silently corrupting the statistics)
      WHERE value IS NOT NULL
    ),
    framed AS (
      SELECT event_id, event_type, ts, micro,
             COUNT(*) OVER w AS cnt,
             SUM(micro) OVER w AS s1,
             SUM(CAST(micro AS DECIMAL(38,0)) * micro) OVER w AS s2
      FROM m
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN {ANOM_LOOKBACK} PRECEDING
                            AND 1 PRECEDING)
    ),
    z AS (
      SELECT event_id, event_type, ts,
             ROUND((CAST(micro AS DOUBLE) * cnt - s1)
                   / SQRT(CAST(cnt * s2 - CAST(s1 AS DECIMAL(38,0)) * s1
                               AS DOUBLE)), 4) AS z_rounded
      FROM framed
      WHERE cnt = {ANOM_LOOKBACK}
        -- zero-variance frames (a constant run fills the window, e.g.
        -- replicated or clamped metrics) admit no z-score: same guard
        -- as the streaming twin's ring buffer (streaming/stateful.py)
        AND cnt * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 > 0
    )
    SELECT event_id, event_type, ts, z_rounded
    FROM z WHERE ABS(z_rounded) >= {ANOM_Z}
    """


@query("w_event_anomaly_zscore", _ANOMALY_ORACLE, survey="W3,F11,X-UD5")
def w_event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against
    the mean/std of its event_type's trailing {ANOM_LOOKBACK}-row
    frame (current row excluded — no self-contamination), flagged at
    |z| ≥ {ANOM_Z}.  The batch twin of a streaming metrics monitor —
    the same frame algebra a `transformWithState` job would keep as
    a ring buffer per key.

    Scale shape: one shuffle on event_type (the window partition key);
    the frame sums are incremental per partition.  Key skew bounds the
    partition sizes exactly as the other per-key windows in this
    module.

    Determinism: values are floored to exact integer micro-units, so
    the frame sums are exact (BIGINT / DECIMAL(38,0)) no matter what
    order the engine's frame accumulator adds them in; the z-score is
    algebraically rearranged to (x·n − Σx)/√(n·Σx² − (Σx)²) so the
    only floating ops are one exact-int→double cast each, one IEEE
    sqrt (correctly rounded), and one division — bit-identical
    cross-engine; the hash-checked value is rounded to 4 decimals."""
    events = read_table(spark, sf_dir, "events")
    m = events.filter(F.col("value").isNotNull()).select(
        "event_id", "event_type", "ts",
        F.floor(F.col("value") * 1000000).cast("long").alias("micro"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOM_LOOKBACK, -1)
    )
    micro_dec = F.col("micro").cast("decimal(38,0)")
    framed = m.select(
        "event_id", "event_type", "ts", "micro",
        F.count(F.lit(1)).over(w).alias("cnt"),
        F.sum("micro").over(w).alias("s1"),
        F.sum(micro_dec * F.col("micro")).over(w).alias("s2"),
    )
    var_num = (
        F.col("cnt") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1")
    )
    z = (
        (F.col("micro").cast("double") * F.col("cnt") - F.col("s1"))
        / F.sqrt(var_num.cast("double"))
    )
    return (
        framed.filter(F.col("cnt") == ANOM_LOOKBACK)
        # zero-variance frames (constant runs — found by the sf1.0
        # rehearsal's replicated events) admit no z-score; same guard
        # as the streaming twin's ring buffer (streaming/stateful.py)
        .filter(var_num > 0)
        .select(
            "event_id", "event_type", "ts",
            F.round(z, 4).alias("z_rounded"),
        )
        .filter(F.abs(F.col("z_rounded")) >= ANOM_Z)
    )


# --- round 10: the two remaining partsupp-free TPC-H faces -------------

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(4,2))
                       - CAST(l_discount AS DECIMAL(4,2)))
                    * (CAST(1.00 AS DECIMAL(4,2))
                       + CAST(l_tax AS DECIMAL(4,2))))
                AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    survey="A7,A10,P12,F11",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1, the canonical pricing summary: one pass over
    lineitem, fully map-side-combinable aggregates per
    (returnflag, linestatus) — at 100 TB this is THE scan-shaped
    query AQE/codegen should own end to end (no join, 6-cell group
    space, partial aggregation collapses each task to 6 rows).

    Determinism: every sum accumulates in exact DECIMAL.  The
    three-factor charge term uses NARROW casts (12,2)x(4,2)x(4,2) —
    product scale 6, width ~22 — so neither engine hits its 38-digit
    ceiling and neither rounds (Spark's allowPrecisionLoss and
    DuckDB's width error both trigger only past 38).  Averages divide
    the exact double-cast sums by the count — one double division,
    bit-identical cross-engine."""
    li = read_table(spark, sf_dir, "lineitem")
    from hfcommunity_spark.operators.relational import DEC, dec

    d4 = "decimal(4,2)"
    one = F.lit(1).cast(d4)
    charge = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (one - F.col("l_discount").cast(d4))
        * (one + F.col("l_tax").cast(d4))
    )
    disc_price = dec("l_extendedprice") * (
        F.lit(1).cast(DEC) - dec("l_discount")
    )
    n = F.count(F.lit(1))
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double")
            .alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / n)
            .alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    survey="P12,J3,F11",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue under an OR-of-ANDs
    predicate), adapted to the synthetic part columns (no
    p_container; brand/size carry the disjunction).  The planner face
    this exists for: per-side conjuncts split across the join — the
    l_quantity range union pushes to the lineitem scan, the
    brand/size union to the part scan (both visible as PushedFilters)
    — while the cross-table disjunction evaluates post-join.  part is
    the broadcast side."""
    from hfcommunity_spark.operators.relational import DEC, dec

    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    arm = [
        (("Brand#12", 1, 5), (1, 11)),
        (("Brand#23", 1, 10), (10, 20)),
        (("Brand#34", 1, 15), (20, 30)),
    ]
    cond = None
    for (brand, s_lo, s_hi), (q_lo, q_hi) in arm:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        cond = c if cond is None else (cond | c)
    rev = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# --- round 11: three more partsupp-free TPC-H faces --------------------
# (q2/q9/q11/q16/q20 need partsupp, which the synthetic corpus does
# not carry; q12's l_shipmode/l_receiptdate likewise; Q6 already
# lives here as p12_q6_revenue_pushdown.  These two are the remaining
# classics expressible over the ten driver tables, adapted to the
# synthetic value domains: shipdates span 1995-2001, p_type is the
# container-free {ECONOMY,..,PROMO} set, nations are NATION_k.)

@query(
    "q8_national_market_share",
    """
    WITH vol AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0.00 AS DECIMAL(18,2)) END)
                AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
    survey="J4,J9,A7,F6,F11",
)
def q8_national_market_share(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """TPC-H Q8, the national-market-share face: the deepest join tree
    in the suite (lineitem ⋈ orders as the fact-fact shuffle; part,
    customer, supplier, both nation roles, and region all broadcast
    dims — J9's strategy-selection evidence in one plan), with the
    share computed as a ratio of two exact-DECIMAL sums per order
    year.  At 100 TB: one fact-fact exchange on orderkey, every other
    edge map-side; the region/p_type filters prune BEFORE the
    broadcasts, so the hash tables carry only the qualifying slices.

    Determinism: both sums accumulate in DECIMAL (the zero arm of the
    CASE is a DECIMAL literal so neither engine widens the sum type
    differently); one double division at the end."""
    from hfcommunity_spark.operators.relational import DEC, dec

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount",
    )
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    cn = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    r = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    s = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    sn = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    zero = F.lit("0.00").cast("decimal(18,2)")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == cn["cn_key"])
        .join(F.broadcast(r), cn["cn_region"] == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == sn["sn_key"])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
        .otherwise(zero)
    ).cast("double")
    return (
        joined.groupBy("o_year")
        .agg((num / F.sum("volume").cast("double")).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH agg AS (
      SELECT l_partkey AS a_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN agg ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#12'
      AND CAST(5 * l_quantity * cnt AS DECIMAL(18,2)) < sum_qty
    """,
    survey="J3,A7,J9,F11",
)
def q17_small_quantity_revenue(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-H Q17, the small-quantity-order revenue face: each
    lineitem compares against ITS PART'S average quantity — the
    correlated-aggregate classic, planned as a per-part aggregate
    joined back to the fact (the decorrelation every serious planner
    performs; Spark's shape is groupBy + shuffle join on partkey,
    sharing one exchange with the probe side).

    Determinism: the textbook predicate ``l_quantity < 0.2 *
    avg(l_quantity)`` multiplies through to ``5 * qty * cnt <
    sum_qty`` — quantities are integral in the synthetic corpus, so
    BOTH SIDES ARE EXACT (decimal-compared); no float boundary can
    flip a row between engines.  The brand filter prunes the part
    broadcast before the join."""
    from hfcommunity_spark.operators.relational import dec

    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#12"
    ).select("p_partkey")
    agg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(dec("l_quantity")).cast("decimal(18,2)").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    small = (
        (F.lit(5) * F.col("l_quantity") * F.col("cnt"))
        .cast("decimal(18,2)")
        < F.col("sum_qty")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(agg, li["l_partkey"] == agg["a_partkey"])
        .filter(small)
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )
