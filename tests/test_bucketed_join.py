"""Bucketing: the production layout claim in ARCHITECTURE.md §4 made
executable.  Writing both join sides bucketed by the join key must
produce a SortMergeJoin with NO shuffle exchange on either side — the
co-located join that makes repeated fact⋈fact joins affordable at
100 TB (pay the shuffle once at write time, never again per query).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    # warehouse.dir is a static config — use the session default and
    # drop the tables afterwards
    orders = read_table(spark, SF, "orders")
    lineitem = read_table(spark, SF, "lineitem")
    for df, name, key in (
        (orders, "orders_b", "o_orderkey"),
        (lineitem, "lineitem_b", "l_orderkey"),
    ):
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    yield spark
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # at test scale Spark would rightly broadcast the tiny side; the
    # claim under test is the big⋈big case, so force the merge path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not re-shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_shuffle(bucketed):
    """Aggregation on the bucket key reuses the write-time partitioning
    too — the repeated-rollup case (per-order stats every release)."""
    spark = bucketed
    agg = spark.table("lineitem_b").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bucketed_join_matches_unbucketed(bucketed):
    spark = bucketed
    a = (
        spark.table("orders_b")
        .join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    b = (
        read_table(spark, SF, "orders")
        .join(
            read_table(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert a == b > 0
