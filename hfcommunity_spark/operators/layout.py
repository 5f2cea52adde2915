"""Physical-layout operators: Z-order (Morton) clustering keys and the
pruning audit that justifies them.

The reference stores everything in row-ordered MariaDB tables
(reference/extractor/databaseImport.py:1) and has no layout surface;
at 100 TB, file-level clustering IS a query operator — min/max zone
maps only prune when each file's key range is narrow, and a Z-order
rewrite (Delta OPTIMIZE ZORDER BY / Iceberg sort orders are the
public practice) makes ranges narrow in SEVERAL dimensions at once.

This module computes the Morton key as pure JVM integer bit math (no
UDF — interleaving compiles to shifts/masks inside whole-stage
codegen) and audits what the rewrite buys: bucket the fact table once
by Z-range and once by insertion order, and compare the average
per-bucket span of each dimension.  Narrow spans = prunable files.
The audit is the sample-first measurement a table owner runs before
paying for a full rewrite, exactly like the LSH confusion audit
before a dedup run (``operators/dedup.py:dd_lsh_recall_audit``).

Determinism: every value here is exact integer arithmetic (bit
interleaving, min/max, counts); the only floats are two final exact
INT→DOUBLE casts and one IEEE division per average — bit-identical in
any engine, no rounding discipline needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query

ZBITS = 8          # low bits interleaved per dimension -> 16-bit z-key
ZBUCKET_SHIFT = 8  # keep the top 8 z-bits -> 256 z-range buckets
N_BUCKETS = 256
EPOCH = "1992-01-01"  # TPC-H date floor: day offsets stay small ints


def zorder_key(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    ints: bit i of ``a`` lands at position 2i, bit i of ``b`` at
    2i+1.  Pure shifts/masks — whole-stage codegen, no UDF."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        out = out + F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return out


def zorder_key_sql(a_expr: str, b_expr: str, bits: int = ZBITS) -> str:
    """DuckDB twin of :func:`zorder_key`, generated from the same
    constants (the no-hand-copies rule — see ``shingle_unnest_sql``)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({a_expr} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({b_expr} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(parts)


_A_EXPR = f"(DATEDIFF('day', DATE '{EPOCH}', o_orderdate) % {1 << ZBITS})"
_B_EXPR = f"(o_custkey % {1 << ZBITS})"

_ZORDER_ORACLE = f"""
    WITH dims AS (
      SELECT o_orderkey,
             {_A_EXPR} AS da,
             {_B_EXPR} AS db
      FROM orders
    ),
    keyed AS (
      SELECT o_orderkey, da, db,
             {zorder_key_sql('da', 'db')} AS zkey
      FROM dims
    ),
    chunk AS (SELECT CAST(CEIL((MAX(o_orderkey) + 1.0) / {N_BUCKETS})
                          AS BIGINT) AS sz
              FROM keyed),
    buckets AS (
      SELECT 'zorder' AS layout, zkey >> {ZBUCKET_SHIFT} AS bucket,
             da, db FROM keyed
      UNION ALL
      SELECT 'insertion' AS layout, o_orderkey // sz AS bucket, da, db
      FROM keyed, chunk
    ),
    spans AS (
      SELECT layout, bucket,
             MAX(da) - MIN(da) AS span_a,
             MAX(db) - MIN(db) AS span_b,
             COUNT(*) AS n_rows
      FROM buckets GROUP BY layout, bucket
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(span_a) AS DOUBLE) / COUNT(*) AS avg_span_date,
           CAST(SUM(span_b) AS DOUBLE) / COUNT(*) AS avg_span_cust
    FROM spans GROUP BY layout
    """


@query("layout_zorder_pruning_audit", _ZORDER_ORACLE,
       survey="F11,A5,A10,X-UD5")
def layout_zorder_pruning_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Z-order pruning audit over ``orders``: bucket the table once by
    the top bits of the Morton key over (order-date day, custkey) and
    once by insertion order, and report the average per-bucket span of
    each dimension.  A min/max zone map prunes a bucket when the
    queried value falls outside its span, so smaller average spans =
    more files skipped; the Z layout should show BOTH dimensions'
    spans well below the insertion layout's (which is only narrow in
    the key it was inserted by).

    Scale shape: the key is codegen'd bit math in the scan projection;
    the audit is one (layout, bucket) partial-agg shuffle of 2×256
    groups and a 2-row rollup.  On a real table the same ``zkey``
    column is what the rewrite job sorts by before writing — this
    query is the measurement, ``zorder_key`` the production
    expression."""
    orders = read_table(spark, sf_dir, "orders")
    mask = (1 << ZBITS) - 1
    dims = orders.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit(EPOCH).cast("date"))
        .bitwiseAND(F.lit(mask)).alias("da"),
        F.col("o_custkey").bitwiseAND(F.lit(mask)).alias("db"),
    )
    keyed = dims.select(
        "o_orderkey", "da", "db",
        zorder_key(F.col("da"), F.col("db")).alias("zkey"),
    )
    chunk = keyed.agg(
        F.ceil((F.max("o_orderkey") + F.lit(1.0)) / N_BUCKETS)
        .cast("long").alias("sz")
    )
    z_side = keyed.select(
        F.lit("zorder").alias("layout"),
        F.shiftright(F.col("zkey"), ZBUCKET_SHIFT).alias("bucket"),
        "da", "db",
    )
    ins_side = keyed.crossJoin(F.broadcast(chunk)).select(
        F.lit("insertion").alias("layout"),
        F.floor(F.col("o_orderkey") / F.col("sz")).alias("bucket"),
        "da", "db",
    )
    spans = (
        z_side.unionByName(ins_side)
        .groupBy("layout", "bucket")
        .agg(
            (F.max("da") - F.min("da")).alias("span_a"),
            (F.max("db") - F.min("db")).alias("span_b"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return spans.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        (F.sum("span_a").cast("double") / F.count(F.lit(1)))
        .alias("avg_span_date"),
        (F.sum("span_b").cast("double") / F.count(F.lit(1)))
        .alias("avg_span_cust"),
    )
