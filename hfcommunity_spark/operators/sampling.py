"""Deterministic corpus sampling for training-data pipelines
(north-star X-UD5): stratified sampling and train/val/test splits.

Random sampling is useless in a reproducible 100 TB pipeline — a rerun
must pick the SAME rows on any cluster layout, and two engines must
agree row-for-row.  Both operators therefore derive randomness from a
salted content hash (sha2 — the one cryptographic hash Spark and the
DuckDB oracle share bit-for-bit):

- stratified top-N: rank docs inside each stratum by their salted hash
  and keep the first N — an exact per-stratum quota, shuffled only on
  the stratum key (one partitioned window, no global sort).
- hash split: map the first two hex chars of the salted hash to
  train/val/test by plain string-range compare — a pure narrow
  projection (no shuffle at all until the audit aggregation), stable
  under any repartitioning, and identical in any engine that can
  compare ASCII strings.

Changing SALT re-draws both samples; keeping it pins them forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query

SALT = "smpl:"
STRATUM_QUOTA = 5
# 256 two-hex-char buckets: < 'cd' is 205/256 ≈ 80% train,
# < 'e6' is 230/256 ≈ 90% cumulative → 10% val, rest test
TRAIN_UPPER = "cd"
VAL_UPPER = "e6"


def salted_hash(col):
    """Lowercase sha256 hex of SALT + doc id — identical in Spark
    (sha2) and DuckDB (sha256)."""
    return F.sha2(F.concat(F.lit(SALT), col.cast("string")), 256)


@query(
    "samp_stratified_topn",
    f"""
    SELECT doc_id, source, pos FROM (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY sha256('{SALT}' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS INTEGER) AS pos
      FROM documents
    ) WHERE pos <= {STRATUM_QUOTA}
    """,
    survey="X-UD5,W1,F1",
)
def samp_stratified_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source quota sample: N docs per stratum, chosen by
    salted-hash order.  One shuffle on the stratum key; the window is
    partitioned, never global."""
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        salted_hash(F.col("doc_id")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= STRATUM_QUOTA)
        .select("doc_id", "source", "pos")
    )


def hash_split(col) -> F.Column:
    """'train' / 'val' / 'test' from the salted hash — a narrow
    projection, no shuffle, stable under any partitioning."""
    prefix = F.substring(salted_hash(col), 1, 2)
    return (
        F.when(prefix < TRAIN_UPPER, "train")
        .when(prefix < VAL_UPPER, "val")
        .otherwise("test")
    )


CONTAM_NGRAM = 3  # contamination screens use smaller n than dedup:
# a 3-gram hit is a weaker signal but catches partial leakage


@query(
    "samp_split_contamination",
    f"""
    WITH sp AS (
      SELECT doc_id, text,
             CASE WHEN substr(sha256('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 2)
                       < '{TRAIN_UPPER}' THEN 'train'
                  WHEN substr(sha256('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 2)
                       < '{VAL_UPPER}' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    toks AS (SELECT doc_id, split, string_split(text, ' ') AS w FROM sp),
    sh AS (SELECT DISTINCT doc_id, split,
                  unnest(list_transform(range(1, len(w) - {CONTAM_NGRAM - 2}),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                    AS shingle
           FROM toks WHERE len(w) >= {CONTAM_NGRAM})
    SELECT te.doc_id,
           COUNT(DISTINCT te.shingle) AS n_shared_shingles,
           COUNT(DISTINCT tr.doc_id) AS n_train_docs
    FROM sh te JOIN sh tr ON te.shingle = tr.shingle
    WHERE te.split = 'test' AND tr.split = 'train'
    GROUP BY te.doc_id
    """,
    survey="X-UD5,J5,A9",
)
def samp_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: for every test-split doc, how
    many of its 3-gram shingles also appear in ANY train-split doc, and
    how many train docs are implicated.  Candidates meet through the
    shingle-hash equi-join (``doc_shingle_hashes`` — 8-byte shuffle
    keys), never a cross product; the split is the shuffle-free
    ``hash_split`` projection."""
    from hfcommunity_spark.operators.dedup import doc_shingle_hashes

    docs = read_table(spark, sf_dir, "documents")
    sh = doc_shingle_hashes(docs, CONTAM_NGRAM)
    split = docs.select(
        "doc_id", hash_split(F.col("doc_id")).alias("split")
    )
    shs = sh.join(split, "doc_id")
    train = shs.filter(F.col("split") == "train").select(
        F.col("h"), F.col("doc_id").alias("train_doc")
    )
    test = shs.filter(F.col("split") == "test").select("h", "doc_id")
    return (
        test.join(train, "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("n_shared_shingles"),
            F.countDistinct("train_doc").alias("n_train_docs"),
        )
    )


@query(
    "samp_hash_split_counts",
    f"""
    SELECT source, split, COUNT(*) AS n_docs FROM (
      SELECT source,
             CASE WHEN substr(sha256('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 2)
                       < '{TRAIN_UPPER}' THEN 'train'
                  WHEN substr(sha256('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 2)
                       < '{VAL_UPPER}' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) GROUP BY source, split
    """,
    survey="X-UD5,A5,P8",
)
def samp_hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment audit: per-source split sizes.  The
    assignment itself is the shuffle-free ``hash_split`` projection;
    the audit is one partial-aggregated groupBy."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select("source", hash_split(F.col("doc_id")).alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
