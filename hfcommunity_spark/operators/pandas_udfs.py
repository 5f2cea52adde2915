"""Pandas-UDF surface (SURVEY §2.11 UD1/UD3): the sanctioned Python
escape hatches, Arrow-vectorized — never row-at-a-time.

UDF objects are built lazily inside the query builders:
``pandas_udf(...)`` parses its return type against the active session,
so decorating at import time would require a SparkContext before the
registry can even be imported.

Determinism note: the GROUPED_AGG demo accumulates in integer cents
(the values are 2-decimal), so the Python path produces the same bits
as the SQL oracle despite floating-point summation being order-
dependent in general — same convention as the DECIMAL trick on the
JVM side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query


def _ascii_ratio_impl(text: pd.Series) -> pd.Series:
    """UD1 scalar (vectorized batch in, batch out): share of ASCII
    letters per document — the clean-text-style per-row Python
    computation (databaseImport.py:635) done on Arrow batches."""
    total = text.str.len().clip(lower=1)
    letters = text.str.count("[A-Za-z]")
    return letters / total


def _sum_cents_impl(value: pd.Series) -> int:
    """UD3 grouped-agg (Series -> scalar): exact integer-cent sum of a
    2-decimal double column (deterministic at any partitioning)."""
    return int((value * 100).round().astype("int64").sum())


def _count_impl(value: pd.Series) -> int:
    return len(value)


@query(
    "ud1_ascii_ratio",
    """
    SELECT doc_id,
           CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
             / GREATEST(LENGTH(text), 1) AS letter_ratio
    FROM documents
    """,
    survey="UD1,F12",
)
def ud1_ascii_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF vs pure-SQL oracle: identical integer counts,
    one final double division on both sides."""
    ascii_ratio = pandas_udf(_ascii_ratio_impl, "double")
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", ascii_ratio(F.col("text")).alias("letter_ratio"))


def _group_profile_impl(pdf: pd.DataFrame) -> pd.DataFrame:
    """UD4 grouped-map: whole-group in, whole-group out.  Rows are
    sorted by event_id first so every statistic is computed over a
    deterministic order regardless of shuffle arrival."""
    pdf = pdf.sort_values("event_id")
    cents = (pdf["value"] * 100).round().astype("int64")
    n = len(pdf)
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [n],
            "total_cents": [int(cents.sum())],
            "first_event_id": [int(pdf["event_id"].iloc[0])],
            "last_event_id": [int(pdf["event_id"].iloc[-1])],
        }
    )


@query(
    "ud4_grouped_map_profile",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           MIN(event_id) AS first_event_id,
           MAX(event_id) AS last_event_id
    FROM events GROUP BY event_type
    """,
    survey="UD4,A7",
)
def ud4_grouped_map_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map transform (UD4): arbitrary per-group
    Python over the whole group's frame, Arrow both ways — here
    computing a group profile whose every field is integer-exact so the
    SQL oracle matches bit-for-bit."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select("event_id", "event_type", "value").groupBy(
        "event_type"
    ).applyInPandas(
        _group_profile_impl,
        "event_type string, n long, total_cents long, "
        "first_event_id long, last_event_id long",
    )


@query(
    "ud3_grouped_agg_cents",
    """
    SELECT event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    survey="UD3,A7",
)
def ud3_grouped_agg_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDFs over event values in integer cents
    (grouped-agg pandas UDFs cannot mix with JVM aggregates in one
    ``agg`` — both measures ride the Arrow path)."""
    sum_cents = pandas_udf(_sum_cents_impl, "long")
    pd_count = pandas_udf(_count_impl, "long")
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        sum_cents(F.col("value")).alias("total_cents"),
        pd_count(F.col("value")).alias("n"),
    )


CHUNK_UDTF_SIZE = 96  # chars per emitted piece


class _ChunkTextUDTF:
    """UD2 in its literal Spark 4 form: a Python USER-DEFINED TABLE
    FUNCTION, one input row → many output rows, usable under LATERAL
    (the per-key correlated-fetch shape, databaseImport.py:467-469 —
    each parent row fans out to detail rows).

    Row-based Python is the SLOW path (this is the API demonstration;
    the production-volume equivalents are the mapInPandas UDTF-shaped
    operators in multimodal.py / etl/fetch.py, which move Arrow
    batches).  Registered with ``useArrow=True`` so at least the
    transport is Arrow-batched."""

    def eval(self, doc_id: int, text: str):
        if not text:
            return
        for i in range(0, len(text), CHUNK_UDTF_SIZE):
            yield doc_id, i // CHUNK_UDTF_SIZE, text[i: i + CHUNK_UDTF_SIZE]


def chunk_text_udtf():
    from pyspark.sql.functions import udtf

    return udtf(
        _ChunkTextUDTF,
        returnType="doc_id: long, piece_idx: int, piece: string",
        useArrow=True,
    )


@query(
    "ud2_chunk_udtf",
    f"""
    SELECT doc_id,
           CAST(i AS INTEGER) AS piece_idx,
           substr(text, CAST(i * {CHUNK_UDTF_SIZE} + 1 AS BIGINT),
                  {CHUNK_UDTF_SIZE}) AS piece
    FROM documents,
         LATERAL unnest(range(0, CAST(ceil(LENGTH(text)
                / {CHUNK_UDTF_SIZE}.0) AS BIGINT))) AS t(i)
    WHERE LENGTH(text) > 0
    """,
    survey="UD2,P1",
)
def ud2_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text chunking through a registered Python UDTF under LATERAL —
    the same cut the pure-SQL ``t_chunk_documents`` makes, proving the
    UDTF emits exactly the declarative rows (hash-equal oracle)."""
    docs = read_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("ud2_docs")
    spark.udtf.register("chunk_text", chunk_text_udtf())
    return spark.sql(
        "SELECT c.doc_id, c.piece_idx, c.piece "
        "FROM ud2_docs d, LATERAL chunk_text(d.doc_id, d.text) c"
    )
