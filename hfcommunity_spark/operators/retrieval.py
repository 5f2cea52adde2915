"""Lexical retrieval over the ``documents`` corpus (SURVEY §2.11
X-UD5 north star): inverted-index term statistics → BM25 ranking.

The reference has no retrieval surface (its query layer is delegated
to MariaDB — reference/extractor/databaseImport.py:1); this is part of
the beyond-reference LLM-pipeline capability set, next to the
embedding-space ANN family in ``operators/similarity.py``.

Scale shape (the 100 TB lens): the token explode is narrow and the
``term IN (...)`` filter runs BEFORE any shuffle, so only postings for
the query's terms ever move — exactly the posting-list slice an
inverted index would serve.  The per-term document frequencies and the
corpus-size scalar are k-row / 1-row aggregates (broadcast); the one
data-sized shuffle is the tf ⋈ doclen equi-join on doc_id.  Top-k
compiles to TakeOrderedAndProject (per-partition heap, k-row driver
merge).

Determinism contract: tf/dl/df/N are exact integers in both engines;
``avgdl`` is one exact int/int double division; the only libm call is
``ln`` (idf), which is not guaranteed correctly rounded cross-engine,
so the hash-checked score is rounded to 4 decimals and the rank is
computed over the ROUNDED score with a doc_id tie-break — the
displayed ordering is exactly reproducible from the displayed values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.operators.textops import token_count
from hfcommunity_spark.registry import query

K1 = 1.2
B = 0.75
BM25_TOP_K = 10
# Fixed query terms (present in the synthetic vocabulary at every SF).
BM25_TERMS = ("spark", "table", "join")


def _bm25_term_cases() -> str:
    """Fixed-order per-term sum for the oracle: float addition is not
    associative, so both engines add the per-term partials in the same
    literal order."""
    parts = [
        f"COALESCE(MAX(CASE WHEN term = '{t}' THEN s END), 0)"
        for t in BM25_TERMS
    ]
    return " + ".join(parts)


_BM25_ORACLE = f"""
    WITH dl AS (
      SELECT doc_id,
             LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS dl
      FROM documents
    ),
    st AS (SELECT COUNT(*) AS n, SUM(dl) AS sum_dl FROM dl),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN {BM25_TERMS!r}
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored_t AS (
      SELECT tf.doc_id, tf.term,
             LN((CAST(st.n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * ({K1} + 1.0))
               / (tf + {K1} * (1.0 - {B} + {B} * (dl /
                    (CAST(sum_dl AS DOUBLE) / st.n)))) AS s
      FROM tf
      JOIN dl USING (doc_id)
      JOIN dfreq USING (term), st
    ),
    scored AS (
      SELECT doc_id, ROUND({_bm25_term_cases()}, 4)::DOUBLE AS score_rounded
      FROM scored_t GROUP BY doc_id
    ),
    top AS (SELECT * FROM scored
            ORDER BY score_rounded DESC, doc_id LIMIT {BM25_TOP_K})
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY score_rounded DESC, doc_id)
                AS INTEGER) AS rank,
           score_rounded
    FROM top
    """


@query("sim_bm25_topk", _BM25_ORACLE, survey="X-UD5,A4,O2,J9")
def sim_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval for a fixed bag-of-words query.

    Plan: postings filter before the (doc_id, term) partial agg, df and
    corpus stats as broadcast k-row/1-row sides, one doc_id equi-join,
    fixed-order per-term sum (pivot), TakeOrderedAndProject top-k."""
    docs = read_table(spark, sf_dir, "documents")
    dl = docs.select("doc_id", token_count(F.col("text")).alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    avgdl = F.col("sum_dl").cast("double") / F.col("n")
    idf = F.log(
        (F.col("n").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
        + 1.0
    )
    denom = F.col("tf") + K1 * (
        1.0 - B + B * (F.col("dl") / avgdl)
    )
    scored_t = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(st))
        .select(
            "doc_id",
            "term",
            (idf * (F.col("tf") * (K1 + 1.0)) / denom).alias("s"),
        )
    )
    # Fixed-order per-term sum: same literal order as the oracle.
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)
        )
        for t in BM25_TERMS
    ]
    total = per_term[0]
    for p in per_term[1:]:
        total = total + p
    scored = scored_t.groupBy("doc_id").agg(
        F.round(total, 4).alias("score_rounded")
    )
    from hfcommunity_spark.operators.lm import ranked_topk

    return ranked_topk(scored, "score_rounded", BM25_TOP_K).select(
        "doc_id", "rank", "score_rounded"
    )
