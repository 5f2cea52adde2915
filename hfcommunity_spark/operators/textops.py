"""Text-analysis operators for LLM-data pipelines (SURVEY §2.11 X-UD5,
BASELINE.json north star) over the ``documents`` table.

All hot-path expressions are JVM-side built-ins (whole-stage codegen;
no Python row loop).  Arithmetic is integer-exact with a single final
double division so the DuckDB oracle hashes bit-identically.

The only reference-code analog is the clean-text call
(databaseImport.py:635) — the rest is the capability set the north
star mandates beyond the reference.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query


def token_count(text: Column) -> Column:
    """Whitespace token count via length arithmetic — identical in any
    engine (no regex-dialect dependence): tokens = chars − non-space
    chars + 1 for single-space-separated text."""
    return (
        F.length(text) - F.length(F.regexp_replace(text, " ", "")) + F.lit(1)
    )


@query(
    "t_token_stats",
    """
    SELECT doc_id,
           CAST(LENGTH(text) AS INTEGER) AS n_chars,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS INTEGER)
             AS n_tokens,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
             AS avg_token_len
    FROM documents
    """,
    survey="X-UD5,F12",
)
def t_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (token counting for training-data
    budgeting)."""
    docs = read_table(spark, sf_dir, "documents")
    text = F.col("text")
    nospace = F.length(F.regexp_replace(text, " ", ""))
    ntok = F.length(text) - nospace + F.lit(1)
    return docs.select(
        "doc_id",
        F.length(text).alias("n_chars"),
        ntok.alias("n_tokens"),
        (nospace.cast("double") / ntok).alias("avg_token_len"),
    )


@query(
    "t_lang_id_heuristic",
    """
    SELECT lang,
           CASE WHEN ' ' || text || ' ' LIKE '% the %' THEN 'en'
                WHEN ' ' || text || ' ' LIKE '% der %'
                  OR ' ' || text || ' ' LIKE '% und %' THEN 'de'
                WHEN ' ' || text || ' ' LIKE '% le %'
                  OR ' ' || text || ' ' LIKE '% et %' THEN 'fr'
                WHEN ' ' || text || ' ' LIKE '% el %'
                  OR ' ' || text || ' ' LIKE '% la %' THEN 'es'
                ELSE 'unk' END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang, predicted_lang
    """,
    survey="X-UD5",
)
def t_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-presence language ID; output is the confusion matrix
    against the labeled ``lang`` column.  (An n-gram-profile model slots
    in behind the same signature; on this synthetic shared-vocab corpus
    the stopword heuristic is the honest baseline.)"""
    docs = read_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))

    def has(word: str) -> Column:
        return padded.like(f"% {word} %")

    predicted = (
        F.when(has("the"), "en")
        .when(has("der") | has("und"), "de")
        .when(has("le") | has("et"), "fr")
        .when(has("el") | has("la"), "es")
        .otherwise("unk")
    )
    return docs.groupBy("lang", predicted.alias("predicted_lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@query(
    "t_quality_score",
    """
    SELECT doc_id,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / LENGTH(text)
             AS ink_ratio,
           CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 < 30
                  THEN 'short'
                WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 < 70
                  THEN 'medium'
                ELSE 'long' END AS length_bucket,
           (' ' || text || ' ' LIKE '% the %') AS has_stopword
    FROM documents
    """,
    survey="X-UD5,A5",
)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal extraction: ink ratio (non-space density), length
    bucket, stopword presence — the filter basis of a pretraining
    cleaning pass."""
    docs = read_table(spark, sf_dir, "documents")
    text = F.col("text")
    nospace = F.length(F.regexp_replace(text, " ", ""))
    ntok = F.length(text) - nospace + F.lit(1)
    return docs.select(
        "doc_id",
        (nospace.cast("double") / F.length(text)).alias("ink_ratio"),
        F.when(ntok < 30, "short")
        .when(ntok < 70, "medium")
        .otherwise("long")
        .alias("length_bucket"),
        F.concat(F.lit(" "), text, F.lit(" ")).like("% the %").alias("has_stopword"),
    )


@query(
    "t_doc_fingerprint",
    """
    SELECT doc_id, sha256(text) AS fingerprint,
           CAST(LENGTH(text) AS INTEGER) AS n_chars
    FROM documents
    """,
    survey="X-UD5,F1",
)
def t_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash document fingerprint — the join key for exact dedup
    across shards/releases."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("fingerprint"),
        F.length("text").alias("n_chars"),
    )


@query(
    "dd_corpus_dedup_keep_first",
    """
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    JOIN (SELECT sha256(text) AS fp, MIN(doc_id) AS keep
          FROM documents GROUP BY fp) s
      ON sha256(d.text) = s.fp AND d.doc_id = s.keep
    """,
    survey="X-UD5,D1,A9,J2",
)
def dd_corpus_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user-facing corpus dedup: materialize the surviving
    documents (lowest doc_id per content fingerprint) — what a
    training-data pipeline actually writes out after exact dedup."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "fp", F.sha2(F.col("text"), 256)
    )
    keep = docs.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keep, ["fp", "doc_id"], "left_semi").select(
        "doc_id", "lang", "n_chars"
    )


CHUNK_CHARS = 128


@query(
    "t_chunk_documents",
    f"""
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
           substring(text, i * {CHUNK_CHARS} + 1, {CHUNK_CHARS}) AS chunk
    FROM documents,
         (SELECT unnest(range(0, 64)) AS i)
    WHERE i * {CHUNK_CHARS} < LENGTH(text)
    """,
    survey="X-UD5,F12,P1",
)
def t_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width document chunking for training windows: substring
    arithmetic over a generated index — a narrow explode, no UDF, no
    shuffle; chunk count derives from the length so no trailing empty
    chunks (the 64-slot range upper bound is just the oracle's static
    iterator — the WHERE clause prunes it to ceil(len/width)).  Empty
    documents emit NO chunks: without the guard, sequence(0, -1) yields
    [0, -1] and posexplode would fabricate two bogus empty chunks."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "text",
            F.posexplode(
                F.expr(
                    f"CASE WHEN length(text) > 0 THEN "
                    f"transform(sequence(0, CAST(ceil(length(text) / "
                    f"{CHUNK_CHARS}.0) AS INT) - 1), "
                    f"i -> substring(text, i * {CHUNK_CHARS} + 1, {CHUNK_CHARS})) "
                    f"ELSE CAST(array() AS array<string>) END"
                )
            ).alias("chunk_idx", "chunk"),
        )
        .select("doc_id", "chunk_idx", "chunk")
    )


@query(
    "t_stopword_ratio",
    """
    SELECT doc_id,
           CAST((LENGTH(' ' || text || ' ')
                 - LENGTH(REPLACE(' ' || text || ' ', ' the ', ' '))) / 4
                AS INTEGER) AS the_count,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS INTEGER)
             AS n_tokens
    FROM documents
    """,
    survey="X-UD5,F12",
)
def t_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword frequency signal via replace-length arithmetic —
    non-overlapping left-to-right replacement is identical in both
    engines, so the count is engine-neutral (' the ' is 6 chars
    replaced by 1 → each hit removes 4)."""
    docs = read_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    the_count = (
        (F.length(padded) - F.length(F.regexp_replace(padded, " the ", " "))) / 4
    ).cast("int")
    nospace = F.length(F.regexp_replace(F.col("text"), " ", ""))
    return docs.select(
        "doc_id",
        the_count.alias("the_count"),
        (F.length("text") - nospace + F.lit(1)).alias("n_tokens"),
    )


@query(
    "t_bpe_token_count",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                AS INTEGER) AS n_regex_tokens,
           CAST((SELECT SUM(CAST(ceil(length(w) / 4.0) AS INTEGER))
                 FROM unnest(string_split(text, ' ')) AS t(w))
                AS INTEGER) AS n_subword_units
    FROM documents
    """,
    survey="X-UD5,F12",
)
def t_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting for training-data budgeting: a GPT-style
    regex pre-tokenizer count plus a subword-unit estimate (≤4-char
    chunks per word — the fixed-fanout stand-in for a learned merge
    table).  Both are engine-neutral integer counts."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count(
            F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]")
        ).alias("n_regex_tokens"),
        F.expr(
            "CAST(aggregate(split(text, ' '), 0, "
            "(a, w) -> a + CAST(ceil(length(w) / 4.0) AS INT)) AS INT)"
        ).alias("n_subword_units"),
    )


try:  # optional exact-F3 dependency; not installed in this container
    from cleantext import clean as _cleantext_clean
except ImportError:  # pragma: no cover
    _cleantext_clean = None


def clean_text(col):
    """F3: the reference's clean(config, no_emoji=True) call
    (databaseImport.py:633-635, clean-text lib) approximated engine-
    side: lowercase, strip non-printable-ASCII (covers emoji), collapse
    runs of whitespace, trim.  Vectorized JVM regexp — no Python.
    For byte-exact lib parity use ``clean_text_exact_udf`` (SURVEY
    §2.9 F3's optional pandas-UDF path)."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.lower(c), "[^\\x20-\\x7e]", "")
    return F.trim(F.regexp_replace(stripped, " +", " "))


def clean_text_exact_udf():
    """Exact F3: Arrow-batched pandas UDF wrapping the actual
    ``clean-text`` library with the reference's argument shape —
    ``clean(x, no_emoji=True)`` (databaseImport.py:635).  Known deltas
    vs the regex approximation: the lib also folds unicode to ASCII
    lookalikes (ç→c) and normalizes curly quotes/dashes instead of
    stripping them; the regex path simply drops all non-printable-ASCII.
    Raises ImportError when the lib is absent (this container) so
    callers fall back to ``clean_text`` explicitly, never silently."""
    if _cleantext_clean is None:
        raise ImportError(
            "clean-text is not installed; use the clean_text() regex "
            "approximation or install clean-text for byte parity"
        )

    @F.pandas_udf("string")
    def _clean(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None if x is None else _cleantext_clean(x, no_emoji=True)
        )

    return _clean


def clean_text_best(col):
    """Exact lib path when importable, regex approximation otherwise —
    the documented production seam for F3."""
    if _cleantext_clean is not None:
        c = F.col(col) if isinstance(col, str) else col
        return clean_text_exact_udf()(c)
    return clean_text(col)


@query(
    "f3_clean_text",
    r"""
    SELECT doc_id,
           trim(regexp_replace(
                regexp_replace(lower(text), '[^\x20-\x7e]', '', 'g'),
                ' +', ' ', 'g')) AS cleaned
    FROM documents
    """,
    survey="F3,UD1",
)
def f3_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text cleaning applied to the documents corpus (the reference
    applies it only to model.config — same operator, bigger column)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", clean_text("text").alias("cleaned"))


_ROLLING_P = 2147483647  # 2^31 - 1

_ROLLING_ORACLE = f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                 w -> ('0x' || substr(sha256('0:' || w), 1, 15))::BIGINT
                      % {_ROLLING_P})),
             (acc, h) -> (acc * 31 + h) % {_ROLLING_P}) AS rolling_fp
    FROM documents
    """


@query("t_rolling_hash_fingerprint", _ROLLING_ORACLE, survey="X-UD5")
def t_rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash over the token stream (shift-resistant
    fingerprint).  Pure JVM fold (aggregate over split) — modular
    arithmetic keeps every intermediate in-range under ANSI mode.
    Token hashes use the seeded sha256-prefix hash (``dedup.sha60``)
    whose DuckDB twin folds identically via list_reduce, so the full
    fingerprint is value-checked; every intermediate is < 2^36."""
    docs = read_table(spark, sf_dir, "documents")
    p = _ROLLING_P
    tok_hash = (
        "CAST(CONV(SUBSTRING(SHA2(CONCAT_WS(':', '0', w), 256), 1, 15), "
        "16, 10) AS BIGINT)"
    )
    expr = (
        "aggregate(split(text, ' '), CAST(0 AS BIGINT), "
        f"(acc, w) -> pmod(acc * 31 + pmod({tok_hash}, {p}), {p}))"
    )
    return docs.select("doc_id", F.expr(expr).alias("rolling_fp"))


MIN_TOKENS = 30  # C4-style floor: shorter docs carry too little signal


@query(
    "t_clean_corpus_stats",
    f"""
    WITH ranked AS (
      SELECT doc_id, source, text,
             LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY sha256(text)
                                ORDER BY doc_id) AS dup_rank
      FROM documents
    )
    SELECT source,
           COUNT(*) FILTER (dup_rank = 1 AND n_tokens >= {MIN_TOKENS})
             AS n_kept,
           COUNT(*) FILTER (dup_rank > 1) AS n_dropped_dup,
           COUNT(*) FILTER (dup_rank = 1 AND n_tokens < {MIN_TOKENS})
             AS n_dropped_short,
           CAST(SUM(n_tokens) FILTER (dup_rank = 1 AND n_tokens >= {MIN_TOKENS})
                AS BIGINT) AS tokens_kept
    FROM ranked GROUP BY source
    """,
    survey="X-UD5,A8,P12,W4",
)
def t_clean_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed C4-style cleaning pipeline as ONE declarative plan:
    exact-dedup keep-first (sha256 row_number, W4 shape) -> minimum
    token floor -> per-source survivor accounting.  Everything is
    JVM built-ins; the only shuffles are the dedup window on the
    32-byte fingerprint and the final pre-aggregated groupBy.  This is
    the query a data curator runs before committing a training mix."""
    docs = read_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    text = F.col("text")
    ntok = token_count(text)
    w = Window.partitionBy(F.sha2(text, 256)).orderBy("doc_id")
    ranked = docs.select(
        "source", ntok.alias("n_tokens"), F.row_number().over(w).alias("dup_rank")
    )
    kept = (F.col("dup_rank") == 1) & (F.col("n_tokens") >= MIN_TOKENS)
    return ranked.groupBy("source").agg(
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.count(F.when(F.col("dup_rank") > 1, 1)).alias("n_dropped_dup"),
        F.count(
            F.when(
                (F.col("dup_rank") == 1)
                & (F.col("n_tokens") < MIN_TOKENS), 1
            )
        ).alias("n_dropped_short"),
        F.sum(F.when(kept, F.col("n_tokens"))).alias("tokens_kept"),
    )


TOP_BIGRAM_MAX = 0.18  # Gopher-style cap on the most frequent 2-gram's
# share of all 2-gram occurrences (Rae et al. 2021 use 0.20 for the
# top 2-gram; tightened slightly so the synthetic corpus actually
# rejects a few docs and the flag column carries signal)


@query(
    "t_repetition_filter",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i+1])) AS bigram
      FROM toks WHERE len(w) >= 2
    ),
    cnt AS (
      SELECT doc_id, bigram, COUNT(*) AS c
      FROM bg GROUP BY doc_id, bigram
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_bigram_frac,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / SUM(c)
             AS dup_bigram_frac,
           MAX(c) * 100 <= SUM(c) * {int(TOP_BIGRAM_MAX * 100)} AS keep
    FROM cnt GROUP BY doc_id
    """,
    survey="X-UD5,A4,F11",
)
def t_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter (Rae et al. 2021 §A.1.1): per
    document, the share of 2-gram occurrences taken by the most
    frequent 2-gram and by any repeated 2-gram; docs above the cap are
    flagged for drop.

    Scale shape: explode is narrow (rows fan out but stay on their
    input partition), then two shuffles both keyed by doc_id — the
    (doc_id, bigram) count partial-aggregates map-side, and the final
    per-doc rollup moves one row per distinct bigram.  The keep flag
    is integer-only arithmetic (c*100 <= total*18) so Spark and DuckDB
    agree bit-for-bit with no float threshold ambiguity."""
    docs = read_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    bigrams = F.expr(
        "transform(sequence(1, size(w) - 1), "
        "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
    )
    bg = (
        docs.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
    )
    cnt = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    total = F.sum("c")
    top = F.max("c")
    dup = F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
    return cnt.groupBy("doc_id").agg(
        total.cast("long").alias("n_bigrams"),
        (top.cast("double") / total).alias("top_bigram_frac"),
        (dup.cast("double") / total).alias("dup_bigram_frac"),
        (top * 100 <= total * int(TOP_BIGRAM_MAX * 100)).alias("keep"),
    )


# Cross-engine-safe PII patterns: no lookaround, no \b (Java and RE2
# agree on these exact constructs).
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
IP_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


@query(
    "t_pii_scrub_stats",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.1 end' AS raw
      FROM documents
    ),
    scrub AS (
      SELECT doc_id, raw,
             regexp_replace(regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g'),
                            '{IP_RE}', '<IP>', 'g') AS clean
      FROM aug
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS INTEGER)
             AS n_emails,
           CAST(len(regexp_extract_all(regexp_replace(raw, '{EMAIL_RE}',
                    '<EMAIL>', 'g'), '{IP_RE}')) AS INTEGER) AS n_ips,
           CAST(LENGTH(clean) AS INTEGER) AS clean_len,
           sha256(clean) AS clean_sha
    FROM scrub
    """,
    survey="X-UD5,F1,F12",
)
def t_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: mask emails then IPv4-shaped
    tokens, count hits, and sha256 the scrubbed text so the oracle
    proves the masking is byte-identical (not just same-length).

    The synthetic corpus contains no organic PII, so the query first
    derives a deterministic augmented column (same expression in both
    engines) that embeds one email + one IP per row — the regex
    machinery, masking order (emails before IPs so 'user@10.0.0.1'
    styles can't double-count), and hash discipline are the real
    operator; the augmentation is only the fixture.  All per-row
    narrow projections — no shuffle at any scale."""
    docs = read_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".1 end"),
    )
    emails_masked = F.regexp_replace(raw, EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(emails_masked, IP_RE, "<IP>")
    return docs.select(
        "doc_id",
        F.regexp_count(raw, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(emails_masked, F.lit(IP_RE)).cast("int").alias("n_ips"),
        F.length(clean).cast("int").alias("clean_len"),
        F.sha2(clean, 256).alias("clean_sha"),
    )


@query(
    "t_rarity_score",
    """
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    dw AS (SELECT doc_id, w, COUNT(*) AS in_doc FROM words GROUP BY doc_id, w),
    vocab AS (SELECT w, CAST(SUM(in_doc) AS BIGINT) AS corpus_freq
              FROM dw GROUP BY w)
    SELECT dw.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
           CAST(MIN(corpus_freq) AS BIGINT) AS rarest_freq,
           CAST(SUM(CASE WHEN corpus_freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(SUM(in_doc * corpus_freq) AS DOUBLE) / SUM(in_doc)
             AS mean_word_freq
    FROM dw JOIN vocab USING (w)
    GROUP BY dw.doc_id
    """,
    survey="X-UD5,A7",
)
def t_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass vocabulary rarity scoring — the classic corpus-level
    statistic → per-document score pipeline (the shape behind unigram
    perplexity filters, done integer-exact so both engines hash
    identically: occurrence-weighted mean corpus frequency instead of
    a log-prob, since ln() is not correctly rounded cross-engine).

    Scale shape: explode is narrow; the (doc_id, word) partial agg
    runs map-side before its shuffle, the vocab rollup and the
    vocab⋈doc-word join each shuffle on the word key, and the final
    per-doc rollup shuffles on doc_id — four bounded shuffles, all of
    frames no larger than one row per (doc, distinct word).  The
    doc-word subtree is recomputed for the two branches rather than
    cached: at corpus scale a columnar re-scan is cheaper than
    spilling the exploded token set through the block manager.
    Zipf-head words skew the word shuffles; the (doc_id, word) partial
    agg caps any single key's fan-in at one row per doc."""
    docs = read_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    dw = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("in_doc"))
    vocab = dw.groupBy("w").agg(
        F.sum("in_doc").cast("long").alias("corpus_freq")
    )
    joined = dw.join(vocab, "w")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
        F.min("corpus_freq").cast("long").alias("rarest_freq"),
        F.sum(F.when(F.col("corpus_freq") == 1, 1).otherwise(0))
        .cast("long").alias("n_hapax"),
        (
            F.sum(F.col("in_doc") * F.col("corpus_freq")).cast("double")
            / F.sum("in_doc")
        ).alias("mean_word_freq"),
    )


# ---------------------------------------------------------------------------
# Round 6: rule-cascade filter audit + per-source adaptive quality threshold
# ---------------------------------------------------------------------------

_CASCADE_ORACLE = """
    WITH m AS (
        SELECT doc_id,
               LENGTH(text) AS len,
               LENGTH(REPLACE(text, ' ', '')) AS nospace,
               LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS ntok,
               LENGTH(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                 AS symbols,
               CAST((LENGTH(' ' || text || ' ')
                     - LENGTH(REPLACE(' ' || text || ' ', ' a ', ' '))) / 2
                    AS BIGINT) AS a_count,
               (' ' || text || ' ' LIKE '% the %') AS has_stopword
        FROM documents
    ),
    v AS (
        SELECT ntok,
               CASE WHEN len IS NULL OR len = 0 THEN 'no_text'
                    WHEN ntok < 20 THEN 'too_short'
                    WHEN nospace < 4 * ntok THEN 'low_density'
                    WHEN 10 * symbols > len THEN 'symbol_heavy'
                    WHEN NOT has_stopword THEN 'no_stopword'
                    WHEN 10 * a_count > ntok THEN 'filler_heavy'
                    ELSE 'pass' END AS verdict
        FROM m
    )
    SELECT verdict,
           COUNT(*) AS n_docs,
           CAST(SUM(ntok) AS DOUBLE) / COUNT(*) AS avg_tokens
    FROM v
    GROUP BY verdict
"""


@query(
    "t_filter_cascade_audit",
    _CASCADE_ORACLE,
    survey="X-UD5,A5,A7,P12,F12",
)
def t_filter_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style quality-rule cascade with per-rule drop
    accounting: each document is charged to the FIRST rule it fails
    (no text at all, min length, lexical density, symbol ratio,
    stopword presence, filler-token share), and the audit reports
    document count and mean token length per verdict — the rejection
    funnel a cleaning pass publishes before anyone commits to its
    thresholds.  NULL and empty texts land in an explicit 'no_text'
    verdict rather than falling through every NULL-valued rule into
    'pass' (both engines' CASE semantics would do exactly that).

    All rule arithmetic is integer-exact (cross-multiplied ratios, the
    non-overlapping replace-length token count the module already uses
    for ' the '), so the DuckDB oracle hashes bit-identically.

    Scale shape: one scan, all flags in whole-stage codegen, a single
    partial-aggregated shuffle of ≤6 verdict groups.  No UDF, no
    window, no join — this audit costs one pass regardless of corpus
    size."""
    docs = read_table(spark, sf_dir, "documents")
    text = F.col("text")
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    ln = F.length(text)
    nospace = F.length(F.regexp_replace(text, " ", ""))
    ntok = ln - nospace + F.lit(1)
    symbols = F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", ""))
    a_count = (
        (F.length(padded) - F.length(F.regexp_replace(padded, " a ", " ")))
        / 2
    ).cast("bigint")
    verdict = (
        F.when(text.isNull() | (ln == 0), "no_text")
        .when(ntok < 20, "too_short")
        .when(nospace < 4 * ntok, "low_density")
        .when(10 * symbols > ln, "symbol_heavy")
        .when(~padded.like("% the %"), "no_stopword")
        .when(10 * a_count > ntok, "filler_heavy")
        .otherwise("pass")
    )
    n = F.count(F.lit(1))
    return (
        docs.select(verdict.alias("verdict"), ntok.alias("ntok"))
        .groupBy("verdict")
        .agg(
            n.alias("n_docs"),
            (F.sum("ntok").cast("double") / n).alias("avg_tokens"),
        )
    )


_ADAPTIVE_ORACLE = """
    WITH scored AS (
        SELECT doc_id, source,
               (LENGTH(REPLACE(text, ' ', '')) * 1000) // LENGTH(text)
                 AS score
        FROM documents
        WHERE text IS NOT NULL AND source IS NOT NULL
          AND LENGTH(text) > 0
    ),
    ranked AS (
        SELECT source, score,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY score, doc_id) AS rk,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM scored
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rk > n // 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           MIN(CASE WHEN rk > n // 4 THEN score END) AS threshold_score,
           CAST(SUM(CASE WHEN rk > n // 4 THEN score END) AS DOUBLE)
             / CAST(SUM(CASE WHEN rk > n // 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS avg_kept_score
    FROM ranked
    GROUP BY source
"""


@query(
    "t_source_relative_quality_filter",
    _ADAPTIVE_ORACLE,
    survey="X-UD5,W1,A6,A7,J9",
)
def t_source_relative_quality_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FineWeb-style ADAPTIVE quality gate: instead of one global
    cutoff, each source sheds its own bottom quartile by ink-density
    score (rank > floor(n/4) under a (score, doc_id) total order), so
    a clean source is not over-pruned and a noisy one is not
    under-pruned.  Reports per-source doc count, survivors, the
    realised threshold score, and the survivors' exact mean score.

    The oracle ranks with a per-source ROW_NUMBER window — the obvious
    formulation.  The Spark plan deliberately does NOT: with few
    sources and 100 TB of text, a window partitioned only by source
    sorts 1/|sources| of the corpus in single tasks.  Instead the rank
    is decomposed through the score histogram: scores live in [0,1000]
    (per-mille ink ratio, integer DIV), so groupBy(source, score) is a
    tiny partial-aggregated frame; a cumulative window over that
    histogram yields each (source, score) cell's below-count; the
    full-data window only breaks ties WITHIN a (source, score) cell
    (fine-grained partitions), and rank = below + row_number.  Same
    declared semantics, bounded per-task work at any corpus size.

    NULL/empty guard, explicit on BOTH sides: a NULL or empty text has
    no score (LENGTH 0 makes the integer DIV undefined) and a NULL
    source has no population to rank within — and the engines disagree
    by default (Spark's equi-join drops NULL keys and orders NULLS
    FIRST where the oracle's window keeps and orders them LAST), so
    the gate excludes all three up front; a production pipeline routes
    them to a quarantine source before ranking."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & F.col("source").isNotNull()
        & (F.length("text") > 0)
    )
    scored = docs.select(
        "doc_id",
        "source",
        F.expr(
            "CAST((LENGTH(REPLACE(text, ' ', '')) * 1000)"
            " DIV LENGTH(text) AS BIGINT)"
        ).alias("score"),
    )
    hist = scored.groupBy("source", "score").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = hist.select(
        "source",
        "score",
        (F.sum("cnt").over(w_cum) - F.col("cnt")).alias("below"),
        F.sum("cnt").over(Window.partitionBy("source")).alias("n"),
    )
    w_tie = Window.partitionBy("source", "score").orderBy("doc_id")
    ranked = scored.join(F.broadcast(hist), ["source", "score"]).withColumn(
        "rk", F.col("below") + F.row_number().over(w_tie)
    )
    kept = F.col("rk") > F.expr("n DIV 4")
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept.cast("bigint")).alias("n_kept"),
        F.min(F.when(kept, F.col("score"))).alias("threshold_score"),
        (
            F.sum(F.when(kept, F.col("score"))).cast("double")
            / F.sum(kept.cast("bigint"))
        ).alias("avg_kept_score"),
    )


# --- distributed BPE merge step (round 8) ----------------------------

# One round of byte-pair-encoding vocabulary training, the way a
# tokenizer is actually trained over a 100 TB corpus: all pair
# statistics are computed over the WORD-TYPE table (distinct word +
# occurrence count — vocabulary-bounded, orders of magnitude smaller
# than the corpus), the winning merge is a 1-row broadcast, and the
# rewritten word types are re-counted.  Two unrolled rounds, like the
# fixed-iteration PageRank: round 1 finds the top pair, round 2
# returns the post-merge pair counts.
BPE_TOP_PAIRS = 20
# placeholder symbol for the merged pair inside rewritten words; both
# engines REPLACE left-to-right non-overlapping, which IS the BPE
# greedy merge rule ("aaa" + merge "aa" -> ["aa","a"])
BPE_MARK = "¤"

_BPE_PAIRS_CTES = """wf AS (
      SELECT w, COUNT(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
      ) WHERE w <> '' GROUP BY w
    ),
    p1 AS (
      SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b,
             SUM(n) AS cnt
      FROM wf, LATERAL (SELECT unnest(range(1, length(w))) AS i)
      WHERE length(w) >= 2
      GROUP BY a, b
    ),
    top1 AS (SELECT a AS ma, b AS mb FROM p1
             ORDER BY cnt DESC, a, b LIMIT 1),
    wf2 AS (
      SELECT replace(w, ma || mb, '¤') AS w, n FROM wf, top1
    ),
    p2 AS (
      SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b,
             SUM(n) AS cnt
      FROM wf2, LATERAL (SELECT unnest(range(1, length(w))) AS i)
      WHERE length(w) >= 2
      GROUP BY a, b
    )"""

_BPE_MERGE_ORACLE = f"""
    WITH {_BPE_PAIRS_CTES},
    top AS (SELECT a, b, cnt FROM p2
            ORDER BY cnt DESC, a, b LIMIT {BPE_TOP_PAIRS})
    SELECT replace(a, '¤', ma || mb) AS sym_a,
           replace(b, '¤', ma || mb) AS sym_b,
           cnt::BIGINT AS pair_count
    FROM top, top1
    """


def _bpe_pair_counts(wf: DataFrame) -> DataFrame:
    """(a, b, cnt) adjacent-symbol pair counts over a word-type
    frame — a narrow generator explode (chars of DISTINCT words, never
    the corpus) into a two-key partial→final aggregate."""
    pairs = (
        wf.filter(F.length("w") >= 2)
        .select(
            F.col("n"),
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), "
                    "i -> struct(substring(w, i, 1) AS a, "
                    "substring(w, i + 1, 1) AS b))"
                )
            ).alias("p"),
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "n")
    )
    return pairs.groupBy("a", "b").agg(F.sum("n").alias("cnt"))


@query("t_bpe_merge_pairs", _BPE_MERGE_ORACLE,
       survey="X-UD5,A4,O2,F12,J9")
def t_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed BPE training round: count adjacent-symbol pairs
    over the word-type table, apply the single most frequent merge
    (broadcast 1-row winner; left-to-right ``replace`` == the greedy
    BPE rule), and return the top post-merge pair counts with the
    merged symbol expanded back to its character pair.

    Scale shape: the corpus-sized work is ONE word-frequency aggregate
    (the same shuffle every token-count query pays); everything after
    runs over the vocabulary-bounded word-type frame.  Counts are
    exact integers; ordering is (count DESC, symbols ASC) in both
    engines — no floats anywhere."""
    docs = read_table(spark, sf_dir, "documents")
    wf = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        # vocabulary-bounded, two consumers (the p1 pair counts and
        # the rewrite) — eagerly checkpoint so the corpus is tokenized
        # ONCE, not once per consumer
        .localCheckpoint()
    )
    p1 = _bpe_pair_counts(wf)
    top1 = (
        p1.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(1)
        .select(F.col("a").alias("ma"), F.col("b").alias("mb"))
        # 1-row winner, two consumers (the rewrite and the final
        # symbol expansion) — checkpoint so the vocabulary-wide p1
        # aggregation runs once, not once per reference
        .localCheckpoint()
    )
    wf2 = wf.crossJoin(F.broadcast(top1)).select(
        F.expr(f"replace(w, ma || mb, '{BPE_MARK}')").alias("w"),
        "n", "ma", "mb",
    )
    p2 = _bpe_pair_counts(wf2.select("w", "n"))
    top = p2.orderBy(
        F.desc("cnt"), F.asc("a"), F.asc("b")
    ).limit(BPE_TOP_PAIRS)
    return top.crossJoin(F.broadcast(top1)).select(
        F.expr(f"replace(a, '{BPE_MARK}', ma || mb)").alias("sym_a"),
        F.expr(f"replace(b, '{BPE_MARK}', ma || mb)").alias("sym_b"),
        F.col("cnt").cast("long").alias("pair_count"),
    )
