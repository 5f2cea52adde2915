"""Unigram language-model scoring over the ``documents`` corpus
(SURVEY §2.11 X-UD5 north star): DSIR-style importance selection and
CCNet-style per-language perplexity bucketing.

The reference has no data-selection surface (its query layer is
delegated to MariaDB — reference/extractor/databaseImport.py:1); these
are part of the beyond-reference LLM-pipeline capability set, next to
BM25 retrieval (``operators/retrieval.py``) and the dedup/ANN families.
Both methods are from the public literature:

- DSIR (Xie et al., "Data Selection for Language Models via Importance
  Resampling", 2023): score each raw-pool document by the bag-of-words
  log-likelihood ratio between a small target corpus and the raw pool,
  then keep the top-weighted documents.  Here the target is the 'val'
  hash split and the raw pool the 'train' split, so the whole query is
  reproducible from the corpus alone.
- CCNet (Wenzek et al., 2020): score each document under a per-language
  unigram LM and cut each language into head/middle/tail perplexity
  terciles.  CCNet uses a 5-gram KenLM; a unigram LM is the same
  pipeline shape with the corpus itself as training data.

Scale shape (the 100 TB lens): the token explode is narrow; every
shuffle is keyed — (lang, token) / token for the LM statistics,
doc_id for the per-document rollup — with map-side partial aggregation,
so Zipf-head tokens fan in at one row per (doc, token) at most.  The
per-token score tables are vocabulary-sized; they join back to the
occurrence stream on the token key (an equi-join Spark can hash or
broadcast by size — at these SFs they broadcast).  The tercile window
is partitioned per language (CCNet's own granularity), never global.

Determinism contract (the driver hash-compares values): all counts are
exact integers; each per-token score takes exactly ONE libm ``ln``
(not correctly rounded cross-engine) and is immediately rounded
half-away-from-zero to integer MICROS, so the per-document sums are
exact BIGINT arithmetic — associative, order-independent, identical in
any engine.  The only remaining float op is one IEEE division
(correctly rounded) for the per-token mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.operators.sampling import hash_split, hash_split_sql
from hfcommunity_spark.registry import query
from hfcommunity_spark.session_cache import SessionCache

MICROS = 1_000_000  # per-token log scores as integer micro-nats
DSIR_KEEP = 200     # documents selected from the raw pool


def dsir_docw_ctes(p: str = "") -> str:
    """The split→tokens→counts→log-ratio→per-doc-weight CTE chain,
    shared by the top-K selection, the Gumbel resample, and the
    curation composite's oracles so the weight model cannot drift
    between them (the MINHASH_CAPPED_CTES rule).  Every CTE name takes
    the ``p`` prefix so composers can splice the chain next to chains
    that already bind toks/sp (``operators/curation.py``)."""
    return f"""{p}sp AS (
      SELECT doc_id, text, {hash_split_sql()} AS split FROM documents
    ),
    {p}toks AS (
      SELECT doc_id, split, unnest(string_split(text, ' ')) AS w
      FROM {p}sp WHERE split IN ('train', 'val')
    ),
    {p}cnt AS (
      SELECT w,
             CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ct,
             CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cr
      FROM {p}toks GROUP BY w
    ),
    {p}tot AS (
      SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM {p}cnt
    ),
    {p}lr AS (
      SELECT w,
             CAST(ROUND(LN(
               ((CAST(ct AS DOUBLE) + 1.0) * CAST(nr + v AS DOUBLE))
               / ((CAST(cr AS DOUBLE) + 1.0) * CAST(nt + v AS DOUBLE))
             ) * {MICROS}) AS BIGINT) AS lr_micro
      FROM {p}cnt, {p}tot
    ),
    {p}docw AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(lr_micro) AS BIGINT) AS weight_micro
      FROM {p}toks t JOIN {p}lr USING (w)
      WHERE t.split = 'train'
      GROUP BY t.doc_id
    )"""


_DSIR_DOCW_CTES = dsir_docw_ctes()

_DSIR_ORACLE = f"""
    WITH {_DSIR_DOCW_CTES},
    top AS (SELECT * FROM docw
            ORDER BY weight_micro DESC, doc_id LIMIT {DSIR_KEEP})
    SELECT doc_id, n_tokens, weight_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY weight_micro DESC, doc_id)
                AS INTEGER) AS rank
    FROM top
    """


def dsir_lr_frames(docs: DataFrame):
    """The DSIR unigram-LM artifacts from a documents pool: the
    exploded (doc_id, split, w) occurrence stream, the vocabulary-sized
    per-token micro-nat log-ratio table (w, lr_micro), and the 1-row
    totals frame (nt, nr, v, oov_micro) — ``oov_micro`` is the add-1
    log ratio of a token unseen in BOTH splits, the score an
    out-of-vocabulary arrival gets at admission time.  Target = 'val'
    hash split, raw pool = 'train'."""
    sp = docs.select(
        "doc_id", "text", hash_split(F.col("doc_id")).alias("split")
    ).filter(F.col("split").isin("train", "val"))
    toks = sp.select(
        "doc_id", "split", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    cnt = toks.groupBy("w").agg(
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("long").alias("ct"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long").alias("cr"),
    )
    tot = cnt.agg(
        F.sum("ct").cast("long").alias("nt"),
        F.sum("cr").cast("long").alias("nr"),
        F.count(F.lit(1)).cast("long").alias("v"),
    ).select(
        "nt", "nr", "v",
        F.round(
            F.log(
                (F.col("nr") + F.col("v")).cast("double")
                / (F.col("nt") + F.col("v")).cast("double")
            )
            * MICROS,
            0,
        ).cast("long").alias("oov_micro"),
    )
    ratio = (
        (F.col("ct").cast("double") + F.lit(1.0))
        * (F.col("nr") + F.col("v")).cast("double")
    ) / (
        (F.col("cr").cast("double") + F.lit(1.0))
        * (F.col("nt") + F.col("v")).cast("double")
    )
    lr = cnt.crossJoin(F.broadcast(tot)).select(
        "w",
        F.round(F.log(ratio) * MICROS, 0).cast("long").alias("lr_micro"),
    )
    return toks, lr, tot


def ranked_topk(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """``orderBy(key DESC, doc_id ASC).limit(k)`` + an INT rank over
    the ≤k surviving rows — TakeOrderedAndProject then a k-row window,
    never a global rank (the ``similarity._rank_topk`` discipline).
    ONE definition for the DSIR-family top-k faces (select, resample,
    and the curation composite) so the tie-break cannot drift."""
    top = df.orderBy(F.desc(key_col), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc(key_col), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def _dsir_docw(toks: DataFrame, lr: DataFrame) -> DataFrame:
    """Per-train-doc weight rollup (doc_id, n_tokens, weight_micro) —
    the ONE Spark twin of the ``docw`` CTE, shared by the top-K
    selection and the Gumbel resample exactly like their oracles share
    ``_DSIR_DOCW_CTES`` (round-5 review finding: a duplicated build
    could silently desynchronize the two weight models)."""
    return (
        toks.filter(F.col("split") == "train")
        .join(F.broadcast(lr), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lr_micro").cast("long").alias("weight_micro"),
        )
    )


# The per-doc DSIR weight frame over the standard documents pool — the
# selection, the Gumbel resample, and both curation composites all
# rank against the SAME weight model, so it's a build-once/probe-many
# artifact like the posting and pair indexes (at 100 TB: a scored
# manifest the selection pipeline maintains beside the corpus).
_DSIR_DOCW_CACHE = SessionCache(persist=True)


def dsir_docw_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-persisted (doc_id, n_tokens, weight_micro) DSIR weight
    frame over ``sf_dir``'s documents table (target = 'val' split,
    pool = 'train' split — the ``_DSIR_DOCW_CTES`` model)."""

    def build() -> DataFrame:
        docs = read_table(spark, sf_dir, "documents")
        toks, lr, _tot = dsir_lr_frames(docs)
        return _dsir_docw(toks, lr)

    return _DSIR_DOCW_CACHE.get_or_build(spark, (sf_dir,), build)


@query("samp_dsir_select", _DSIR_ORACLE, survey="X-UD5,A10,O2,J9,F11")
def samp_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance selection: rank the 'train' hash-split pool by
    the add-1-smoothed unigram log-likelihood ratio toward the 'val'
    split and keep the top {DSIR_KEEP}.

    Plan: explode → one (w) partial-agg shuffle for the split counts,
    a 1-row broadcast of the corpus totals, the vocabulary-sized
    log-ratio table broadcast back onto the occurrence stream, one
    doc_id rollup shuffle, TakeOrderedAndProject top-k.  Per-token
    log ratios are micro-rounded BIGINTs so document weights are
    exact integer sums (order-independent; see module docstring).
    The weight frame is session-persisted (:func:`dsir_docw_index`) —
    the resample and the curation composites rank against the same
    persisted model."""
    docw = dsir_docw_index(spark, sf_dir)
    return ranked_topk(docw, "weight_micro", DSIR_KEEP).select(
        "doc_id", "n_tokens", "weight_micro", "rank"
    )


_PPL_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    freq AS (
      SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS f
      FROM toks GROUP BY lang, w
    ),
    nl AS (SELECT lang, CAST(SUM(f) AS BIGINT) AS n FROM freq GROUP BY lang),
    nll AS (
      SELECT lang, w,
             CAST(ROUND(LN(CAST(n AS DOUBLE) / CAST(f AS DOUBLE))
                        * {MICROS}) AS BIGINT) AS nll_micro
      FROM freq JOIN nl USING (lang)
    ),
    docstats AS (
      SELECT t.doc_id, t.lang,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(nll_micro) AS BIGINT) AS total_nll_micro
      FROM toks t JOIN nll USING (lang, w)
      GROUP BY t.doc_id, t.lang
    ),
    scored AS (
      SELECT doc_id, lang, n_tokens,
             CAST(total_nll_micro AS DOUBLE) / n_tokens AS mean_nll_micro
      FROM docstats
    )
    SELECT doc_id, lang, n_tokens, mean_nll_micro,
           CASE NTILE(3) OVER (PARTITION BY lang
                               ORDER BY mean_nll_micro, doc_id)
             WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS ppl_bucket
    FROM scored
    """


@query("t_unigram_ppl_buckets", _PPL_ORACLE, survey="X-UD5,A7,F11,W1")
def t_unigram_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document under its
    language's unigram LM (mean negative log-probability per token,
    in micro-nats) and cut each language into head/middle/tail
    terciles — head = lowest perplexity = most in-distribution.

    Plan: explode → (lang, w) partial-agg shuffle for frequencies, a
    language-sized rollup for corpus totals, the per-token NLL table
    joined back on (lang, w), one doc_id rollup shuffle, then an
    NTILE window partitioned BY LANGUAGE (CCNet's own granularity —
    no global sort; each language's docs sort within its partition).
    The mean is one IEEE division of an exact BIGINT micro-nat sum."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    freq = toks.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    nl = freq.groupBy("lang").agg(F.sum("f").cast("long").alias("n"))
    nll = freq.join(F.broadcast(nl), "lang").select(
        "lang", "w",
        F.round(
            F.log(F.col("n").cast("double") / F.col("f").cast("double"))
            * MICROS,
            0,
        ).cast("long").alias("nll_micro"),
    )
    docstats = (
        toks.join(F.broadcast(nll), ["lang", "w"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("nll_micro").cast("long").alias("total_nll_micro"),
        )
    )
    scored = docstats.select(
        "doc_id", "lang", "n_tokens",
        (F.col("total_nll_micro").cast("double") / F.col("n_tokens"))
        .alias("mean_nll_micro"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.asc("mean_nll_micro"), F.asc("doc_id")
    )
    bucket = F.ntile(3).over(w)
    return scored.select(
        "doc_id", "lang", "n_tokens", "mean_nll_micro",
        F.when(bucket == 1, "head")
        .when(bucket == 2, "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


# --- streaming DSIR admission gate (round 5) -----------------------
#
# The ingest face of the importance model: an arriving micro-batch is
# scored against the FROZEN corpus LM (the same per-token log-ratio
# table samp_dsir_select ranks with) and admitted iff its total
# micro-nat weight is non-negative — i.e. the document looks at least
# as target-like as raw-pool-like under the corpus statistics.
# Out-of-vocabulary tokens get the add-1 score of a token unseen in
# both splits (oov_micro), so the gate is total.  Like the curation
# gate (operators/curation.py), every probe is a stream-static join
# against an artifact the batch pipeline already maintains; the
# admission sign is an exact integer comparison, so the decision is
# bit-stable in any engine and any partitioning.

def dsir_gate(incoming: DataFrame, lr: DataFrame,
              tot: DataFrame) -> DataFrame:
    """One micro-batch's admission decision (the foreachBatch body):
    ``incoming`` (doc_id, text) scored against the frozen LM artifacts
    ``lr`` (w, lr_micro) and ``tot`` (…, oov_micro).  Returns
    (doc_id, n_tokens, weight_micro, mean_lr_micro, admitted)."""
    toks = incoming.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    scored = (
        toks.join(F.broadcast(lr), "w", "left")
        .crossJoin(F.broadcast(tot.select("oov_micro")))
        .select(
            "doc_id",
            F.coalesce(F.col("lr_micro"), F.col("oov_micro"))
            .alias("lr_micro"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("lr_micro").cast("long").alias("weight_micro"),
    )
    return agg.select(
        "doc_id", "n_tokens", "weight_micro",
        (F.col("weight_micro").cast("double") / F.col("n_tokens"))
        .alias("mean_lr_micro"),
        (F.col("weight_micro") >= 0).alias("admitted"),
    )


_X12_INC = "doc_id % 10 = 3"
_X12_CORP = "doc_id % 10 <> 3"

_X12_ORACLE = f"""
    WITH sp AS (
      SELECT doc_id, text, {hash_split_sql()} AS split
      FROM documents WHERE {_X12_CORP}
    ),
    toks AS (
      SELECT doc_id, split, unnest(string_split(text, ' ')) AS w
      FROM sp WHERE split IN ('train', 'val')
    ),
    cnt AS (
      SELECT w,
             CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ct,
             CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cr
      FROM toks GROUP BY w
    ),
    tot AS (
      SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM cnt
    ),
    oov AS (
      SELECT CAST(ROUND(LN(CAST(nr + v AS DOUBLE) / CAST(nt + v AS DOUBLE))
                        * {MICROS}) AS BIGINT) AS oov_micro
      FROM tot
    ),
    lr AS (
      SELECT w,
             CAST(ROUND(LN(
               ((CAST(ct AS DOUBLE) + 1.0) * CAST(nr + v AS DOUBLE))
               / ((CAST(cr AS DOUBLE) + 1.0) * CAST(nt + v AS DOUBLE))
             ) * {MICROS}) AS BIGINT) AS lr_micro
      FROM cnt, tot
    ),
    inc AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE {_X12_INC}
    ),
    scored AS (
      SELECT i.doc_id, COALESCE(lr.lr_micro, o.oov_micro) AS lr_micro
      FROM inc i LEFT JOIN lr ON lr.w = i.w, oov o
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(lr_micro) AS BIGINT) AS weight_micro
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, weight_micro,
           CAST(weight_micro AS DOUBLE) / n_tokens AS mean_lr_micro,
           weight_micro >= 0 AS admitted
    FROM agg
    """


@query("x12_stream_dsir_gate", _X12_ORACLE, survey="X7,J8,J9,A10,X-UD5")
def x12_stream_dsir_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming DSIR admission gate: the arriving
    slice (``doc_id % 10 = 3``, the same batch-twin convention as
    x10/x11) is scored token-by-token against the corpus LM built
    from the REMAINING documents and admitted iff its integer
    micro-nat weight is ≥ 0.

    Plan: the LM statistics are corpus-side aggregates (built once —
    at 100 TB a materialized artifact next to the band indexes); the
    arriving batch explodes narrowly, left-joins the broadcast
    log-ratio table (OOV fallback from the 1-row totals broadcast),
    and rolls up once on doc_id.  The admission decision is the SIGN
    OF AN EXACT INTEGER — no float comparison anywhere in the
    gate."""
    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.expr(_X12_CORP))
    incoming = docs.filter(F.expr(_X12_INC)).select("doc_id", "text")
    _toks, lr, tot = dsir_lr_frames(corpus)
    return dsir_gate(incoming, lr, tot)


# --- DSIR Gumbel-top-k resample (round 5) --------------------------
#
# The paper's actual selection rule is importance RESAMPLING, not
# arg-top-K: draw docs with probability proportional to exp(weight)
# via the Gumbel-top-k trick (key = weight + Gumbel noise, keep the
# k largest keys — a distributed one-pass weighted sample without
# replacement).  Reproducibility demands the noise be derived, not
# drawn: u comes from the seeded cross-engine sha60 hash of doc_id
# ((h >> 8) + 0.5) / 2^52, exact in a double), and
# g = -ln(-ln(u)) is micro-rounded so the sort key
# weight_micro + gumbel_micro is again an exact BIGINT.

DSIR_SAMPLE = 200
GUMBEL_SEED = 97
_TWO_52 = float(1 << 52)


def _dsir_resample_oracle() -> str:
    from hfcommunity_spark.operators.dedup import _sha60_sql

    h = _sha60_sql("CAST(doc_id AS VARCHAR)", GUMBEL_SEED)
    u = f"((({h} >> 8) + 0.5) / {_TWO_52!r})"
    return f"""
    WITH {_DSIR_DOCW_CTES},
    keyed AS (
      SELECT doc_id, n_tokens, weight_micro,
             weight_micro
             + CAST(ROUND(-LN(-LN({u})) * {MICROS}) AS BIGINT)
               AS key_micro
      FROM docw
    ),
    top AS (SELECT * FROM keyed
            ORDER BY key_micro DESC, doc_id LIMIT {DSIR_SAMPLE})
    SELECT doc_id, n_tokens, weight_micro, key_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY key_micro DESC, doc_id)
                AS INTEGER) AS rank
    FROM top
    """


@query("samp_dsir_resample", _dsir_resample_oracle(),
       survey="X-UD5,A10,O2,J9,F1")
def samp_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling via Gumbel-top-k: every 'train' doc
    gets key = weight_micro + round(-ln(-ln(u))·1e6) with u derived
    from the seeded sha60 hash of its doc_id, and the {DSIR_SAMPLE}
    largest keys win — a weighted sample without replacement drawn in
    one distributed pass (no sequential sampling state), re-drawable
    bit-for-bit on any cluster layout and re-seeded by changing
    GUMBEL_SEED.

    Plan: identical to ``samp_dsir_select`` through the per-doc
    weight rollup (the shared session-persisted
    :func:`dsir_docw_index`), plus one narrow projection for the key;
    TakeOrderedAndProject keeps the heap top-k property."""
    from hfcommunity_spark.operators.dedup import sha60

    docw = dsir_docw_index(spark, sf_dir)
    u = (
        F.shiftright(sha60(F.col("doc_id"), GUMBEL_SEED), 8)
        .cast("double") + F.lit(0.5)
    ) / F.lit(_TWO_52)
    gumbel_micro = F.round(-F.log(-F.log(u)) * MICROS, 0).cast("long")
    keyed = docw.select(
        "doc_id", "n_tokens", "weight_micro",
        (F.col("weight_micro") + gumbel_micro).alias("key_micro"),
    )
    return ranked_topk(keyed, "key_micro", DSIR_SAMPLE).select(
        "doc_id", "n_tokens", "weight_micro", "key_micro", "rank"
    )


# --- data-constrained epoch repetition schedule (round 6) ----------

# Repeats per quality tercile (best -> worst): the data-constrained
# scaling result that repeating high-value data up to ~4 epochs is
# near-free while low-value data stops paying after one pass.
EPOCH_REPEATS = (4, 2, 1)


def _repeat_schedule_oracle() -> str:
    r1, r2, r3 = EPOCH_REPEATS
    return f"""
    WITH {dsir_docw_ctes()},
    src AS (
      SELECT w.doc_id, d.source, w.n_tokens, w.weight_micro,
             CAST(NTILE(3) OVER (PARTITION BY d.source
                                 ORDER BY w.weight_micro DESC, w.doc_id)
                  AS INTEGER) AS tercile
      FROM docw w JOIN documents d USING (doc_id)
    )
    SELECT doc_id, source, n_tokens, weight_micro, tercile,
           CAST(CASE tercile WHEN 1 THEN {r1} WHEN 2 THEN {r2}
                ELSE {r3} END AS INTEGER) AS repeats,
           CAST(n_tokens * CASE tercile WHEN 1 THEN {r1} WHEN 2 THEN {r2}
                ELSE {r3} END AS BIGINT) AS effective_tokens
    FROM src
    """


@query("samp_repeat_schedule", _repeat_schedule_oracle(),
       survey="X-UD5,W1,A10,F11,J9")
def samp_repeat_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch plan: when the corpus is smaller than
    the token budget, schedule REPEATS per document instead of
    scaling the corpus — top DSIR-weight tercile per source trains
    {EPOCH_REPEATS[0]} epochs, middle {EPOCH_REPEATS[1]}, bottom
    {EPOCH_REPEATS[2]} (the multi-epoch regime where repeating
    high-value data stays near-free).  Output is the per-doc repeat
    manifest with effective token counts — the input a loader's
    sampler consumes alongside the shard plan.

    Plan: probes the session-persisted DSIR weight frame
    (``lm.dsir_docw_index``), one broadcast join for the source
    column, and an NTILE window PARTITIONED per source (the
    ``t_unigram_ppl_buckets`` discipline — no global sort; a source's
    docs rank within its partition).  Repeats and effective tokens
    are integer CASE arithmetic."""
    docw = dsir_docw_index(spark, sf_dir)
    src = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.desc("weight_micro"), F.asc("doc_id")
    )
    r1, r2, r3 = EPOCH_REPEATS
    joined = docw.join(src, "doc_id").withColumn(
        "tercile", F.ntile(3).over(w).cast("int")
    )
    repeats = (
        F.when(F.col("tercile") == 1, r1)
        .when(F.col("tercile") == 2, r2)
        .otherwise(r3)
        .cast("int")
    )
    return joined.select(
        "doc_id", "source", "n_tokens", "weight_micro", "tercile",
        repeats.alias("repeats"),
        (F.col("n_tokens") * repeats).cast("long")
        .alias("effective_tokens"),
    )
