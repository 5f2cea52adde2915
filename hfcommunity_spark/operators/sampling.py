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
from hfcommunity_spark.operators.dedup import shingle_unnest_sql
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


def hash_split_sql(id_expr: str = "doc_id") -> str:
    """DuckDB twin of :func:`hash_split` as a CASE fragment — generated
    from the same SALT / boundary constants so every oracle that embeds
    the split derives it from ONE definition (the same no-hand-copies
    rule as ``shingle_unnest_sql``; round-5 review finding)."""
    h = f"substr(sha256('{SALT}' || CAST({id_expr} AS VARCHAR)), 1, 2)"
    return (
        f"CASE WHEN {h} < '{TRAIN_UPPER}' THEN 'train' "
        f"WHEN {h} < '{VAL_UPPER}' THEN 'val' ELSE 'test' END"
    )


CONTAM_NGRAM = 3  # contamination screens use smaller n than dedup:
# a 3-gram hit is a weaker signal but catches partial leakage


@query(
    "samp_split_contamination",
    f"""
    WITH sp AS (
      SELECT doc_id, text,
             {hash_split_sql()} AS split
      FROM documents
    ),
    toks AS (SELECT doc_id, split, string_split(text, ' ') AS w FROM sp),
    sh AS (SELECT DISTINCT doc_id, split,
                  {shingle_unnest_sql(CONTAM_NGRAM)} AS shingle
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


DECONTAM_NGRAM = 5  # the ACTION uses the dedup shingle width: a full
# shared 5-gram is leakage (GPT-3 used 13-grams on web-scale text;
# these synthetic docs are ~50 tokens, so 5 is the proportional
# choice).  The 3-gram audit above stays the weaker-signal REPORT.


@query(
    "samp_decontaminated_train",
    f"""
    WITH sp AS (
      SELECT doc_id, source,
             {hash_split_sql()} AS split
      FROM documents
    ),
    toks AS (SELECT d.doc_id, sp.split, string_split(d.text, ' ') AS w
             FROM documents d JOIN sp ON sp.doc_id = d.doc_id),
    sh AS (SELECT DISTINCT doc_id, split,
                  {shingle_unnest_sql(DECONTAM_NGRAM)} AS shingle
           FROM toks WHERE len(w) >= {DECONTAM_NGRAM}),
    leaking AS (
      SELECT DISTINCT tr.doc_id
      FROM sh tr JOIN sh ho ON tr.shingle = ho.shingle
      WHERE tr.split = 'train' AND ho.split <> 'train'
    )
    SELECT sp.doc_id, sp.source
    FROM sp
    WHERE sp.split = 'train'
      AND sp.doc_id NOT IN (SELECT doc_id FROM leaking)
    """,
    survey="X-UD5,J2,U3,A9",
)
def samp_decontaminated_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination ACTION (the audit above only reports): the
    train split minus every train doc sharing a full 5-gram shingle
    with any held-out (val/test) doc — the n-gram-overlap
    decontamination step of GPT-3-style pipelines, expressed as
    posting-list equi-join → leaking-id set → left-anti join.  No
    cross product anywhere: candidates meet only through the shared
    shingle hash (the session-persisted ``shingle_hash_index``, shared
    with the dedup family); the anti join ships only leaking doc ids.
    At 100 TB the held-out side is ~1e-3 of the corpus, so the join's
    build side (held-out shingles) broadcasts."""
    from hfcommunity_spark.operators.dedup import shingle_hash_index

    docs = read_table(spark, sf_dir, "documents")
    sh = shingle_hash_index(spark, sf_dir, DECONTAM_NGRAM)
    split = docs.select(
        "doc_id", hash_split(F.col("doc_id")).alias("split")
    )
    shs = sh.join(split, "doc_id")
    train_sh = shs.filter(F.col("split") == "train").select("doc_id", "h")
    holdout_sh = shs.filter(F.col("split") != "train").select("h")
    leaking = train_sh.join(holdout_sh, "h", "left_semi").select(
        "doc_id"
    ).distinct()
    train_docs = docs.select("doc_id", "source").join(
        split.filter(F.col("split") == "train"), "doc_id", "left_semi"
    )
    return train_docs.join(leaking, "doc_id", "left_anti")


@query(
    "samp_hash_split_counts",
    f"""
    SELECT source, split, COUNT(*) AS n_docs FROM (
      SELECT source,
             {hash_split_sql()} AS split
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


TEMP_ALPHA_NOTE = "alpha = 0.5 (sqrt temperature)"  # see docstring
PACK_BUDGET = 2048  # tokens per packed context window
PACK_BLOCK = 4096  # doc_ids per prefix-sum block


@query(
    "samp_mixture_weights",
    """
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                  AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(tokens) AS total FROM per_src)
    SELECT source, n_docs, tokens,
           CAST(tokens AS DOUBLE) / total AS token_share,
           sqrt(CAST(tokens AS DOUBLE) / total) AS temp_weight
    FROM per_src, tot
    """,
    survey="X-UD5,A7,J9",
)
def samp_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixture weights for a training data
    blend (the mT5/XLM-R resampling rule p_s ∝ share_s^alpha with
    alpha = 0.5): per source, exact token totals and the unnormalized
    temperature weight sqrt(tokens/total).

    alpha is pinned to 0.5 because sqrt is correctly rounded under
    IEEE-754 in every engine while pow(x, 0.3) is not — the weight is
    one exact integer division then one exactly-rounded op, so Spark
    and DuckDB hash identically.  (Normalizing by SUM(weight) would
    reintroduce an order-dependent float sum; the driver-side softmax
    over ≤#sources rows is trivial.)  Scale shape: one map-side
    partial-agg shuffle on source, then a broadcast join against the
    single-row total."""
    docs = read_table(spark, sf_dir, "documents")
    from hfcommunity_spark.operators.textops import token_count

    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("long").alias("tokens"),
    )
    total = per_src.agg(F.sum("tokens").alias("total"))
    share = F.col("tokens").cast("double") / F.col("total")
    return (
        per_src.join(F.broadcast(total))
        .select(
            "source", "n_docs", "tokens",
            share.alias("token_share"),
            F.sqrt(share).alias("temp_weight"),
        )
    )


@query(
    "samp_pack_token_budget",
    f"""
    WITH t AS (
      SELECT doc_id,
             LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id) AS cum
      FROM t
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin_start,
           CAST((cum - 1) // {PACK_BUDGET} AS BIGINT) AS bin_end,
           CAST((cum - n_tokens) - ((cum - n_tokens) // {PACK_BUDGET})
                * {PACK_BUDGET} AS BIGINT) AS bin_offset
    FROM c
    """,
    survey="X-UD5,W3,A10",
)
def samp_pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are laid head to
    tail in doc_id order and cut into {PACK_BUDGET}-token context
    windows; each doc learns its first/last window and offset (docs
    may straddle windows — exactly how pretraining packers batch).

    The global running token sum is computed as a two-phase
    distributed prefix scan, NOT a global single-partition window:
    (1) block partial sums (one map-side-combined shuffle on
    doc_id // {PACK_BLOCK}), (2) a window over the tiny block-sum
    frame (corpus/{PACK_BLOCK} rows — bounded, the classic scan
    recursion base), (3) broadcast the block offsets back and finish
    with a window partitioned BY BLOCK, so no executor ever sorts more
    than {PACK_BLOCK} rows.  The oracle states the same result as the
    naive global window.  Integer-only arithmetic end to end."""
    docs = read_table(spark, sf_dir, "documents")
    from hfcommunity_spark.operators.textops import token_count

    t = docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.expr(f"doc_id DIV {PACK_BLOCK}").alias("blk"),
    )
    blk_sums = t.groupBy("blk").agg(F.sum("n_tokens").alias("blk_tokens"))
    w_blk = Window.orderBy("blk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    blk_off = blk_sums.select(
        "blk",
        (F.sum("blk_tokens").over(w_blk) - F.col("blk_tokens")).alias(
            "blk_offset"
        ),
    )
    w_in = Window.partitionBy("blk").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.col("blk_offset") + F.sum("n_tokens").over(w_in)
    start = cum - F.col("n_tokens")
    # Integer DIV, not `/`: Spark's `/` is double division, which
    # silently loses exactness once the running sum passes 2^53 —
    # certain at real corpus scale.
    return (
        t.join(F.broadcast(blk_off), "blk")
        .select(
            "doc_id", "n_tokens",
            start.alias("_start"), cum.alias("_cum"),
        )
        .select(
            "doc_id", "n_tokens",
            F.expr(f"_start DIV {PACK_BUDGET}").alias("bin_start"),
            F.expr(f"(_cum - 1) DIV {PACK_BUDGET}").alias("bin_end"),
            F.expr(f"_start - (_start DIV {PACK_BUDGET}) * {PACK_BUDGET}")
            .alias("bin_offset"),
        )
    )


QUOTA_SCALE = 100  # docs granted per unit of sqrt token-share


@query(
    "samp_temperature_resample",
    f"""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                  AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(tokens) AS total FROM per_src),
    q AS (SELECT source,
                 LEAST(CAST(FLOOR({QUOTA_SCALE}
                        * sqrt(CAST(tokens AS DOUBLE) / total)) AS BIGINT),
                       n_docs) AS quota
          FROM per_src, tot),
    ranked AS (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY sha256('{SALT}' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS INTEGER) AS pos
      FROM documents
    )
    SELECT r.doc_id, r.source, r.pos
    FROM ranked r JOIN q USING (source)
    WHERE r.pos <= q.quota
    """,
    survey="X-UD5,A7,W1,J9",
)
def samp_temperature_resample(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The ACTION for :func:`samp_mixture_weights` (which only reports
    weights): materialize the temperature-resampled corpus.  Each
    source gets a quota ∝ sqrt(token share) — the mT5/XLM-R α=0.5
    rule, up-weighting low-resource sources relative to proportional
    sampling — and fills it with its salted-hash-ranked docs, so the
    draw is deterministic, rerun-stable, and engine-identical (same
    selection rule as ``samp_stratified_topn``).

    Cross-engine exactness: the quota is ``floor(QUOTA_SCALE ·
    sqrt(share))`` — one exact integer division and one
    correctly-rounded sqrt, NO normalization by a float sum over
    sources (order-dependent) — and the measured distance of every
    quota value from its floor boundary (≥4e-3 at the checked SFs)
    dwarfs last-ulp noise.  Scale shape: one partial-agg shuffle on
    source for the quotas (k rows, broadcast back), one partitioned
    window for the ranks — no global sort, no driver loop."""
    docs = read_table(spark, sf_dir, "documents")
    from hfcommunity_spark.operators.textops import token_count

    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("long").alias("tokens"),
    )
    total = per_src.agg(F.sum("tokens").alias("total"))
    share = F.col("tokens").cast("double") / F.col("total")
    quotas = (
        per_src.join(F.broadcast(total))
        .select(
            "source",
            F.least(
                F.floor(F.lit(QUOTA_SCALE) * F.sqrt(share)).cast("long"),
                F.col("n_docs"),
            ).alias("quota"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        salted_hash(F.col("doc_id")).asc(), F.col("doc_id").asc()
    )
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w).alias("pos")
    )
    return ranked.join(F.broadcast(quotas), "source").filter(
        F.col("pos") <= F.col("quota")
    ).select("doc_id", "source", "pos")


# --- deterministic epoch shuffle + shard plan (round 5) ------------

EPOCH_SEED = 1        # re-deal the whole epoch by bumping this
N_SHARDS = 8          # training data files per epoch


def _epoch_shard_oracle() -> str:
    from hfcommunity_spark.operators.dedup import _sha60_sql

    h = _sha60_sql("CAST(doc_id AS VARCHAR)", EPOCH_SEED)
    return f"""
    WITH keyed AS (
      SELECT doc_id, {h} AS ord_hash FROM documents
    )
    SELECT doc_id,
           CAST(ord_hash % {N_SHARDS} AS INTEGER) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY ord_hash % {N_SHARDS}
             ORDER BY ord_hash, doc_id
           ) AS INTEGER) AS pos
    FROM keyed
    """


@query("samp_epoch_shard_plan", _epoch_shard_oracle(),
       survey="X-UD5,W1,F1,A5")
def samp_epoch_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-order plan: a reproducible global shuffle of the
    corpus into {N_SHARDS} epoch shards — every doc gets a seeded
    cross-engine hash, its shard is hash mod {N_SHARDS}, and its
    position within the shard is the hash order.  A rerun on any
    cluster layout deals the identical epoch; bumping EPOCH_SEED
    re-deals it.  This replaces the global ORDER BY rand() shuffle a
    naive pipeline would pay: shard assignment is a narrow codegen
    projection and the ordering window is PARTITIONED per shard
    (each ~corpus/{N_SHARDS}), so no single-partition sort exists at
    any scale — the shard writer just sortWithinPartitions on the
    same key."""
    from hfcommunity_spark.operators.dedup import sha60

    docs = read_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", sha60(F.col("doc_id"), EPOCH_SEED).alias("ord_hash")
    )
    shard = (F.col("ord_hash") % N_SHARDS).cast("int")
    w = Window.partitionBy(shard).orderBy(
        F.asc("ord_hash"), F.asc("doc_id")
    )
    return keyed.select(
        "doc_id",
        shard.alias("shard"),
        F.row_number().over(w).cast("int").alias("pos"),
    )


# --- length-bucketed batch plan (round 6) ---------------------------

BATCH_DOCS = 8  # documents per training batch within a length bucket


@query(
    "samp_length_batch_plan",
    f"""
    WITH t AS (
      SELECT doc_id,
             LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT doc_id, n_tokens,
             CAST(LENGTH(bin(n_tokens)) AS INTEGER) AS bucket
      FROM t
    ),
    p AS (
      SELECT bucket, n_tokens,
             CAST((ROW_NUMBER() OVER (
               PARTITION BY bucket ORDER BY n_tokens DESC, doc_id
             ) - 1) // {BATCH_DOCS} AS INTEGER) AS batch_id
      FROM b
    )
    SELECT bucket, batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
             AS padding_tokens,
           ROUND(CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS DOUBLE)
                 / (COUNT(*) * MAX(n_tokens)), 4) AS waste_rounded
    FROM p GROUP BY bucket, batch_id
    """,
    survey="X-UD5,W1,A5,F11,A10",
)
def samp_length_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed dynamic batching: group documents into
    power-of-two length buckets, fill {BATCH_DOCS}-doc batches
    longest-first inside each bucket, and report per batch the padding
    a loader would pay to the batch max — the plan that decides
    whether bucketing is worth it before anyone pads a single tensor.

    Plan: one scan for token counts; the bucket key is
    ``length(bin(n_tokens))`` — exact integer log2 via binary-string
    length, bit-identical in both engines where float ``log2`` could
    disagree at exact powers of two; batch assembly is a row_number
    window PARTITIONED per bucket (longest-first so batch members are
    length-homogeneous — minimum padding under a fixed batch size);
    the output is one keyed partial agg, #buckets x #batches rows.
    Padding counts are exact integers; only the final waste share is
    a rounded double."""
    docs = read_table(spark, sf_dir, "documents")
    from hfcommunity_spark.operators.textops import token_count

    b = docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    ).withColumn(
        "bucket", F.length(F.expr("bin(n_tokens)")).cast("int")
    )
    w = Window.partitionBy("bucket").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    p = (
        b.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "batch_id", F.expr(f"int((rn - 1) DIV {BATCH_DOCS})")
        )
        .drop("rn")
    )
    padded = F.col("n_docs") * F.col("max_tokens")
    return (
        p.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "bucket", "batch_id", "n_docs", "max_tokens", "total_tokens",
            (padded - F.col("total_tokens")).cast("long")
            .alias("padding_tokens"),
            F.round(
                (padded - F.col("total_tokens")).cast("double") / padded, 4
            ).alias("waste_rounded"),
        )
    )


# --- UniMax epoch-budget allocation (round 8) ------------------------

# Language/source-balanced sampling for LM pretraining: each source's
# contribution is capped at UNIMAX_EPOCH_CAP passes over its natural
# data, and the remaining token budget is water-filled equally among
# the sources the cap doesn't bind (the UniMax rule: closest to
# uniform without over-repeating small sources).  The budget is a
# fixed FRACTION of the corpus so the allocation problem is scale-free
# — at any SF (or 100 TB) roughly the same sources sit above/below the
# water level.
UNIMAX_EPOCH_CAP = 2
# budget = 9/5 of the corpus tokens: between min(cap) and max(cap) at
# every SF's source spread, so the cap genuinely binds on the smallest
# sources while the rest sit at the water level — both branches of the
# allocator carry driver evidence (a budget under min(cap)/n-th of the
# corpus would degenerate to a uniform split and never exercise the
# prefix-capping logic).
UNIMAX_BUDGET_NUM = 9
UNIMAX_BUDGET_DEN = 5
# Invariant: NUM/DEN < UNIMAX_EPOCH_CAP, so the budget is strictly
# under the total capacity Σcaps = EPOCH_CAP·total — at least one
# source always sits at the water level and the `(budget - capped_sum)
# DIV (n - k)` divisor is never zero (ANSI division-by-zero would
# throw in both engines).


_UNIMAX_ORACLE = f"""
    WITH nat AS (
      SELECT source,
             SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
               AS nat_tokens
      FROM documents WHERE text IS NOT NULL GROUP BY source
    ),
    tot AS (SELECT SUM(nat_tokens) * {UNIMAX_BUDGET_NUM} // {UNIMAX_BUDGET_DEN} AS budget,
                   COUNT(*) AS n FROM nat),
    caps AS (
      SELECT source, nat_tokens,
             nat_tokens * {UNIMAX_EPOCH_CAP} AS cap_tokens,
             ROW_NUMBER() OVER (ORDER BY nat_tokens * {UNIMAX_EPOCH_CAP},
                                source) AS i,
             COALESCE(SUM(nat_tokens * {UNIMAX_EPOCH_CAP}) OVER (
               ORDER BY nat_tokens * {UNIMAX_EPOCH_CAP}, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM nat
    ),
    -- ascending caps: the capped set is a prefix — source i is capped
    -- iff giving every remaining source its equal share would still
    -- leave i at or under its cap (exact integer test, no division)
    flagged AS (
      SELECT caps.*, tot.budget, tot.n,
             cap_tokens * (n - i + 1) <= budget - cum_before AS capped
      FROM caps, tot
    ),
    lvl AS (
      SELECT COALESCE(SUM(CASE WHEN capped THEN cap_tokens END), 0)
               AS capped_sum,
             COUNT(*) FILTER (capped) AS k
      FROM flagged
    )
    SELECT f.source,
           f.nat_tokens::BIGINT AS nat_tokens,
           f.cap_tokens::BIGINT AS cap_tokens,
           (CASE WHEN f.capped THEN f.cap_tokens
                 ELSE (f.budget - l.capped_sum) // (f.n - l.k)
            END)::BIGINT AS alloc_tokens,
           f.capped
    FROM flagged f, lvl l
    """


@query("samp_unimax_budget", _UNIMAX_ORACLE,
       survey="X-UD5,A7,A10,F11,W3")
def samp_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax water-filling of a token budget across sources: cap each
    source at ``UNIMAX_EPOCH_CAP`` epochs of its natural tokens, then
    split the leftover budget equally among the uncapped sources.

    Scale shape: the ONLY data-scale work is the per-source token
    aggregate (one partial→final shuffle of ≤|sources| groups); the
    allocator itself runs as windows over that ≤|sources|-row frame —
    the bounded-frame discipline (same as every post-top-k rank
    window).  All arithmetic is exact integers (floor division for the
    water level), so the hash is engine-independent; the undistributed
    remainder of the floor division is < n tokens and intentionally
    left unallocated (documented, deterministic)."""
    from hfcommunity_spark.operators.textops import token_count

    docs = read_table(spark, sf_dir, "documents")
    nat = (
        docs.filter(F.col("text").isNotNull())
        .groupBy("source")
        .agg(
            F.sum(token_count(F.col("text")))
            .cast("long").alias("nat_tokens")
        )
        # ≤|sources| rows, two consumers (the budget scalar and the
        # allocator) — eagerly checkpoint so the corpus-sized token
        # aggregate runs ONCE, not once per consumer (the delta-family
        # diamond discipline)
        .localCheckpoint()
    )
    tot = nat.agg(
        F.expr(
            f"sum(nat_tokens) * {UNIMAX_BUDGET_NUM} "
            f"DIV {UNIMAX_BUDGET_DEN}"
        ).alias("budget"),
        F.count(F.lit(1)).alias("n"),
    )
    cap = (F.col("nat_tokens") * UNIMAX_EPOCH_CAP).cast("long")
    w = Window.orderBy(F.col("cap_tokens"), F.col("source"))
    caps = (
        nat.withColumn("cap_tokens", cap)
        .crossJoin(F.broadcast(tot))
        .withColumn("i", F.row_number().over(w))
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("cap_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "capped",
            F.col("cap_tokens") * (F.col("n") - F.col("i") + 1)
            <= F.col("budget") - F.col("cum_before"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lvl = caps.withColumn(
        "capped_sum",
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("cap_tokens"))).over(wall),
            F.lit(0),
        ),
    ).withColumn(
        "k", F.sum(F.when(F.col("capped"), 1).otherwise(0)).over(wall)
    )
    return lvl.select(
        "source",
        F.col("nat_tokens").cast("long").alias("nat_tokens"),
        F.col("cap_tokens").cast("long").alias("cap_tokens"),
        F.when(F.col("capped"), F.col("cap_tokens"))
        .otherwise(
            F.expr("(budget - capped_sum) DIV (n - k)")
        )
        .cast("long")
        .alias("alloc_tokens"),
        "capped",
    )
