"""The end-to-end training-data curation composite (north-star
X-UD5): one declared query chaining the four pipeline stages every
pretraining corpus pass runs — quality gate → exact dedup → near-dup
canonicalization → n-gram decontamination — with a single DuckDB
oracle reproducing the whole chain, so the COMPOSITION (not just each
stage) is value-checked.

Every stage reuses the session-persisted index artifacts the
individual queries build (`ngram_jaccard_pair_index`,
`shingle_hash_index`), mirroring a cluster deployment where each is a
materialized table maintained beside the corpus: the composite adds
NO new heavy computation — it is semi-joins and aggregations over
existing indexes.

Scale shape (the 100 TB lens): the quality gate and exact dedup are
one scan + one hash-shuffle; near-dup restriction is two semi-joins of
the (already capped, already bucketed) pair frame against the survivor
set; connected components is O(log n) star contraction over τ-pairs
only; decontamination is a posting-list semi-join whose held-out side
broadcasts at real split ratios.  No cross products, no driver
transit, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query
from hfcommunity_spark.session_cache import SessionCache
from hfcommunity_spark.operators.dedup import (
    JACCARD_CLUSTER_THRESHOLD,
    JACCARD_THRESHOLD_CTES,
    MINHASH_K,
    MINHASH_CAPPED_CTES,
    NGRAM,
    minhash_matches_sql,
    ngram_jaccard_pair_index,
    shingle_hash_index,
    shingle_unnest_sql,
)
from hfcommunity_spark.operators.sampling import (
    DECONTAM_NGRAM,
    hash_split,
    hash_split_sql,
)
from hfcommunity_spark.operators.textops import token_count

MIN_TOKENS = 30  # quality gate: drop the 'short' length bucket
# (at sf0.01 the four stages keep 302 of 500 docs — every stage prunes)


# The five-stage survivor chain (quality -> exact dedup -> component
# canonicalization -> decontamination -> train split), ending at the
# ``final`` CTE of surviving doc_ids — shared by the corpus-stats
# composite and the DSIR-selection composite so the curation policy
# cannot drift between them (the MINHASH_CAPPED_CTES rule).
CURATION_FINAL_CTES = f"""
    -- stage 1: quality gate (token count >= {MIN_TOKENS})
    q AS (SELECT doc_id, lang, source, text,
                 LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS ntok
          FROM documents
          WHERE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
                >= {MIN_TOKENS}),
    -- stage 2: exact dedup, min doc_id survives per content hash
    ex AS (SELECT * FROM q
           QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY sha256(text))),
    -- stage 3: near-dup clusters over the jaccard pair graph,
    -- restricted to stage-2 survivors; component label = min member
    {JACCARD_THRESHOLD_CTES},
    edges AS (SELECT doc_a, doc_b FROM jac
              WHERE doc_a IN (SELECT doc_id FROM ex)
                AND doc_b IN (SELECT doc_id FROM ex)),
    und AS (SELECT doc_a AS a, doc_b AS b FROM edges
            UNION SELECT doc_b, doc_a FROM edges),
    reach AS (
      SELECT DISTINCT a AS vertex, a AS component FROM und
      UNION
      SELECT u.b, r.component FROM reach r JOIN und u ON u.a = r.vertex
    ),
    comp AS (SELECT vertex AS doc_id, MIN(component) AS component
             FROM reach GROUP BY vertex),
    keep AS (SELECT e.doc_id FROM ex e LEFT JOIN comp c USING (doc_id)
             WHERE c.component IS NULL OR c.component = e.doc_id),
    -- stage 4: train split minus docs sharing a {DECONTAM_NGRAM}-gram
    -- with ANY held-out doc (full-corpus held-out side)
    spl AS (SELECT doc_id, {hash_split_sql()} AS split
            FROM documents),
    shd AS (SELECT DISTINCT doc_id,
                   {shingle_unnest_sql(DECONTAM_NGRAM)} AS shingle
            FROM toks WHERE len(w) >= {DECONTAM_NGRAM}),
    holdout_sh AS (SELECT DISTINCT shingle
                   FROM shd JOIN spl USING (doc_id)
                   WHERE split <> 'train'),
    leaking AS (SELECT DISTINCT doc_id FROM shd
                WHERE shingle IN (SELECT shingle FROM holdout_sh)),
    final AS (SELECT k.doc_id FROM keep k
              JOIN spl USING (doc_id)
              WHERE split = 'train'
                AND k.doc_id NOT IN (SELECT doc_id FROM leaking))"""


_CURATION_ORACLE = f"""
    WITH RECURSIVE {CURATION_FINAL_CTES}
    SELECT q.lang, q.source,
           COUNT(*) AS n_docs,
           CAST(SUM(q.ntok) AS BIGINT) AS total_tokens
    FROM final JOIN q USING (doc_id)
    GROUP BY q.lang, q.source
    """


@query(
    "pipe_curation_end_to_end",
    _CURATION_ORACLE,
    survey="X-UD5,J2,J5,U3,A9,F1,W4",
)
def pipe_curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup (min-id per sha256, W4/F1/A9/D1
    semantics) → near-dup canonicalization (jaccard-τ pair graph
    restricted to survivors, star-contraction components, keep the
    component minimum, J5) → n-gram decontamination of the train split
    (posting-list semi-join, leak set anti-joined away, J2/U3) →
    per-(lang, source) corpus stats.  The DuckDB oracle replays the
    identical four stages (recursive CTE for the components), so the
    full composition is hash-checked.

    Pair and shingle frames come from the session-persisted indexes
    shared with the dedup family (``ngram_jaccard_pair_index``,
    ``shingle_hash_index``); restricting full-corpus τ-pairs to the
    survivor set is exact because pairwise jaccard is independent of
    the rest of the corpus."""
    final = curated_docs(spark, sf_dir)
    return final.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").cast("bigint").alias("total_tokens"),
    )


# The curation survivor set is what every downstream stage (selection,
# export, stats) consumes — at 100 TB it's the materialized corpus
# manifest a curation run publishes; in-session it's a persisted frame
# like the index artifacts (round 6: the three composites each rebuilt
# the full five-stage chain per call).
_CURATED_CACHE = SessionCache(persist=True)


def curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document survivor frame (doc_id, lang, source, ntok)
    the composite aggregates — exposed so tests can assert the
    invariants (min length, hash-distinct, near-dup-canonical,
    decontaminated, train-only) on the id set directly.
    Session-persisted per corpus."""
    return _CURATED_CACHE.get_or_build(
        spark, (sf_dir,), lambda: _build_curated_docs(spark, sf_dir)
    )


def _build_curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfcommunity_spark.operators.graph import connected_components

    docs = read_table(spark, sf_dir, "documents")
    text = F.col("text")
    ntok = token_count(text)

    # stage 1: quality gate
    q = docs.select(
        "doc_id", "lang", "source", "text", ntok.alias("ntok")
    ).filter(F.col("ntok") >= MIN_TOKENS)

    # stage 2: exact dedup (keep-first = min doc_id per fingerprint)
    fp_min = (
        q.groupBy(F.sha2(text, 256).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    ex = q.join(fp_min, "doc_id", "left_semi")
    ex_ids = ex.select("doc_id")

    # stage 3: near-dup canonicalization over survivor-restricted pairs
    pairs = ngram_jaccard_pair_index(spark, sf_dir).filter(
        F.col("jaccard") >= JACCARD_CLUSTER_THRESHOLD
    )
    edges = (
        pairs.join(ex_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a",
                   "left_semi")
        .join(ex_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b",
              "left_semi")
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    comp = connected_components(edges).select(
        F.col("vertex").alias("doc_id"), "component"
    )
    keep = (
        ex.join(comp, "doc_id", "left")
        .filter(
            F.col("component").isNull()
            | (F.col("component") == F.col("doc_id"))
        )
        .select("doc_id", "lang", "source", "ntok")
    )

    # stage 4: decontaminate the train split against held-out shingles
    split = docs.select("doc_id", hash_split(F.col("doc_id")).alias("split"))
    sh = shingle_hash_index(spark, sf_dir, DECONTAM_NGRAM)
    shs = sh.join(split, "doc_id")
    holdout_sh = shs.filter(F.col("split") != "train").select("h")
    leaking = (
        sh.join(holdout_sh, "h", "left_semi").select("doc_id").distinct()
    )
    return (
        keep.join(split.filter(F.col("split") == "train"), "doc_id",
                  "left_semi")
        .join(leaking, "doc_id", "left_anti")
    )


# ---------------------------------------------------------------------------
# x11 — streaming admission gate: the curation pipeline's ingest face
# ---------------------------------------------------------------------------

INCOMING_MOD = 10
INCOMING_REM = 3  # docs with doc_id % 10 = 3 play the arriving batch
NEARDUP_REJECT_EST = 0.5  # MinHash estimate at/above which arrivals drop

_INC = f"doc_id % {INCOMING_MOD} = {INCOMING_REM}"
_CORP = f"doc_id % {INCOMING_MOD} <> {INCOMING_REM}"
_X11_MATCHES = minhash_matches_sql("i", "c")

_X11_ORACLE = f"""
    WITH {MINHASH_CAPPED_CTES},
    corpus_capped AS (SELECT * FROM capped WHERE {_CORP}),
    inc AS (SELECT doc_id, text,
                   LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS ntok
            FROM documents WHERE {_INC}),
    corp_fp AS (SELECT DISTINCT sha256(text) AS fp
                FROM documents WHERE {_CORP}),
    inc_bands AS (SELECT * FROM bands WHERE {_INC}),
    near AS (SELECT i.doc_id,
                    MAX(CAST({_X11_MATCHES} AS DOUBLE) / {MINHASH_K})
                      AS max_est
             FROM inc_bands i JOIN corpus_capped c
               ON i.band = c.band AND i.bhash = c.bhash
                  AND i.doc_id <> c.doc_id
             GROUP BY i.doc_id),
    spl AS (SELECT doc_id, {hash_split_sql()} AS split
            FROM documents),
    dtoks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    shd AS (SELECT DISTINCT doc_id,
                   {{DECONTAM_SHINGLE}} AS shingle
            FROM dtoks WHERE len(w) >= {DECONTAM_NGRAM}),
    holdout_sh AS (SELECT DISTINCT shingle
                   FROM shd JOIN spl USING (doc_id)
                   WHERE split <> 'train' AND {_CORP}),
    contam AS (SELECT DISTINCT doc_id FROM shd
               WHERE {_INC}
                 AND shingle IN (SELECT shingle FROM holdout_sh)),
    decided AS (
      SELECT i.doc_id,
             CASE WHEN i.ntok < {MIN_TOKENS} THEN 'too_short'
                  WHEN sha256(i.text) IN (SELECT fp FROM corp_fp)
                    THEN 'exact_dup'
                  WHEN COALESCE(n.max_est >= {NEARDUP_REJECT_EST}, FALSE)
                    THEN 'near_dup'
                  WHEN i.doc_id IN (SELECT doc_id FROM contam)
                    THEN 'contaminated'
                  ELSE NULL END AS reason
      FROM inc i LEFT JOIN near n ON n.doc_id = i.doc_id)
    SELECT doc_id, reason IS NULL AS admitted, reason
    FROM decided
    """.replace("{DECONTAM_SHINGLE}", shingle_unnest_sql(DECONTAM_NGRAM))


@query(
    "x11_streaming_curation_gate",
    _X11_ORACLE,
    survey="X7,J2,J9,X-UD5",
)
def x11_streaming_curation_gate(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The curation pipeline's INGEST face: an arriving micro-batch
    (the ``doc_id % 10 = 3`` slice, the same batch-twin convention as
    ``x10_stream_neardup_gate``) is admitted or dropped BEFORE
    entering the corpus, with the first failing stage as the recorded
    reason — ``too_short`` (quality), ``exact_dup`` (fingerprint
    probe of the corpus), ``near_dup`` (MinHash estimate ≥ 0.5
    against the session-persisted, capped corpus band index —
    incoming side deliberately uncapped), ``contaminated`` (shares a
    ``DECONTAM_NGRAM``-gram with a held-out corpus doc).

    Every probe is a stream-static join against an index the batch
    pipeline already maintains, so ingestion adds no new state: at
    100 TB this is exactly a foreachBatch body
    (``tests/test_streaming.py`` drives :func:`curation_admission`
    through real micro-batches in production xxhash64 mode, including
    the ``exact_dup`` branch no slice of the synthetic corpus hits).
    sha2 hash mode end-to-end → the full admission decision, reasons
    included, is value-checked against DuckDB."""
    from hfcommunity_spark.operators.dedup import minhash_band_index

    docs = read_table(spark, sf_dir, "documents")
    is_inc = F.col("doc_id") % INCOMING_MOD == INCOMING_REM
    incoming = docs.filter(is_inc).select("doc_id", "text")
    corp_fp = docs.filter(~is_inc).select(
        F.sha2(F.col("text"), 256).alias("fp")
    )
    idx = minhash_band_index(spark, sf_dir, hash_mode="sha2").filter(
        F.col("doc_id") % INCOMING_MOD != INCOMING_REM
    )
    split = docs.select("doc_id", hash_split(F.col("doc_id")).alias("split"))
    holdout_sh = (
        shingle_hash_index(spark, sf_dir, DECONTAM_NGRAM)
        .join(split.filter(F.col("split") != "train"), "doc_id")
        .filter(F.col("doc_id") % INCOMING_MOD != INCOMING_REM)
        .select("h")
    )
    return curation_admission(incoming, corp_fp, idx, holdout_sh,
                              hash_mode="sha2")


def curation_admission(incoming: DataFrame, corp_fp: DataFrame,
                       band_index: DataFrame, holdout_sh: DataFrame,
                       hash_mode: str = "xxhash64") -> DataFrame:
    """One micro-batch's admission decision (the foreachBatch body):
    ``incoming`` (doc_id, text) against the corpus artifacts —
    ``corp_fp`` (fp: sha256 text fingerprints), ``band_index`` (the
    capped MinHash band index), ``holdout_sh`` (h: held-out
    ``DECONTAM_NGRAM``-gram shingle hashes).  Returns (doc_id, admitted,
    reason) with the first failing stage as the reason."""
    from hfcommunity_spark.operators.dedup import (
        doc_shingle_hashes,
        neardup_gate,
    )

    text = F.col("text")
    inc = incoming.select(
        "doc_id", token_count(text).alias("ntok"),
        F.sha2(text, 256).alias("fp"),
    )
    # semi-join flag, not a left join on fp: the corpus side needs no
    # dedup (left_semi is insensitive to duplicates — no extra
    # distinct shuffle in the per-batch hot path, and no row blowup if
    # the corpus holds repeated fingerprints)
    exact = (
        inc.join(corp_fp, inc.fp == corp_fp.fp, "left_semi")
        .select("doc_id")
        .withColumn("is_exact_dup", F.lit(True))
    )
    # ONE shingle explode per micro-batch: the signature aggregation
    # and the contamination probe both consume the same (doc_id, h)
    # frame (DECONTAM_NGRAM equals the dedup NGRAM), materialized once
    # — the hot path used to pay the explode+distinct twice (round-6
    # review finding)
    from hfcommunity_spark.operators.dedup import NGRAM as _DEDUP_NGRAM

    inc_sh = doc_shingle_hashes(incoming, DECONTAM_NGRAM)
    shared_sh = None
    if DECONTAM_NGRAM == _DEDUP_NGRAM and hash_mode == "xxhash64":
        inc_sh = inc_sh.localCheckpoint()
        shared_sh = inc_sh
    gate = neardup_gate(
        incoming, band_index, hash_mode=hash_mode, shingles=shared_sh
    ).select("doc_id", "max_est_similarity")
    contam = (
        inc_sh
        .join(holdout_sh.select("h"), "h", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contaminated", F.lit(True))
    )
    decided = (
        inc.join(exact, "doc_id", "left")
        .join(gate, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("ntok") < MIN_TOKENS, "too_short")
            .when(F.col("is_exact_dup"), "exact_dup")
            .when(
                F.coalesce(
                    F.col("max_est_similarity") >= NEARDUP_REJECT_EST,
                    F.lit(False),
                ),
                "near_dup",
            )
            .when(F.col("is_contaminated"), "contaminated")
            .alias("reason"),
        )
    )
    return decided.select(
        "doc_id", F.col("reason").isNull().alias("admitted"), "reason"
    )


# ---------------------------------------------------------------------------
# curation -> selection: the full "curate then select" path
# ---------------------------------------------------------------------------

CURATION_DSIR_KEEP = 100


def _curation_dsir_oracle() -> str:
    from hfcommunity_spark.operators.lm import dsir_docw_ctes

    return f"""
    WITH RECURSIVE {CURATION_FINAL_CTES},
    {dsir_docw_ctes("d_")},
    top AS (
      SELECT d.doc_id, d.n_tokens, d.weight_micro
      FROM d_docw d JOIN final USING (doc_id)
      ORDER BY d.weight_micro DESC, d.doc_id LIMIT {CURATION_DSIR_KEEP}
    )
    SELECT doc_id, n_tokens, weight_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY weight_micro DESC, doc_id)
                AS INTEGER) AS rank
    FROM top
    """


@query("pipe_curation_dsir_topk", _curation_dsir_oracle(),
       survey="X-UD5,J2,A10,O2,J9")
def pipe_curation_dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete pipeline a 100 TB training-data run actually
    ends with: the five-stage curation survivor set
    (:func:`curated_docs`) ranked by DSIR importance toward the 'val'
    target and cut to the top {CURATION_DSIR_KEEP}.  Curation
    restricts the SELECTION pool (a duplicate can't be selected); the
    DSIR unigram statistics are deliberately built over the FULL raw
    pool in both engines, as in the DSIR formulation — raw-distribution
    estimates come from the raw pool, so a re-curation never silently
    re-weights previously selected documents.

    Both stages reuse their green building blocks (the curation CTE
    chain and the DSIR weight model are each ONE shared definition
    with their standalone composites), and the join between them is a
    semi-join on doc_id — the selection adds one broadcast probe and
    a heap top-k on top of the curation plan."""
    from hfcommunity_spark.operators.lm import (
        dsir_docw_index,
        ranked_topk,
    )

    docw = dsir_docw_index(spark, sf_dir)
    final = curated_docs(spark, sf_dir).select("doc_id")
    return ranked_topk(
        docw.join(final, "doc_id", "left_semi"),
        "weight_micro", CURATION_DSIR_KEEP,
    ).select("doc_id", "n_tokens", "weight_micro", "rank")


# ---------------------------------------------------------------------------
# the final mile: curate -> select -> shard -> pack
# ---------------------------------------------------------------------------


def _final_export_oracle() -> str:
    from hfcommunity_spark.operators.dedup import _sha60_sql
    from hfcommunity_spark.operators.lm import dsir_docw_ctes
    from hfcommunity_spark.operators.sampling import (
        EPOCH_SEED,
        N_SHARDS,
        PACK_BUDGET,
    )

    h = _sha60_sql("CAST(doc_id AS VARCHAR)", EPOCH_SEED)
    return f"""
    WITH RECURSIVE {CURATION_FINAL_CTES},
    {dsir_docw_ctes("d_")},
    top AS (
      SELECT d.doc_id, d.n_tokens, d.weight_micro
      FROM d_docw d JOIN final USING (doc_id)
      ORDER BY d.weight_micro DESC, d.doc_id LIMIT {CURATION_DSIR_KEEP}
    ),
    sel AS (
      SELECT doc_id, n_tokens,
             CAST(ROW_NUMBER() OVER (ORDER BY weight_micro DESC, doc_id)
                  AS INTEGER) AS rank
      FROM top
    ),
    keyed AS (SELECT doc_id, n_tokens, rank, {h} AS ord_hash FROM sel),
    dealt AS (
      SELECT doc_id, n_tokens, rank,
             CAST(ord_hash % {N_SHARDS} AS INTEGER) AS shard,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY ord_hash % {N_SHARDS}
               ORDER BY ord_hash, doc_id) AS INTEGER) AS pos,
             SUM(n_tokens) OVER (
               PARTITION BY ord_hash % {N_SHARDS}
               ORDER BY ord_hash, doc_id) AS cum
      FROM keyed
    )
    SELECT doc_id, rank, shard, pos,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin_start,
           CAST((cum - 1) // {PACK_BUDGET} AS BIGINT) AS bin_end,
           CAST((cum - n_tokens)
                - ((cum - n_tokens) // {PACK_BUDGET}) * {PACK_BUDGET}
                AS BIGINT) AS bin_offset
    FROM dealt
    """


@query("pipe_curate_select_pack_shard", _final_export_oracle(),
       survey="X-UD5,J2,O2,W1,W3,F1,A10")
def pipe_curate_select_pack_shard(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The last unit a pretraining run exports (round-6 flagship): the
    curated, DSIR-selected corpus dealt into reproducible epoch shards
    and packed into {PACK_BUDGET}-token context windows PER SHARD —
    every selected document learns (shard, pos, bin_start, bin_end,
    bin_offset), exactly the manifest a shard writer materializes.

    Composition, each stage its green building block: the
    curation+selection half IS :func:`pipe_curation_dsir_topk` (one
    shared definition); the epoch deal is the ``samp_epoch_shard_plan``
    recipe (seeded cross-engine sha60, shard = hash mod
    ``N_SHARDS``); the packing is the ``samp_pack_token_budget`` bin
    math, with the running token sum per shard.

    Scale shape: one shard-keyed shuffle beyond the selection plan —
    shard assignment is a narrow codegen projection; pos and the
    packing prefix-sum share ONE window PARTITIONED by shard (no
    global sort: at 100 TB the shard count is the parallelism knob —
    thousands of shards, each writer-task-sized — so the per-shard
    sort is the shard writer's own sortWithinPartitions).  Integer
    arithmetic end to end (DIV, not ``/``: exactness past 2^53)."""
    from hfcommunity_spark.operators.dedup import sha60
    from hfcommunity_spark.operators.sampling import (
        EPOCH_SEED,
        N_SHARDS,
        PACK_BUDGET,
    )

    sel = pipe_curation_dsir_topk(spark, sf_dir)
    keyed = sel.select(
        "doc_id", "n_tokens", "rank",
        sha60(F.col("doc_id"), EPOCH_SEED).alias("ord_hash"),
    ).withColumn("shard", (F.col("ord_hash") % N_SHARDS).cast("int"))
    w = Window.partitionBy("shard").orderBy(
        F.asc("ord_hash"), F.asc("doc_id")
    )
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        keyed.select(
            "doc_id", "rank", "shard",
            F.row_number().over(w).cast("int").alias("pos"),
            "n_tokens",
            (cum - F.col("n_tokens")).alias("_start"),
            cum.alias("_cum"),
        )
        .select(
            "doc_id", "rank", "shard", "pos", "n_tokens",
            F.expr(f"_start DIV {PACK_BUDGET}").alias("bin_start"),
            F.expr(f"(_cum - 1) DIV {PACK_BUDGET}").alias("bin_end"),
            F.expr(
                f"_start - (_start DIV {PACK_BUDGET}) * {PACK_BUDGET}"
            ).alias("bin_offset"),
        )
    )
