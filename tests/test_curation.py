"""Behavioral checks for the end-to-end curation composite beyond the
oracle parity: every stage must actually prune, and the final survivor
set must satisfy the declared invariants — minimum length, distinct
content hashes, at most one survivor per near-dup cluster, zero
held-out shingle overlap, train split only."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.operators.curation import MIN_TOKENS, curated_docs
from hfcommunity_spark.operators.dedup import (
    JACCARD_CLUSTER_THRESHOLD,
    ngram_jaccard_pair_index,
    shingle_hash_index,
)
from hfcommunity_spark.operators.sampling import DECONTAM_NGRAM, hash_split
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def final(spark):
    return curated_docs(spark, SF_ORACLE).persist()


def test_composite_prunes_but_keeps_a_corpus(spark, final):
    total = read_table(spark, SF_ORACLE, "documents").count()
    kept = final.count()
    assert 0 < kept < total


def test_min_length_invariant(final):
    assert final.filter(F.col("ntok") < MIN_TOKENS).count() == 0


def test_exact_dedup_invariant(spark, final):
    docs = read_table(spark, SF_ORACLE, "documents")
    joined = final.select("doc_id").join(docs, "doc_id")
    n = joined.count()
    n_hashes = joined.select(F.sha2("text", 256)).distinct().count()
    assert n == n_hashes


def test_neardup_canonical_invariant(spark, final):
    """No surviving τ-pair may have BOTH endpoints in the final set."""
    pairs = ngram_jaccard_pair_index(spark, SF_ORACLE).filter(
        F.col("jaccard") >= JACCARD_CLUSTER_THRESHOLD
    )
    ids = final.select("doc_id")
    both = (
        pairs.join(ids.withColumnRenamed("doc_id", "doc_a"), "doc_a",
                   "left_semi")
        .join(ids.withColumnRenamed("doc_id", "doc_b"), "doc_b",
              "left_semi")
    )
    assert both.count() == 0


def test_decontamination_invariant(spark, final):
    """No survivor shares a DECONTAM_NGRAM shingle with any held-out
    doc, and every survivor is in the train split."""
    docs = read_table(spark, SF_ORACLE, "documents")
    split = docs.select("doc_id", hash_split(F.col("doc_id")).alias("split"))
    sh = shingle_hash_index(spark, SF_ORACLE, DECONTAM_NGRAM)
    shs = sh.join(split, "doc_id")
    holdout = shs.filter(F.col("split") != "train").select("h").distinct()
    overlap = (
        sh.join(final.select("doc_id"), "doc_id", "left_semi")
        .join(holdout, "h", "left_semi")
    )
    assert overlap.count() == 0
    non_train = final.join(
        split.filter(F.col("split") == "train"), "doc_id", "left_anti"
    )
    assert non_train.count() == 0


def test_x11_gate_reasons_at_sf01(spark):
    """The driver's parity scale (sf0.01) never exercises the
    'contaminated' branch; sf0.1 does (43 docs).  Cross-check the full
    admission decision against the oracle at the larger scale, and
    pin that at least three distinct reject reasons fire."""
    import duckdb

    from hfcommunity_spark.operators.curation import (
        _X11_ORACLE,
        x11_streaming_curation_gate,
    )
    from tests.oracle_utils import assert_frames_match, duck_connection

    sf = "/root/testdata/sf0.1"
    sdf = x11_streaming_curation_gate(spark, sf).toPandas()
    con = duck_connection(sf)
    ddf = con.execute(_X11_ORACLE).df()
    con.close()
    assert_frames_match(sdf, ddf, "x11@sf0.1")
    reasons = set(sdf.reason.dropna())
    assert {"too_short", "near_dup", "contaminated"} <= reasons


def test_curation_dsir_topk_composition(spark):
    """The curate-then-select composite must pick exactly the
    arg-top-K of the curated survivor set under (weight DESC, doc_id
    ASC): full quota, weights identical to the standalone DSIR weight
    model, tie-break included."""
    from hfcommunity_spark.operators.curation import (
        CURATION_DSIR_KEEP,
        pipe_curation_dsir_topk,
    )
    from hfcommunity_spark.operators.lm import _dsir_docw, dsir_lr_frames

    out = pipe_curation_dsir_topk(spark, SF_ORACLE).toPandas()
    survivors = {
        r.doc_id
        for r in curated_docs(spark, SF_ORACLE).select("doc_id").collect()
    }
    assert len(out) == min(CURATION_DSIR_KEEP, len(survivors))
    assert set(out["doc_id"]) <= survivors

    docs = read_table(spark, SF_ORACLE, "documents")
    toks, lr, _tot = dsir_lr_frames(docs)
    weights = {
        r.doc_id: r.weight_micro for r in _dsir_docw(toks, lr).collect()
    }
    for _, r in out.iterrows():
        assert weights[r.doc_id] == r.weight_micro
    # exact arg-top-K with the declared tie-break, recomputed in Python
    expected = sorted(
        ((d, weights[d]) for d in survivors if d in weights),
        key=lambda kv: (-kv[1], kv[0]),
    )[: len(out)]
    got = list(zip(out["doc_id"].astype(int), out["weight_micro"]))
    got.sort(key=lambda kv: (-kv[1], kv[0]))
    assert got == [(int(d), w) for d, w in expected]


def test_final_export_shard_and_pack_invariants(spark):
    """The final-mile composite (curate -> select -> shard -> pack)
    must deal EXACTLY the selection into shards (a permutation: every
    selected doc appears once), keep pos contiguous from 1 per shard
    in seeded-hash order, and pack each shard's token stream without
    gaps: offsets in [0, PACK_BUDGET), bins non-decreasing doc to doc,
    each doc's start equal to the previous doc's end position."""
    from hfcommunity_spark.operators.curation import (
        pipe_curate_select_pack_shard,
        pipe_curation_dsir_topk,
    )
    from hfcommunity_spark.operators.sampling import N_SHARDS, PACK_BUDGET

    out = pipe_curate_select_pack_shard(spark, SF_ORACLE).toPandas()
    sel = pipe_curation_dsir_topk(spark, SF_ORACLE).toPandas()
    assert sorted(out["doc_id"]) == sorted(sel["doc_id"])
    assert set(out["shard"]) <= set(range(N_SHARDS))

    for shard, grp in out.groupby("shard"):
        grp = grp.sort_values("pos")
        assert list(grp["pos"]) == list(range(1, len(grp) + 1))
        running = 0
        for _, r in grp.iterrows():
            assert 0 <= r.bin_offset < PACK_BUDGET
            assert r.bin_start <= r.bin_end
            # head-to-tail packing: this doc starts where the shard's
            # token stream left off
            assert r.bin_start * PACK_BUDGET + r.bin_offset == running
            end = running + r.n_tokens
            assert r.bin_end == (end - 1) // PACK_BUDGET
            running = end
