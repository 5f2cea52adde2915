"""Production-regime recall floor for the LSH-fed SemDeDup composite
(``dd_semantic_dup_clusters_lsh``).

The synthetic corpus has no pairs above cosine ~0.6, so the declared
query's value check (DuckDB reproduces the identical candidate rule)
says nothing about recall where real semantic dedup operates —
near-duplicates at cosine ~0.95+.  This test plants such dups and
locks the multi-table hyperplane candidate recall, mirroring the ANN
recall floors in tests/test_ann_recall.py.

Expected recall math (sign-LSH): per-plane agreement for cosine s is
p = 1 - θ(s)/π; a pair collides in one B-bit table with p^B and in ≥1
of L tables with 1-(1-p^B)^L.  At s≈0.97, B=8, L=4 that is ≈0.95.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from hfcommunity_spark.operators.similarity import (
    COSINE_PAIR_TAU,
    DIM,
    exact_rerank_pairs,
    lsh_table_candidate_pairs,
    lsh_table_rows,
)

N_BASE = 150
N_DUPS = 60
PLANT_SIM = 0.97  # target cosine of planted near-dup pairs
RECALL_FLOOR = 0.85


def _planted_corpus():
    """(rows, planted_pairs): base vectors plus near-dups of the first
    N_DUPS bases, perturbed to ~PLANT_SIM cosine."""
    rng = np.random.RandomState(7)
    base = rng.standard_normal((N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # dup_i = cos(α)·base_i + sin(α)·orthogonal noise → cosine ≈ cos(α)
    alpha = np.arccos(PLANT_SIM)
    noise = rng.standard_normal((N_DUPS, DIM))
    noise -= (noise * base[:N_DUPS]).sum(axis=1, keepdims=True) * base[:N_DUPS]
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    dups = np.cos(alpha) * base[:N_DUPS] + np.sin(alpha) * noise
    vecs = np.vstack([base, dups])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    planted = {(i, N_BASE + i) for i in range(N_DUPS)}
    return rows, planted


def test_candidate_recall_on_planted_near_dups(spark):
    rows, planted = _planted_corpus()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cand = {
        (r.vec_a, r.vec_b)
        for r in lsh_table_candidate_pairs(lsh_table_rows(emb)).collect()
    }
    recall = len(cand & planted) / len(planted)
    assert recall >= RECALL_FLOOR, f"candidate recall {recall:.2f}"


def test_composite_clusters_planted_dups(spark):
    """End-to-end on the planted corpus: candidates → exact re-rank at
    the production-style threshold → CC must put every recalled planted
    pair in one component, and never merge unrelated bases."""
    from hfcommunity_spark.operators.graph import connected_components

    rows, planted = _planted_corpus()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cand = lsh_table_candidate_pairs(lsh_table_rows(emb))
    edges = exact_rerank_pairs(cand, emb, 0.9).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    got_edges = {(r.src, r.dst) for r in edges.collect()}
    # re-rank keeps only genuinely similar pairs: everything surviving
    # τ=0.9 must be a planted pair (random 64-dim bases don't reach it)
    assert got_edges and got_edges <= planted
    comp = {
        r.vec_id: r.component
        for r in connected_components(edges, "src", "dst").select(
            F.col("vertex").alias("vec_id"), "component"
        ).collect()
    }
    for a, b in got_edges:
        assert comp[a] == comp[b] == a  # min-id canonical label


def test_rerank_tau_matches_exact_threshold(spark):
    """The re-rank kernel agrees with the JVM cosine at the declared
    τ margin: no candidate pair flips across COSINE_PAIR_TAU between
    the pandas kernel and a float64 recompute."""
    rows, _ = _planted_corpus()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cand = lsh_table_candidate_pairs(lsh_table_rows(emb))
    kept = exact_rerank_pairs(cand, emb, COSINE_PAIR_TAU)
    vecs = {r[0]: np.asarray(r[1], np.float64) for r in rows}
    for r in kept.collect():
        a, b = vecs[r.vec_a], vecs[r.vec_b]
        sim = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert sim >= COSINE_PAIR_TAU - 1e-9
