"""k-means: objective decreases, separated clusters recovered,
deterministic across parallelism."""

from __future__ import annotations

import pandas as pd

from hfcommunity_spark.operators.kmeans import (
    assign_cells,
    inertia,
    kmeans_fit,
)


def _two_blobs(spark):
    rows = []
    for i in range(20):  # blob A around +5, blob B around -5
        rows.append((i, [5.0 + (i % 3) * 0.1] * 4))
        rows.append((100 + i, [-5.0 - (i % 3) * 0.1] * 4))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_recovers_separated_blobs(spark):
    emb = _two_blobs(spark)
    cents = kmeans_fit(emb, k=2, iters=4)
    assigned = assign_cells(emb, cents).select("vec_id", "cell").collect()
    cell_of = {r.vec_id: r.cell for r in assigned}
    blob_a = {cell_of[i] for i in range(20)}
    blob_b = {cell_of[100 + i] for i in range(20)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    # centroids land on the blob means (±5.1 avg)
    signs = sorted(round(c[0]) for c in cents)
    assert signs == [-5, 5]


def test_kmeans_objective_nonincreasing(spark):
    emb = _two_blobs(spark)
    i1 = inertia(emb, kmeans_fit(emb, k=2, iters=1))
    i3 = inertia(emb, kmeans_fit(emb, k=2, iters=3))
    assert i3 <= i1 + 1e-9


def test_kmeans_deterministic_across_parallelism(spark):
    emb = _two_blobs(spark)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", 3)
        a = kmeans_fit(emb, k=2, iters=2)
        spark.conf.set("spark.sql.shuffle.partitions", 17)
        b = kmeans_fit(emb, k=2, iters=2)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", 8)
    # same init + same assignment → identical cells; means may differ
    # in float low bits across partitioning, so compare rounded
    ra = [[round(v, 6) for v in c] for c in a]
    rb = [[round(v, 6) for v in c] for c in b]
    assert ra == rb
