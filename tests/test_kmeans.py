"""k-means: objective decreases, separated clusters recovered,
deterministic across parallelism."""

from __future__ import annotations

import pandas as pd
import pytest

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


@pytest.mark.parametrize("sf_dir", [
    "/root/testdata/sf0.01",   # the driver's hash-comparison scale
    "/root/testdata/sf0.1",    # the bench scale the claim extends to
])
def test_kmeans_ivf_assignment_margins_dwarf_float_noise(sf_dir):
    """sim_kmeans_ivf_topk's DuckDB oracle unrolls the Lloyd rounds in
    SQL, so its hash-exactness rests on every per-round nearest-
    centroid decision having a margin far above cross-engine float
    drift (~1e-12 from partial-sum order in the means).  Measure the
    worst (d2nd − d1st) gap per round at EVERY scale the exactness
    claim is made for (ADVICE r10: the sf0.01-only lock could not see
    a narrow margin at the bench scale) and assert it clears the noise
    floor by orders of magnitude."""
    import numpy as np
    import pyarrow.parquet as pq

    from hfcommunity_spark.operators.kmeans import _pairwise_sq_dists

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
    ).to_pandas().sort_values("vec_id")
    m = np.stack([np.asarray(v, np.float64) for v in tbl.embedding])
    cents = m[:8].copy()  # init = k lowest vec_ids (deterministic)
    worst = np.inf
    for _ in range(3):
        d = _pairwise_sq_dists(m, cents)
        part = np.partition(d, 1, axis=1)
        worst = min(worst, float((part[:, 1] - part[:, 0]).min()))
        cells = np.argmin(d, axis=1)
        for c in range(8):  # empty cells keep the previous centroid
            members = m[cells == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    # final serving assignment margin too
    d = _pairwise_sq_dists(m, cents)
    part = np.partition(d, 1, axis=1)
    worst = min(worst, float((part[:, 1] - part[:, 0]).min()))
    assert worst > 1e-6, worst
