"""Distributed Lloyd's k-means over an embedding column — the
iterative-algorithm representative (genuinely non-SQL-expressible;
declared rows-only per the driver contract) and the real coarse
quantizer for IVF similarity search.

Execution shape per iteration (the only shape that survives 100 TB):
- assignment: map-side only — the k×dim centroid matrix is a closure
  constant in an Arrow-batched pandas UDF; each batch does ONE
  pairwise-distance GEMM and an argmin.  No shuffle touches the big
  side, and no interpreted per-element lambdas (the round-1 shape — k
  separate ``aggregate(zip_with(...))`` folds — was ~50x slower).
- update: posexplode + (cell, dim) partial aggregation — one shuffle
  of k×dim partial sums, independent of row count.

Initialization is deterministic (k lowest vec_ids), so runs are
reproducible at any parallelism; iterations run eagerly (centroids are
collected each round — k×dim values, driver-side small by design).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairwise_sq_dists(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, dim) × (k, dim) → (n, k) squared euclidean distances,
    computed as literal (x - c)² sums (not the expanded ‖x‖²-2xc+‖c‖²
    form) so the arithmetic matches the objective exactly."""
    return ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)


def _nearest_cells(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Argmin cell per row; ties → lowest cell id (argmin is
    first-occurrence)."""
    return np.argmin(_pairwise_sq_dists(m, cents), axis=1)


def _rows_matrix(series: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def assign_cells(emb: DataFrame, centroids: list[list[float]],
                 emb_col: str = "embedding") -> DataFrame:
    """Nearest-centroid cell id per row (ties → lowest cell id).
    Map-side only: one GEMM + argmin per Arrow batch."""
    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("integer")
    def _cell(s: pd.Series) -> pd.Series:
        if not len(s):
            return pd.Series([], dtype=np.int32)
        return pd.Series(
            _nearest_cells(_rows_matrix(s), cents).astype(np.int32)
        )

    return emb.withColumn("cell", _cell(F.col(emb_col)))


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 5,
               emb_col: str = "embedding",
               id_col: str = "vec_id") -> list[list[float]]:
    """Lloyd's iterations; returns the k centroids (k×dim floats).
    Empty cells keep their previous centroid."""
    init = (
        emb.orderBy(id_col).limit(k).select(emb_col).collect()
    )
    if len(init) < k:
        # fail loudly: a silently truncated codebook would hand IVF
        # consumers a different cell-id space than they asked for, and
        # an empty frame would IndexError below with no useful message
        # (round-6 review finding)
        raise ValueError(
            f"kmeans_fit: need at least k={k} rows to seed centroids, "
            f"got {len(init)}"
        )
    centroids = [list(map(float, r[0])) for r in init]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = assign_cells(emb, centroids, emb_col)
        sums = (
            assigned.select("cell", F.posexplode(F.col(emb_col)).alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(F.sum(F.col("v").cast("double")).alias("s"),
                 F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_c = [list(c) for c in centroids]
        acc: dict[int, list[float]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r.cell, [0.0] * dim)[r.dim] = r.s
            cnt[r.cell] = r.n
        for cell, vec in acc.items():
            new_c[cell] = [v / cnt[cell] for v in vec]
        centroids = new_c
    return centroids


def inertia(emb: DataFrame, centroids: list[list[float]],
            emb_col: str = "embedding") -> float:
    """Sum of squared distances to the assigned centroid (the k-means
    objective — must be non-increasing over iterations).  Vectorized:
    min-distance per Arrow batch, one scalar aggregation."""
    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("double")
    def _min_d(s: pd.Series) -> pd.Series:
        if not len(s):
            return pd.Series([], dtype=np.float64)
        return pd.Series(
            _pairwise_sq_dists(_rows_matrix(s), cents).min(axis=1)
        )

    row = emb.select(_min_d(F.col(emb_col)).alias("d")).agg(
        F.sum("d").alias("t")
    ).first()
    return float(row.t)
