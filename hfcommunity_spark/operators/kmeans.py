"""Distributed Lloyd's k-means over an embedding column — the
iterative-algorithm representative (genuinely non-SQL-expressible;
declared rows-only per the driver contract) and the real coarse
quantizer for IVF similarity search.

Execution shape per iteration (the only shape that survives 100 TB):
- assignment: map-side only — centroids are k×dim doubles broadcast to
  every task; no shuffle touches the big side
- update: posexplode + (cell, dim) partial aggregation — one shuffle
  of k×dim partial sums, independent of row count

Initialization is deterministic (k lowest vec_ids), so runs are
reproducible at any parallelism; iterations run eagerly (centroids are
collected each round — k×dim values, driver-side small by design).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(a: str | Column, centroid: list[float]) -> Column:
    e = F.col(a) if isinstance(a, str) else a
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(e, lit, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_cells(emb: DataFrame, centroids: list[list[float]],
                 emb_col: str = "embedding") -> DataFrame:
    """Nearest-centroid cell id per row (ties → lowest cell id).
    Pure projection: k distance expressions + least()."""
    dists = [
        _sq_dist(emb_col, centroids[i]).alias(f"__d{i}")
        for i in range(len(centroids))
    ]
    with_d = emb.select("*", *dists)
    cell = F.lit(0)
    best = F.col("__d0")
    for i in range(1, len(centroids)):
        is_better = F.col(f"__d{i}") < best
        cell = F.when(is_better, F.lit(i)).otherwise(cell)
        best = F.when(is_better, F.col(f"__d{i}")).otherwise(best)
    return with_d.withColumn("cell", cell).drop(
        *[f"__d{i}" for i in range(len(centroids))]
    )


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 5,
               emb_col: str = "embedding",
               id_col: str = "vec_id") -> list[list[float]]:
    """Lloyd's iterations; returns the k centroids (k×dim floats).
    Empty cells keep their previous centroid."""
    init = (
        emb.orderBy(id_col).limit(k).select(emb_col).collect()
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
    objective — must be non-increasing over iterations)."""
    assigned = assign_cells(emb, centroids, emb_col)
    dist_cases = F.lit(None).cast("double")
    expr = None
    for i, c in enumerate(centroids):
        d = _sq_dist(emb_col, c)
        expr = F.when(F.col("cell") == i, d) if expr is None else expr.when(
            F.col("cell") == i, d
        )
    row = assigned.select(expr.alias("d")).agg(F.sum("d").alias("t")).collect()
    return float(row[0].t)
