"""Commit-DAG traversal over the commit_parents edge list
(SURVEY §2.3 J5 / §1.1 — the reference's only graph-shaped table,
DDL databaseImport.py:236-239).

MariaDB 10.3 gave the reference recursive CTEs for ancestry walks; in
Spark the equivalent is iterative frontier expansion — each hop is one
equi join on the edge list, the loop lives in the driver, the data
never does.  Hop count is bounded by the DAG depth; each iteration's
frontier is deduplicated so the join input never exceeds the reachable
set (this is BFS, not path enumeration — no exponential blowup on
diamond merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestors(commit_parents: DataFrame, start_shas: DataFrame,
              max_hops: int = 20) -> DataFrame:
    """All ancestors of ``start_shas`` (column ``sha``) within
    ``max_hops``: returns (sha, ancestor_sha, hops) with the minimal
    hop count per ancestor (BFS order guarantees minimality)."""
    edges = commit_parents.select(
        F.col("commit_sha").alias("child"), F.col("parent_sha").alias("parent")
    )
    frontier = start_shas.select(
        F.col("sha"), F.col("sha").alias("node"), F.lit(0).alias("hops")
    )
    seen = frontier.select("sha", "node", "hops")
    for hop in range(1, max_hops + 1):
        step = (
            frontier.join(edges, frontier["node"] == edges["child"])
            .select("sha", F.col("parent").alias("node"), F.lit(hop).alias("hops"))
            .distinct()
        )
        # keep only nodes not reached at a smaller hop count
        step = step.join(seen.select("sha", "node"), ["sha", "node"], "left_anti")
        if step.isEmpty():
            break
        seen = seen.unionByName(step)
        frontier = step
    return (
        seen.filter(F.col("hops") > 0)
        .select("sha", F.col("node").alias("ancestor_sha"), "hops")
    )


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_iters: int = 25) -> DataFrame:
    """Undirected connected components by min-label propagation:
    every vertex starts labelled with itself; each round takes the min
    of its own label and its neighbors' (one edge⋈label equi join +
    one min aggregation per round) until a fixpoint.  Returns
    (vertex, component) with component = min vertex id reachable.

    Rounds needed = graph diameter; the loop is driver-side and eager
    (like ``kmeans_fit``), the data stays distributed.  At 100 TB you
    swap the propagation for the large-star/small-star rewrites
    (O(log n) rounds, same join primitive) — the per-round shuffle is
    identical, only the round count changes."""
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # cache the symmetrized edge list: every propagation round joins
    # against it, and its lineage may be arbitrarily expensive
    # (e.g. the shingle join feeding dd_dup_clusters)
    und = (
        und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("a").alias("vertex")).distinct()
        .withColumn("component", F.col("vertex"))
        .persist()
    )
    def _step(lbl: DataFrame, with_old: bool) -> DataFrame:
        msgs = und.join(lbl, und["a"] == lbl["vertex"]).select(
            F.col("b").alias("vertex"), "component",
            F.lit(False).alias("is_self"))
        unioned = lbl.select(
            "vertex", "component", F.lit(True).alias("is_self")
        ).unionByName(msgs)
        aggs = [F.min("component").alias("component")]
        if with_old:
            # fold convergence detection into the SAME aggregation
            # pass: the self row carries the previous label, so one
            # count() both materializes the labels and reports how
            # many moved — no separate comparison join
            aggs.append(
                F.max(F.when(F.col("is_self"), F.col("component"))).alias("__old")
            )
        return unioned.groupBy("vertex").agg(*aggs)

    pinned = labels  # the currently-persisted frame (labels may be a
    # projection over it; unpersist must target the cached handle)
    for _ in range(max_iters):
        # TWO propagation rounds per materialized action: the first is
        # chained lazily, only the second carries the convergence
        # columns.  If round 2 moved nothing its input was already a
        # fixpoint, so detection stays exact while the job count (the
        # dominant per-round cost on small graphs) halves.
        mid = _step(labels, with_old=False)
        new_labels = _step(mid, with_old=True).persist()
        n_changed = new_labels.filter(
            F.col("component") != F.col("__old")
        ).count()
        pinned.unpersist()
        pinned = new_labels
        labels = new_labels.select("vertex", "component")
        if n_changed == 0:
            break
    und.unpersist()
    return labels


def merge_commits(commit_parents: DataFrame) -> DataFrame:
    """Commits with ≥2 parents (merge nodes of the DAG)."""
    return (
        commit_parents.groupBy(F.col("commit_sha").alias("sha"))
        .agg(F.count(F.lit(1)).alias("n_parents"))
        .filter(F.col("n_parents") >= 2)
    )
