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


def merge_commits(commit_parents: DataFrame) -> DataFrame:
    """Commits with ≥2 parents (merge nodes of the DAG)."""
    return (
        commit_parents.groupBy(F.col("commit_sha").alias("sha"))
        .agg(F.count(F.lit(1)).alias("n_parents"))
        .filter(F.col("n_parents") >= 2)
    )
