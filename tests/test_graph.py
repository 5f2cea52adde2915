"""Commit-DAG traversal: BFS ancestry with minimal hop counts over a
diamond-merge history, and merge-commit detection."""

from __future__ import annotations

from hfcommunity_spark.operators.graph import ancestors, merge_commits

#        a
#       / \
#      b   c
#       \ /
#        d  (merge)
#        |
#        e
EDGES = [
    ("b", "a"), ("c", "a"),
    ("d", "b"), ("d", "c"),
    ("e", "d"),
]


def _edges(spark):
    return spark.createDataFrame(EDGES, ["commit_sha", "parent_sha"])


def test_ancestors_minimal_hops_through_diamond(spark):
    starts = spark.createDataFrame([("e",)], ["sha"])
    out = {(r.ancestor_sha): r.hops
           for r in ancestors(_edges(spark), starts).collect()}
    # a is reachable via b and via c — one row, minimal hops = 3
    assert out == {"d": 1, "b": 2, "c": 2, "a": 3}


def test_ancestors_respects_max_hops(spark):
    starts = spark.createDataFrame([("e",)], ["sha"])
    out = {r.ancestor_sha for r in
           ancestors(_edges(spark), starts, max_hops=2).collect()}
    assert out == {"d", "b", "c"}


def test_merge_commit_detection(spark):
    out = {r.sha: r.n_parents for r in merge_commits(_edges(spark)).collect()}
    assert out == {"d": 2}


def test_connected_components_chain_and_island(spark):
    from hfcommunity_spark.operators.graph import connected_components

    # chain 1-2-3-4 (diameter 3), island 10-11, self-contained pair 7-8
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (7, 8)], ["src", "dst"]
    )
    got = {r.vertex: r.component
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 7: 7, 8: 7}


def test_connected_components_converges_on_cycle(spark):
    from hfcommunity_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(5, 6), (6, 9), (9, 5)], ["src", "dst"]  # triangle
    )
    got = {r.vertex: r.component
           for r in connected_components(edges).collect()}
    assert got == {5: 5, 6: 5, 9: 5}
