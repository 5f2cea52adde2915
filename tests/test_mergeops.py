"""Property tests for D1/D2/D3/U1 merge semantics against DuckDB's
native INSERT OR IGNORE / ON CONFLICT DO UPDATE — the same contract
MariaDB gave the reference (databaseImport.py:277,:641,:609)."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from hfcommunity_spark.operators.mergeops import (
    insert_ignore,
    partial_update,
    priority_union,
    upsert,
)


def _rand_batch(rng: random.Random, n: int, tag: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "k": [rng.randint(0, 9) for _ in range(n)],
            "a": [f"{tag}{i}" for i in range(n)],
            "b": [rng.randint(0, 100) for _ in range(n)],
            "seq": list(range(n)),
        }
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_insert_ignore_matches_duckdb(spark, seed):
    rng = random.Random(seed)
    b1, b2 = _rand_batch(rng, 12, "x"), _rand_batch(rng, 12, "y")

    empty = spark.createDataFrame(b1).limit(0)
    d1 = insert_ignore(empty, spark.createDataFrame(b1), ["k"], ["seq"])
    got = (
        insert_ignore(d1, spark.createDataFrame(b2), ["k"], ["seq"])
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT PRIMARY KEY, a VARCHAR, b INT, seq INT)")
    for df in (b1, b2):  # row-at-a-time, like the reference
        for r in df.itertuples(index=False):
            con.execute(
                "INSERT OR IGNORE INTO t VALUES (?, ?, ?, ?)",
                [r.k, r.a, r.b, r.seq],
            )
    want = con.execute("SELECT * FROM t ORDER BY k").df()
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64", "b": "int64", "seq": "int64"}),
        want.astype({"k": "int64", "b": "int64", "seq": "int64"}),
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_upsert_matches_duckdb(spark, seed):
    rng = random.Random(100 + seed)
    b1, b2 = _rand_batch(rng, 10, "x"), _rand_batch(rng, 10, "y")
    # PK-unique inputs (last writer wins within each batch, by seq)
    b1u = b1.sort_values("seq").groupby("k", as_index=False).last()
    b2u = b2.sort_values("seq").groupby("k", as_index=False).last()

    got = (
        upsert(
            spark.createDataFrame(b1u),
            spark.createDataFrame(b2u),
            ["k"],
            update_cols=["a", "b"],  # seq is NOT in the update list
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT PRIMARY KEY, a VARCHAR, b INT, seq INT)")
    for df in (b1u, b2u):
        for r in df.itertuples(index=False):
            con.execute(
                "INSERT INTO t VALUES (?, ?, ?, ?) "
                "ON CONFLICT (k) DO UPDATE SET a = excluded.a, b = excluded.b",
                [r.k, r.a, r.b, r.seq],
            )
    want = con.execute("SELECT * FROM t ORDER BY k").df()
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64", "b": "int64", "seq": "int64"}),
        want.astype({"k": "int64", "b": "int64", "seq": "int64"}),
    )


def test_partial_update_no_inserts(spark):
    existing = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "likes": [5, 7], "name": ["a", "b"]})
    )
    updates = spark.createDataFrame(
        pd.DataFrame({"k": [2, 3], "likes": [99, 42], "name": ["B", "C"]})
    )
    out = (
        partial_update(existing, updates, ["k"], ["likes"])
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2]  # k=3 NOT inserted (UPDATE-only)
    assert out["likes"].tolist() == [5, 99]
    assert out["name"].tolist() == ["a", "b"]  # unlisted column untouched


def test_priority_union_richer_source_wins(spark):
    # author streams: "commit" stubs vs richer "hf" rows (:513-518)
    commit_stub = spark.createDataFrame(
        pd.DataFrame(
            {"username": ["u1", "u2"], "fullname": [None, None],
             "source": ["commit", "commit"]}
        )
    )
    hf_rich = spark.createDataFrame(
        pd.DataFrame(
            {"username": ["u2", "u3"], "fullname": ["User Two", "User Three"],
             "source": ["hf", "hf"]}
        )
    )
    out = (
        priority_union(
            [(commit_stub, 1), (hf_rich, 2)], ["username"], ["source"]
        )
        .toPandas()
        .sort_values("username")
        .reset_index(drop=True)
    )
    assert out["source"].tolist() == ["commit", "hf", "hf"]
    assert out["fullname"].tolist()[1] == "User Two"
