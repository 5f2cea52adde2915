"""Property-based checks (hypothesis) for the merge operators: for ANY
two batches with colliding keys, insert_ignore/upsert must agree with
DuckDB's native conflict handling executed row-at-a-time — the exact
contract MariaDB gave the reference."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hfcommunity_spark.operators.mergeops import insert_ignore, upsert

row = st.tuples(
    st.integers(min_value=0, max_value=4),      # key (forced collisions)
    st.text(alphabet="abcxyz", min_size=0, max_size=4),
    st.integers(min_value=-5, max_value=5),
)
batch = st.lists(row, min_size=0, max_size=8)


def _pdf(rows):
    return pd.DataFrame(
        [(k, a, b, i) for i, (k, a, b) in enumerate(rows)],
        columns=["k", "a", "b", "seq"],
    )


@pytest.fixture(scope="module")
def prop_spark(spark):
    return spark


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(b1=batch, b2=batch)
def test_insert_ignore_property(prop_spark, b1, b2):
    spark = prop_spark
    p1, p2 = _pdf(b1), _pdf(b2)
    schema = "k int, a string, b int, seq int"
    d1 = spark.createDataFrame(p1, schema=schema)
    d2 = spark.createDataFrame(p2, schema=schema)
    got = (
        insert_ignore(
            insert_ignore(d1.limit(0), d1, ["k"], ["seq"]),
            d2, ["k"], ["seq"],
        )
        .toPandas()
        .sort_values(["k"])
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT PRIMARY KEY, a VARCHAR, b INT, seq INT)")
    for pdf in (p1, p2):
        for r in pdf.itertuples(index=False):
            con.execute("INSERT OR IGNORE INTO t VALUES (?, ?, ?, ?)", list(r))
    want = con.execute("SELECT * FROM t ORDER BY k").df()
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64", "b": "int64", "seq": "int64"}) if len(got) else got,
        want.astype({"k": "int64", "b": "int64", "seq": "int64"}) if len(want) else want,
        check_dtype=False,
    )


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(b1=batch, b2=batch)
def test_upsert_property(prop_spark, b1, b2):
    spark = prop_spark
    # PK-unique inputs: last writer per key by seq (within-batch rule)
    p1 = _pdf(b1).sort_values("seq").groupby("k", as_index=False).last()
    p2 = _pdf(b2).sort_values("seq").groupby("k", as_index=False).last()
    schema = "k int, a string, b int, seq int"
    got = (
        upsert(
            spark.createDataFrame(p1, schema=schema),
            spark.createDataFrame(p2, schema=schema),
            ["k"], update_cols=["a", "b"],
        )
        .toPandas()
        .sort_values(["k"])
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT PRIMARY KEY, a VARCHAR, b INT, seq INT)")
    for pdf in (p1, p2):
        for r in pdf.itertuples(index=False):
            con.execute(
                "INSERT INTO t VALUES (?, ?, ?, ?) ON CONFLICT (k) DO UPDATE "
                "SET a = excluded.a, b = excluded.b",
                list(r),
            )
    want = con.execute("SELECT * FROM t ORDER BY k").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
