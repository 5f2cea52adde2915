"""Generative cross-engine property test for the unigram-LM micro-nat
discipline (operators/lm.py): on HYPOTHESIS-DRAWN corpora — not just
the fixed testdata — the Spark DSIR selection must match the DuckDB
oracle value-for-value.  This is the same cross-engine property lock
the sha60 hash carries (tests/test_sha60_property.py), extended to
the whole weight model: splits, add-1 smoothing, single-ln
micro-rounding, exact BIGINT sums, and the top-K tie-break."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from hfcommunity_spark.operators.lm import _DSIR_ORACLE, samp_dsir_select

VOCAB = [f"tok{i}" for i in range(12)]

doc_strategy = st.lists(
    st.sampled_from(VOCAB), min_size=1, max_size=20
).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(st.lists(doc_strategy, min_size=8, max_size=40))
def _check(spark, tmp_root, texts):
    n = len(texts)
    pdf = pd.DataFrame({
        "doc_id": range(n),
        "text": texts,
        "lang": ["en"] * n,
        "source": ["s"] * n,
        "n_chars": [len(t) for t in texts],
    })
    case_dir = tmp_root / f"case_{abs(hash(tuple(texts))) % 10**12}"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{case_dir}/documents.parquet"
    )
    got = (
        samp_dsir_select(spark, str(case_dir))
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{case_dir}/documents.parquet/*.parquet')"
    )
    want = con.execute(_DSIR_ORACLE).fetchdf().sort_values(
        "rank"
    ).reset_index(drop=True)
    con.close()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["weight_micro"].tolist() == want["weight_micro"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()


def test_dsir_select_cross_engine_property(spark, tmp_path):
    _check(spark, tmp_path)
