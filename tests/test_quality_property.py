"""Generative cross-engine property tests for the round-6 quality
operators: on HYPOTHESIS-DRAWN corpora — not just the fixed testdata —
the Spark queries must match their DuckDB oracles value-for-value.

- rule-cascade audit (operators/textops.py): first-failing-rule
  dispatch order, integer cross-multiplied ratios, the non-overlapping
  ' a ' replace-count, stopword LIKE parity.
- per-source adaptive quality gate: histogram-decomposed rank must
  equal the oracle's per-source ROW_NUMBER under (score, doc_id) ties,
  including sources with fewer than 4 documents (floor(n/4) = 0 →
  nothing dropped) and duplicate texts (tied scores at the quartile
  boundary, broken by doc_id).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from hfcommunity_spark.operators.textops import (
    _ADAPTIVE_ORACLE,
    _CASCADE_ORACLE,
    t_filter_cascade_audit,
    t_source_relative_quality_filter,
)
from tests.oracle_utils import assert_frames_match

# Vocabulary chosen to trip every cascade rule: 'a' (filler), 'the'
# (stopword), short words (low density), a long word (density rescue),
# and a symbol-only token (symbol_heavy).
VOCAB = ["a", "the", "ab", "abcde", "abcdefghij", "!!", "x9"]

doc_strategy = st.one_of(
    st.none(),      # NULL text: both engines must agree on its handling
    st.just(""),    # empty text: LENGTH 0, the other degenerate case
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=30).map(" ".join),
)

corpus_strategy = st.lists(
    st.tuples(
        doc_strategy,
        st.sampled_from(["s0", "s1", "s2", None]),  # NULL source too
    ),
    min_size=1,
    max_size=40,
)


def _write_case(spark, tmp_root, rows):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": [t for t, _ in rows],
            "lang": ["en"] * len(rows),
            "source": [s for _, s in rows],
            "n_chars": [len(t) if t is not None else None for t, _ in rows],
        }
    )
    case_dir = tmp_root / f"case_{abs(hash(tuple(map(tuple, rows)))) % 10**12}"
    spark.createDataFrame(
        pdf,
        schema="doc_id long, text string, lang string, "
               "source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{case_dir}/documents.parquet")
    return case_dir


def _oracle(case_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{case_dir}/documents.parquet/*.parquet')"
    )
    want = con.execute(sql).fetchdf()
    con.close()
    return want


@settings(max_examples=6, deadline=None)
@given(corpus_strategy)
def _check_cascade(spark, tmp_root, rows):
    case_dir = _write_case(spark, tmp_root, rows)
    got = t_filter_cascade_audit(spark, str(case_dir)).toPandas()
    want = _oracle(case_dir, _CASCADE_ORACLE)
    assert_frames_match(got, want, "t_filter_cascade_audit")


def test_filter_cascade_cross_engine_property(spark, tmp_path):
    _check_cascade(spark, tmp_path)


@settings(max_examples=6, deadline=None)
@given(corpus_strategy)
def _check_adaptive(spark, tmp_root, rows):
    case_dir = _write_case(spark, tmp_root, rows)
    got = t_source_relative_quality_filter(spark, str(case_dir)).toPandas()
    want = _oracle(case_dir, _ADAPTIVE_ORACLE)
    assert_frames_match(got, want, "t_source_relative_quality_filter")


def test_adaptive_quality_gate_cross_engine_property(spark, tmp_path):
    _check_adaptive(spark, tmp_path)
