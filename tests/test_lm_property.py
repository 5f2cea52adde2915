"""Generative cross-engine property tests for the round-5 numeric
disciplines: on HYPOTHESIS-DRAWN inputs — not just the fixed testdata
— the Spark queries must match their DuckDB oracles value-for-value.
The same property-lock idea as tests/test_sha60_property.py, extended
to whole query disciplines:

- DSIR weight model (operators/lm.py): hash splits, add-1 smoothing,
  single-ln micro-rounding, exact BIGINT sums, top-K tie-break.
- BM25 (operators/retrieval.py): fixed-literal-order float sums and
  rounded-score ranking.
- z-score anomaly (operators/relational_ext2.py): exact-integer frame
  algebra, zero-variance guard, NULL-event exclusion."""

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


BM25_VOCAB = VOCAB + ["spark", "table", "join"]  # must include the
# fixed query terms so scored docs exist

bm25_doc = st.lists(
    st.sampled_from(BM25_VOCAB), min_size=1, max_size=25
).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(bm25_doc, min_size=6, max_size=30))
def _check_bm25(spark, tmp_root, texts):
    from hfcommunity_spark.operators.retrieval import sim_bm25_topk
    from hfcommunity_spark.registry import REGISTRY

    n = len(texts)
    pdf = pd.DataFrame({
        "doc_id": range(n), "text": texts, "lang": ["en"] * n,
        "source": ["s"] * n, "n_chars": [len(t) for t in texts],
    })
    case_dir = tmp_root / f"bm25_{abs(hash(tuple(texts))) % 10**12}"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{case_dir}/documents.parquet"
    )
    got = (
        sim_bm25_topk(spark, str(case_dir)).toPandas()
        .sort_values("rank").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{case_dir}/documents.parquet/*.parquet')"
    )
    want = con.execute(
        REGISTRY["sim_bm25_topk"].oracle
    ).fetchdf().sort_values("rank").reset_index(drop=True)
    con.close()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score_rounded"].tolist() == want["score_rounded"].tolist()


def test_bm25_cross_engine_property(spark, tmp_path):
    """BM25's fixed-literal-order float sums and rounded-score ranking
    must agree with DuckDB on generated corpora, not just the fixed
    testdata — the discipline the retrieval module claims."""
    _check_bm25(spark, tmp_path)


val_strategy = st.one_of(
    st.none(),                                # NULL events
    st.just(7.0),                             # constant runs
    st.floats(min_value=-50, max_value=50,
              allow_nan=False, allow_infinity=False),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(val_strategy, min_size=25, max_size=60))
def _check_anomaly(spark, tmp_root, values):
    import datetime as dt

    from hfcommunity_spark.registry import REGISTRY
    from hfcommunity_spark.streaming import jobs

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=i), 1, "k", v, None)
        for i, v in enumerate(values)
    ]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ])
    case_dir = tmp_root / f"anom_{abs(hash(tuple(values))) % 10**12}"
    spark.createDataFrame(pdf, schema=jobs.EVENT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{case_dir}/events.parquet")

    from hfcommunity_spark.operators.relational_ext2 import (
        w_event_anomaly_zscore,
    )

    got = (
        w_event_anomaly_zscore(spark, str(case_dir)).toPandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{case_dir}/events.parquet/*.parquet')"
    )
    want = con.execute(
        REGISTRY["w_event_anomaly_zscore"].oracle
    ).fetchdf().sort_values("event_id").reset_index(drop=True)
    con.close()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["z_rounded"].tolist() == want["z_rounded"].tolist()


def test_anomaly_zscore_cross_engine_property(spark, tmp_path):
    """The trailing-frame z-score must agree with DuckDB bit-for-bit
    on generated streams including NULL events and constant runs —
    the exact-integer frame algebra, the zero-variance guard, and the
    NULL exclusion all exercised under random data."""
    _check_anomaly(spark, tmp_path)


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5000),   # o_custkey
        st.integers(min_value=0, max_value=2500),   # day offset
        ),
    min_size=5, max_size=120, unique=True))
def _check_zorder(spark, tmp_root, rows):
    import datetime as dt

    from hfcommunity_spark.operators.layout import (
        layout_zorder_pruning_audit,
    )
    from hfcommunity_spark.registry import REGISTRY

    base = dt.date(1992, 1, 1)
    pdf = pd.DataFrame({
        "o_orderkey": range(len(rows)),
        "o_custkey": [c for c, _ in rows],
        "o_orderstatus": ["O"] * len(rows),
        "o_totalprice": [1.0] * len(rows),
        "o_orderdate": [base + dt.timedelta(days=d) for _, d in rows],
        "o_orderpriority": ["1-URGENT"] * len(rows),
    })
    case_dir = tmp_root / f"z_{abs(hash(tuple(rows))) % 10**12}"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{case_dir}/orders.parquet"
    )
    got = (
        layout_zorder_pruning_audit(spark, str(case_dir)).toPandas()
        .sort_values("layout").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{case_dir}/orders.parquet/*.parquet')"
    )
    want = con.execute(
        REGISTRY["layout_zorder_pruning_audit"].oracle
    ).fetchdf().sort_values("layout").reset_index(drop=True)
    con.close()
    for col in ("layout", "n_buckets", "n_rows",
                "avg_span_date", "avg_span_cust"):
        assert got[col].tolist() == want[col].tolist(), col


def test_zorder_audit_cross_engine_property(spark, tmp_path):
    """The Z-order pruning audit is pure integer arithmetic plus two
    exact casts — it must agree with DuckDB on arbitrary generated
    orders tables, not just TPC-H-shaped data."""
    _check_zorder(spark, tmp_path)


def test_epoch_shard_seed_redeal(spark, monkeypatch):
    """Bumping EPOCH_SEED must re-deal the epoch: shard assignments
    and within-shard orders change, while the coverage invariants
    (every doc exactly once, dense positions) hold for every seed."""
    from hfcommunity_spark.operators import sampling as S

    a = S.samp_epoch_shard_plan(spark, "/root/testdata/sf0.001").toPandas()
    monkeypatch.setattr(S, "EPOCH_SEED", S.EPOCH_SEED + 1)
    b = S.samp_epoch_shard_plan(spark, "/root/testdata/sf0.001").toPandas()
    assert set(a["doc_id"]) == set(b["doc_id"])
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    # a re-deal must actually move documents
    assert (merged["shard_a"] != merged["shard_b"]).any()
    for pdf in (a, b):
        for _, grp in pdf.groupby("shard"):
            assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))


# --- round 6: the exact-substring strip transform -------------------

# A tiny vocab + short docs makes cross-doc 5-gram collisions common,
# so generated corpora exercise every branch: fully-unique docs
# (unchanged), partially-covered docs, and docs stripped to ''.
strip_doc = st.lists(
    st.sampled_from(VOCAB[:6]), min_size=1, max_size=14
).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(st.lists(strip_doc, min_size=4, max_size=24))
def _check_strip(spark, tmp_root, texts):
    from hfcommunity_spark.operators.dedup import NGRAM, dd_strip_dup_spans
    from hfcommunity_spark.registry import REGISTRY

    n = len(texts)
    pdf = pd.DataFrame({
        "doc_id": range(n), "text": texts, "lang": ["en"] * n,
        "source": ["s"] * n, "n_chars": [len(t) for t in texts],
    })
    case_dir = tmp_root / f"strip_{abs(hash(tuple(texts))) % 10**12}"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{case_dir}/documents.parquet"
    )
    got = (
        dd_strip_dup_spans(spark, str(case_dir)).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{case_dir}/documents.parquet/*.parquet')"
    )
    want = con.execute(
        REGISTRY["dd_strip_dup_spans"].oracle
    ).fetchdf().sort_values("doc_id").reset_index(drop=True)
    con.close()
    # cross-engine: the cleaned STRINGS must match exactly
    assert got["cleaned_text"].tolist() == want["cleaned_text"].tolist()
    assert got["n_kept"].tolist() == want["n_kept"].tolist()

    # semantic invariants, recomputed in plain Python
    toks = [t.split(" ") for t in texts]
    from collections import defaultdict

    docs_of = defaultdict(set)
    for d, w in enumerate(toks):
        for p in range(len(w) - NGRAM + 1):
            docs_of[" ".join(w[p:p + NGRAM])].add(d)
    for d, w in enumerate(toks):
        covered = set()
        for p in range(len(w) - NGRAM + 1):
            if len(docs_of[" ".join(w[p:p + NGRAM])]) >= 2:
                covered.update(range(p, p + NGRAM))
        expect = " ".join(
            t for i, t in enumerate(w) if i not in covered
        )
        row = got.iloc[d]
        assert row["cleaned_text"] == expect, d
        assert row["n_tokens"] == len(w) and row["n_kept"] == len(w) - len(
            covered
        )


def test_strip_dup_spans_cross_engine_property(spark, tmp_path):
    """The strip transform's CLEANED STRINGS must match DuckDB exactly
    on hypothesis-drawn corpora, and both engines must match a plain
    Python recomputation of the covered-position semantics — unique
    docs pass through byte-identical, shared spans strip from BOTH
    sides, a doc can strip to ''."""
    _check_strip(spark, tmp_path)


# --- round 6: repeat schedule (NTILE) + length-batch plan ------------

multi_source_doc = st.tuples(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=18).map(" ".join),
    st.sampled_from(["sA", "sB", "sC"]),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(multi_source_doc, min_size=6, max_size=30))
def _check_repeat_and_batch(spark, tmp_root, rows):
    from hfcommunity_spark.operators.lm import samp_repeat_schedule
    from hfcommunity_spark.operators.sampling import samp_length_batch_plan
    from hfcommunity_spark.registry import REGISTRY

    n = len(rows)
    pdf = pd.DataFrame({
        "doc_id": range(n),
        "text": [t for t, _ in rows],
        "lang": ["en"] * n,
        "source": [s for _, s in rows],
        "n_chars": [len(t) for t, _ in rows],
    })
    case_dir = tmp_root / f"rb_{abs(hash(tuple(map(tuple, rows)))) % 10**12}"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{case_dir}/documents.parquet"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{case_dir}/documents.parquet/*.parquet')"
    )
    # repeat schedule: per-source NTILE terciles + CASE repeats must
    # agree row-for-row (ties broken by doc_id in both engines)
    got = (
        samp_repeat_schedule(spark, str(case_dir)).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    want = con.execute(
        REGISTRY["samp_repeat_schedule"].oracle
    ).fetchdf().sort_values("doc_id").reset_index(drop=True)
    for col in ("doc_id", "tercile", "repeats", "effective_tokens"):
        assert got[col].tolist() == want[col].tolist(), col

    # length-batch plan: integer log2 buckets, longest-first fill,
    # exact padding counts
    gotb = (
        samp_length_batch_plan(spark, str(case_dir)).toPandas()
        .sort_values(["bucket", "batch_id"]).reset_index(drop=True)
    )
    wantb = con.execute(
        REGISTRY["samp_length_batch_plan"].oracle
    ).fetchdf().sort_values(["bucket", "batch_id"]).reset_index(drop=True)
    con.close()
    for col in ("bucket", "batch_id", "n_docs", "max_tokens",
                "total_tokens", "padding_tokens"):
        assert gotb[col].tolist() == wantb[col].tolist(), col
    # semantic invariant: padding is exactly batch-max minus each doc
    lens = pdf["text"].str.split(" ").str.len()
    assert int(gotb["total_tokens"].sum()) == int(lens.sum())
    assert (gotb["padding_tokens"] >= 0).all()


def test_repeat_schedule_and_length_batches_cross_engine_property(
    spark, tmp_path
):
    """NTILE terciles (per-source, doc_id tie-break), CASE repeat
    factors, binary-string log2 buckets, and longest-first batch fill
    must agree with DuckDB row-for-row on hypothesis-drawn corpora."""
    _check_repeat_and_batch(spark, tmp_path)
