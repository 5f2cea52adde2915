"""Invariant tests for the round-5 additions: BM25 retrieval,
embedding-centroid outlier pruning, rolling z-score anomaly
detection, and the exact-substring duplication audit.

Value-level cross-engine correctness is covered by the auto-enrolled
``tests/test_oracle_parity.py`` sweep; these tests pin the semantic
invariants that a hash match alone wouldn't explain to a reader."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_ORACLE, SF_SMOKE


def test_bm25_topk_shape_and_term_presence(spark):
    from hfcommunity_spark.operators.retrieval import (
        BM25_TERMS,
        BM25_TOP_K,
        sim_bm25_topk,
    )

    rows = sim_bm25_topk(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= BM25_TOP_K
    assert [r.rank for r in rows] != []
    assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
    # ranks follow the rounded score (desc) with doc_id tie-break
    ordered = sorted(rows, key=lambda r: (-r.score_rounded, r.doc_id))
    assert [r.rank for r in ordered] == list(range(1, len(rows) + 1))
    assert all(r.score_rounded > 0 for r in rows)
    # every ranked doc actually contains at least one query term
    docs = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")["text"]
    )
    for r in rows:
        toks = set(docs[r.doc_id].split(" "))
        assert toks & set(BM25_TERMS)


def test_outlier_prune_per_label_counts(spark):
    from hfcommunity_spark.operators.similarity import (
        OUTLIER_PER_LABEL,
        emb_centroid_outlier_prune,
    )

    pdf = emb_centroid_outlier_prune(spark, SF_ORACLE).toPandas()
    assert (pdf["dist2_rounded"] >= 0).all()
    per_label = pdf.groupby("label")["rank"].agg(["count", "min", "max"])
    assert (per_label["count"] == OUTLIER_PER_LABEL).all()
    assert (per_label["min"] == 1).all()
    assert (per_label["max"] == OUTLIER_PER_LABEL).all()
    # pruned outliers are the per-label MAXIMA: nothing outside the
    # prune set may be farther than its label's rank-3 distance
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").toPandas()
    cents = {
        lbl: np.mean(np.stack(g["embedding"].to_numpy()).astype(np.float64), axis=0)
        for lbl, g in emb.groupby("label")
    }
    d2 = emb.apply(
        lambda r: float(
            np.sum((np.asarray(r["embedding"], np.float64) - cents[r["label"]]) ** 2)
        ),
        axis=1,
    )
    emb = emb.assign(d2=d2.round(4))
    for lbl, g in pdf.groupby("label"):
        floor = g["dist2_rounded"].min()
        others = emb[(emb["label"] == lbl) & (~emb["vec_id"].isin(g["vec_id"]))]
        assert (others["d2"] <= floor).all()


def test_anomaly_zscore_matches_pandas_rolling(spark):
    from hfcommunity_spark.operators.relational_ext2 import (
        ANOM_LOOKBACK,
        ANOM_Z,
        w_event_anomaly_zscore,
    )

    got = w_event_anomaly_zscore(spark, SF_SMOKE).toPandas()
    assert (got["z_rounded"].abs() >= ANOM_Z).all()

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    ev["micro"] = np.floor(ev["value"] * 1_000_000).astype("int64")
    expected = []
    for _, g in ev.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        m = g["micro"].astype(float)
        roll = m.shift(1).rolling(ANOM_LOOKBACK)
        mu, sd = roll.mean(), roll.std(ddof=0)
        z = ((m - mu) / sd).round(4)
        hit = g[(z.abs() >= ANOM_Z) & sd.notna() & (sd > 0)]
        expected.extend(zip(hit["event_id"], z[hit.index]))
    exp = pd.DataFrame(expected, columns=["event_id", "z_exp"])
    merged = got.merge(exp, on="event_id", how="outer", indicator=True)
    assert (merged["_merge"] == "both").all(), merged[merged._merge != "both"]
    assert np.allclose(merged["z_rounded"], merged["z_exp"], atol=1e-4)


def test_dup_span_ratio_bounds_and_exact_dups(spark):
    from hfcommunity_spark.operators.dedup import dd_dup_span_ratio

    pdf = dd_dup_span_ratio(spark, SF_ORACLE).toPandas()
    assert (pdf["n_dup_spans"] <= pdf["n_spans"]).all()
    assert ((pdf["dup_ratio"] >= 0) & (pdf["dup_ratio"] <= 1)).all()
    # any pair of byte-identical documents must audit at ratio 1.0
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").toPandas()
    dup_texts = docs[docs.duplicated("text", keep=False)]
    long_enough = dup_texts[dup_texts["text"].str.count(" ") + 1 >= 5]
    if not long_enough.empty:
        audited = pdf.set_index("doc_id").loc[long_enough["doc_id"]]
        assert (audited["dup_ratio"] == 1.0).all()


def test_dsir_select_prefers_target_like_docs(spark):
    """The selection must be exactly the arg-top-K of the full train
    pool by (weight, doc_id), and a reference pandas recomputation of
    the add-1 LLR on the same splits must agree with the integer
    micro-nat weights."""
    import math

    from hfcommunity_spark.operators.lm import DSIR_KEEP, samp_dsir_select
    from hfcommunity_spark.operators.sampling import (
        SALT,
        TRAIN_UPPER,
        VAL_UPPER,
    )

    out = samp_dsir_select(spark, SF_ORACLE).toPandas()
    assert len(out) == min(DSIR_KEEP, len(out))
    assert out["rank"].tolist() == list(range(1, len(out) + 1))
    # ranks follow (weight desc, doc_id asc)
    ordered = out.sort_values(
        ["weight_micro", "doc_id"], ascending=[False, True]
    )
    assert ordered["rank"].tolist() == list(range(1, len(out) + 1))

    # pandas twin of the whole computation
    import hashlib

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").toPandas()

    def split_of(doc_id):
        h = hashlib.sha256(f"{SALT}{doc_id}".encode()).hexdigest()[:2]
        return "train" if h < TRAIN_UPPER else ("val" if h < VAL_UPPER else "test")

    docs["split"] = docs["doc_id"].map(split_of)
    pool = docs[docs["split"].isin(["train", "val"])]
    ct: dict[str, int] = {}
    cr: dict[str, int] = {}
    for _, row in pool.iterrows():
        tgt = ct if row["split"] == "val" else cr
        for w in row["text"].split(" "):
            tgt[w] = tgt.get(w, 0) + 1
    vocab = set(ct) | set(cr)
    nt, nr, v = sum(ct.values()), sum(cr.values()), len(vocab)
    lr = {
        w: round(
            math.log(
                ((ct.get(w, 0) + 1.0) * (nr + v))
                / ((cr.get(w, 0) + 1.0) * (nt + v))
            )
            * 1_000_000
        )
        for w in vocab
    }
    train = pool[pool["split"] == "train"]
    weights = {
        int(r["doc_id"]): sum(lr[w] for w in r["text"].split(" "))
        for _, r in train.iterrows()
    }
    expected = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = expected[: len(out)]
    got = list(zip(out["doc_id"], out["weight_micro"]))
    assert [(int(d), int(wm)) for d, wm in got] == [
        (d, wm) for d, wm in expected
    ]


def test_unigram_ppl_buckets_balanced_and_monotone(spark):
    """Per language: NTILE(3) bucket sizes differ by at most one, and
    the bucket boundaries are monotone in mean NLL (head <= middle <=
    tail)."""
    from hfcommunity_spark.operators.lm import t_unigram_ppl_buckets

    pdf = t_unigram_ppl_buckets(spark, SF_ORACLE).toPandas()
    assert set(pdf["ppl_bucket"]) <= {"head", "middle", "tail"}
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").toPandas()
    assert len(pdf) == len(docs)  # every doc scored exactly once
    for lang, grp in pdf.groupby("lang"):
        sizes = grp["ppl_bucket"].value_counts()
        if len(grp) >= 3:
            assert sizes.max() - sizes.min() <= 1
        if {"head", "middle"} <= set(sizes.index):
            assert (
                grp[grp.ppl_bucket == "head"]["mean_nll_micro"].max()
                <= grp[grp.ppl_bucket == "middle"]["mean_nll_micro"].min()
            )
        if {"middle", "tail"} <= set(sizes.index):
            assert (
                grp[grp.ppl_bucket == "middle"]["mean_nll_micro"].max()
                <= grp[grp.ppl_bucket == "tail"]["mean_nll_micro"].min()
            )


def test_zorder_buckets_narrow_both_dims(spark):
    """The Z-layout must narrow the zone-map span of BOTH dimensions
    well below the insertion layout's (which is narrow only in the
    insertion key) — the property that makes a Z-order rewrite pay for
    itself in file pruning."""
    from hfcommunity_spark.operators.layout import (
        layout_zorder_pruning_audit,
    )

    rows = {
        r.layout: r
        for r in layout_zorder_pruning_audit(spark, SF_ORACLE).collect()
    }
    z, ins = rows["zorder"], rows["insertion"]
    assert z.n_rows == ins.n_rows  # both layouts cover every row
    assert z.avg_span_date < ins.avg_span_date / 4
    assert z.avg_span_cust < ins.avg_span_cust / 4


def test_dsir_resample_gumbel_keys_reproducible(spark):
    """The resample's Gumbel part must equal an independent Python
    recomputation from the seeded sha60 hash (bit-for-bit), ranks must
    follow the integer keys, and the noise must actually reorder the
    tail relative to the deterministic top-K."""
    import hashlib
    import math

    from hfcommunity_spark.operators.lm import (
        GUMBEL_SEED,
        samp_dsir_resample,
        samp_dsir_select,
    )

    out = samp_dsir_resample(spark, SF_ORACLE).toPandas()
    ordered = out.sort_values(["key_micro", "doc_id"],
                              ascending=[False, True])
    assert ordered["rank"].tolist() == list(range(1, len(out) + 1))

    def gumbel_micro(doc_id: int) -> int:
        hx = hashlib.sha256(f"{GUMBEL_SEED}:{doc_id}".encode()).hexdigest()
        h = int(hx[:15], 16)
        u = ((h >> 8) + 0.5) / float(1 << 52)
        g = -math.log(-math.log(u))
        return int(math.copysign(math.floor(abs(g * 1e6) + 0.5), g))

    for _, r in out.head(20).iterrows():
        assert int(r.key_micro) - int(r.weight_micro) == gumbel_micro(
            int(r.doc_id)
        ), int(r.doc_id)

    select_ids = set(
        samp_dsir_select(spark, SF_ORACLE).toPandas()["doc_id"]
    )
    resample_ids = set(out["doc_id"])
    # same weight model -> heavy overlap; Gumbel noise -> not identical
    assert len(select_ids & resample_ids) >= len(select_ids) // 2
    assert select_ids != resample_ids


def test_zorder_key_roundtrip_property(spark):
    """Morton interleave must be a bijection on the masked domain:
    decoding the Spark-computed key recovers (a, b) exactly for a
    hypothesis-driven sample of the 16-bit key space."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F

    from hfcommunity_spark.operators.layout import ZBITS, zorder_key

    def decode(z: int) -> tuple[int, int]:
        a = b = 0
        for i in range(ZBITS):
            a |= ((z >> (2 * i)) & 1) << i
            b |= ((z >> (2 * i + 1)) & 1) << i
        return a, b

    @settings(max_examples=20, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(0, (1 << ZBITS) - 1),
                  st.integers(0, (1 << ZBITS) - 1)),
        min_size=1, max_size=50))
    def check(pairs):
        df = spark.createDataFrame(pairs, "a int, b int").select(
            "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
        )
        for r in df.collect():
            assert decode(r.z) == (r.a, r.b)

    check()


def test_lsh_recall_audit_null_metrics_on_clean_sample(spark, tmp_path):
    """A clean sample (no true near-dup pairs) must report explicit
    NULL recall — not a divide-by-zero NaN/Inf that diverges between
    engines (round-5 review finding)."""
    import pandas as pd

    from hfcommunity_spark.operators.dedup import dd_lsh_recall_audit

    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": [" ".join(f"w{d}_{i}" for i in range(40))
                 for d in range(6)],
        "lang": ["en"] * 6,
        "source": ["s"] * 6,
        "n_chars": [100] * 6,
    })
    spark.createDataFrame(docs).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    row = dd_lsh_recall_audit(spark, str(tmp_path)).collect()[0]
    assert row.n_true == 0 and row.fn == 0
    assert row.recall_rounded is None
    if row.n_candidates == 0:
        assert row.precision_rounded is None


def test_epoch_shard_plan_deterministic_and_balanced(spark):
    """The epoch plan must re-deal identically on rerun, cover every
    doc exactly once, keep shards statistically balanced, and number
    positions densely from 1 within each shard."""
    from hfcommunity_spark.operators.sampling import (
        N_SHARDS,
        samp_epoch_shard_plan,
    )

    a = samp_epoch_shard_plan(spark, SF_ORACLE).toPandas()
    b = samp_epoch_shard_plan(spark, SF_ORACLE).toPandas()
    key = ["doc_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    assert len(a) == docs.count()
    assert a["doc_id"].is_unique
    sizes = a.groupby("shard").size()
    assert set(sizes.index) == set(range(N_SHARDS))
    assert sizes.max() < 2 * sizes.min()  # hash balance, no hot shard
    for _, grp in a.groupby("shard"):
        pos = sorted(grp["pos"])
        assert pos == list(range(1, len(grp) + 1))
