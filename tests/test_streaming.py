"""Real Structured Streaming tests (X1-X7): micro-batch execution with
file sources, watermark-driven late-data discard, cross-batch stateful
dedup, and batch/stream result parity on the same transform."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.streaming import jobs

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _events_pdf(rows):
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def _write_batch(spark, pdf, path):
    spark.createDataFrame(pdf, schema=jobs.EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_stream(spark, stream_df, tmp, name, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", f"{tmp}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_batch_parity_tumbling(spark, tmp_path):
    """The same transform fn on readStream vs read gives identical
    results (unified API, X1/X3)."""
    src = str(tmp_path / "in")
    sf = "/root/testdata/sf0.001"
    batch_events = read_table(spark, sf, "events")
    batch_events.write.parquet(src, mode="overwrite")

    stream = jobs.tumbling_counts(
        jobs.read_event_stream(spark, src), watermark="100 days"
    )
    got = _run_stream(
        spark, stream, tmp_path, "t_tumbling", "complete"
    ).toPandas()
    want = jobs.tumbling_counts(batch_events).toPandas()
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def _run_two_batches(spark, make_stream, tmp, name, output_mode, src, b1, b2):
    """Write batch 1, start the stream, drain; write batch 2, drain —
    guarantees two micro-batches with a watermark update in between."""
    _write_batch(spark, b1, src)
    q = (
        make_stream()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", f"{tmp}/ckpt_{name}")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, b2, src)
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def test_watermark_discards_late_data(spark, tmp_path):
    """X2/X6: an event older than the watermark horizon arriving in a
    later micro-batch is dropped from an append-mode windowed agg."""
    src = str(tmp_path / "in")
    b1 = _events_pdf(
        [
            (1, T0, 1, "click", 1.0, None),
            (2, T0 + dt.timedelta(hours=3), 1, "click", 1.0, None),
        ]
    )
    # batch 2: one on-time event; one 3h-late event (watermark = 10 min)
    b2 = _events_pdf(
        [
            (3, T0 + dt.timedelta(hours=3, minutes=5), 1, "click", 1.0, None),
            (4, T0 + dt.timedelta(minutes=1), 1, "click", 99.0, None),
        ]
    )
    out = _run_two_batches(
        spark,
        lambda: jobs.tumbling_counts(
            jobs.read_event_stream(spark, src), watermark="10 minutes"
        ),
        tmp_path,
        "t_late",
        "append",
        src,
        b1,
        b2,
    ).toPandas()
    # window T0 was finalized with exactly 1 event when the watermark
    # (13:00 − 10min) passed its end after batch 1; the late event (id 4,
    # value 99) arriving in batch 2 must not reopen it
    first_window = out[out.window_start == T0]
    assert first_window.n_events.tolist() == [1]
    assert 99.0 not in out.sum_value.tolist()


def test_stateful_dedup_across_batches(spark, tmp_path):
    """X5: dropDuplicatesWithinWatermark suppresses a same-id event
    arriving in a later micro-batch within the horizon."""
    src = str(tmp_path / "in")
    b1 = _events_pdf([(10, T0, 1, "click", 1.0, None)])
    b2 = _events_pdf(
        [
            (10, T0 + dt.timedelta(minutes=1), 1, "click", 1.0, None),  # dup id
            (11, T0 + dt.timedelta(minutes=2), 1, "click", 1.0, None),
        ]
    )
    out = _run_two_batches(
        spark,
        lambda: jobs.dedup_events(
            jobs.read_event_stream(spark, src), watermark="1 hour"
        ),
        tmp_path,
        "t_dedup",
        "append",
        src,
        b1,
        b2,
    ).toPandas()
    assert sorted(out.event_id.tolist()) == [10, 11]


def test_stream_static_join(spark, tmp_path):
    """X7: per-micro-batch broadcast enrichment against a static dim."""
    src = str(tmp_path / "in")
    b1 = _events_pdf(
        [(1, T0, 7, "click", 1.0, None), (2, T0, 999999, "click", 1.0, None)]
    )
    _write_batch(spark, b1, src)
    dim = spark.createDataFrame(
        [(7, "SEG-A")], ["c_custkey", "c_mktsegment"]
    )
    stream = jobs.enrich_with_dim(
        jobs.read_event_stream(spark, src), dim, "user_id", "c_custkey"
    ).select("event_id", "c_mktsegment")
    out = _run_stream(spark, stream, tmp_path, "t_join", "append").toPandas()
    by_id = dict(zip(out.event_id, out.c_mktsegment))
    assert by_id[1] == "SEG-A"
    assert pd.isna(by_id[2])


def test_session_window_merge_rule(spark):
    """X4 batch-mode semantics: gap strictly under 30 min merges, exactly
    30 min starts a new session (the rule the oracle encodes)."""
    rows = _events_pdf(
        [
            (1, T0, 1, "a", 0.0, None),
            (2, T0 + dt.timedelta(minutes=29, seconds=59), 1, "a", 0.0, None),
            (3, T0 + dt.timedelta(minutes=59, seconds=59), 1, "a", 0.0, None),
            (4, T0 + dt.timedelta(minutes=89, seconds=59), 1, "a", 0.0, None),
            (5, T0 + dt.timedelta(hours=5), 1, "a", 0.0, None),
        ]
    )
    df = spark.createDataFrame(rows, schema=jobs.EVENT_SCHEMA)
    out = jobs.session_counts(df).orderBy("session_start").collect()
    # events 1-4 chain with sub-30min gaps → one session; 5 is alone
    assert [(r.session_start, r.n_events) for r in out] == [
        (T0, 4),
        (T0 + dt.timedelta(hours=5), 1),
    ]


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-user totals accumulate across
    micro-batches via the checkpointed state store (custom stateful
    operator beyond built-in windows/dedup)."""
    from hfcommunity_spark.streaming.stateful import user_running_totals

    src = str(tmp_path / "in")
    b1 = _events_pdf(
        [
            (1, T0, 7, "click", 1.50, None),
            (2, T0, 7, "view", 2.25, None),
            (3, T0, 8, "click", 10.00, None),
        ]
    )
    b2 = _events_pdf(
        [
            (4, T0 + dt.timedelta(minutes=1), 7, "click", 0.25, None),
            # NULL value: counts as an event, contributes 0 cents —
            # an unmasked NaN killed the query pre-fix (round-6 review)
            (5, T0 + dt.timedelta(minutes=1), 7, "view", None, None),
        ]
    )
    out = _run_two_batches(
        spark,
        lambda: user_running_totals(jobs.read_event_stream(spark, src)),
        tmp_path,
        "t_stateful",
        "append",
        src,
        b1,
        b2,
    ).toPandas()
    u7 = out[out.user_id == 7].sort_values("total_events")
    # batch 1: two events, 375 cents; batch 2: one more, 400 cents total
    assert u7.batch_events.tolist() == [2, 2]
    assert u7.total_events.tolist() == [2, 4]
    assert u7.total_cents.tolist() == [375, 400]
    u8 = out[out.user_id == 8]
    assert u8.total_events.tolist() == [1]
    assert u8.total_cents.tolist() == [1000]


def test_stream_stream_interval_join(spark, tmp_path):
    """X9: two file-source streams joined on user_id + 1h interval,
    across two micro-batches; late view beyond both watermark and
    horizon never pairs."""
    vsrc, psrc = str(tmp_path / "views"), str(tmp_path / "purch")

    def ev(eid, minutes, uid, etype):
        return (eid, T0 + dt.timedelta(minutes=minutes), uid, etype, 1.0, "{}")

    # batch 1: user 1 views at t+0 and t-90min; purchase at t+30
    views1 = _events_pdf([ev(1, 0, 1, "view"), ev(2, -90, 1, "view")])
    purch1 = _events_pdf([ev(100, 30, 1, "purchase")])
    # batch 2: user 2 pair inside horizon; user 1 extra view pairs with
    # nothing (no later purchase)
    views2 = _events_pdf([ev(3, 200, 2, "view"), ev(4, 500, 1, "view")])
    purch2 = _events_pdf([ev(101, 210, 2, "purchase")])

    _write_batch(spark, views1, vsrc)
    _write_batch(spark, purch1, psrc)

    def make_stream():
        views, _ = jobs.split_views_purchases(jobs.read_event_stream(spark, vsrc))
        _, purchases = jobs.split_views_purchases(
            jobs.read_event_stream(spark, psrc)
        )
        return jobs.interval_join(views, purchases)

    q = (
        make_stream()
        .writeStream.format("memory")
        .queryName("t_x9")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt_x9")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, views2, vsrc)
        _write_batch(spark, purch2, psrc)
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.table("t_x9")
        .select("purchase_id", "view_id")
        .toPandas()
        .sort_values(["purchase_id", "view_id"])
        .reset_index(drop=True)
    )
    # purchase 100 pairs ONLY with view 1 (view 2 is 2h earlier — outside
    # the horizon); purchase 101 pairs with view 3.
    assert got.values.tolist() == [[100, 1], [101, 3]]


def test_stream_stream_outer_interval_join(spark, tmp_path):
    """X18: the right-outer variant preserves view-less purchases —
    the null-padded row is emitted only once the watermark proves no
    in-horizon view can still arrive, so a late batch must advance
    event time before the unmatched purchase appears."""
    vsrc, psrc = str(tmp_path / "views18"), str(tmp_path / "purch18")

    def ev(eid, minutes, uid, etype):
        return (eid, T0 + dt.timedelta(minutes=minutes), uid, etype, 1.0, "{}")

    # user 1's purchase pairs with its view; user 2's purchase has NO
    # view anywhere — the row the inner join drops
    views1 = _events_pdf([ev(1, 0, 1, "view")])
    purch1 = _events_pdf([
        ev(100, 30, 1, "purchase"), ev(101, 30, 2, "purchase"),
    ])
    _write_batch(spark, views1, vsrc)
    _write_batch(spark, purch1, psrc)

    def make_stream():
        views, _ = jobs.split_views_purchases(jobs.read_event_stream(spark, vsrc))
        _, purchases = jobs.split_views_purchases(
            jobs.read_event_stream(spark, psrc)
        )
        return jobs.interval_join(views, purchases, how="right_outer")

    q = (
        make_stream()
        .writeStream.format("memory")
        .queryName("t_x18")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt_x18")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance BOTH watermarks far past purchase 101 + horizon so
        # its unmatched row must be released
        _write_batch(spark, _events_pdf([ev(5, 3000, 9, "view")]), vsrc)
        _write_batch(
            spark, _events_pdf([ev(900, 3000, 9, "purchase")]), psrc
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.purchase_id, r.view_id)
        for r in spark.table("t_x18")
        .select("purchase_id", "view_id").collect()
    }
    assert (100, 1) in got        # matched pair, emitted immediately
    assert (101, None) in got     # view-less purchase, null-padded


def test_interval_join_batch_parity(spark):
    """The same interval_join transform on batch frames equals the
    naive range-join SQL on sf0.001 events."""
    sf = "/root/testdata/sf0.001"
    events = read_table(spark, sf, "events")
    views, purchases = jobs.split_views_purchases(events)
    pairs = jobs.interval_join(views, purchases)
    got = pairs.count()
    events.createOrReplaceTempView("ev_x9")
    want = spark.sql(
        """
        SELECT COUNT(*) FROM ev_x9 p JOIN ev_x9 v
          ON v.user_id = p.user_id AND v.event_type = 'view'
         AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        WHERE p.event_type = 'purchase'
        """
    ).collect()[0][0]
    assert got == want


def test_stream_neardup_gate_micro_batches(spark, tmp_path):
    """X10: the MinHash admission gate runs per micro-batch through
    foreachBatch against the session-persisted corpus band index —
    the union of per-batch outputs must equal the batch twin run on
    the same incoming docs (production xxhash64 mode)."""
    from pyspark.sql import types as T

    from hfcommunity_spark.operators.dedup import (
        minhash_band_index,
        neardup_gate,
    )

    sf = "/root/testdata/sf0.001"
    corpus = spark.read.parquet(f"{sf}/documents.parquet")
    # incoming docs: replay two real corpus docs (guaranteed near-dup
    # hits: identical signatures) + one fresh doc
    texts = [
        r.text
        for r in corpus.orderBy("doc_id").limit(2).select("text").collect()
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    rows = [
        (100001, texts[0]),
        (100003, texts[1]),
        (100002, "completely novel words never seen in corpus "
                 "alpha beta gamma delta epsilon zeta eta theta"),
    ]
    src = str(tmp_path / "docs_in")
    spark.createDataFrame(rows[:2], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    idx = minhash_band_index(spark, sf, hash_mode="xxhash64")
    got = []

    def gate_batch(batch_df, batch_id):
        got.extend(
            neardup_gate(batch_df, idx, hash_mode="xxhash64").collect()
        )

    q = (
        spark.readStream.schema(schema).parquet(src)
        .writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", f"{tmp_path}/ckpt_gate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # second micro-batch
    spark.createDataFrame(rows[2:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = (
        spark.readStream.schema(schema).parquet(src)
        .writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", f"{tmp_path}/ckpt_gate")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    batch_twin = {
        r.doc_id: r
        for r in neardup_gate(
            spark.createDataFrame(rows, schema), idx, hash_mode="xxhash64"
        ).collect()
    }
    streamed = {r.doc_id: r for r in got}
    assert streamed.keys() == batch_twin.keys()
    for k, want in batch_twin.items():
        assert streamed[k].n_near_dups == want.n_near_dups, k
        assert streamed[k].max_est_similarity == want.max_est_similarity, k
    # the replayed docs must be flagged (identical sig → similarity 1.0)
    assert streamed[100001].n_near_dups >= 1
    assert streamed[100001].max_est_similarity == 1.0
    assert streamed[100003].n_near_dups >= 1


def test_stream_curation_gate_micro_batches(spark, tmp_path):
    """X11: the FULL curation admission decision runs per micro-batch
    through foreachBatch against the session-persisted corpus
    artifacts (production xxhash64 mode).  Crafted arrivals exercise
    every reject reason — including exact_dup, which no slice of the
    synthetic corpus hits — and the union of per-batch decisions must
    equal the batch twin."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from hfcommunity_spark.operators.curation import (
        DECONTAM_NGRAM,
        curation_admission,
    )
    from hfcommunity_spark.operators.dedup import (
        minhash_band_index,
        shingle_hash_index,
    )
    from hfcommunity_spark.operators.sampling import hash_split

    sf = "/root/testdata/sf0.001"
    corpus = spark.read.parquet(f"{sf}/documents.parquet")
    # a long corpus doc to replay (exact_dup) and near-modify (near_dup)
    long_doc = (
        corpus.filter(F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1 >= 40)
        .orderBy("doc_id").limit(1).select("text").collect()[0].text
    )
    words = long_doc.split(" ")
    near_text = " ".join(words[:-1] + ["zzzmutated"])
    # a held-out corpus doc whose 5-grams the contaminated arrival copies
    holdout_doc = (
        corpus.select("doc_id", "text",
                      hash_split(F.col("doc_id")).alias("split"))
        .filter((F.col("split") != "train")
                & (F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1 >= 40))
        .orderBy("doc_id").limit(1).collect()[0]
    )
    hw = holdout_doc.text.split(" ")
    contaminated_text = " ".join(
        ["fresh"] * 35 + hw[:DECONTAM_NGRAM]  # long enough + one leaked 5-gram
    )
    novel_text = " ".join(f"novelword{i}" for i in range(40))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    rows = [
        (200001, long_doc),            # exact_dup
        (200002, "tiny doc"),          # too_short
        (200003, near_text),           # near_dup (sig differs, est high)
        (200004, contaminated_text),   # contaminated
        (200005, novel_text),          # admitted
    ]
    expected = {
        200001: "exact_dup",
        200002: "too_short",
        200003: "near_dup",
        200004: "contaminated",
        200005: None,
    }

    corp_fp = corpus.select(F.sha2("text", 256).alias("fp"))
    idx = minhash_band_index(spark, sf, hash_mode="xxhash64")
    split = corpus.select("doc_id", hash_split(F.col("doc_id")).alias("split"))
    holdout_sh = (
        shingle_hash_index(spark, sf, DECONTAM_NGRAM)
        .join(split.filter(F.col("split") != "train"), "doc_id")
        .select("h")
    )

    src = str(tmp_path / "curation_in")
    got = []

    def gate_batch(batch_df, batch_id):
        got.extend(
            curation_admission(
                batch_df, corp_fp, idx, holdout_sh, hash_mode="xxhash64"
            ).collect()
        )

    def run_stream():
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.foreachBatch(gate_batch)
            .option("checkpointLocation", f"{tmp_path}/ckpt_curation")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(rows[:3], schema).coalesce(1).write.mode(
        "append").parquet(src)
    run_stream()
    spark.createDataFrame(rows[3:], schema).coalesce(1).write.mode(
        "append").parquet(src)
    run_stream()

    streamed = {r.doc_id: r for r in got}
    assert streamed.keys() == expected.keys()
    for doc_id, want in expected.items():
        assert streamed[doc_id].reason == want, (doc_id, streamed[doc_id])
        assert streamed[doc_id].admitted == (want is None)

    twin = {
        r.doc_id: r.reason
        for r in curation_admission(
            spark.createDataFrame(rows, schema), corp_fp, idx, holdout_sh,
            hash_mode="xxhash64",
        ).collect()
    }
    assert twin == expected


def test_stream_curation_gate_index_evolution(spark, tmp_path):
    """The real ingestion loop: each batch's ADMITTED docs append
    their band rows to the corpus index before the next batch probes —
    a near-copy of a doc admitted in batch 1 must be rejected in batch
    2, which a static index would have admitted."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from hfcommunity_spark.operators.curation import curation_admission
    from hfcommunity_spark.operators.dedup import (
        _minhash_bands,
        minhash_band_index,
        minhash_signatures,
        shingle_hash_index,
    )
    from hfcommunity_spark.operators.sampling import hash_split

    sf = "/root/testdata/sf0.001"
    corpus = spark.read.parquet(f"{sf}/documents.parquet")
    corp_fp = corpus.select(F.sha2("text", 256).alias("fp"))
    split = corpus.select("doc_id", hash_split(F.col("doc_id")).alias("split"))
    holdout_sh = (
        shingle_hash_index(spark, sf, 5)
        .join(split.filter(F.col("split") != "train"), "doc_id")
        .select("h")
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    novel = " ".join(f"evolvetoken{i}" for i in range(45))
    near_copy = " ".join(
        novel.split(" ")[:-1] + ["evolvemutated"]
    )
    batch1 = spark.createDataFrame([(300001, novel)], schema)
    batch2 = spark.createDataFrame([(300002, near_copy)], schema)

    idx = minhash_band_index(spark, sf, hash_mode="xxhash64")

    # batch 1: novel doc admitted
    d1 = curation_admission(batch1, corp_fp, idx, holdout_sh).collect()
    assert d1[0].admitted and d1[0].reason is None

    # maintenance: admitted docs' bands append to the index (at scale:
    # an append to the bucket-partitioned index table)
    admitted_ids = [r.doc_id for r in d1 if r.admitted]
    admitted_docs = batch1.filter(F.col("doc_id").isin(admitted_ids))
    evolved = idx.unionByName(
        _minhash_bands(
            minhash_signatures(admitted_docs, hash_mode="xxhash64"),
            "xxhash64",
        )
    )

    # batch 2 vs STATIC index: the near-copy sails through (wrong)
    static = curation_admission(batch2, corp_fp, idx, holdout_sh).collect()
    assert static[0].admitted

    # batch 2 vs EVOLVED index: rejected as a near-dup of 300001
    d2 = curation_admission(batch2, corp_fp, evolved, holdout_sh).collect()
    assert not d2[0].admitted and d2[0].reason == "near_dup"


def test_streaming_anomaly_matches_batch_twin(spark, tmp_path):
    """X5/X6 + W3: the ring-buffer streaming anomaly monitor
    (applyInPandasWithState) replayed over two micro-batches in
    event order produces exactly the flags of its batch twin
    ``w_event_anomaly_zscore`` on the unioned data — one policy,
    two execution modes, like the curation gate pair."""
    from hfcommunity_spark.operators.relational_ext2 import (
        ANOM_LOOKBACK,
        w_event_anomaly_zscore,
    )
    from hfcommunity_spark.streaming.stateful import streaming_anomaly_zscore

    # one key, stable alternation with two spikes landing after the
    # frame fills; a second key stays entirely un-anomalous
    rows = []
    for i in range(30):
        val = 10.0 + (0.2 if i % 2 else 0.0)
        if i in (24, 28):
            val = 55.0
        rows.append((i, T0 + dt.timedelta(seconds=i), 1, "m", val, None))
    # a NULL-valued event mid-stream: both modes must exclude it from
    # scoring AND from the frame (round-5 review finding: a NaN killed
    # the streaming query while the batch path kept running)
    rows.append((50, T0 + dt.timedelta(seconds=25, milliseconds=500),
                 1, "m", None, None))
    for i in range(ANOM_LOOKBACK + 5):
        rows.append(
            (100 + i, T0 + dt.timedelta(seconds=i), 2, "q",
             5.0 + (0.4 if i % 2 else 0.0), None)
        )
    pdf = _events_pdf(rows)

    src = str(tmp_path / "in")
    split = 22
    out = _run_two_batches(
        spark,
        lambda: streaming_anomaly_zscore(jobs.read_event_stream(spark, src)),
        tmp_path,
        "t_anomaly",
        "append",
        src,
        pdf.iloc[:split],
        pdf.iloc[split:],
    ).toPandas()

    batch_dir = str(tmp_path / "batch")
    spark.createDataFrame(pdf, schema=jobs.EVENT_SCHEMA).write.parquet(
        f"{batch_dir}/events.parquet"
    )
    expected = w_event_anomaly_zscore(spark, batch_dir).toPandas()

    assert len(expected) > 0  # the spikes must actually flag
    got = out.sort_values("event_id").reset_index(drop=True)
    exp = expected.sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["z_rounded"].tolist() == exp["z_rounded"].tolist()


def test_stream_dsir_gate_micro_batches(spark, tmp_path):
    """X12: the DSIR admission gate runs per micro-batch through
    foreachBatch against the frozen corpus LM artifacts; the union of
    per-batch decisions must equal the batch twin on the same
    arrivals, and crafted arrivals hit both sides of the gate —
    target-like (words common in the 'val' split), raw-like, and
    all-OOV."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from hfcommunity_spark.operators.lm import dsir_gate, dsir_lr_frames

    sf = "/root/testdata/sf0.001"
    corpus = spark.read.parquet(f"{sf}/documents.parquet")
    _toks, lr, tot = dsir_lr_frames(corpus)
    lr_pdf = lr.toPandas().set_index("w")["lr_micro"]
    oov = tot.select("oov_micro").collect()[0][0]

    # most target-like and most raw-like vocabulary words
    best = " ".join(lr_pdf.sort_values(ascending=False).index[:10])
    worst = " ".join(lr_pdf.sort_values(ascending=True).index[:10])
    all_oov = " ".join(f"oovword{i}" for i in range(10))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    rows = [(300001, best), (300002, worst), (300003, all_oov)]

    src = str(tmp_path / "dsir_in")
    got = []

    def gate_batch(batch_df, batch_id):
        got.extend(dsir_gate(batch_df, lr, tot).collect())

    def run_stream():
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.foreachBatch(gate_batch)
            .option("checkpointLocation", f"{tmp_path}/ckpt_dsir")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(rows[:2], schema).coalesce(1).write.mode(
        "append").parquet(src)
    run_stream()
    spark.createDataFrame(rows[2:], schema).coalesce(1).write.mode(
        "append").parquet(src)
    run_stream()

    streamed = {r.doc_id: r for r in got}
    assert streamed.keys() == {300001, 300002, 300003}
    # the gate's sign IS the integer sum's sign
    exp_weights = {
        300001: sum(int(lr_pdf[w]) for w in best.split(" ")),
        300002: sum(int(lr_pdf[w]) for w in worst.split(" ")),
        300003: 10 * int(oov),
    }
    for doc_id, wm in exp_weights.items():
        r = streamed[doc_id]
        assert r.weight_micro == wm, (doc_id, r)
        assert r.admitted == (wm >= 0)
    assert streamed[300001].admitted  # top target words must pass
    assert not streamed[300002].admitted  # top raw words must fail

    twin = {
        r.doc_id: (r.weight_micro, r.admitted)
        for r in dsir_gate(
            spark.createDataFrame(rows, schema), lr, tot
        ).collect()
    }
    assert twin == {
        d: (wm, wm >= 0) for d, wm in exp_weights.items()
    }


def test_anomaly_zscore_constant_run_no_flags(spark, tmp_path):
    """Regression (found by the sf1.0 rehearsal): a constant run that
    fills the whole trailing frame has zero variance — both execution
    modes must skip the score rather than divide by zero, even when
    the next value differs wildly."""
    import datetime as dt

    from hfcommunity_spark.operators.relational_ext2 import (
        ANOM_LOOKBACK,
        w_event_anomaly_zscore,
    )
    from hfcommunity_spark.streaming.stateful import streaming_anomaly_zscore

    rows = [
        (i, T0 + dt.timedelta(seconds=i), 1, "const", 7.0, None)
        for i in range(ANOM_LOOKBACK + 5)
    ]
    rows.append((99, T0 + dt.timedelta(seconds=99), 1, "const", 9999.0, None))
    pdf = _events_pdf(rows)
    batch_dir = str(tmp_path / "const")
    spark.createDataFrame(pdf, schema=jobs.EVENT_SCHEMA).write.parquet(
        f"{batch_dir}/events.parquet"
    )
    assert w_event_anomaly_zscore(spark, batch_dir).count() == 0

    src = str(tmp_path / "const_in")
    out = _run_two_batches(
        spark,
        lambda: streaming_anomaly_zscore(jobs.read_event_stream(spark, src)),
        tmp_path,
        "t_anomaly_const",
        "append",
        src,
        pdf.iloc[:10],
        pdf.iloc[10:],
    )
    assert out.count() == 0


def test_stream_dsir_gate_lm_evolution(spark):
    """The DSIR ingestion loop's maintenance step: admitted documents
    enter the raw pool, so the LM rebuild must DAMP the very signal
    that admitted them — after ingesting many copies of a
    target-looking doc, the same doc scores strictly lower against
    the evolved log-ratio table (self-reinforcement control, the LM
    analog of the band-index evolution test above)."""
    import hashlib

    from pyspark.sql import types as T

    from hfcommunity_spark.operators.lm import dsir_gate, dsir_lr_frames
    from hfcommunity_spark.operators.sampling import SALT, TRAIN_UPPER

    sf = "/root/testdata/sf0.001"
    corpus = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    _toks, lr, tot = dsir_lr_frames(corpus)
    best_word = (
        lr.toPandas().sort_values("lr_micro", ascending=False)
        .iloc[0]["w"]
    )
    text = " ".join([best_word] * 30)

    # synthetic ingest ids that land in the 'train' hash split, so the
    # rebuilt LM counts them in the raw pool
    def in_train(d: int) -> bool:
        h = hashlib.sha256(f"{SALT}{d}".encode()).hexdigest()[:2]
        return h < TRAIN_UPPER

    ids = [d for d in range(400000, 401000) if in_train(d)][:20]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    probe = spark.createDataFrame([(ids[0], text)], schema)

    d1 = dsir_gate(probe, lr, tot).collect()[0]
    assert d1.admitted  # the most target-like word must pass

    ingested = spark.createDataFrame([(d, text) for d in ids], schema)
    _t2, lr2, tot2 = dsir_lr_frames(corpus.unionByName(ingested))
    d2 = dsir_gate(probe, lr2, tot2).collect()[0]
    assert d2.weight_micro < d1.weight_micro


def test_round_half_away_matches_spark_round(spark):
    """The streaming monitor's rounding must be bit-identical to
    Spark's ROUND(x, 4) (Scala BigDecimal over the shortest-decimal
    repr) — including exact .00005 boundaries and values whose
    float×10⁴ product crosses a representation boundary."""
    from pyspark.sql import functions as F

    from hfcommunity_spark.streaming.stateful import _round_half_away

    vals = [
        0.00005, -0.00005, 2.49995, -2.49995, 2.500049999,
        0.1 + 0.2, 1.0005, -1.0005, 3.00015, 0.12345,
        2.5, -2.5, 36.70005, 1e-9, -1e-9,
    ] + [i * 0.00005 for i in range(1, 50)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        "x", F.round("x", 4).alias("r")
    )
    for row in df.collect():
        assert _round_half_away(row.x) == row.r, row.x


def test_stream_source_hygiene_micro_batches(spark, tmp_path):
    """X13: the source-hygiene monitor runs per micro-batch through
    foreachBatch against a fixed corpus; a crafted delivery of docs
    duplicated against one corpus source must FLIP that source's
    verdict, while a unique-text delivery to another source must not.
    The per-batch decision for the full arriving slice must equal the
    declared batch twin."""
    from pyspark.sql import types as T

    from hfcommunity_spark.operators.dedup import (
        source_hygiene_before_after,
    )

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    # corpus: srcA has 10 clean docs; srcB has 10 clean docs.  Texts
    # are ≥5 tokens and globally unique within the corpus.
    corpus_rows = [
        (i, "srcA", f"alpha{i} beta{i} gamma{i} delta{i} eps{i} zeta{i}")
        for i in range(10)
    ] + [
        (100 + i, "srcB",
         f"kappa{i} lam{i} mu{i} nu{i} xi{i} omi{i}")
        for i in range(10)
    ]
    corpus = spark.createDataFrame(corpus_rows, schema)

    # delivery: 3 docs into srcA that DUPLICATE corpus doc 0's text
    # (every span becomes cross-doc shared -> doc 0 and the arrivals
    # all turn duplicative: 4/13 > 10%), plus 1 unique doc into srcB
    # (11 docs, 0 duplicative).
    dup_text = corpus_rows[0][2]
    arrivals = [
        (200, "srcA", dup_text),
        (201, "srcA", dup_text),
        (202, "srcA", dup_text),
        (300, "srcB", "rho1 sig1 tau1 ups1 phi1 chi1"),
    ]

    src_dir = str(tmp_path / "x13_in")
    got = []

    def gate_batch(batch_df, batch_id):
        got.append({
            r.source: r
            for r in source_hygiene_before_after(corpus, batch_df).collect()
        })

    spark.createDataFrame(arrivals, schema).coalesce(1).write.mode(
        "append").parquet(src_dir)
    q = (
        spark.readStream.schema(schema).parquet(src_dir)
        .writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", f"{tmp_path}/ckpt_x13")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    (batch,) = got
    a, b = batch["srcA"], batch["srcB"]
    assert a.old_keep and not a.new_keep and a.flipped
    assert a.old_n_docs == 10 and a.new_n_docs == 13
    assert a.old_duplicative == 0 and a.new_duplicative == 4
    assert b.old_keep and b.new_keep and not b.flipped
    assert b.new_n_docs == 11 and b.new_duplicative == 0

    # parity with the batch-twin form on the same arrivals
    twin = {
        r.source: r
        for r in source_hygiene_before_after(
            corpus, spark.createDataFrame(arrivals, schema)
        ).collect()
    }
    assert {s: tuple(r) for s, r in twin.items()} == {
        s: tuple(r) for s, r in batch.items()
    }


def test_stream_neardup_index_evolution(spark, tmp_path):
    """X10 + maintained index: accepted docs are ADMITTED into the
    band/pair index between micro-batches via minhash_band_delta, so a
    near-copy arriving later is flagged against the EVOLVED index even
    though the original corpus never saw either doc.  The static-index
    twin (the previous test) would wave the copy through — this is the
    difference between probing a snapshot and maintaining the index
    under ingest."""
    from pyspark.sql import types as T

    from hfcommunity_spark.operators.dedup import (
        minhash_band_delta,
        minhash_band_index,
        minhash_lsh_pairs_from_bands,
        neardup_gate,
    )

    sf = "/root/testdata/sf0.001"
    novel = ("completely novel words never seen in corpus "
             "alpha beta gamma delta epsilon zeta eta theta")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    src = str(tmp_path / "docs_in")

    state = {
        "bands": minhash_band_index(spark, sf, hash_mode="xxhash64"),
        "pairs": None,
        "verdicts": [],
    }
    state["pairs"] = minhash_lsh_pairs_from_bands(state["bands"])

    def gate_and_admit(batch_df, batch_id):
        batch_df = batch_df.localCheckpoint()
        verdicts = neardup_gate(
            batch_df, state["bands"], hash_mode="xxhash64"
        ).collect()
        state["verdicts"].extend(verdicts)
        clean_ids = [v.doc_id for v in verdicts if v.n_near_dups == 0]
        admitted = batch_df.filter(F.col("doc_id").isin(clean_ids))
        state["bands"], state["pairs"] = minhash_band_delta(
            state["bands"], state["pairs"], admitted
        )
        # pin the evolved index so the next batch probes materialized
        # state, not a growing lineage
        state["bands"] = state["bands"].localCheckpoint()
        state["pairs"] = state["pairs"].localCheckpoint()

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.foreachBatch(gate_and_admit)
            .option("checkpointLocation", f"{tmp_path}/ckpt_evo")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch([(200001, novel)])          # novel → admitted
    run_batch([(200002, novel)])          # near-copy of an ADMITTED doc

    verdicts = {v.doc_id: v for v in state["verdicts"]}
    assert verdicts[200001].n_near_dups == 0      # clean on arrival
    assert verdicts[200002].n_near_dups >= 1      # caught by evolution
    assert verdicts[200002].max_est_similarity == 1.0
    # the static twin misses it: the original index never saw 200001
    static = neardup_gate(
        spark.createDataFrame([(200002, novel)], schema),
        minhash_band_index(spark, sf, hash_mode="xxhash64"),
        hash_mode="xxhash64",
    ).collect()
    assert static[0].n_near_dups == 0
    # and the maintained pair index recorded the admitted duplicate
    # pair-free state (only 200001 was admitted; 200002 was flagged,
    # never admitted, so no (200001, 200002) pair exists)
    touching = state["pairs"].filter(
        (F.col("doc_a") >= 200000) | (F.col("doc_b") >= 200000)
    ).count()
    assert touching == 0


def test_stream_incremental_cluster_maintenance(spark, tmp_path):
    """The maintained dedup pipeline under REAL micro-batches: each
    foreachBatch delivery flows band delta -> pair delta ->
    components_delta, and after two batches the maintained cluster
    assignment equals the from-scratch build (bands -> thresholded
    pairs -> CC) over corpus + both batches.  This is the ingestion
    mode that CLUSTERS arrivals instead of gating them — a crawl drop
    lands, its near-dup edges fold into the standing assignment, and
    no step re-reads history."""
    from pyspark.sql import types as T

    from hfcommunity_spark.operators.dedup import (
        _minhash_bands,
        minhash_band_delta,
        minhash_band_index,
        minhash_lsh_pairs_from_bands,
        minhash_signatures,
    )
    from hfcommunity_spark.operators.graph import (
        components_delta,
        connected_components,
    )

    sf = "/root/testdata/sf0.001"
    corpus = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    copy_text = corpus.orderBy("doc_id").limit(1).collect()[0].text
    novel = ("entirely fresh ingest words quark meson boson lepton "
             "hadron gluon photon neutrino")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    src = str(tmp_path / "docs_in")
    T_SIM = 0.5

    def edges_of(pairs):
        return pairs.filter(F.col("est_similarity") >= T_SIM).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )

    state = {"bands": minhash_band_index(spark, sf, hash_mode="xxhash64")}
    state["pairs"] = minhash_lsh_pairs_from_bands(state["bands"])
    state["assign"] = connected_components(edges_of(state["pairs"]))

    def ingest(batch_df, batch_id):
        batch_df = batch_df.localCheckpoint()
        bands, merged = minhash_band_delta(
            state["bands"], state["pairs"], batch_df
        )
        delta = merged.exceptAll(state["pairs"])
        state["assign"] = components_delta(
            state["assign"], edges_of(delta)
        ).localCheckpoint()
        state["bands"] = bands.localCheckpoint()
        state["pairs"] = merged.localCheckpoint()

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", f"{tmp_path}/ckpt_cluster")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch([(300001, novel)])
    run_batch([(300002, copy_text), (300003, novel)])

    got = {(r.vertex, r.component) for r in state["assign"].collect()}
    world = corpus.unionByName(
        spark.createDataFrame(
            [(300001, novel), (300002, copy_text), (300003, novel)], schema
        )
    )
    want = {
        (r.vertex, r.component)
        for r in connected_components(
            edges_of(
                minhash_lsh_pairs_from_bands(
                    _minhash_bands(minhash_signatures(world), "xxhash64")
                )
            )
        ).collect()
    }
    assert got == want and len(got) > 0
    comp_of = dict(got)
    # the copy clusters with its corpus original; the two novel docs
    # cluster with each other under the min-id label
    assert comp_of[300002] < 300000
    assert comp_of[300003] == 300001
