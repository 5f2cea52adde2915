"""repo_full / parity views on a built snapshot, and the streaming
merge sink maintaining a PK-unique snapshot across micro-batches."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from hfcommunity_spark.streaming import jobs
from hfcommunity_spark.streaming.sink import BUCKET_COL, SnapshotMergeSink
from hfcommunity_spark.views import mariadb_parity, repo_full, tags_agg

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _mini_tables(spark):
    repository = spark.createDataFrame(
        [("models/a/m", "a/m", "model", "a", True, False),
         ("datasets/a/d", "a/d", "dataset", "a", False, False)],
        ["id", "name", "type", "author", "private", "disabled"],
    )
    model = spark.createDataFrame(
        [("models/a/m", "text-generation", 10, "transformers", 5, "cfg")],
        ["model_id", "pipeline_tag", "downloads", "library_name", "likes", "config"],
    )
    dataset = spark.createDataFrame(
        [("datasets/a/d", "desc", "cit", "pwc", 3)],
        ["dataset_id", "description", "citation", "paperswithcode_id", "downloads"],
    )
    space = spark.createDataFrame(
        [("spaces/zz/unused", "gradio", "RUNNING", "cpu", "cpu", 1, "small", "{}")],
        ["space_id", "sdk", "stage", "hardware", "requested_hw",
         "sleep_time", "storage", "runtime_raw"],
    ).filter(F.col("space_id").isNull())  # empty frame with a real schema
    tags_in_repo = spark.createDataFrame(
        [("nlp", "models/a/m"), ("bert", "models/a/m")], ["tag_name", "repo_id"]
    )
    return {"repository": repository, "model": model, "dataset": dataset,
            "space": space, "tags_in_repo": tags_in_repo}


def test_repo_full_flattens_inheritance(spark):
    t = _mini_tables(spark)
    out = {r.id: r for r in repo_full(t).collect()}
    assert len(out) == 2
    m = out["models/a/m"]
    assert m.model_pipeline_tag == "text-generation"
    assert m.dataset_description is None  # other subtype columns null
    d = out["datasets/a/d"]
    assert d.dataset_paperswithcode_id == "pwc"
    assert d.model_downloads is None


def test_mariadb_parity_casts_flags(spark):
    t = _mini_tables(spark)
    out = mariadb_parity("repository", t["repository"])
    row = out.filter(F.col("id") == "models/a/m").collect()[0]
    assert row.private == 1 and isinstance(row.private, int)


def test_tags_agg_sorted_array(spark):
    t = _mini_tables(spark)
    row = tags_agg(t).collect()[0]
    assert row.tags == ["bert", "nlp"]


def test_streaming_merge_sink_first_writer_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    snap = str(tmp_path / "snapshot")
    b1 = pd.DataFrame(
        [(1, T0, 1, "click", 1.0, None)],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    # batch 2 replays event 1 with a different value + adds event 2
    b2 = pd.DataFrame(
        [(1, T0 + dt.timedelta(minutes=1), 1, "click", 99.0, None),
         (2, T0 + dt.timedelta(minutes=2), 1, "view", 2.0, None)],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    sink = SnapshotMergeSink(snap, pk=["event_id"], order_by=["ts"])

    spark.createDataFrame(b1, schema=jobs.EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = sink.attach(jobs.read_event_stream(spark, src), f"{tmp_path}/ckpt")
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema=jobs.EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    final = spark.read.parquet(snap).toPandas().sort_values("event_id")
    assert final.event_id.tolist() == [1, 2]
    # first writer won: the replayed value 99.0 did not overwrite
    assert final[final.event_id == 1].value.tolist() == [1.0]


def test_sink_corrupt_snapshot_propagates_not_overwrites(spark, tmp_path):
    """ADVICE r4: a snapshot that EXISTS but fails to read must raise
    (so the micro-batch retries) — the old bare-except treated any read
    failure as 'no snapshot yet' and the dirty-bucket overwrite then
    silently dropped previously-sunk rows.  Only true absence may
    bootstrap."""
    import os

    import pytest

    snap = str(tmp_path / "snapshot")
    os.makedirs(snap)
    with open(os.path.join(snap, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet footer")
    sink = SnapshotMergeSink(
        snap, pk=["event_id"], order_by=["ts"], n_buckets=4
    )
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(1, T0, 1, "click", 1.0, None)],
            columns=["event_id", "ts", "user_id", "event_type",
                     "value", "props"],
        ),
        schema=jobs.EVENT_SCHEMA,
    )
    with pytest.raises(Exception, match="(?i)parquet|footer|read"):
        sink.process_batch(batch, 0)
    # the broken snapshot was not clobbered by an unmerged overwrite
    with open(os.path.join(snap, "part-00000.parquet"), "rb") as f:
        assert f.read() == b"this is not a parquet footer"


def test_bucketed_sink_rewrites_only_dirty_partitions(spark, tmp_path):
    """n_buckets mode: a micro-batch touching one pk_bucket must leave
    every other partition's files byte-identical (same paths, sizes,
    mtimes) while keeping D1 first-writer semantics."""
    import os

    snap = str(tmp_path / "snapshot")
    n_buckets = 8
    sink = SnapshotMergeSink(
        snap, pk=["event_id"], order_by=["ts"], n_buckets=n_buckets
    )

    # bucket assignment used by the sink: pmod(xxhash64(event_id), 8)
    ids = list(range(1, 41))
    bucket_of = {
        r.event_id: r.b
        for r in spark.createDataFrame(
            [(i,) for i in ids], ["event_id"]
        ).select(
            "event_id",
            F.pmod(F.xxhash64("event_id"), F.lit(n_buckets))
            .cast("int").alias("b"),
        ).collect()
    }
    assert len(set(bucket_of.values())) > 2  # ids spread over buckets

    def frame(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                rows,
                columns=["event_id", "ts", "user_id", "event_type",
                         "value", "props"],
            ),
            schema=jobs.EVENT_SCHEMA,
        )

    sink.process_batch(
        frame([(i, T0, 1, "click", float(i), None) for i in ids]), 0
    )

    def file_state():
        state = {}
        for root, _dirs, files in os.walk(snap):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    state[p] = (st.st_size, st.st_mtime_ns)
        return state

    before = file_state()
    assert before, "first batch wrote no parquet files"

    # batch 2: replay id=ids[0] with a new value + insert one new id
    # from the SAME bucket, so exactly one partition is dirty
    target_bucket = bucket_of[ids[0]]
    new_id = next(
        i for i in range(100, 400)
        if spark.createDataFrame([(i,)], ["event_id"]).select(
            F.pmod(F.xxhash64("event_id"), F.lit(n_buckets)).cast("int")
        ).collect()[0][0] == target_bucket and i not in ids
    )
    sink.process_batch(
        frame([
            (ids[0], T0 + dt.timedelta(minutes=1), 1, "click", 999.0, None),
            (new_id, T0 + dt.timedelta(minutes=2), 2, "view", 7.0, None),
        ]),
        1,
    )

    after = file_state()
    dirty_dir = f"{BUCKET_COL}={target_bucket}"
    untouched_before = {p: v for p, v in before.items()
                       if dirty_dir not in p}
    untouched_after = {p: v for p, v in after.items() if dirty_dir not in p}
    assert untouched_before == untouched_after, (
        "clean partitions were rewritten"
    )
    assert any(dirty_dir in p for p in after), "dirty partition missing"

    final = sink.read(spark).toPandas().sort_values("event_id")
    assert final.event_id.tolist() == sorted(ids + [new_id])
    # D1: the replay did not overwrite the first write
    assert final[final.event_id == ids[0]].value.tolist() == [float(ids[0])]
    assert final[final.event_id == new_id].value.tolist() == [7.0]


def test_bucketed_sink_through_streaming_attach(spark, tmp_path):
    """The n_buckets sink behind a real foreachBatch stream: replays
    across micro-batches keep D1 semantics and the snapshot stays
    PK-unique with the bucket column hidden by read()."""
    src = str(tmp_path / "in")
    snap = str(tmp_path / "snapshot")
    sink = SnapshotMergeSink(
        snap, pk=["event_id"], order_by=["ts"], n_buckets=4
    )
    b1 = pd.DataFrame(
        [(1, T0, 1, "click", 1.0, None)],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    b2 = pd.DataFrame(
        [(1, T0 + dt.timedelta(minutes=1), 1, "click", 99.0, None),
         (2, T0 + dt.timedelta(minutes=2), 1, "view", 2.0, None)],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    spark.createDataFrame(b1, schema=jobs.EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = sink.attach(jobs.read_event_stream(spark, src), f"{tmp_path}/ckpt")
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema=jobs.EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    final = sink.read(spark).toPandas().sort_values("event_id")
    assert final.event_id.tolist() == [1, 2]
    assert BUCKET_COL not in final.columns
    assert final[final.event_id == 1].value.tolist() == [1.0]


def test_sink_bootstraps_over_crashed_first_write(spark, tmp_path):
    """Round-5 review: a directory left behind by a CRASHED first write
    (only _temporary leftovers, no committed data file) is true absence
    — the sink must bootstrap instead of failing schema inference on
    every retry forever."""
    import os

    snap = str(tmp_path / "snapshot")
    os.makedirs(os.path.join(snap, "_temporary", "0"))
    with open(os.path.join(snap, "_temporary", "0",
                           "part-00000.parquet"), "wb") as f:
        f.write(b"uncommitted leftover")
    sink = SnapshotMergeSink(
        snap, pk=["event_id"], order_by=["ts"], n_buckets=4
    )
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(1, T0, 1, "click", 1.0, None)],
            columns=["event_id", "ts", "user_id", "event_type",
                     "value", "props"],
        ),
        schema=jobs.EVENT_SCHEMA,
    )
    sink.process_batch(batch, 0)
    assert sink.read(spark).count() == 1


def test_write_epoch_shards_roundtrip(spark, tmp_path):
    """The final-mile writer: one parquet dir partitioned by shard,
    rows per shard readable back in training order (pos), text joined
    on, and the full selection present exactly once."""
    from hfcommunity_spark.io import read_table, write_epoch_shards
    from hfcommunity_spark.operators.curation import (
        pipe_curate_select_pack_shard,
    )
    from tests.conftest import SF_ORACLE

    export = pipe_curate_select_pack_shard(spark, SF_ORACLE)
    docs = read_table(spark, SF_ORACLE, "documents")
    out = write_epoch_shards(export, docs, str(tmp_path / "epoch0"))

    back = spark.read.parquet(out)
    exp = {(r.doc_id, r.shard, r.pos) for r in export.collect()}
    got = [(r.doc_id, int(r.shard), r.pos, r.text is not None)
           for r in back.collect()]
    assert {(d, s, p) for d, s, p, _ in got} == exp
    assert all(has_text for *_ignored, has_text in got)
    # partition dirs exist per shard present in the manifest
    import os

    shards = {s for _, s, _, _ in got}
    for s in shards:
        assert os.path.isdir(os.path.join(out, f"shard={s}"))


def test_export_formats_roundtrip(spark, tmp_path):
    """S15 closed end to end: the same frame exports to parquet, ORC,
    JSON, and CSV and reads back value-identical (explicit schema for
    the row formats — inference is not trusted)."""
    from hfcommunity_spark.io import export_table, read_export, read_table
    from tests.conftest import SF_ORACLE

    df = read_table(spark, SF_ORACLE, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    want = sorted(tuple(r) for r in df.collect())
    for fmt, opts in [("parquet", {}), ("orc", {}),
                      ("json", {}), ("csv", {"header": "true"})]:
        out = export_table(df, str(tmp_path / fmt), fmt, **opts)
        back = read_export(spark, out, fmt, schema=df.schema, **opts)
        assert sorted(tuple(r) for r in back.collect()) == want, fmt

    import pytest

    with pytest.raises(ValueError):
        export_table(df, str(tmp_path / "x"), "avro")


def test_write_jdbc_contract_without_driver(spark, monkeypatch):
    """S12 driver-less contract (VERDICT r9 ask #4): no JDBC driver
    ships in this container (COVERAGE.md records the env block), so
    lock write_jdbc's mode/options/url/table mapping by intercepting
    the three DataFrameWriter seams it composes — exactly what a real
    driver would receive.  Reference parity: the reference's sink is a
    MariaDB connection + per-table INSERT loops
    (extractor/databaseImport.py:117-147, :276-806); here one
    write_jdbc call per schema.py table replaces that loop."""
    from pyspark.sql.readwriter import DataFrameWriter

    from hfcommunity_spark.io import read_table, write_jdbc
    from tests.conftest import SF_ORACLE

    calls = {}
    orig_mode, orig_options = DataFrameWriter.mode, DataFrameWriter.options

    def rec_mode(self, saveMode):
        calls["mode"] = saveMode
        return orig_mode(self, saveMode)  # keeps Spark's validation

    def rec_options(self, **opts):
        calls.setdefault("options", {}).update(opts)
        return orig_options(self, **opts)

    def fake_jdbc(self, url, table, mode=None, properties=None):
        calls["url"], calls["table"] = url, table
        calls["jdbc_called"] = True

    monkeypatch.setattr(DataFrameWriter, "mode", rec_mode)
    monkeypatch.setattr(DataFrameWriter, "options", rec_options)
    monkeypatch.setattr(DataFrameWriter, "jdbc", fake_jdbc)
    df = read_table(spark, SF_ORACLE, "nation")
    write_jdbc(
        df, "jdbc:mysql://db:3306/hfc", "hf_model",
        mode="append", batchsize="500",
        isolationLevel="READ_COMMITTED",
    )
    assert calls["jdbc_called"]
    assert calls["url"] == "jdbc:mysql://db:3306/hfc"
    assert calls["table"] == "hf_model"
    assert calls["mode"] == "append"
    assert calls["options"] == {
        "batchsize": "500", "isolationLevel": "READ_COMMITTED",
    }
    # an invalid save mode must fail eagerly (Spark's own validation,
    # reached through our .mode() composition), not at the DB
    import pytest

    with pytest.raises(Exception):
        write_jdbc(df, "jdbc:mysql://db:3306/hfc", "t", mode="bogus")
