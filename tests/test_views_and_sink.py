"""repo_full / parity views on a built snapshot, and the streaming
merge sink maintaining a PK-unique snapshot across micro-batches."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from hfcommunity_spark.streaming import jobs
from hfcommunity_spark.streaming.sink import SnapshotMergeSink
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
