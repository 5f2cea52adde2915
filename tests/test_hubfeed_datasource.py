"""The `hubfeed` Python Data Source: registration, schema-typed reads,
source-side limit, filter pushdown parity with the plain JSON reader."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from hfcommunity_spark.sources.hubfeed_datasource import HubFeedDataSource
from tests.test_hub_feeds import MODELS


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("hubfeed")
    rows = list(MODELS) + [
        {**MODELS[0], "name": "org/m9", "author": "other", "likes": 42}
    ]
    with open(d / "models.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(HubFeedDataSource)
    return str(d)


def _load(spark, feed_dir, **opts):
    r = spark.read.format("hubfeed").option("path", feed_dir).option(
        "kind", "models"
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_reads_typed_rows(spark, feed_dir):
    df = _load(spark, feed_dir)
    rows = {r.name: r for r in df.collect()}
    assert set(rows) == {"org/m1", "org/m9"}
    m1 = rows["org/m1"]
    assert m1.last_modified is not None  # timestamp parsed
    assert m1.siblings[1].lfs.size == 999  # nested struct/array typed
    assert m1.tags == ["nlp"]


def test_source_side_limit(spark, feed_dir):
    assert _load(spark, feed_dir, limit=1).count() == 1


def test_filter_pushdown_matches_post_filter(spark, feed_dir):
    pushed = _load(spark, feed_dir).filter(F.col("author") == "other")
    assert [r.name for r in pushed.collect()] == ["org/m9"]


def test_pushed_filters_compare_in_column_type(spark, feed_dir):
    """Round-6 review finding: a pushed EqualTo used to compare the
    COLUMN's typed literal against the RAW JSON value, so equality on
    a timestamp (literal vs ISO string) or an int-typed literal vs
    JSON number silently dropped every matching row.  Both must match
    the plain JSON reader's answer."""
    df = _load(spark, feed_dir)
    ts = df.filter(F.col("name") == "org/m1").collect()[0].last_modified
    by_ts = df.filter(F.col("last_modified") == F.lit(ts))
    assert {r.name for r in by_ts.collect()} >= {"org/m1"}
    by_likes = df.filter(F.col("likes") == 42)
    assert [r.name for r in by_likes.collect()] == ["org/m9"]
    # malformed shapes null out instead of crashing (P11 parity):
    # a non-list for an array column and a non-dict for a struct
    from hfcommunity_spark.sources.hubfeed_datasource import _convert
    from pyspark.sql import types as T

    arr = T.ArrayType(T.StringType())
    assert _convert(False, arr) is None
    assert _convert("README.md", arr) is None
    st = T.StructType([T.StructField("a", T.LongType())])
    assert _convert("oops", st) is None


def test_unknown_kind_rejected(spark, feed_dir):
    with pytest.raises(Exception, match="unknown kind"):
        spark.read.format("hubfeed").option("path", feed_dir).option(
            "kind", "bogus"
        ).load().count()


def test_streaming_picks_up_new_files(spark, tmp_path):
    """simpleStreamReader: batch 1 sees the first dump file, batch 2
    only the newly arrived one (file-set offsets, no re-emission)."""
    d = tmp_path / "stream"
    feed = d / "models.jsonl"
    feed.mkdir(parents=True)
    spark.dataSource.register(HubFeedDataSource)

    def dump(name, rows):
        with open(feed / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    dump("2024-01.jsonl", list(MODELS))
    stream = (
        spark.readStream.format("hubfeed")
        .option("path", str(d))
        .option("kind", "models")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_hubfeed_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.table("t_hubfeed_stream").count()
        assert n1 == len(MODELS)
        dump("2024-02.jsonl", [
            {**MODELS[0], "name": "org/m-late", "author": "late"}
        ])
        q.processAllAvailable()
        got = spark.table("t_hubfeed_stream")
        assert got.count() == len(MODELS) + 1  # no re-emission of file 1
        assert got.filter(F.col("name") == "org/m-late").count() == 1
    finally:
        q.stop()


def test_stream_writer_two_phase_commit(spark, tmp_path):
    """Custom streaming sink: micro-batches land as committed JSONL
    parts + per-batch manifests; no _tmp leftovers; the written feed
    round-trips through the batch reader."""
    import os

    src = tmp_path / "wsrc" / "models.jsonl"
    src.mkdir(parents=True)
    out = tmp_path / "wout"
    out.mkdir()
    spark.dataSource.register(HubFeedDataSource)

    with open(src / "a.jsonl", "w") as f:
        for r in MODELS:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.format("hubfeed")
        .option("path", str(tmp_path / "wsrc"))
        .option("kind", "models")
        .load()
    )
    q = (
        stream.writeStream.format("hubfeed")
        .option("path", str(out))
        .option("kind", "models")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        with open(src / "b.jsonl", "w") as f:
            f.write(json.dumps({**MODELS[0], "name": "org/m-w2"}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()

    names = sorted(os.listdir(out))
    manifests = [n for n in names if n.startswith("_batch-")]
    parts = [n for n in names if n.endswith(".jsonl")]
    assert len(manifests) >= 2 and parts
    assert not os.listdir(out / "_tmp")  # two-phase: nothing uncommitted
    total = sum(
        p["rows"]
        for m in manifests
        for p in json.load(open(out / m))["parts"]
    )
    assert total == len(MODELS) + 1
    # round-trip: the sink's output is itself a readable JSONL dump
    import glob
    rows = []
    for p in glob.glob(str(out / "*.jsonl")):
        with open(p) as fh:
            rows += [json.loads(l) for l in fh if l.strip()]
    assert {r["name"] for r in rows} >= {m["name"] for m in MODELS} | {"org/m-w2"}


def test_writer_parts_gated_by_manifest(tmp_path):
    """Round-6 review finding, locked: a writer-produced part file is
    visible to the streaming reader ONLY once its batch manifest
    exists — a crash between part-publish and manifest-write exposes
    nothing — while hand-written feed files remain directly visible
    and a torn (truncated) manifest hides its parts instead of
    crashing discovery."""
    import json as _json
    import os

    from hfcommunity_spark.sources.hubfeed_datasource import (
        HubFeedSimpleStreamReader,
        _feed_schemas,
    )

    d = tmp_path / "models.jsonl"
    d.mkdir()
    (d / "hand-written.jsonl").write_text("{}\n")
    (d / "models-000000-0.jsonl").write_text("{}\n")  # no manifest yet
    r = HubFeedSimpleStreamReader(
        _feed_schemas()["models"], {"path": str(tmp_path), "kind": "models"}
    )
    assert r._discover() == ["hand-written.jsonl"]

    (d / "_batch-000000.json").write_text(_json.dumps(
        {"batchId": 0, "parts": [{"path": "models-000000-0.jsonl",
                                  "rows": 1}]}
    ))
    assert r._discover() == ["hand-written.jsonl", "models-000000-0.jsonl"]

    (d / "models-000001-0.jsonl").write_text("{}\n")
    (d / "_batch-000001.json").write_text("{\"batchId\": 1,")  # torn
    assert r._discover() == ["hand-written.jsonl", "models-000000-0.jsonl"]


def test_replay_skip_requires_manifest_supersession(tmp_path):
    """ADVICE r8, locked: a checkpointed part missing from disk is
    skipped ONLY when its batch's live manifest no longer lists it
    (the retried-batch supersession the r7 fix targeted).  Every other
    cause of a missing file — manual deletion, partial restore, a
    still-claimed part, an absent manifest — must raise, not silently
    drop records behind a RuntimeWarning."""
    import json as _json

    import pytest as _pytest

    from hfcommunity_spark.sources.hubfeed_datasource import (
        HubFeedSimpleStreamReader,
        _feed_schemas,
    )

    d = tmp_path / "models.jsonl"
    d.mkdir()
    row = _json.dumps({"name": "org/m1"}) + "\n"
    (d / "models-000000-0.jsonl").write_text(row)
    (d / "_batch-000000.json").write_text(_json.dumps(
        {"batchId": 0,
         "parts": [{"path": "models-000000-0.jsonl", "rows": 1}]}
    ))
    r = HubFeedSimpleStreamReader(
        _feed_schemas()["models"], {"path": str(tmp_path), "kind": "models"}
    )

    # legit supersession: the offset references a stray second part the
    # retried batch's manifest no longer lists → warn + skip, rows of
    # the surviving part still come through
    with _pytest.warns(RuntimeWarning, match="superseded"):
        rows = list(r._rows(
            ["models-000000-0.jsonl", "models-000000-1.jsonl"]
        ))
    assert len(rows) == 1

    # the live manifest still CLAIMS the missing part → loud error
    (d / "_batch-000001.json").write_text(_json.dumps(
        {"batchId": 1,
         "parts": [{"path": "models-000001-0.jsonl", "rows": 1}]}
    ))
    with _pytest.raises(FileNotFoundError, match="still claims"):
        list(r._rows(["models-000001-0.jsonl"]))

    # no manifest at all for the part's batch → loud error
    with _pytest.raises(FileNotFoundError):
        list(r._rows(["models-000002-0.jsonl"]))

    # a hand-written (non-writer-part) file gone missing → loud error
    with _pytest.raises(FileNotFoundError):
        list(r._rows(["2024-01.jsonl"]))
