"""ETL-semantics tests on HFC-shaped fixtures (FIXTURES.md family 2):
the behaviors TPC-H can't reach — byte-exact surrogate keys, gated
normalization, event dispatch, LFS branch, oversize guard, merge-commit
validation, watermark split."""

from __future__ import annotations

import datetime as dt
import hashlib

import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F

from hfcommunity_spark.etl.incremental import (
    incremental_repository_load,
    split_by_watermark,
)
from hfcommunity_spark.etl.normalize import (
    OVERSIZE_DIFF_SENTINEL,
    conflicting_files_rows,
    dispatch_discussion_events,
    explode_tags,
    guard_oversize_diff,
    modified_file_path,
    normalize_gated,
    normalize_repo_files,
    repo_full_id,
    surrogate_key,
    validate_merge_commits,
)
from hfcommunity_spark.schema import SCHEMAS, FOREIGN_KEYS, fk_violations


def test_surrogate_key_matches_reference_hash(spark):
    """sha256(repo_id + '_' + filename) byte parity with the Python at
    databaseImport.py:309."""
    df = spark.createDataFrame(
        [("models/org/repo", "data/train.parquet"), ("datasets/a/b", "x.txt")],
        ["repo_id", "filename"],
    )
    got = df.select(surrogate_key("repo_id", "filename").alias("id")).collect()
    for row, (rid, fn) in zip(
        got, [("models/org/repo", "data/train.parquet"), ("datasets/a/b", "x.txt")]
    ):
        assert row.id == hashlib.sha256(f"{rid}_{fn}".encode()).hexdigest()


def test_surrogate_key_null_part_propagates(spark):
    """A NULL key part must yield a NULL key (the reference would raise
    on str + None) — never a silently-collapsed digest."""
    df = spark.createDataFrame(
        [("models/org/repo", None)],
        schema="repo_id string, filename string",
    )
    got = df.select(surrogate_key("repo_id", "filename").alias("id")).collect()
    assert got[0].id is None


def test_path_basename_matches_pydriller_filename(spark):
    """element_at(split(path,'/'),-1) == Path(path).name for the shapes
    git emits — the component hashed into modified_file_id (:419)."""
    from hfcommunity_spark.etl.normalize import path_basename

    df = spark.createDataFrame(
        [("data/train/part-0.parquet",), ("README.md",), ("a/b/c",)],
        ["p"],
    )
    got = [r.b for r in df.select(path_basename("p").alias("b")).collect()]
    assert got == ["part-0.parquet", "README.md", "c"]


def test_repo_full_id_pluralization(spark):
    df = spark.createDataFrame(
        [("model", "org/m"), ("dataset", "org/d"), ("space", "org/s")],
        ["type", "name"],
    )
    got = [r.id for r in df.select(repo_full_id("type", "name").alias("id")).collect()]
    assert got == ["models/org/m", "datasets/org/d", "spaces/org/s"]


def test_normalize_gated_tristate(spark):
    df = spark.createDataFrame(
        [("True",), ("False",), ("manual",), ("auto",), (None,)], ["gated"]
    )
    got = [r.g for r in df.select(normalize_gated("gated").alias("g")).collect()]
    assert got == ["True", "False", None, None, None]


def test_modified_file_path_delete_keyed_by_old_path(spark):
    df = spark.createDataFrame(
        [("DELETE", "old.py", None), ("MODIFY", "old.py", "new.py"),
         ("ADD", None, "added.py")],
        ["change_type", "old_path", "new_path"],
    )
    got = [
        r.p
        for r in df.select(
            modified_file_path("change_type", "old_path", "new_path").alias("p")
        ).collect()
    ]
    assert got == ["old.py", "new.py", "added.py"]


def test_guard_oversize_diff(spark):
    big = "x" * 2048
    df = spark.createDataFrame([(big,), ("small",)], ["diff"])
    got = [
        r.d
        for r in df.select(guard_oversize_diff("diff", limit=1024).alias("d")).collect()
    ]
    assert got == [OVERSIZE_DIFF_SENTINEL, "small"]


def test_explode_tags_insert_ignore_dedup(spark):
    repos = spark.createDataFrame(
        [("models/a/m1", ["nlp", "bert", "nlp"]), ("models/a/m2", ["nlp"]),
         ("models/a/m3", None)],
        ["id", "tags"],
    )
    tag, tir = explode_tags(repos)
    assert sorted(r.name for r in tag.collect()) == ["bert", "nlp"]
    pairs = sorted((r.tag_name, r.repo_id) for r in tir.collect())
    assert pairs == [
        ("bert", "models/a/m1"), ("nlp", "models/a/m1"), ("nlp", "models/a/m2")
    ]


def test_normalize_repo_files_lfs_branch(spark):
    rows = [
        Row(repo_id="models/a/m", filename="model.bin", size=10, blob_id="b1",
            lfs=Row(size=999, pointer_size=134, sha="abc")),
        Row(repo_id="models/a/m", filename="README.md", size=5, blob_id="b2",
            lfs=None),
    ]
    out = normalize_repo_files(spark.createDataFrame(rows)).collect()
    by_name = {r.filename: r for r in out}
    assert by_name["model.bin"].lfs_size == 999
    assert by_name["README.md"].lfs_size is None
    assert by_name["model.bin"].id == hashlib.sha256(
        b"models/a/m_model.bin"
    ).hexdigest()


def test_dispatch_discussion_events(spark):
    base = dict(repo_id="models/a/m", discussion_num=1,
                created_at=dt.datetime(2024, 1, 1), author="u",
                full_data="{}")
    raw = spark.createDataFrame(
        [
            Row(id="e1", event_type="comment", content="hi", edited=0, hidden=1,
                new_status="SHOULD_NULL", summary=None, sha=None,
                old_title=None, new_title=None, **base),
            Row(id="e2", event_type="status-change", content="SHOULD_NULL",
                edited=None, hidden=None, new_status="closed", summary=None,
                sha=None, old_title=None, new_title=None, **base),
            Row(id="e3", event_type="commit", content=None, edited=None,
                hidden=None, new_status=None, summary="msg", sha="c" * 40,
                old_title=None, new_title=None, **base),
            Row(id="e4", event_type="title-change", content=None, edited=None,
                hidden=None, new_status=None, summary=None, sha=None,
                old_title="t0", new_title="t1", **base),
        ]
    )
    out = {r.id: r for r in dispatch_discussion_events(raw).collect()}
    assert out["e1"].content == "hi" and out["e1"].hidden is True
    assert out["e1"].new_status is None  # cross-type payload nulled
    assert out["e2"].new_status == "closed" and out["e2"].content is None
    assert out["e3"].summary == "msg" and out["e3"].sha == "c" * 40
    assert out["e4"].old_title == "t0" and out["e4"].new_title == "t1"


def test_validate_merge_commits_semi_join(spark):
    disc = spark.createDataFrame(
        [(1, "models/a/m", "known"), (2, "models/a/m", "unknown"),
         (3, "models/a/m", None)],
        ["num", "repo_id", "merge_commit_oid"],
    )
    commits = spark.createDataFrame([("known",)], ["sha"])
    out = {r.num: r.merge_commit_oid
           for r in validate_merge_commits(disc, commits).collect()}
    assert out == {1: "known", 2: None, 3: None}


def test_conflicting_files_deterministic_ids(spark):
    disc = spark.createDataFrame(
        [(1, "models/a/m", ["b.py", "a.py"]), (2, "models/a/m", None)],
        ["num", "repo_id", "conflicting_files"],
    )
    out = conflicting_files_rows(disc).collect()
    assert [r.id for r in out] == [1, 2]
    assert [r.filename for r in out] == ["a.py", "b.py"]  # total order
    assert out[0].repo_file_id == hashlib.sha256(b"models/a/m_a.py").hexdigest()


def test_watermark_split_and_incremental_load(spark):
    wm = F.lit("2024-01-01").cast("timestamp")
    existing = spark.createDataFrame(
        [("models/a/m1", "m1", dt.datetime(2023, 6, 1), 10),
         ("models/a/m2", "m2", dt.datetime(2023, 7, 1), 20)],
        ["id", "name", "last_modified", "likes"],
    )
    incoming = spark.createDataFrame(
        [  # fresh: new repo + updated repo; stale: likes-only refresh
            ("models/a/m3", "m3", dt.datetime(2024, 2, 1), 1),
            ("models/a/m2", "m2-renamed", dt.datetime(2024, 3, 1), 25),
            ("models/a/m1", "SHOULD_NOT_RENAME", dt.datetime(2023, 6, 1), 99),
        ],
        ["id", "name", "last_modified", "likes"],
    )
    fresh, stale = split_by_watermark(incoming, wm)
    assert fresh.count() == 2 and stale.count() == 1

    out = {r.id: r for r in
           incremental_repository_load(existing, incoming, wm).collect()}
    assert len(out) == 3
    assert out["models/a/m1"].likes == 99  # stale: likes refreshed...
    assert out["models/a/m1"].name == "m1"  # ...but nothing else
    assert out["models/a/m2"].name == "m2-renamed"  # fresh: full upsert
    assert out["models/a/m3"].likes == 1  # fresh: inserted


def test_schema_registry_and_fk_audit(spark):
    assert len(SCHEMAS) == 17
    # minimal consistent snapshot across three related tables
    tables = {
        "repository": spark.createDataFrame(
            [("models/a/m", "a/m", "model", "a")],
            ["id", "name", "type", "author"],
        ),
        "author": spark.createDataFrame([("a",)], ["username"]),
        "model": spark.createDataFrame([("models/a/m",)], ["model_id"]),
    }
    for fk in FOREIGN_KEYS:
        if fk.table in tables and fk.ref_table in tables:
            assert fk_violations(tables, fk).count() == 0, fk
    # now break one FK and expect the audit to catch it
    tables["model"] = spark.createDataFrame([("models/ghost/x",)], ["model_id"])
    fk = next(f for f in FOREIGN_KEYS if f.table == "model")
    assert fk_violations(tables, fk).count() == 1


def test_etl_bench_feeds_are_schema_compatible(spark, tmp_path):
    """The throughput harness's synthetic feeds must stay loadable by
    the real pipeline — schema drift in tools/etl_bench.py would
    silently turn the 54-hour comparison into a crash or a zero-row
    lie.  A 60-repo feed must parse with the production feed schemas,
    produce all 17 tables, and pass the RI audit."""
    import sys

    sys.path.insert(0, "tools")
    from etl_bench import _write_feeds

    from hfcommunity_spark.etl import pipeline
    from hfcommunity_spark.schema import FOREIGN_KEYS, SCHEMAS, fk_violations
    from hfcommunity_spark.sources import hub_feeds

    d = str(tmp_path / "feeds")
    import os

    os.makedirs(d)
    _write_feeds(d, 60)
    feeds = hub_feeds.read_all_feeds(spark, d)
    tables = pipeline.run_offline(
        spark, feeds["models"], feeds["datasets"], feeds["spaces"],
        feeds["commits"], feeds["discussions"],
    )
    assert set(tables) == set(SCHEMAS)
    assert tables["repository"].count() == 60
    assert tables["commits"].count() > 0
    assert tables["repo_file"].count() > 0
    for fk in FOREIGN_KEYS:
        assert fk_violations(tables, fk).count() == 0, fk
