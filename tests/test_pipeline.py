"""End-to-end offline ETL: fixture feeds → all 17 tables →
referential-integrity audit green → published metrics run on the
result.  Plus the real git source adapter driven against this repo's
own history."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hfcommunity_spark.etl import fetch, pipeline
from hfcommunity_spark.metrics import ALL_METRICS
from hfcommunity_spark.schema import FOREIGN_KEYS, SCHEMAS, fk_violations

TS = dt.datetime(2024, 1, 5, 12, 0)


def _sib(fn, size=10, lfs=None):
    return dict(filename=fn, size=size, blob_id=f"b-{fn}",
                lfs=dict(size=lfs, pointer_size=134, sha="l" * 40) if lfs else None)


@pytest.fixture(scope="module")
def built(spark):
    models = spark.createDataFrame(
        [
            dict(name="org/m1", author="org", sha="a" * 40, last_modified=TS,
                private=False, card_data="{'x': 1}", gated="False", likes=5,
                disabled=False, tags=["nlp", "bert", "nlp"],
                siblings=[_sib("README.md"), _sib("model.bin", 9, lfs=999)],
                pipeline_tag="text-generation", downloads=100,
                library_name="transformers", config="cfg"),
            dict(name="solo/m2", author="solo", sha="b" * 40, last_modified=TS,
                private=False, card_data=None, gated="manual", likes=0,
                disabled=False, tags=["nlp"], siblings=[_sib("weights.pt")],
                pipeline_tag=None, downloads=3, library_name=None, config=None),
        ],
        schema=pipeline.MODEL_FEED_SCHEMA,
    )
    datasets = spark.createDataFrame(
        [
            dict(name="org/d1", author="org", sha="c" * 40, last_modified=TS,
                private=False, card_data=None, gated="auto", likes=2,
                disabled=False, tags=["qa"], siblings=[_sib("data.parquet")],
                description="d", citation=None, paperswithcode_id="pwc-1",
                downloads=9),
        ],
        schema=pipeline.DATASET_FEED_SCHEMA,
    )
    spaces = spark.createDataFrame(
        [
            dict(name="org/s1", author="org", sha="d" * 40, last_modified=TS,
                private=False, card_data=None, gated="False", likes=1,
                disabled=False, tags=[], siblings=[_sib("app.py")],
                sdk="gradio", stage="RUNNING", hardware="cpu-basic",
                requested_hw=None, sleep_time=None, storage=None,
                runtime_raw="{}", models=["org/m1"], datasets=["org/d1"]),
        ],
        schema=pipeline.SPACE_FEED_SCHEMA,
    )
    commits_feed = spark.createDataFrame(
        [
            dict(repo_id="models/org/m1", sha="c1" + "0" * 38, parents=[],
                message="init", author_date=TS, author_tz=-28800,
                committer_date=TS, committer_tz=-28800, in_main_branch=True,
                author_name="org", committer_name="org",
                files=[dict(old_path=None, new_path="README.md",
                           change_type="ADD", diff="+x", added=1, deleted=0,
                           nloc=1)]),
            dict(repo_id="models/org/m1", sha="c2" + "0" * 38,
                parents=["c1" + "0" * 38], message="update \U0001f600",
                author_date=TS + dt.timedelta(days=1), author_tz=3600,
                committer_date=TS + dt.timedelta(days=1), committer_tz=3600,
                in_main_branch=True, author_name="contrib",
                committer_name="org",
                files=[dict(old_path="README.md", new_path=None,
                           change_type="DELETE", diff="-x", added=0,
                           deleted=1, nloc=None),
                       dict(old_path=None, new_path="model.bin",
                           change_type="ADD", diff="bin", added=None,
                           deleted=None, nloc=None)]),
        ],
        schema=pipeline.COMMITS_FEED_SCHEMA,
    )
    discussions_feed = spark.createDataFrame(
        [
            dict(repo_id="models/org/m1", num=1, author="fan", title="PR",
                status="merged", created_at=TS, is_pull_request=True,
                target_branch="main", merge_commit_oid="c2" + "0" * 38,
                git_reference="refs/pr/1",
                conflicting_files=["README.md"],
                events=[
                    dict(id="ev1", event_type="comment", created_at=TS,
                        author="fan", content="nice", edited=False,
                        hidden=False, new_status=None, summary=None, sha=None,
                        old_title=None, new_title=None, full_data="{}"),
                    dict(id="ev2", event_type="status-change", created_at=TS,
                        author="org", content=None, edited=None, hidden=None,
                        new_status="merged", summary=None, sha=None,
                        old_title=None, new_title=None, full_data="{}"),
                ]),
            dict(repo_id="models/solo/m2", num=1, author="solo", title="q",
                status="open", created_at=TS, is_pull_request=False,
                target_branch=None, merge_commit_oid="missing" + "0" * 33,
                git_reference=None, conflicting_files=None, events=[]),
        ],
        schema=pipeline.DISCUSSIONS_FEED_SCHEMA,
    )
    return pipeline.run_offline(
        spark, models, datasets, spaces, commits_feed, discussions_feed
    )


def test_all_17_tables_built(built):
    assert set(built) == set(SCHEMAS)


def test_referential_integrity_audit_green(built):
    for fk in FOREIGN_KEYS:
        assert fk_violations(built, fk).count() == 0, fk


def test_semantics_spot_checks(built):
    repo = {r.id: r for r in built["repository"].collect()}
    assert set(repo) == {
        "models/org/m1", "models/solo/m2", "datasets/org/d1", "spaces/org/s1"
    }
    assert repo["models/solo/m2"].gated is None  # P8: manual → NULL
    assert repo["datasets/org/d1"].gated is None  # P8: auto → NULL

    # D1 dedup of duplicate tag pairs
    tir = built["tags_in_repo"].filter(
        (F.col("repo_id") == "models/org/m1") & (F.col("tag_name") == "nlp")
    )
    assert tir.count() == 1

    # F1 surrogate key parity
    import hashlib
    rf = {r.filename: r for r in built["repo_file"].filter(
        F.col("repo_id") == "models/org/m1").collect()}
    assert rf["model.bin"].id == hashlib.sha256(
        b"models/org/m1_model.bin").hexdigest()
    assert rf["model.bin"].lfs_size == 999 and rf["README.md"].lfs_size is None

    # P7: DELETE keyed by old_path; J1 probe: README resolved, miss → NULL
    mf = {r.rfilename: r for r in built["modified_file"].collect()}
    assert mf["README.md"].change_type in ("ADD", "DELETE")
    assert mf["model.bin"].repo_file_id is not None

    # J2: merge commit kept when commit exists, nulled when missing
    disc = {(r.repo_id, r.num): r for r in built["discussion"].collect()}
    assert disc[("models/org/m1", 1)].merge_commit_oid == "c2" + "0" * 38
    assert disc[("models/solo/m2", 1)].merge_commit_oid is None

    # P9 event dispatch
    ev = {r.id: r for r in built["discussion_event"].collect()}
    assert ev["ev1"].content == "nice" and ev["ev1"].new_status is None
    assert ev["ev2"].new_status == "merged" and ev["ev2"].content is None

    # U1: richer source wins for shared usernames
    authors = {r.username: r.source for r in built["author"].collect()}
    assert authors["org"] == "hf"       # owner + discussion author → hf
    assert authors["contrib"] == "commit"

    # commit aggregates
    commits = {r.sha: r for r in built["commits"].collect()}
    assert commits["c2" + "0" * 38].insertions == 0
    assert commits["c2" + "0" * 38].deletions == 1

    # bridges from space deps
    assert built["models_in_space"].count() == 1
    assert built["datasets_in_space"].count() == 1


def test_metrics_run_on_built_tables(built):
    for name, fn in ALL_METRICS.items():
        out = fn(built)
        assert out.count() >= 0, name
    top = ALL_METRICS["m1_top_orgs"](built).collect()
    assert top[0].author == "org" and top[0].n_models == 1
    pwc = {r.has_pwc: r.n_datasets
           for r in ALL_METRICS["m3_paperswithcode_split"](built).collect()}
    assert pwc == {True: 1}
    gauge = {r.type: r.n_with_discussions
             for r in ALL_METRICS["m4_pct_repos_with_discussions"](built).collect()}
    assert gauge == {"model": 2, "dataset": 0, "space": 0}


def test_git_adapter_on_real_repo(spark):
    """S7/S8 against this repo's actual git history — no fixtures."""
    n = fetch.git_commit_count("/root/repo")
    assert n >= 5
    rows = fetch.git_log_rows("/root/repo")
    assert len(rows) == n
    first = rows[-1]  # oldest
    assert len(first["sha"]) == 40 and first["parents"] == []
    assert any(f["path"] for r in rows for f in r["files"])

    # and through the Spark seam: mapInPandas over a key frame
    keys = spark.createDataFrame([("repo",)], ["repo_name"])
    df = fetch.map_fetch(
        keys, "repo_name", fetch.make_git_fetcher("/root"),
        fetch.GIT_COMMIT_SCHEMA,
    )
    got = df.count()
    assert got == n


def test_pk_uniqueness_under_collisions(spark):
    """Two round-6 review findings, locked: (1) one commit touching
    a/util.py and b/util.py collides on modified_file_id (the id
    hashes the BASENAME by reference design :419) — the snapshot must
    keep exactly one row per id like the reference's INSERT IGNORE;
    (2) one commit sha replayed under two repo_ids (forks/mirrors)
    must produce ONE commits row (PK is sha alone), first-writer by
    ascending repo_id."""
    empty_m = spark.createDataFrame([], schema=pipeline.MODEL_FEED_SCHEMA)
    empty_d = spark.createDataFrame([], schema=pipeline.DATASET_FEED_SCHEMA)
    empty_s = spark.createDataFrame([], schema=pipeline.SPACE_FEED_SCHEMA)
    empty_disc = spark.createDataFrame(
        [], schema=pipeline.DISCUSSIONS_FEED_SCHEMA
    )
    sha = "f1" + "0" * 38
    commits_feed = spark.createDataFrame(
        [
            dict(repo_id="models/org/fork-a", sha=sha, parents=[],
                 message="shared", author_date=TS, author_tz=0,
                 committer_date=TS, committer_tz=0, in_main_branch=True,
                 author_name="dev", committer_name="dev",
                 files=[dict(old_path=None, new_path="a/util.py",
                             change_type="ADD", diff="+1", added=1,
                             deleted=0, nloc=1),
                        dict(old_path=None, new_path="b/util.py",
                             change_type="ADD", diff="+2", added=2,
                             deleted=0, nloc=1)]),
            dict(repo_id="models/org/fork-b", sha=sha, parents=[],
                 message="shared", author_date=TS, author_tz=0,
                 committer_date=TS, committer_tz=0, in_main_branch=True,
                 author_name="dev", committer_name="dev",
                 files=[dict(old_path=None, new_path="a/util.py",
                             change_type="ADD", diff="+1", added=1,
                             deleted=0, nloc=1)]),
        ],
        schema=pipeline.COMMITS_FEED_SCHEMA,
    )
    tables = pipeline.run_offline(
        spark, empty_m, empty_d, empty_s, commits_feed, empty_disc
    )
    commits = tables["commits"].collect()
    assert len(commits) == 1
    assert commits[0].repo_id == "models/org/fork-a"  # first writer
    mf = tables["modified_file"].collect()
    ids = [r.modified_file_id for r in mf]
    assert len(ids) == len(set(ids)), "duplicate modified_file PK"
    # the deterministic survivor of the basename collision is the
    # path-ascending row (a/util.py)
    by_path = {r.new_path for r in mf}
    assert "a/util.py" in by_path
