"""Record-and-replay contract tests for the live-Hub adapters
(etl/hub_live.py) — VERDICT r4 ask #4.

Canned payload objects shaped exactly like ``huggingface_hub``
responses (model/dataset/space info with siblings and runtime,
discussions with all four event kinds — mirroring the reference's
field access at databaseImport.py:597/:685/:765 (listings), :299
(repo_info), :467-469 (discussions), :520-536 (event dispatch)) are
replayed through the REAL adapters with a stub client, so the only
untested seam left is the HTTP transport itself.
"""

from __future__ import annotations

from datetime import datetime, timezone
from itertools import islice
from types import SimpleNamespace as NS

import pytest

from pyspark.sql import functions as F

from hfcommunity_spark.etl import hub_live
from hfcommunity_spark.etl.normalize import (
    dispatch_discussion_events,
    normalize_gated,
)
from hfcommunity_spark.etl.pipeline import (
    DATASET_FEED_SCHEMA,
    DISCUSSIONS_FEED_SCHEMA,
    SPACE_FEED_SCHEMA,
)

TS = datetime(2023, 4, 2, tzinfo=timezone.utc)


def _siblings():
    return [
        NS(rfilename="README.md", size=5, blob_id="b0", lfs=None),
        NS(rfilename="data.bin", size=None, blob_id="b1",
           lfs={"size": 123, "pointer_size": 9, "sha256": "lfs-sha"}),
    ]


def _dataset_info(i: int, gated):
    """DatasetInfo shape: the reference reads description/citation
    directly and paperswithcode_id off cardData (:693-717)."""
    return NS(
        id=f"org/d{i}", author="org", sha=f"sha{i}", last_modified=TS,
        private=False, card_data=NS(paperswithcode_id=f"pwc-{i}"),
        gated=gated, likes=i, disabled=False, tags=["nlp"],
        siblings=_siblings(), description=f"desc {i}",
        citation="@misc{x}", downloads=10 * i,
    )


def _space_info(i: int):
    """SpaceInfo shape: runtime is a nested object (:773-806)."""
    return NS(
        id=f"org/s{i}", author="org", sha=f"s{i}", last_modified=TS,
        private=True, card_data=None, gated=None, likes=0, disabled=False,
        tags=[], siblings=_siblings(), sdk="gradio",
        runtime=NS(stage="RUNNING", hardware="cpu-basic",
                   requested_hardware="t4-small", sleep_time=300,
                   storage="small"),
        models=["org/m1"], datasets=[f"org/d{i}"],
    )


class RecordedApi:
    """Replays canned payloads; records the exact call shapes."""

    def __init__(self) -> None:
        self.calls: list[tuple] = []
        self.listed = 0

    # --- listings (:597/:685/:765): newest-first, bounded by limit ---
    def list_datasets(self, **kw):
        self.calls.append(("list_datasets", kw))
        assert kw["sort"] == "lastModified" and kw["direction"] == -1
        gates = [False, True, "auto", "manual"]

        def gen():
            for i in range(100):  # far more than any limit used here
                self.listed += 1
                yield _dataset_info(i, gates[i % 4])

        it = gen()
        return it if kw["limit"] is None else islice(it, kw["limit"])

    def list_spaces(self, **kw):
        self.calls.append(("list_spaces", kw))
        it = (_space_info(i) for i in range(3))
        return it if kw["limit"] is None else islice(it, kw["limit"])

    # --- per-key lateral (:299) --------------------------------------
    def repo_info(self, name, repo_type, files_metadata):
        self.calls.append(("repo_info", name, repo_type))
        assert files_metadata is True
        return NS(siblings=_siblings())

    # --- discussions (:467-469) --------------------------------------
    def get_repo_discussions(self, repo_id, repo_type):
        self.calls.append(("get_repo_discussions", repo_id, repo_type))
        if repo_id == "org/no-discussions":
            raise RuntimeError("HTTPError: discussions are disabled")
        return [NS(num=1), NS(num=2), NS(num=3)]

    def get_discussion_details(self, repo_id, discussion_num, repo_type):
        self.calls.append(("details", repo_id, discussion_num))
        if discussion_num == 2:  # one broken detail must not kill the feed
            raise RuntimeError("HTTPError: 500")
        return NS(
            num=discussion_num, author="bob", title=f"t{discussion_num}",
            status="open", created_at=TS, is_pull_request=True,
            target_branch="main", merge_commit_oid="mc1",
            git_reference="refs/pr/1", conflicting_files=["a.txt"],
            # all four event kinds the reference dispatches (:520-536)
            events=[
                NS(id="e1", type="comment", created_at=TS, author="bob",
                   content="hello", edited=True, hidden=False,
                   new_status=None, summary=None, oid=None,
                   old_title=None, new_title=None, _event={"k": 1}),
                NS(id="e2", type="status-change", created_at=TS,
                   author="bob", content=None, edited=None, hidden=None,
                   new_status="closed", summary=None, oid=None,
                   old_title=None, new_title=None, _event=None),
                NS(id="e3", type="commit", created_at=TS, author="bob",
                   content=None, edited=None, hidden=None, new_status=None,
                   summary="add file", oid="abc123", old_title=None,
                   new_title=None, _event=None),
                NS(id="e4", type="title-change", created_at=TS,
                   author="bob", content=None, edited=None, hidden=None,
                   new_status=None, summary=None, oid=None,
                   old_title="old", new_title="new", _event=None),
            ],
        )


def test_dataset_listing_rows_fit_feed_schema(spark):
    api = RecordedApi()
    rows = list(hub_live.list_repo_rows("dataset", limit=4, api=api))
    df = spark.createDataFrame(rows, DATASET_FEED_SCHEMA)
    got = {r.name: r for r in df.collect()}
    assert set(got) == {"org/d0", "org/d1", "org/d2", "org/d3"}
    assert got["org/d1"].paperswithcode_id == "pwc-1"
    assert got["org/d2"].description == "desc 2"
    assert got["org/d2"].citation == "@misc{x}"
    assert got["org/d3"].downloads == 30
    assert got["org/d0"].siblings[1].lfs.sha == "lfs-sha"


def test_listing_is_lazy_and_limit_bounded():
    """The listing is one bounded API cursor (the reference's paged
    loop): consuming k rows must not pull the whole hub."""
    api = RecordedApi()
    rows = hub_live.list_repo_rows("dataset", limit=50, api=api)
    first_two = list(islice(rows, 2))
    assert [r["name"] for r in first_two] == ["org/d0", "org/d1"]
    assert api.listed <= 3  # generator pulled ~2, never the full 100


def test_tri_state_gated_normalizes_downstream(spark):
    """gated is False/True/'auto'/'manual' on the wire; the adapter
    str()-ifies (reference :641) and the P8 normalizer NULLs the manual
    /auto states (:721-723)."""
    api = RecordedApi()
    rows = list(hub_live.list_repo_rows("dataset", limit=4, api=api))
    assert [r["gated"] for r in rows] == ["False", "True", "auto", "manual"]
    df = spark.createDataFrame(rows, DATASET_FEED_SCHEMA)
    out = {
        r.name: r.g
        for r in df.select("name", normalize_gated("gated").alias("g")).collect()
    }
    assert out == {"org/d0": "False", "org/d1": "True",
                   "org/d2": None, "org/d3": None}


def test_space_listing_flattens_runtime(spark):
    api = RecordedApi()
    rows = list(hub_live.list_repo_rows("space", limit=2, api=api))
    df = spark.createDataFrame(rows, SPACE_FEED_SCHEMA)
    got = df.orderBy("name").collect()[0]
    assert got.sdk == "gradio"
    assert got.stage == "RUNNING"
    assert got.hardware == "cpu-basic"
    assert got.requested_hw == "t4-small"
    assert got.sleep_time == 300
    assert got.storage == "small"
    assert got.models == ["org/m1"]
    assert "RUNNING" in got.runtime_raw
    assert got.private is True


def test_repo_info_passes_repo_type_through():
    api = RecordedApi()
    fetch = hub_live.make_repo_info_fetcher("dataset", api=api)
    rows = list(fetch("org/d0"))
    assert api.calls[-1] == ("repo_info", "org/d0", "dataset")
    assert [r["filename"] for r in rows] == ["README.md", "data.bin"]
    assert rows[0]["repo_name"] == "org/d0"


def test_discussion_feed_survives_partial_failures(spark):
    """Disabled discussions → []; one failing detail fetch skips that
    num only (the reference's per-repo/per-num try/except)."""
    api = RecordedApi()
    fetch = hub_live.make_discussions_fetcher("model", api=api)
    assert list(fetch("org/no-discussions")) == []
    rows = list(fetch("org/m1"))
    assert [r["num"] for r in rows] == [1, 3]  # num=2 errored, skipped
    assert rows[0]["conflicting_files"] == ["a.txt"]
    assert rows[0]["merge_commit_oid"] == "mc1"
    # rows load under the exact feed schema the pipeline consumes
    spark.createDataFrame(rows, DISCUSSIONS_FEED_SCHEMA).collect()


def test_event_dispatch_from_replayed_payloads(spark):
    """The adapter's event rows drive the REAL P9 dispatcher: each
    event kind keeps exactly its own payload columns (:521-536)."""
    api = RecordedApi()
    fetch = hub_live.make_discussions_fetcher("model", api=api)
    feed = spark.createDataFrame(list(fetch("org/m1")), DISCUSSIONS_FEED_SCHEMA)
    raw = feed.filter(F.col("num") == 1).select(
        "repo_id", F.col("num").alias("discussion_num"),
        F.explode("events").alias("ev")
    ).select("repo_id", "discussion_num", "ev.*")
    out = {r.id: r for r in dispatch_discussion_events(raw).collect()}
    assert set(out) == {"e1", "e2", "e3", "e4"}
    c = out["e1"]
    assert (c.content, c.edited, c.new_status, c.sha) == ("hello", True, None, None)
    s = out["e2"]
    assert (s.new_status, s.content, s.summary) == ("closed", None, None)
    k = out["e3"]
    assert (k.summary, k.sha, k.content) == ("add file", "abc123", None)
    t = out["e4"]
    assert (t.old_title, t.new_title, t.content) == ("old", "new", None)
    assert out["e1"].full_data == "{'k': 1}"


def test_unknown_repo_type_rejected():
    with pytest.raises(ValueError, match="repo_type"):
        next(iter(hub_live.list_repo_rows("nope", api=RecordedApi())))
