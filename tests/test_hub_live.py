"""Live-Hub adapter seam: the module must import (and its flatteners
work) WITHOUT huggingface_hub installed — the live client is only
required at construction time.  Fake api objects stand in for the real
one; the flattened rows must load under the exact feed schemas the
pipeline consumes."""

from __future__ import annotations

from datetime import datetime, timezone
from types import SimpleNamespace as NS

import pytest

from hfcommunity_spark.etl import hub_live
from hfcommunity_spark.etl.fetch import map_fetch
from hfcommunity_spark.etl.pipeline import (
    DISCUSSIONS_FEED_SCHEMA,
    MODEL_FEED_SCHEMA,
)

TS = datetime(2022, 9, 1, tzinfo=timezone.utc)


def _model_info():
    return NS(
        id="org/m1", author="org", sha="abc", last_modified=TS,
        private=False, card_data={"license": "mit"}, gated=False, likes=3,
        disabled=False, tags=["pytorch"],
        siblings=[
            NS(rfilename="config.json", size=10, blob_id="b1", lfs=None),
            # real hub field name is sha256 (reference reads
            # file.lfs.get("sha256"), databaseImport.py:318)
            NS(rfilename="model.bin", size=None, blob_id="b2",
               lfs=NS(size=99, pointer_size=12, sha256="lfs-sha")),
            # newer hub versions ship lfs as a plain dict
            NS(rfilename="model2.bin", size=None, blob_id="b3",
               lfs={"size": 7, "pointer_size": 3, "sha256": "lfs-sha-2"}),
        ],
        pipeline_tag="text-classification", downloads=42,
        library_name="transformers", config={"architectures": ["X"]},
    )


class FakeApi:
    def list_models(self, **kwargs):
        # the reference's exact listing shape (:597)
        assert kwargs["sort"] == "lastModified" and kwargs["direction"] == -1
        assert kwargs["full"] and kwargs["cardData"] and kwargs["fetch_config"]
        return [_model_info()][: kwargs["limit"]]

    def repo_info(self, name, repo_type, files_metadata):
        assert files_metadata is True  # :299
        if name == "org/gone":
            raise RuntimeError("RepositoryNotFoundError")
        return _model_info()

    def get_repo_discussions(self, repo_id, repo_type):
        return [NS(num=1)]

    def get_discussion_details(self, repo_id, discussion_num, repo_type):
        return NS(
            num=discussion_num, author="alice", title="t", status="open",
            created_at=TS, is_pull_request=True, target_branch="main",
            merge_commit_oid=None, git_reference="refs/pr/1",
            conflicting_files="ERROR-not-a-list",  # P11: must become NULL
            events=[
                NS(id="e1", type="comment", created_at=TS, author="alice",
                   content="hi", edited=False, hidden=False, new_status=None,
                   summary=None, oid=None, old_title=None, new_title=None,
                   _event={"raw": 1}),
            ],
        )


def test_module_imports_without_library():
    assert hub_live.HfApi is None  # the container genuinely lacks it
    with pytest.raises(ImportError, match="huggingface_hub"):
        hub_live.default_api()


def test_listing_rows_fit_model_feed_schema(spark):
    rows = list(hub_live.list_repo_rows("model", limit=1, api=FakeApi()))
    df = spark.createDataFrame(rows, MODEL_FEED_SCHEMA)
    got = df.collect()[0]
    assert got.name == "org/m1"
    assert got.card_data == "{'license': 'mit'}"  # str()-ified like :641
    assert got.gated == "False"
    assert [s.filename for s in got.siblings] == [
        "config.json", "model.bin", "model2.bin"
    ]
    assert got.siblings[1].lfs.size == 99
    assert got.siblings[1].lfs.sha == "lfs-sha"
    assert got.siblings[2].lfs.sha == "lfs-sha-2"
    assert got.siblings[2].lfs.pointer_size == 3
    assert got.config == "{'architectures': ['X']}"


def test_repo_info_fetcher_through_map_fetch(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("repo_name", T.StringType()),
            T.StructField("filename", T.StringType()),
            T.StructField("size", T.LongType()),
            T.StructField("blob_id", T.StringType()),
            T.StructField(
                "lfs",
                T.StructType(
                    [
                        T.StructField("size", T.LongType()),
                        T.StructField("pointer_size", T.LongType()),
                        T.StructField("sha", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    keys = spark.createDataFrame(
        [("org/m1",), ("org/gone",)], ["repo_name"]
    )
    fetch = hub_live.make_repo_info_fetcher("model", api=FakeApi())
    out = map_fetch(keys, "repo_name", fetch, schema).collect()
    # org/gone errors → [] (the reference's per-repo try/except, :298)
    assert {r.repo_name for r in out} == {"org/m1"}
    # one row per sibling file (the reference inserts every sibling,
    # databaseImport.py:306-318) — both lfs shapes flattened
    assert len(out) == 3
    by_file = {r.filename: r for r in out}
    assert by_file["model.bin"].lfs.sha == "lfs-sha"
    assert by_file["model2.bin"].lfs.pointer_size == 3


def test_discussions_fetcher_rows_fit_feed_schema(spark):
    fetch = hub_live.make_discussions_fetcher("model", api=FakeApi())
    rows = list(fetch("org/m1"))
    df = spark.createDataFrame(rows, DISCUSSIONS_FEED_SCHEMA)
    got = df.collect()[0]
    assert got.repo_id == "models/org/m1"
    assert got.conflicting_files is None  # P11 non-list → NULL
    assert got.events[0].event_type == "comment"
    assert got.events[0].full_data == "{'raw': 1}"
