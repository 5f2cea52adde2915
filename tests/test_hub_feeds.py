"""Files-on-disk offline E2E: JSONL feeds → read_all_feeds →
run_offline → 17 tables, RI-audit green — the complete reference
pipeline shape with zero network."""

from __future__ import annotations

import json

import pytest

from hfcommunity_spark.etl import pipeline
from hfcommunity_spark.schema import FOREIGN_KEYS, SCHEMAS, fk_violations
from hfcommunity_spark.sources import hub_feeds

MODELS = [
    {
        "name": "org/m1", "author": "org", "sha": "a" * 40,
        "last_modified": "2024-01-05T12:00:00", "private": False,
        "card_data": "{}", "gated": "False", "likes": 3, "disabled": False,
        "tags": ["nlp"],
        "siblings": [
            {"filename": "README.md", "size": 10, "blob_id": "b1", "lfs": None},
            {"filename": "model.bin", "size": 5,
             "blob_id": "b2",
             "lfs": {"size": 999, "pointer_size": 134, "sha": "l" * 40}},
        ],
        "pipeline_tag": "text-generation", "downloads": 7,
        "library_name": "transformers", "config": "cfg",
    }
]
DATASETS = [
    {
        "name": "org/d1", "author": "org", "sha": "c" * 40,
        "last_modified": "2024-01-06T00:00:00", "private": False,
        "card_data": None, "gated": "auto", "likes": 1, "disabled": False,
        "tags": [], "siblings": [],
        "description": "d", "citation": None,
        "paperswithcode_id": None, "downloads": 2,
    }
]
SPACES = [
    {
        "name": "org/s1", "author": "org", "sha": "d" * 40,
        "last_modified": "2024-01-07T00:00:00", "private": False,
        "card_data": None, "gated": "False", "likes": 0, "disabled": False,
        "tags": [], "siblings": [],
        "sdk": "gradio", "stage": "RUNNING", "hardware": None,
        "requested_hw": None, "sleep_time": None, "storage": None,
        "runtime_raw": "{}", "models": ["org/m1"], "datasets": [],
    }
]
COMMITS = [
    {
        "repo_id": "models/org/m1", "sha": "e" * 40, "parents": [],
        "message": "init", "author_date": "2024-01-01T00:00:00",
        "author_tz": 0, "committer_date": "2024-01-01T00:00:00",
        "committer_tz": 0, "in_main_branch": True, "author_name": "org",
        "committer_name": "org",
        "files": [{"old_path": None, "new_path": "README.md",
                   "change_type": "ADD", "diff": "+", "added": 1,
                   "deleted": 0, "nloc": 1}],
    }
]
DISCUSSIONS = [
    {
        "repo_id": "models/org/m1", "num": 1, "author": "fan",
        "title": "hi", "status": "open", "created_at": "2024-01-08T00:00:00",
        "is_pull_request": False, "target_branch": None,
        "merge_commit_oid": None, "git_reference": None,
        "conflicting_files": None,
        "events": [{"id": "ev1", "event_type": "comment",
                    "created_at": "2024-01-08T00:10:00", "author": "fan",
                    "content": "q", "edited": False, "hidden": False,
                    "new_status": None, "summary": None, "sha": None,
                    "old_title": None, "new_title": None,
                    "full_data": "{}"}],
    }
]


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feeds")
    for kind, rows in [("models", MODELS), ("datasets", DATASETS),
                       ("spaces", SPACES), ("commits", COMMITS),
                       ("discussions", DISCUSSIONS)]:
        with open(d / f"{kind}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return str(d)


def test_jsonl_feeds_to_full_snapshot(spark, feed_dir):
    feeds = hub_feeds.read_all_feeds(spark, feed_dir)
    assert feeds["models"].count() == 1
    # JSON reads surface every field nullable — compare names + types
    assert [(f.name, f.dataType) for f in feeds["models"].schema.fields] == [
        (f.name, f.dataType) for f in pipeline.MODEL_FEED_SCHEMA.fields
    ]

    tables = pipeline.run_offline(
        spark, feeds["models"], feeds["datasets"], feeds["spaces"],
        feeds["commits"], feeds["discussions"],
    )
    assert set(tables) == set(SCHEMAS)
    for fk in FOREIGN_KEYS:
        assert fk_violations(tables, fk).count() == 0, fk
    assert tables["repository"].count() == 3
    lm = [r.last_modified for r in tables["repository"].filter(
        "id = 'models/org/m1'").collect()]
    assert lm[0] is not None  # timestamps parsed, not nulled


def test_unknown_feed_kind_rejected(spark, feed_dir):
    with pytest.raises(ValueError, match="unknown feed kind"):
        hub_feeds.read_feed(spark, feed_dir, "nonsense")
