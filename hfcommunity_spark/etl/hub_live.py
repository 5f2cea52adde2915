"""Live Hub API adapters for the ``map_fetch`` seam (S1-S6, J11).

The reference drives everything through one serial ``HfApi`` client:
listing scans (``list_models(full=True, cardData=True,
fetch_config=True, sort="lastModified", direction=-1, limit=...)``,
databaseImport.py:597; datasets :685; spaces :765), per-repo file
metadata (``repo_info(files_metadata=True).siblings``, :299) and
discussions (``get_repo_discussions`` + ``get_discussion_details``,
:467-469).  These adapters reproduce those exact calls and flatten the
returned objects into the feed schemas ``etl.pipeline`` consumes
(MODEL/DATASET/SPACE/DISCUSSIONS_FEED_SCHEMA) — so the same offline
pipeline runs unchanged against the live Hub: listings land as feed
rows driver-side (bounded by ``limit``, exactly like the reference's
paged loop), while the per-key fetchers plug into ``map_fetch`` and
run partition-parallel on executors.

``huggingface_hub`` is not installed in this container, so everything
is import-guarded: the module imports cleanly without the library, the
``api`` object is injectable (tests use fakes), and only actually
constructing a live client requires the dependency.
"""

from __future__ import annotations

from collections.abc import Iterable

try:  # pragma: no cover - not installed in the build container
    from huggingface_hub import HfApi
except ImportError:  # pragma: no cover
    HfApi = None

from hfcommunity_spark.etl.fetch import FetchFn

REPO_TYPES = ("model", "dataset", "space")


def default_api(token: str | None = None):
    """Construct the live client (requires ``huggingface_hub``)."""
    if HfApi is None:
        raise ImportError(
            "huggingface_hub is not installed; install it or inject a "
            "compatible api object (any object with list_models/"
            "list_datasets/list_spaces/repo_info/get_repo_discussions/"
            "get_discussion_details)"
        )
    return HfApi(token=token)


def _opt_str(v: object) -> str | None:
    return None if v is None else str(v)


def _field(obj: object, name: str):
    """hub metadata is an attribute object in some huggingface_hub
    versions and a plain/Typed dict in others — try both."""
    v = getattr(obj, name, None)
    if v is None and isinstance(obj, dict):
        v = obj.get(name)
    return v


def _flatten_sibling(s: object) -> dict:
    """RepoSibling → SIBLING_TYPE dict (rfilename/size/blob_id/lfs —
    the fields :299-318 reads).  The LFS digest field is ``sha256``
    (the reference reads file.lfs.get("sha256"), databaseImport.py:318),
    and lfs may be an object or a dict depending on hub version."""
    lfs = _field(s, "lfs")
    return {
        "filename": _field(s, "rfilename"),
        "size": _field(s, "size"),
        "blob_id": _field(s, "blob_id"),
        "lfs": None
        if lfs is None
        else {
            "size": _field(lfs, "size"),
            "pointer_size": _field(lfs, "pointer_size"),
            "sha": _field(lfs, "sha256"),
        },
    }


def _flatten_repo_common(info: object) -> dict:
    """The _REPO_COMMON_FIELDS slice every repo subtype shares
    (reference reads at :604-641, :693-717, :773-806)."""
    siblings = _field(info, "siblings")
    return {
        "name": _field(info, "id"),
        "author": _field(info, "author"),
        "sha": _field(info, "sha"),
        "last_modified": _field(info, "last_modified"),
        "private": _field(info, "private"),
        "card_data": _opt_str(_field(info, "card_data")),
        "gated": _opt_str(_field(info, "gated")),
        "likes": _field(info, "likes"),
        "disabled": _field(info, "disabled"),
        "tags": list(_field(info, "tags") or []) or None,
        "siblings": None
        if siblings is None
        else [_flatten_sibling(s) for s in siblings],
    }


def flatten_model(info: object) -> dict:
    row = _flatten_repo_common(info)
    row.update(
        pipeline_tag=_field(info, "pipeline_tag"),
        downloads=_field(info, "downloads"),
        library_name=_field(info, "library_name"),
        config=_opt_str(_field(info, "config")),
    )
    return row


def flatten_dataset(info: object) -> dict:
    card = _field(info, "card_data")
    row = _flatten_repo_common(info)
    row.update(
        description=_field(info, "description"),
        citation=_field(info, "citation"),
        paperswithcode_id=None
        if card is None
        else _field(card, "paperswithcode_id"),
        downloads=_field(info, "downloads"),
    )
    return row


def flatten_space(info: object) -> dict:
    runtime = _field(info, "runtime")
    row = _flatten_repo_common(info)
    row.update(
        sdk=_field(info, "sdk"),
        stage=None if runtime is None else _field(runtime, "stage"),
        hardware=None if runtime is None else _field(runtime, "hardware"),
        requested_hw=None
        if runtime is None
        else _field(runtime, "requested_hardware"),
        sleep_time=None if runtime is None else _field(runtime, "sleep_time"),
        storage=None if runtime is None else _field(runtime, "storage"),
        runtime_raw=_opt_str(runtime),
        models=list(_field(info, "models") or []) or None,
        datasets=list(_field(info, "datasets") or []) or None,
    )
    return row


_FLATTEN = {"model": flatten_model, "dataset": flatten_dataset, "space": flatten_space}


def list_repo_rows(repo_type: str, limit: int | None = None,
                   api: object | None = None,
                   token: str | None = None) -> Iterable[dict]:
    """S1-S3 listing scan: the reference's exact call shape — newest
    first, bounded by ``limit`` (:597/:685/:765) — yielding feed rows.
    Driver-side by design (the listing is one bounded API cursor, like
    the reference's loop); land the output as a JSONL feed and the
    pipeline's scans take over partition-parallel."""
    if repo_type not in REPO_TYPES:
        raise ValueError(f"repo_type must be one of {REPO_TYPES}")
    api = api or default_api(token)
    kwargs: dict = {"full": True, "sort": "lastModified",
                    "direction": -1, "limit": limit}
    if repo_type == "model":
        it = api.list_models(cardData=True, fetch_config=True, **kwargs)
    elif repo_type == "dataset":
        it = api.list_datasets(**kwargs)
    else:
        it = api.list_spaces(**kwargs)
    flatten = _FLATTEN[repo_type]
    for info in it:
        yield flatten(info)


def make_repo_info_fetcher(repo_type: str, api: object | None = None,
                           token: str | None = None) -> FetchFn:
    """S4/J11 per-key lateral fetch: ``repo_info(files_metadata=True)``
    (:299) keyed by "owner/name"; emits one row per sibling file with
    the SIBLING_TYPE shape.  Errors on a single repo yield [] — the
    reference's try/except-per-repo pattern (:298-302)."""
    api = api or default_api(token)

    def fetch(repo_name: object) -> Iterable[dict]:
        try:
            info = api.repo_info(
                str(repo_name), repo_type=repo_type, files_metadata=True
            )
        except Exception:
            return []
        return [
            dict(_flatten_sibling(s), repo_name=str(repo_name))
            for s in (_field(info, "siblings") or [])
        ]

    return fetch


def make_discussions_fetcher(repo_type: str, api: object | None = None,
                             token: str | None = None) -> FetchFn:
    """S5/S6 discussions fetch: ``get_repo_discussions`` then
    ``get_discussion_details`` per num (:467-469), flattened to
    DISCUSSIONS_FEED_SCHEMA rows (events inline, like the reference's
    per-event dispatch loop)."""
    api = api or default_api(token)

    def fetch(repo_name: object) -> Iterable[dict]:
        name = str(repo_name)
        rows: list[dict] = []
        try:
            discussions = list(
                api.get_repo_discussions(repo_id=name, repo_type=repo_type)
            )
        except Exception:  # discussions disabled → HTTPError (:464)
            return []
        for d in discussions:
            try:
                det = api.get_discussion_details(
                    repo_id=name, discussion_num=d.num, repo_type=repo_type
                )
            except Exception:
                continue
            # P11 guard at the source: the API sometimes hands back a
            # non-list here; NULL it rather than crash the feed
            # (etl.normalize.conflicting_files_rows re-checks downstream)
            cf = _field(det, "conflicting_files")
            if not isinstance(cf, list):
                cf = None
            events = []
            for ev in _field(det, "events") or []:
                events.append(
                    {
                        "id": _field(ev, "id"),
                        "event_type": _field(ev, "type"),
                        "created_at": _field(ev, "created_at"),
                        "author": _field(ev, "author"),
                        "content": _field(ev, "content"),
                        "edited": _field(ev, "edited"),
                        "hidden": _field(ev, "hidden"),
                        "new_status": _field(ev, "new_status"),
                        "summary": _field(ev, "summary"),
                        "sha": _field(ev, "oid"),
                        "old_title": _field(ev, "old_title"),
                        "new_title": _field(ev, "new_title"),
                        "full_data": _opt_str(_field(ev, "_event")),
                    }
                )
            rows.append(
                {
                    "repo_id": f"{repo_type}s/{name}",
                    "num": _field(det, "num"),
                    "author": _field(det, "author"),
                    "title": _field(det, "title"),
                    "status": _field(det, "status"),
                    "created_at": _field(det, "created_at"),
                    "is_pull_request": _field(det, "is_pull_request"),
                    "target_branch": _field(det, "target_branch"),
                    "merge_commit_oid": _field(det, "merge_commit_oid"),
                    "git_reference": _field(det, "git_reference"),
                    "conflicting_files": cf,
                    "events": events,
                }
            )
        return rows

    return fetch
