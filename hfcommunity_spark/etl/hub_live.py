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
        "filename": getattr(s, "rfilename", None),
        "size": getattr(s, "size", None),
        "blob_id": getattr(s, "blob_id", None),
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
    siblings = getattr(info, "siblings", None)
    return {
        "name": getattr(info, "id", None),
        "author": getattr(info, "author", None),
        "sha": getattr(info, "sha", None),
        "last_modified": getattr(info, "last_modified", None),
        "private": getattr(info, "private", None),
        "card_data": _opt_str(getattr(info, "card_data", None)),
        "gated": _opt_str(getattr(info, "gated", None)),
        "likes": getattr(info, "likes", None),
        "disabled": getattr(info, "disabled", None),
        "tags": list(getattr(info, "tags", None) or []) or None,
        "siblings": None
        if siblings is None
        else [_flatten_sibling(s) for s in siblings],
    }


def flatten_model(info: object) -> dict:
    row = _flatten_repo_common(info)
    row.update(
        pipeline_tag=getattr(info, "pipeline_tag", None),
        downloads=getattr(info, "downloads", None),
        library_name=getattr(info, "library_name", None),
        config=_opt_str(getattr(info, "config", None)),
    )
    return row


def flatten_dataset(info: object) -> dict:
    card = getattr(info, "card_data", None)
    row = _flatten_repo_common(info)
    row.update(
        description=getattr(info, "description", None),
        citation=getattr(info, "citation", None),
        paperswithcode_id=None
        if card is None
        else getattr(card, "paperswithcode_id", None),
        downloads=getattr(info, "downloads", None),
    )
    return row


def flatten_space(info: object) -> dict:
    runtime = getattr(info, "runtime", None)
    row = _flatten_repo_common(info)
    row.update(
        sdk=getattr(info, "sdk", None),
        stage=None if runtime is None else getattr(runtime, "stage", None),
        hardware=None if runtime is None else getattr(runtime, "hardware", None),
        requested_hw=None
        if runtime is None
        else getattr(runtime, "requested_hardware", None),
        sleep_time=None if runtime is None else getattr(runtime, "sleep_time", None),
        storage=None if runtime is None else getattr(runtime, "storage", None),
        runtime_raw=_opt_str(runtime),
        models=list(getattr(info, "models", None) or []) or None,
        datasets=list(getattr(info, "datasets", None) or []) or None,
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
            for s in (getattr(info, "siblings", None) or [])
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
            cf = getattr(det, "conflicting_files", None)
            if not isinstance(cf, list):
                cf = None
            events = []
            for ev in getattr(det, "events", None) or []:
                events.append(
                    {
                        "id": getattr(ev, "id", None),
                        "event_type": getattr(ev, "type", None),
                        "created_at": getattr(ev, "created_at", None),
                        "author": getattr(ev, "author", None),
                        "content": getattr(ev, "content", None),
                        "edited": getattr(ev, "edited", None),
                        "hidden": getattr(ev, "hidden", None),
                        "new_status": getattr(ev, "new_status", None),
                        "summary": getattr(ev, "summary", None),
                        "sha": getattr(ev, "oid", None),
                        "old_title": getattr(ev, "old_title", None),
                        "new_title": getattr(ev, "new_title", None),
                        "full_data": _opt_str(getattr(ev, "_event", None)),
                    }
                )
            rows.append(
                {
                    "repo_id": f"{repo_type}s/{name}",
                    "num": getattr(det, "num", None),
                    "author": getattr(det, "author", None),
                    "title": getattr(det, "title", None),
                    "status": getattr(det, "status", None),
                    "created_at": getattr(det, "created_at", None),
                    "is_pull_request": getattr(det, "is_pull_request", None),
                    "target_branch": getattr(det, "target_branch", None),
                    "merge_commit_oid": getattr(det, "merge_commit_oid", None),
                    "git_reference": getattr(det, "git_reference", None),
                    "conflicting_files": cf,
                    "events": events,
                }
            )
        return rows

    return fetch
