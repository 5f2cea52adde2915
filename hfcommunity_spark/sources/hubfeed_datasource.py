"""`hubfeed` — a Spark 4 Python Data Source for the hub listing feeds.

The reference's listing scan is an API call with server-side sort,
limit, and projection options (api.list_models(sort=..., limit=...),
databaseImport.py:597).  This plugin is the engine-native analog: a
registered source whose options and pushed filters cut work *before*
rows reach Spark:

- ``kind``  : which feed schema (models/datasets/spaces/commits/
              discussions — etl.pipeline feed StructTypes)
- ``path``  : directory of ``{kind}.jsonl`` dump files
- ``limit`` : source-side row cap per partition file (the ``-i N``
              semantics, usage.rst.txt:79-85)
- filter pushdown: top-level equality/IsNotNull filters are evaluated
  on the parsed JSON object and never materialize non-matching rows
  (Spark 4 ``pushFilters`` — the Python-source equivalent of parquet
  PushedFilters)

Each dump file is one InputPartition → file-parallel scans.  Usage:

    spark.dataSource.register(HubFeedDataSource)
    spark.read.format("hubfeed").option("path", d).option("kind",
        "models").load()
"""

from __future__ import annotations

import datetime as dt
import json
import os
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    IsNotNull,
    DataSourceStreamWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


def _feed_schemas() -> dict[str, T.StructType]:
    # ONE kind→schema mapping, shared with the plain JSON reader —
    # two parallel dicts could drift (round-6 review finding); the
    # import stays inside the function for the pickling-lightness the
    # lazy import was written for
    from hfcommunity_spark.sources.hub_feeds import FEED_SCHEMAS

    return dict(FEED_SCHEMAS)


def _convert(value, dtype):
    """JSON value → the tuple/typed value Spark expects for ``dtype``.

    Malformed shapes null out instead of crashing the task: real
    dumps carry a non-list ``conflicting_files`` (the P11 guard in the
    plain-reader path exists for exactly that row shape), and a plain
    string reaching an ArrayType would otherwise silently explode into
    per-character elements (round-6 review finding)."""
    if value is None:
        return None
    if isinstance(dtype, T.StructType):
        if not isinstance(value, dict):
            return None
        return tuple(_convert(value.get(f.name), f.dataType) for f in dtype.fields)
    if isinstance(dtype, T.ArrayType):
        if not isinstance(value, (list, tuple)):
            return None
        return [_convert(v, dtype.elementType) for v in value]
    if isinstance(dtype, T.TimestampType):
        return dt.datetime.fromisoformat(str(value).replace("Z", "+00:00"))
    if isinstance(dtype, T.LongType) or isinstance(dtype, T.IntegerType):
        return int(value)
    if isinstance(dtype, T.DoubleType):
        return float(value)
    if isinstance(dtype, T.BooleanType):
        return bool(value)
    return str(value)


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class HubFeedReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options) -> None:
        self.schema_ = schema
        self.path = options.get("path")
        self.kind = options.get("kind")
        self.limit = int(options.get("limit", 0)) or None
        self.pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept top-level EqualTo / IsNotNull; everything else stays
        with Spark (returned = not handled here)."""
        names = {f.name for f in self.schema_.fields}
        for f in filters:
            simple = (
                isinstance(f, (EqualTo, IsNotNull))
                and len(f.attribute) == 1
                and f.attribute[0] in names
            )
            if simple:
                self.pushed.append(f)
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        target = os.path.join(self.path, f"{self.kind}.jsonl")
        if os.path.isdir(target):
            files = [
                os.path.join(target, n)
                for n in sorted(os.listdir(target))
                if n.endswith(".jsonl")
            ]
        else:
            files = [target]
        return [_FilePartition(p) for p in files]

    def _keep(self, obj: dict) -> bool:
        for f in self.pushed:
            name = f.attribute[0]
            v = obj.get(name)
            if isinstance(f, EqualTo):
                # compare in the COLUMN'S type, not the raw JSON value:
                # a pushed timestamp literal never equals its ISO string
                # form, so raw comparison silently dropped every
                # matching row (round-6 review finding)
                dtype = self.schema_[name].dataType
                cv, fv = _convert(v, dtype), f.value
                if isinstance(cv, dt.datetime) and isinstance(fv, dt.datetime):
                    # Spark hands TimestampType literals tz-AWARE; a
                    # naive feed value is UTC by the engine's session
                    # convention — normalize both before comparing
                    if cv.tzinfo is None:
                        cv = cv.replace(tzinfo=dt.timezone.utc)
                    if fv.tzinfo is None:
                        fv = fv.replace(tzinfo=dt.timezone.utc)
                if cv != fv:
                    return False
            if isinstance(f, IsNotNull) and v is None:
                return False
        return True

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        emitted = 0
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                obj = json.loads(line)
                if not self._keep(obj):
                    continue
                yield tuple(
                    _convert(obj.get(f.name), f.dataType)
                    for f in self.schema_.fields
                )
                emitted += 1
                if self.limit and emitted >= self.limit:
                    return


class HubFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hubfeed"

    def schema(self) -> T.StructType:
        kind = self.options.get("kind")
        schemas = _feed_schemas()
        if kind not in schemas:
            raise ValueError(
                f"hubfeed: unknown kind {kind!r}; one of {sorted(schemas)}"
            )
        return schemas[kind]

    def reader(self, schema: T.StructType) -> HubFeedReader:
        return HubFeedReader(schema, self.options)

    def simpleStreamReader(self, schema: T.StructType) -> "HubFeedSimpleStreamReader":
        return HubFeedSimpleStreamReader(schema, self.options)

    def streamWriter(self, schema: T.StructType,
                     overwrite: bool) -> "HubFeedStreamWriter":
        return HubFeedStreamWriter(schema, self.options)


class HubFeedSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the hubfeed source (X1 via a custom source):
    each micro-batch picks up newly arrived ``.jsonl`` dump files and
    emits their parsed, schema-typed rows.

    Offset model: the sorted list of file names consumed so far — a
    replayable, exactly-once cursor (``readBetweenOffsets`` re-parses
    exactly the files in ``end − start`` for recovery, so a crashed
    batch replays identical rows).  The driver-side read is fine at
    feed scale (hub dumps arrive as a handful of monthly files);
    for firehose volumes you'd promote to DataSourceStreamReader with
    per-file InputPartitions — same offset model, executor-side IO."""

    def __init__(self, schema: T.StructType, options) -> None:
        self.schema_ = schema
        self.path = options.get("path")
        self.kind = options.get("kind")

    def _discover(self) -> list[str]:
        target = os.path.join(self.path, f"{self.kind}.jsonl")
        if os.path.isdir(target):
            names = {
                n for n in os.listdir(target) if n.endswith(".jsonl")
            }
            # writer-produced part files are visible ONLY through
            # their batch manifest: a crash between part-publish and
            # manifest-write must not expose a partial batch (round-6
            # review finding).  Hand-written feed files (anything not
            # matching the writer's part naming) stay directly visible.
            import re as _re

            part_re = _re.compile(
                rf"^{_re.escape(self.kind)}-\d{{6}}-\d+\.jsonl$"
            )
            manifested: set[str] = set()
            for n in os.listdir(target):
                if n.startswith("_batch-") and n.endswith(".json"):
                    try:
                        with open(os.path.join(target, n),
                                  encoding="utf-8") as fh:
                            doc = json.load(fh)
                        manifested.update(
                            p["path"] for p in doc.get("parts", [])
                        )
                    except (OSError, ValueError, KeyError, TypeError):
                        continue  # torn manifest: its parts stay hidden
            visible = {
                n for n in names
                if not part_re.match(n) or n in manifested
            }
            return sorted(visible)
        return [f"{self.kind}.jsonl"] if os.path.exists(target) else []

    def _superseded(self, base: str, name: str) -> bool:
        """True iff ``name`` is a writer part that the LIVE manifest of
        its own batch no longer lists — the only legitimate way a
        once-offsetted part disappears (a retried batch with fewer
        parts rewrote the manifest, then cleaned the stray).  Any other
        missing file (manual deletion, partial restore, wrong path)
        must stay a loud error, not quiet record loss (ADVICE r8
        narrowed the r7 skip)."""
        import re as _re

        m = _re.match(
            rf"^{_re.escape(self.kind)}-(\d{{6}})-\d+\.jsonl$", name
        )
        if not m:
            return False  # hand-written feed file: never superseded
        manifest = os.path.join(base, f"_batch-{m.group(1)}.json")
        try:
            with open(manifest, encoding="utf-8") as fh:
                doc = json.load(fh)
            listed = {p["path"] for p in doc.get("parts", [])}
        except (OSError, ValueError, KeyError, TypeError):
            return False  # no/torn live manifest: loss is not proven
        return name not in listed

    def _rows(self, names: list[str]) -> Iterator[tuple]:
        target = os.path.join(self.path, f"{self.kind}.jsonl")
        base = target if os.path.isdir(target) else self.path
        for name in names:
            # a checkpointed offset can reference a part that a later
            # retried batch (with fewer parts) legitimately cleaned up;
            # replaying THAT must skip-and-warn, not crash-loop the
            # stream (ADVICE r7) — but only when the part's own live
            # manifest confirms the supersession; every other missing
            # file keeps raising (ADVICE r8)
            if not os.path.exists(os.path.join(base, name)):
                if not self._superseded(base, name):
                    raise FileNotFoundError(
                        f"hubfeed replay: {os.path.join(base, name)!r} "
                        "is in the checkpointed offset range but "
                        "missing on disk, and its batch's live "
                        "manifest still claims it (or is absent) — "
                        "refusing to silently drop records"
                    )
                import warnings

                warnings.warn(
                    f"hubfeed replay: part {name!r} superseded by a "
                    "retried batch (absent from its live manifest) — "
                    "skipping",
                    RuntimeWarning,
                    stacklevel=2,
                )
                continue
            with open(os.path.join(base, name), encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    obj = json.loads(line)
                    yield tuple(
                        _convert(obj.get(f.name), f.dataType)
                        for f in self.schema_.fields
                    )

    def initialOffset(self) -> dict:
        return {"files": json.dumps([])}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        seen = set(json.loads(start["files"]))
        files = self._discover()
        new = [n for n in files if n not in seen]
        end = {"files": json.dumps(sorted(seen | set(new)))}
        # a list iterator, not a generator: Spark both advances AND
        # pickles the prefetched batch for replay (generators don't
        # pickle); the batch is bounded by the newly arrived files
        return iter(list(self._rows(new))), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        replay = sorted(
            set(json.loads(end["files"])) - set(json.loads(start["files"]))
        )
        return self._rows(replay)


class _PartFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int) -> None:
        self.path = path
        self.rows = rows


class HubFeedStreamWriter(DataSourceStreamWriter):
    """Streaming sink face of the hubfeed source: each micro-batch
    lands as JSONL part files written task-side (write-ahead into
    ``_tmp``), published by the driver-side ``commit``, and made
    CONSUMER-visible only by the batch manifest — readers gate
    writer-part files on their manifest (see
    ``HubFeedSimpleStreamReader._discover``), the manifest itself is
    published atomically (temp + rename) after every part is in
    place, and a replayed batchId rewrites the same dest names before
    any reader could have recorded them.  ``abort`` removes the
    orphaned parts.  Together: a crash anywhere in the commit window
    exposes nothing partial and retries cannot double-publish.

    Executor-parallel IO (one part per task, like the reference's
    row-at-a-time mysql INSERTs turned set-oriented); the manifest is
    O(#tasks) driver work per batch."""

    def __init__(self, schema: T.StructType, options) -> None:
        self.schema_ = schema
        self.path = options.get("path")
        self.kind = options.get("kind", "out")

    def _tmp_dir(self) -> str:
        return os.path.join(self.path, "_tmp")

    def write(self, iterator) -> "_PartFile":
        import uuid

        os.makedirs(self._tmp_dir(), exist_ok=True)
        part = os.path.join(self._tmp_dir(), f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(recursive=True),
                                    default=str) + "\n")
                n += 1
        return _PartFile(part, n)

    def commit(self, messages, batchId: int) -> None:
        final = []
        for m in messages:
            if m is None or m.rows == 0:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)
                continue
            dest = os.path.join(
                self.path, f"{self.kind}-{batchId:06d}-{len(final)}.jsonl"
            )
            os.replace(m.path, dest)
            final.append({"path": os.path.basename(dest), "rows": m.rows})
        # atomic manifest publish AFTER every part is in place: readers
        # gate writer-part visibility on the manifest, so a crash in
        # this window leaves the batch invisible (not partial), and the
        # retried batch rewrites the same dest names before any reader
        # could have recorded them (round-6 review finding)
        manifest = os.path.join(self.path, f"_batch-{batchId:06d}.json")
        tmp_manifest = os.path.join(
            self._tmp_dir(), f"_batch-{batchId:06d}.json"
        )
        os.makedirs(self._tmp_dir(), exist_ok=True)
        with open(tmp_manifest, "w", encoding="utf-8") as fh:
            json.dump({"batchId": batchId, "parts": final}, fh)
        os.replace(tmp_manifest, manifest)
        # a retried batch may produce FEWER parts than a crashed prior
        # attempt left behind; those higher-numbered strays are
        # manifest-invisible but would sit on disk forever.  Remove
        # them ONLY NOW, after the new manifest is live: deleting
        # before the os.replace left a window where a crash kept the
        # OLD manifest pointing at already-deleted part files
        # (ADVICE r7)
        import glob

        for stale in glob.glob(
            os.path.join(self.path, f"{self.kind}-{batchId:06d}-*.jsonl")
        ):
            idx = os.path.basename(stale).rsplit("-", 1)[-1].split(".")[0]
            if idx.isdigit() and int(idx) >= len(final):
                os.remove(stale)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
