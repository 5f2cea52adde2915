"""The 17-table HFCommunity relational schema as explicit Spark types.

Source of truth: the MariaDB DDL the reference auto-creates
(extractor/databaseImport.py:184-251; required-table list :73) with
the type mapping of SURVEY.md §1.2 — VARCHAR/TEXT/CHAR(64)→string,
INTEGER counts→int, INTEGER flags→boolean (cast to int in the parity
view), BIGINT sizes→long, DATETIME→timestamp (UTC session; timezone
offsets stay separate int columns, :226).

FK metadata is declared, not enforced — the referential-integrity
audit (``fk_violations``) replaces MariaDB's FK checks with left-anti
join emptiness, the guarantee the extractor got from commit ordering
(:279,:398,:405,:478,:495,:645).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _s(*fields: tuple) -> T.StructType:
    out = []
    for name, dtype, *rest in fields:
        nullable = rest[0] if rest else True
        out.append(T.StructField(name, dtype, nullable))
    return T.StructType(out)


S, I, L, B, TS = (
    T.StringType(),
    T.IntegerType(),
    T.LongType(),
    T.BooleanType(),
    T.TimestampType(),
)

# DDL :184-187
TAG = _s(("name", S, False))

# DDL :188-191
AUTHOR = _s(
    ("username", S, False), ("avatar_url", S), ("is_pro", B),
    ("fullname", S), ("type", S), ("source", S),
)

# DDL :192-195 — id format "{type}s/{owner}/{name}" (:604,:693,:773)
REPOSITORY = _s(
    ("id", S, False), ("name", S), ("type", S, False), ("author", S),
    ("sha", S), ("last_modified", TS), ("private", B), ("card_data", S),
    ("gated", S), ("likes", I), ("disabled", B),
)

# DDL :196-199 — id = sha256(repo_id + '_' + filename) (:309)
REPO_FILE = _s(
    ("id", S, False), ("filename", S), ("repo_id", S, False),
    ("size", L), ("blob_id", S), ("lfs_size", L),
    ("lfs_pointer_size", L), ("lfs_sha", S),
)

# DDL :200-203
TAGS_IN_REPO = _s(("tag_name", S, False), ("repo_id", S, False))

# DDL :204-207
MODEL = _s(
    ("model_id", S, False), ("pipeline_tag", S), ("downloads", I),
    ("library_name", S), ("likes", I), ("config", S),
)

# DDL :208-211
DATASET = _s(
    ("dataset_id", S, False), ("description", S), ("citation", S),
    ("paperswithcode_id", S), ("downloads", I),
)

# DDL :212-215 — enums per UML conceptualSchema-v1.1.png
SPACE = _s(
    ("space_id", S, False), ("sdk", S), ("stage", S), ("hardware", S),
    ("requested_hw", S), ("sleep_time", I), ("storage", S),
    ("runtime_raw", S),
)

# DDL :216-219 / :220-223
MODELS_IN_SPACE = _s(("model_id", S, False), ("space_id", S, False))
DATASETS_IN_SPACE = _s(("dataset_id", S, False), ("space_id", S, False))

# DDL :224-227 — tz offsets are separate int seconds columns
COMMITS = _s(
    ("sha", S, False), ("repo_id", S, False), ("message", S),
    ("author_date", TS), ("author_tz", I), ("committer_date", TS),
    ("committer_tz", I), ("in_main_branch", B), ("insertions", I),
    ("deletions", I), ("author_name", S), ("committer_name", S),
    ("source", S),
)

# DDL :228-231
DISCUSSION = _s(
    ("num", I, False), ("repo_id", S, False), ("author", S),
    ("title", S), ("status", S), ("created_at", TS),
    ("is_pull_request", B), ("target_branch", S),
    ("merge_commit_oid", S), ("diff", S), ("git_reference", S),
)

# DDL :232-235 — the only AUTO_INCREMENT id in the schema
CONFLICTING_FILES_DISCUSSION = _s(
    ("id", I, False), ("num", I, False), ("repo_id", S, False),
    ("filename", S), ("repo_file_id", S),
)

# DDL :236-239
COMMIT_PARENTS = _s(("commit_sha", S, False), ("parent_sha", S, False))

# DDL :240-243 — modified_file_id = sha256(repo_name_filename_commitsha) (:419)
MODIFIED_FILE = _s(
    ("modified_file_id", S, False), ("repo_file_id", S),
    ("rfilename", S), ("old_path", S), ("new_path", S),
    ("change_type", S), ("diff", S), ("added_lines", I),
    ("deleted_lines", I), ("nloc", I),
)

# DDL :244-247
FILES_IN_COMMIT = _s(("sha", S, False), ("modified_file_id", S, False))

# DDL :248-251 — one wide nullable schema; event dispatch fills the
# type-dependent subset (:521-536)
DISCUSSION_EVENT = _s(
    ("id", S, False), ("repo_id", S, False), ("discussion_num", I, False),
    ("event_type", S), ("created_at", TS), ("author", S),
    ("content", S), ("edited", B), ("hidden", B), ("new_status", S),
    ("summary", S), ("sha", S), ("old_title", S), ("new_title", S),
    ("full_data", S),
)

SCHEMAS: dict[str, T.StructType] = {
    "tag": TAG,
    "author": AUTHOR,
    "repository": REPOSITORY,
    "repo_file": REPO_FILE,
    "tags_in_repo": TAGS_IN_REPO,
    "model": MODEL,
    "dataset": DATASET,
    "space": SPACE,
    "models_in_space": MODELS_IN_SPACE,
    "datasets_in_space": DATASETS_IN_SPACE,
    "commits": COMMITS,
    "discussion": DISCUSSION,
    "conflicting_files_discussion": CONFLICTING_FILES_DISCUSSION,
    "commit_parents": COMMIT_PARENTS,
    "modified_file": MODIFIED_FILE,
    "files_in_commit": FILES_IN_COMMIT,
    "discussion_event": DISCUSSION_EVENT,
}
assert len(SCHEMAS) == 17  # "composed by 17 tables", docs/download.html:65

# Enumerations (doc-level; stored as strings — SURVEY §1.2)
REPO_TYPES = ("model", "dataset", "space")
CHANGE_TYPES = ("ADD", "MODIFY", "DELETE", "RENAME", "COPY", "UNKNOWN")
DISCUSSION_STATUS = ("open", "closed", "merged", "draft")
EVENT_TYPES = ("comment", "status-change", "commit", "title-change")
GATED_RAW = ("manual", "auto")  # normalized to NULL (:721-723)


@dataclass(frozen=True)
class ForeignKey:
    table: str
    columns: tuple[str, ...]
    ref_table: str
    ref_columns: tuple[str, ...]


# Primary keys as declared in the reference DDL
# (reference/extractor/databaseImport.py:184-251).  The two surrogate
# ids (conflicting_files_discussion, discussion_event) are
# AUTO_INCREMENT there; here they are deterministic sha2 keys (F1), so
# they remain valid merge keys.
PRIMARY_KEYS: dict[str, tuple[str, ...]] = {
    "tag": ("name",),
    "author": ("username",),
    "repository": ("id",),
    "repo_file": ("id",),
    "tags_in_repo": ("tag_name", "repo_id"),
    "model": ("model_id",),
    "dataset": ("dataset_id",),
    "space": ("space_id",),
    "models_in_space": ("model_id", "space_id"),
    "datasets_in_space": ("dataset_id", "space_id"),
    "commits": ("sha",),
    "discussion": ("num", "repo_id"),
    "conflicting_files_discussion": ("id",),
    "commit_parents": ("commit_sha", "parent_sha"),
    "modified_file": ("modified_file_id",),
    "files_in_commit": ("sha", "modified_file_id"),
    "discussion_event": ("id",),
}

# FK declarations from the DDL (:184-251)
FOREIGN_KEYS: tuple[ForeignKey, ...] = (
    ForeignKey("repository", ("author",), "author", ("username",)),
    ForeignKey("repo_file", ("repo_id",), "repository", ("id",)),
    ForeignKey("tags_in_repo", ("tag_name",), "tag", ("name",)),
    ForeignKey("tags_in_repo", ("repo_id",), "repository", ("id",)),
    ForeignKey("model", ("model_id",), "repository", ("id",)),
    ForeignKey("dataset", ("dataset_id",), "repository", ("id",)),
    ForeignKey("space", ("space_id",), "repository", ("id",)),
    ForeignKey("models_in_space", ("model_id",), "model", ("model_id",)),
    ForeignKey("models_in_space", ("space_id",), "space", ("space_id",)),
    ForeignKey("datasets_in_space", ("dataset_id",), "dataset", ("dataset_id",)),
    ForeignKey("datasets_in_space", ("space_id",), "space", ("space_id",)),
    ForeignKey("commits", ("repo_id",), "repository", ("id",)),
    ForeignKey("discussion", ("repo_id",), "repository", ("id",)),
    ForeignKey(
        "conflicting_files_discussion", ("num", "repo_id"),
        "discussion", ("num", "repo_id"),
    ),
    ForeignKey("commit_parents", ("commit_sha",), "commits", ("sha",)),
    ForeignKey("commit_parents", ("parent_sha",), "commits", ("sha",)),
    ForeignKey("modified_file", ("repo_file_id",), "repo_file", ("id",)),
    ForeignKey("files_in_commit", ("sha",), "commits", ("sha",)),
    ForeignKey(
        "files_in_commit", ("modified_file_id",),
        "modified_file", ("modified_file_id",),
    ),
    ForeignKey(
        "discussion_event", ("discussion_num", "repo_id"),
        "discussion", ("num", "repo_id"),
    ),
)


def fk_violations(tables: dict[str, DataFrame], fk: ForeignKey) -> DataFrame:
    """Rows of ``fk.table`` whose non-null FK has no parent — must be
    empty for a consistent snapshot (left-anti audit, SURVEY §1.3)."""
    child, parent = tables[fk.table], tables[fk.ref_table]
    from pyspark.sql import functions as F

    cond = None
    for c, rc in zip(fk.columns, fk.ref_columns):
        step = child[c] == parent[rc]
        cond = step if cond is None else (cond & step)
    non_null = None
    for c in fk.columns:
        step = child[c].isNotNull()
        non_null = step if non_null is None else (non_null & step)
    return child.filter(non_null).join(parent, cond, "left_anti")
