"""Pure normalization transforms of the reference ETL.

Each function reproduces one row-at-a-time code path of
extractor/databaseImport.py as a declarative column expression — the
whole layer is shuffle-free (narrow transformations only), so at
100 TB it pipelines inside whole-stage codegen on top of whatever
scan produced the raw frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Sentinel for oversize diffs, verbatim (databaseImport.py:413)
OVERSIZE_DIFF_SENTINEL = "The diff of this file is too large to store it"
# The reference tests (sys.getsizeof(diff) >> 20) > 0 (:415), i.e.
# PyObject size ≥ 1 MiB. We use octet_length ≥ 1 MiB — documented
# deviation (getsizeof counts ~49-80 bytes of object header).
OVERSIZE_DIFF_BYTES = 1 << 20


def surrogate_key(*cols: Column | str) -> Column:
    """sha256 hex digest of '_'-joined key parts — byte-identical to
    hashlib.sha256((a + '_' + b).encode()).hexdigest()
    (databaseImport.py:309,:419,:501).

    NULL-propagating by design: the reference would raise on a None
    part (str + None TypeError), so a NULL part must surface as a NULL
    key — concat_ws would silently DROP the part and produce a
    plausible-looking wrong digest that collides across rows."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    interleaved: list[Column] = []
    for i, p in enumerate(parts):
        if i:
            interleaved.append(F.lit("_"))
        interleaved.append(p)
    return F.sha2(F.concat(*interleaved), 256)


def path_basename(path: Column | str) -> Column:
    """Last '/'-separated path segment — pydriller's ``file.filename``
    (Path(new_path or old_path).name), the component the reference
    hashes into modified_file_id and stores as rfilename
    (databaseImport.py:419,:422)."""
    p = F.col(path) if isinstance(path, str) else path
    return F.element_at(F.split(p, "/"), -1)


def repo_full_id(repo_type: Column | str, name: Column | str) -> Column:
    """'{type}s/{owner}/{name}' id construction — the reference prefixes
    the plural type ("models/" :604, "datasets/" :693, "spaces/" :773;
    singular+'s' at :306,:466 — net result always plural)."""
    t = F.col(repo_type) if isinstance(repo_type, str) else repo_type
    n = F.col(name) if isinstance(name, str) else name
    return F.concat(t, F.lit("s/"), n)


def normalize_gated(gated: Column | str) -> Column:
    """Tri-state gated → NULL for 'manual'/'auto' (databaseImport.py:721-723)."""
    g = F.col(gated) if isinstance(gated, str) else gated
    return F.when(g.isin("manual", "auto"), F.lit(None).cast("string")).otherwise(g)


def modified_file_path(change_type: Column | str, old_path: Column | str,
                       new_path: Column | str) -> Column:
    """DELETE rows are keyed by old_path, everything else by new_path
    (databaseImport.py:409-411)."""
    ct = F.col(change_type) if isinstance(change_type, str) else change_type
    op = F.col(old_path) if isinstance(old_path, str) else old_path
    np = F.col(new_path) if isinstance(new_path, str) else new_path
    return F.when(ct == "DELETE", op).otherwise(np)


def guard_oversize_diff(diff: Column | str,
                        limit: int = OVERSIZE_DIFF_BYTES) -> Column:
    """Replace ≥1 MiB diffs with the sentinel string
    (databaseImport.py:412-416)."""
    d = F.col(diff) if isinstance(diff, str) else diff
    return F.when(
        F.octet_length(d) >= F.lit(limit), F.lit(OVERSIZE_DIFF_SENTINEL)
    ).otherwise(d)


def explode_tags(repos: DataFrame, repo_id: str = "id",
                 tags_col: str = "tags") -> tuple[DataFrame, DataFrame]:
    """tags list → (tag, tags_in_repo) normalized pair
    (databaseImport.py:257-282). Distinct = the INSERT IGNORE dedup."""
    pairs = repos.select(
        F.col(repo_id).alias("repo_id"),
        F.explode_outer(F.col(tags_col)).alias("tag_name"),
    ).filter(F.col("tag_name").isNotNull())
    tag = pairs.select(F.col("tag_name").alias("name")).distinct()
    tags_in_repo = pairs.select("tag_name", "repo_id").distinct()
    return tag, tags_in_repo


def normalize_repo_files(files: DataFrame) -> DataFrame:
    """siblings → repo_file rows: surrogate id + nullable LFS branch
    (single schema replaces the two INSERT shapes of
    databaseImport.py:310-317).

    Expects columns: repo_id, filename, size, blob_id and a nullable
    ``lfs`` struct (size, pointer_size, sha)."""
    has_lfs = F.col("lfs").isNotNull()
    return files.select(
        surrogate_key("repo_id", "filename").alias("id"),
        "filename",
        "repo_id",
        F.col("size").cast("long").alias("size"),
        "blob_id",
        F.when(has_lfs, F.col("lfs.size")).cast("long").alias("lfs_size"),
        F.when(has_lfs, F.col("lfs.pointer_size")).cast("long").alias(
            "lfs_pointer_size"
        ),
        F.when(has_lfs, F.col("lfs.sha")).alias("lfs_sha"),
    )


def dispatch_discussion_events(events: DataFrame) -> DataFrame:
    """4-way event dispatch into one wide nullable schema
    (databaseImport.py:521-536): comment → content/edited/hidden,
    status-change → new_status, commit → summary/sha,
    title-change → old_title/new_title.

    Expects raw columns: id, repo_id, discussion_num, event_type,
    created_at, author, full_data plus the raw payload columns
    content/edited/hidden/new_status/summary/sha/old_title/new_title.
    """
    et = F.col("event_type")
    is_comment = et == "comment"
    is_status = et == "status-change"
    is_commit = et == "commit"
    is_title = et == "title-change"
    return events.select(
        "id",
        "repo_id",
        "discussion_num",
        "event_type",
        "created_at",
        "author",
        F.when(is_comment, F.col("content")).alias("content"),
        F.when(is_comment, F.col("edited")).cast("boolean").alias("edited"),
        F.when(is_comment, F.col("hidden")).cast("boolean").alias("hidden"),
        F.when(is_status, F.col("new_status")).alias("new_status"),
        F.when(is_commit, F.col("summary")).alias("summary"),
        F.when(is_commit, F.col("sha")).alias("sha"),
        F.when(is_title, F.col("old_title")).alias("old_title"),
        F.when(is_title, F.col("new_title")).alias("new_title"),
        "full_data",
    )


def validate_merge_commits(discussions: DataFrame,
                           commits: DataFrame) -> DataFrame:
    """merge_commit_oid kept only when the commit row exists, else NULL
    — the per-row existence SELECT at databaseImport.py:480-488 as a
    single broadcast-able semi-join."""
    known = commits.select(F.col("sha").alias("__known_sha")).distinct()
    return (
        discussions.join(
            known,
            discussions["merge_commit_oid"] == known["__known_sha"],
            "left",
        )
        .withColumn(
            "merge_commit_oid",
            F.when(F.col("__known_sha").isNotNull(), F.col("merge_commit_oid")),
        )
        .drop("__known_sha")
    )


def conflicting_files_rows(discussions: DataFrame,
                           dense_ids: bool = True) -> DataFrame:
    """conflicting_files list → child rows with deterministic ids
    (replaces the AUTO_INCREMENT at databaseImport.py:234; the
    type-guard filter mirrors the upstream-bug workaround :498-504).

    Expects: num, repo_id, conflicting_files array<string> (rows whose
    payload wasn't a list arrive as NULL — the P11 guard upstream).

    ``dense_ids=True`` assigns 1..N by row_number over a total order —
    deterministic and parity-exact, but the global window is a single
    partition: use it at dump-parity scale (the table is ~120k rows in
    the reference, docs/download.html:96-97).  ``dense_ids=False``
    derives the id from the composite natural key (hash) — unique and
    deterministic at any scale, shuffle-free, but not dense.
    """
    exploded = (
        discussions.filter(F.col("conflicting_files").isNotNull())
        .select(
            "num",
            "repo_id",
            F.explode(F.col("conflicting_files")).alias("filename"),
        )
    )
    if dense_ids:
        from pyspark.sql import Window

        w = Window.orderBy("repo_id", "num", "filename")
        id_col = F.row_number().over(w)
    else:
        id_col = F.xxhash64("repo_id", "num", "filename").bitwiseAND(
            F.lit((1 << 31) - 1)
        ).cast("int")
    return exploded.select(
        id_col.alias("id"),
        "num",
        "repo_id",
        "filename",
        surrogate_key("repo_id", "filename").alias("repo_file_id"),
    )
