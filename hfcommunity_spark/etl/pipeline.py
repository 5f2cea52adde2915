"""The full HFCommunity ETL as one offline, set-oriented pipeline:
raw API-shaped feeds in → the 17-table schema out.

Mirrors the reference's populate_* call tree
(databaseImport.py:577-824) stage by stage, but every per-row loop is
a DataFrame transform, every FK-ordering commit is unnecessary (the
snapshot is written atomically and audited with ``fk_violations``),
and every fetch is a frame already produced by ``etl.fetch`` adapters
— so the whole pipeline runs without network from JSONL fixtures
(SURVEY §7 step 6).

Expected feed columns (the huggingface_hub object fields the reference
reads, flattened):

- models/datasets/spaces: name ("owner/repo"), author, sha,
  last_modified, private, card_data, gated, likes, disabled, tags
  (array<string>), siblings (array<struct filename,size,blob_id,
  lfs:struct<size,pointer_size,sha>>) plus the subtype fields
  (model: pipeline_tag, downloads, library_name, config;
  dataset: description, citation, paperswithcode_id, downloads;
  space: sdk, stage, hardware, requested_hw, sleep_time, storage,
  runtime_raw, models (array<string> of "owner/name"), datasets
  (array<string>) — the space dependency lists the reference unrolls
  into bridge tables at :549-574)
- commits feed: repo_id, sha, parents, message, author_name,
  author_date, author_tz, committer_name, committer_date,
  committer_tz, in_main_branch, files (array<struct old_path,
  new_path, change_type, diff, added, deleted, nloc>)
- discussions feed: repo_id, num, author, title, status, created_at,
  is_pull_request, target_branch, merge_commit_oid, git_reference,
  conflicting_files (array<string>, NULL when the API returned a
  non-list — P11 guard), events (array<struct id, event_type,
  created_at, author, content, edited, hidden, new_status, summary,
  sha, old_title, new_title, full_data>)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from hfcommunity_spark.etl.normalize import (
    conflicting_files_rows,
    dispatch_discussion_events,
    explode_tags,
    guard_oversize_diff,
    modified_file_path,
    normalize_gated,
    path_basename,
    normalize_repo_files,
    repo_full_id,
    surrogate_key,
    validate_merge_commits,
)
from hfcommunity_spark.operators.mergeops import (
    AUTHOR_SOURCE_PRIORITY,
    priority_union,
)

REPO_COMMON = [
    "name", "author", "sha", "last_modified", "private", "card_data",
    "gated", "likes", "disabled",
]

# ---- explicit feed schemas (streaming/batch sources cannot infer) ---------

_S, _I, _L, _B, _TS = (
    T.StringType(), T.IntegerType(), T.LongType(), T.BooleanType(),
    T.TimestampType(),
)

SIBLING_TYPE = T.StructType(
    [
        T.StructField("filename", _S),
        T.StructField("size", _L),
        T.StructField("blob_id", _S),
        T.StructField(
            "lfs",
            T.StructType(
                [
                    T.StructField("size", _L),
                    T.StructField("pointer_size", _L),
                    T.StructField("sha", _S),
                ]
            ),
        ),
    ]
)

_REPO_COMMON_FIELDS = [
    T.StructField("name", _S, False),
    T.StructField("author", _S),
    T.StructField("sha", _S),
    T.StructField("last_modified", _TS),
    T.StructField("private", _B),
    T.StructField("card_data", _S),
    T.StructField("gated", _S),
    T.StructField("likes", _I),
    T.StructField("disabled", _B),
    T.StructField("tags", T.ArrayType(_S)),
    T.StructField("siblings", T.ArrayType(SIBLING_TYPE)),
]

MODEL_FEED_SCHEMA = T.StructType(
    _REPO_COMMON_FIELDS
    + [
        T.StructField("pipeline_tag", _S),
        T.StructField("downloads", _I),
        T.StructField("library_name", _S),
        T.StructField("config", _S),
    ]
)
DATASET_FEED_SCHEMA = T.StructType(
    _REPO_COMMON_FIELDS
    + [
        T.StructField("description", _S),
        T.StructField("citation", _S),
        T.StructField("paperswithcode_id", _S),
        T.StructField("downloads", _I),
    ]
)
SPACE_FEED_SCHEMA = T.StructType(
    _REPO_COMMON_FIELDS
    + [
        T.StructField("sdk", _S),
        T.StructField("stage", _S),
        T.StructField("hardware", _S),
        T.StructField("requested_hw", _S),
        T.StructField("sleep_time", _I),
        T.StructField("storage", _S),
        T.StructField("runtime_raw", _S),
        T.StructField("models", T.ArrayType(_S)),
        T.StructField("datasets", T.ArrayType(_S)),
    ]
)
COMMITS_FEED_SCHEMA = T.StructType(
    [
        T.StructField("repo_id", _S, False),
        T.StructField("sha", _S, False),
        T.StructField("parents", T.ArrayType(_S)),
        T.StructField("message", _S),
        T.StructField("author_date", _TS),
        T.StructField("author_tz", _I),
        T.StructField("committer_date", _TS),
        T.StructField("committer_tz", _I),
        T.StructField("in_main_branch", _B),
        T.StructField("author_name", _S),
        T.StructField("committer_name", _S),
        T.StructField(
            "files",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("old_path", _S),
                        T.StructField("new_path", _S),
                        T.StructField("change_type", _S),
                        T.StructField("diff", _S),
                        T.StructField("added", _I),
                        T.StructField("deleted", _I),
                        T.StructField("nloc", _I),
                    ]
                )
            ),
        ),
    ]
)
DISCUSSIONS_FEED_SCHEMA = T.StructType(
    [
        T.StructField("repo_id", _S, False),
        T.StructField("num", _I, False),
        T.StructField("author", _S),
        T.StructField("title", _S),
        T.StructField("status", _S),
        T.StructField("created_at", _TS),
        T.StructField("is_pull_request", _B),
        T.StructField("target_branch", _S),
        T.StructField("merge_commit_oid", _S),
        T.StructField("git_reference", _S),
        T.StructField("conflicting_files", T.ArrayType(_S)),
        T.StructField(
            "events",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", _S),
                        T.StructField("event_type", _S),
                        T.StructField("created_at", _TS),
                        T.StructField("author", _S),
                        T.StructField("content", _S),
                        T.StructField("edited", _B),
                        T.StructField("hidden", _B),
                        T.StructField("new_status", _S),
                        T.StructField("summary", _S),
                        T.StructField("sha", _S),
                        T.StructField("old_title", _S),
                        T.StructField("new_title", _S),
                        T.StructField("full_data", _S),
                    ]
                )
            ),
        ),
    ]
)


def _repository_rows(feed: DataFrame, repo_type: str) -> DataFrame:
    """repository supertype rows for one feed (databaseImport.py:640,
    :726, :797): plural-prefixed id, gated normalization."""
    return feed.select(
        repo_full_id(F.lit(repo_type), F.col("name")).alias("id"),
        *[c for c in REPO_COMMON if c != "gated"],
        normalize_gated("gated").alias("gated"),
    ).withColumn("type", F.lit(repo_type))


def apply_commit_threshold(commits_feed: DataFrame,
                           max_num_commits: int | None) -> DataFrame:
    """P4: drop the ENTIRE commit history of repos exceeding the
    commit-count threshold (the reference's -s flag skips populate_
    commits for the repo but keeps the repo row, databaseImport.py:
    374-382; recommended 1500, usage.rst.txt:64).  One count-aggregate
    + semi join — the set equivalent of the rev-list pre-check."""
    if max_num_commits is None:
        return commits_feed
    from pyspark.sql import functions as F  # noqa: PLC0415

    within = (
        commits_feed.groupBy("repo_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_num_commits)
        .select("repo_id")
    )
    return commits_feed.join(within, "repo_id", "left_semi")


def run_offline(
    spark,
    models: DataFrame,
    datasets: DataFrame,
    spaces: DataFrame,
    commits_feed: DataFrame,
    discussions_feed: DataFrame,
    skiplist: tuple[str, ...] = (),
    max_num_commits: int | None = None,
) -> dict[str, DataFrame]:
    """Build all 17 tables. Returns name → DataFrame (un-materialized
    plans; callers write snapshots via io.write_snapshot)."""
    feeds = {"model": models, "dataset": datasets, "space": spaces}
    commits_feed = apply_commit_threshold(commits_feed, max_num_commits)

    # P3 skip-list predicate (:624, :712, :787)
    if skiplist:
        feeds = {
            t: f.filter(~repo_full_id(F.lit(t), F.col("name")).isin(*skiplist))
            for t, f in feeds.items()
        }

    # -- repository supertype + subtypes (J3 backbone) ----------------
    repository = (
        _repository_rows(feeds["model"], "model")
        .unionByName(_repository_rows(feeds["dataset"], "dataset"))
        .unionByName(_repository_rows(feeds["space"], "space"))
    )
    model = feeds["model"].select(
        repo_full_id(F.lit("model"), F.col("name")).alias("model_id"),
        "pipeline_tag", "downloads", "library_name", "likes", "config",
    )
    dataset = feeds["dataset"].select(
        repo_full_id(F.lit("dataset"), F.col("name")).alias("dataset_id"),
        "description", "citation", "paperswithcode_id", "downloads",
    )
    space = feeds["space"].select(
        repo_full_id(F.lit("space"), F.col("name")).alias("space_id"),
        "sdk", "stage", "hardware", "requested_hw", "sleep_time",
        "storage", "runtime_raw",
    )

    # -- tags (explode + INSERT IGNORE dedup, :257-282) ---------------
    # no join back to repository: the (id, tags) union derives from
    # the SAME already-filtered feeds repository is built from, so the
    # join could neither add nor drop a row — it was one pure wasted
    # shuffle per snapshot (round-6 review finding)
    tagged = (
        feeds["model"]
        .select(repo_full_id(F.lit("model"), F.col("name")).alias("id"), "tags")
        .unionByName(
            feeds["dataset"].select(
                repo_full_id(F.lit("dataset"), F.col("name")).alias("id"), "tags"
            )
        )
        .unionByName(
            feeds["space"].select(
                repo_full_id(F.lit("space"), F.col("name")).alias("id"), "tags"
            )
        )
    )
    tag, tags_in_repo = explode_tags(tagged)

    # -- repo_file (siblings explode + LFS branch + sha2 key, :285-317)
    siblings = (
        feeds["model"]
        .select(repo_full_id(F.lit("model"), F.col("name")).alias("repo_id"),
                F.explode_outer("siblings").alias("s"))
        .unionByName(
            feeds["dataset"].select(
                repo_full_id(F.lit("dataset"), F.col("name")).alias("repo_id"),
                F.explode_outer("siblings").alias("s"),
            )
        )
        .unionByName(
            feeds["space"].select(
                repo_full_id(F.lit("space"), F.col("name")).alias("repo_id"),
                F.explode_outer("siblings").alias("s"),
            )
        )
        .filter(F.col("s").isNotNull())
        .select(
            "repo_id",
            F.col("s.filename").alias("filename"),
            F.col("s.size").alias("size"),
            F.col("s.blob_id").alias("blob_id"),
            F.col("s.lfs").alias("lfs"),
        )
    )
    repo_file = normalize_repo_files(siblings)

    # -- commits + modified files (:320-444) --------------------------
    commits = commits_feed.select(
        "sha", "repo_id", "message", "author_date", "author_tz",
        "committer_date", "committer_tz", "in_main_branch",
        F.expr(
            "aggregate(files, 0, (a, f) -> a + coalesce(f.added, 0))"
        ).alias("insertions"),
        F.expr(
            "aggregate(files, 0, (a, f) -> a + coalesce(f.deleted, 0))"
        ).alias("deletions"),
        "author_name", "committer_name",
        F.lit("pydriller").alias("source"),  # :402
    )
    # PK discipline: commits' declared PK is sha alone, but forks and
    # mirrors legitimately replay one commit under several repo_ids in
    # the same feed — the reference's INSERT IGNORE (:401) kept the
    # first arrival, so keep the first under the INSERT-IGNORE
    # discipline: ASCENDING recency (the incremental layer's det_order
    # contract for first-writer-wins tables), then repo_id and message
    # as the total-order tie-break (round-6 review finding)
    c_first = Window.partitionBy("sha").orderBy(
        F.asc("author_date"), F.asc("committer_date"),
        F.asc("repo_id"), F.asc("message"),
    )
    commits = (
        commits.withColumn("__rn", F.row_number().over(c_first))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    commit_parents = commits_feed.select(
        F.col("sha").alias("commit_sha"),
        F.explode_outer("parents").alias("parent_sha"),
    ).filter(F.col("parent_sha").isNotNull()).distinct()

    mf_raw = commits_feed.select(
        "sha", "repo_id",
        F.regexp_replace("repo_id", "^[a-z]+s/", "").alias("repo_name"),
        F.explode_outer("files").alias("f"),
    ).filter(F.col("f").isNotNull())
    keyed_path = modified_file_path(
        F.col("f.change_type"), F.col("f.old_path"), F.col("f.new_path")
    )
    modified_file = mf_raw.select(
        # sha256(repo_name + '_' + file.filename + '_' + commit_sha),
        # :419 — file.filename is pydriller's BASENAME of the keyed
        # path, while the repo_file FK probe (:423) uses the full path;
        # the two deliberately differ for files in subdirectories
        surrogate_key(
            F.col("repo_name"), path_basename(keyed_path), F.col("sha")
        ).alias("modified_file_id"),
        surrogate_key(F.col("repo_id"), keyed_path).alias("repo_file_id"),
        path_basename(keyed_path).alias("rfilename"),  # :422 file.filename
        F.col("f.old_path").alias("old_path"),
        F.col("f.new_path").alias("new_path"),
        F.col("f.change_type").alias("change_type"),
        guard_oversize_diff(F.col("f.diff")).alias("diff"),
        F.col("f.added").alias("added_lines"),
        F.col("f.deleted").alias("deleted_lines"),
        F.col("f.nloc").alias("nloc"),
        F.col("sha"),
    )
    # J1: FK resolution against repo_file — NULL when the probe misses
    # (reference's dict .get at :423); left join keeps the row
    known_files = repo_file.select(F.col("id").alias("__rf_id"))
    modified_file = (
        modified_file.join(
            known_files,
            modified_file["repo_file_id"] == known_files["__rf_id"],
            "left",
        )
        .withColumn(
            "repo_file_id",
            F.when(F.col("__rf_id").isNotNull(), F.col("repo_file_id")),
        )
        .drop("__rf_id")
    )
    files_in_commit = modified_file.select("sha", "modified_file_id").distinct()
    # PK discipline: modified_file_id hashes the BASENAME (reference
    # :419), so one commit touching a/util.py and b/util.py collides on
    # the id while differing in old/new_path — the reference's INSERT
    # IGNORE kept exactly one row, so keep the first under a
    # deterministic path order instead of a full-row distinct that
    # would ship a duplicate PK (round-6 review finding)
    mf_first = Window.partitionBy("modified_file_id").orderBy(
        F.asc_nulls_last("new_path"), F.asc_nulls_last("old_path")
    )
    modified_file = (
        modified_file.drop("sha")
        .withColumn("__rn", F.row_number().over(mf_first))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # -- discussions (:447-546) ---------------------------------------
    discussion = validate_merge_commits(
        discussions_feed.select(
            "num", "repo_id", "author", "title", "status", "created_at",
            "is_pull_request", "target_branch", "merge_commit_oid",
            F.lit(None).cast("string").alias("diff"), "git_reference",
        ),
        commits,
    )
    conflicting = conflicting_files_rows(
        discussions_feed.select("num", "repo_id", "conflicting_files")
    )
    raw_events = discussions_feed.select(
        "repo_id", F.col("num").alias("discussion_num"),
        F.explode_outer("events").alias("e"),
    ).filter(F.col("e").isNotNull())
    discussion_event = dispatch_discussion_events(
        raw_events.select(
            F.col("e.id").alias("id"),
            "repo_id",
            "discussion_num",
            F.col("e.event_type").alias("event_type"),
            F.col("e.created_at").alias("created_at"),
            F.col("e.author").alias("author"),
            F.col("e.content").alias("content"),
            F.col("e.edited").alias("edited"),
            F.col("e.hidden").alias("hidden"),
            F.col("e.new_status").alias("new_status"),
            F.col("e.summary").alias("summary"),
            F.col("e.sha").alias("sha"),
            F.col("e.old_title").alias("old_title"),
            F.col("e.new_title").alias("new_title"),
            F.col("e.full_data").alias("full_data"),
        )
    )

    # -- authors: U1 priority union of the three streams --------------
    def _stub(df: DataFrame, col: str, source: str) -> DataFrame:
        return (
            df.select(F.col(col).alias("username"))
            .filter(F.col("username").isNotNull())
            .distinct()
            .select(
                "username",
                F.lit(None).cast("string").alias("avatar_url"),
                F.lit(None).cast("boolean").alias("is_pro"),
                F.lit(None).cast("string").alias("fullname"),
                F.lit(None).cast("string").alias("type"),
                F.lit(source).alias("source"),
            )
        )

    hf_authors = _stub(discussion, "author", "hf").unionByName(
        _stub(discussion_event, "author", "hf")  # event authors, :513-518
    ).dropDuplicates(["username"])
    author = priority_union(
        [
            (_stub(commits, "author_name", "commit"),
             AUTHOR_SOURCE_PRIORITY["commit"]),                 # :392-396
            (_stub(repository, "author", "hf_owner"),
             AUTHOR_SOURCE_PRIORITY["hf_owner"]),               # :629
            (hf_authors, AUTHOR_SOURCE_PRIORITY["hf"]),         # :474
        ],
        pk=["username"],
        order_by=["source"],
    )

    # -- space dependency bridges (:549-574) --------------------------
    space_base = feeds["space"].select(
        repo_full_id(F.lit("space"), F.col("name")).alias("space_id"),
        "models", "datasets",
    )
    mis = (
        space_base.select(
            "space_id", F.explode_outer("models").alias("dep")
        )
        .filter(F.col("dep").isNotNull())
        .select(
            repo_full_id(F.lit("model"), F.col("dep")).alias("model_id"),
            "space_id",
        )
        .distinct()
    )
    dis = (
        space_base.select(
            "space_id", F.explode_outer("datasets").alias("dep")
        )
        .filter(F.col("dep").isNotNull())
        .select(
            repo_full_id(F.lit("dataset"), F.col("dep")).alias("dataset_id"),
            "space_id",
        )
        .distinct()
    )

    return {
        "repository": repository,
        "model": model,
        "dataset": dataset,
        "space": space,
        "tag": tag,
        "tags_in_repo": tags_in_repo,
        "repo_file": repo_file,
        "commits": commits,
        "commit_parents": commit_parents,
        "modified_file": modified_file,
        "files_in_commit": files_in_commit,
        "discussion": discussion,
        "conflicting_files_discussion": conflicting,
        "discussion_event": discussion_event,
        "author": author,
        "models_in_space": mis,
        "datasets_in_space": dis,
    }
