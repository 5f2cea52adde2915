"""Derived views over the 17-table snapshot (SURVEY §1.1):

- ``repo_full``: the concrete-table-inheritance join flattened — one
  row per repository with its subtype payload (the J3 backbone join
  every published metric starts from, docs/download.html "concrete
  table inheritance").
- ``mariadb_parity``: our canonical schema uses real BooleanType for
  the reference's INTEGER 0/1 flags (SURVEY §1.2); this view casts
  back so row-level output is column-for-column comparable to a
  reference dump.
- ``tags_agg``: the normalized bridge re-exposed as an ArrayType
  column (collect_list), the shape the Hub API returned before the
  reference unrolled it (databaseImport.py:257-282).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOOL_FLAG_COLUMNS = {
    "repository": ("private", "disabled"),
    "author": ("is_pro",),
    "commits": ("in_main_branch",),
    "discussion": ("is_pull_request",),
    "discussion_event": ("edited", "hidden"),
}


def repo_full(tables: dict[str, DataFrame]) -> DataFrame:
    """repository ⋈ subtype (left joins preserve repos whose subtype
    row is absent mid-load); subtype columns prefixed to avoid the
    likes/downloads collisions."""
    repo = tables["repository"]
    model = tables["model"].select(
        F.col("model_id").alias("id"),
        *[
            F.col(c).alias(f"model_{c}")
            for c in ("pipeline_tag", "downloads", "library_name", "likes", "config")
        ],
    )
    dataset = tables["dataset"].select(
        F.col("dataset_id").alias("id"),
        *[
            F.col(c).alias(f"dataset_{c}")
            for c in ("description", "citation", "paperswithcode_id", "downloads")
        ],
    )
    space = tables["space"].select(
        F.col("space_id").alias("id"),
        *[
            F.col(c).alias(f"space_{c}")
            for c in (
                "sdk", "stage", "hardware", "requested_hw", "sleep_time",
                "storage", "runtime_raw",
            )
        ],
    )
    return (
        repo.join(model, "id", "left")
        .join(dataset, "id", "left")
        .join(space, "id", "left")
    )


def mariadb_parity(table_name: str, df: DataFrame) -> DataFrame:
    """Cast boolean flags back to the reference's INTEGER 0/1 storage
    (databaseImport.py:194,:226,:230,:250)."""
    for c in BOOL_FLAG_COLUMNS.get(table_name, ()):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast("int"))
    return df


def tags_agg(tables: dict[str, DataFrame]) -> DataFrame:
    """repo_id → sorted tag array (deterministic order)."""
    return (
        tables["tags_in_repo"]
        .groupBy("repo_id")
        .agg(F.array_sort(F.collect_list("tag_name")).alias("tags"))
    )
