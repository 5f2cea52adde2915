"""S4/S5 correlated point-lookup fetchers through the map_fetch seam
with fixture fetchers (the reference's api.repo_info siblings and
get_repo_discussions/get_discussion_details lateral calls), plus
pipeline determinism: two runs of run_offline produce identical
snapshots."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hfcommunity_spark.etl.fetch import map_fetch
from hfcommunity_spark.etl.normalize import normalize_repo_files

SIBLINGS_FIXTURE = {
    "models/a/m1": [
        {"filename": "README.md", "size": 10, "blob_id": "b1", "lfs": None},
        {"filename": "model.bin", "size": 99, "blob_id": "b2",
         "lfs": {"size": 999, "pointer_size": 134, "sha": "l" * 40}},
    ],
    "models/a/m2": [
        {"filename": "weights.pt", "size": 5, "blob_id": "b3", "lfs": None},
    ],
}

FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo_id", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("blob_id", T.StringType()),
        T.StructField(
            "lfs",
            T.StructType(
                [
                    T.StructField("size", T.LongType()),
                    T.StructField("pointer_size", T.LongType()),
                    T.StructField("sha", T.StringType()),
                ]
            ),
        ),
    ]
)


def _siblings_fetcher(repo_id):
    """S4 fixture: repo_info(files_metadata=True).siblings
    (databaseImport.py:299) without the network."""
    return [dict(repo_id=repo_id, **s) for s in SIBLINGS_FIXTURE.get(repo_id, [])]


def test_map_fetch_siblings_to_repo_file(spark):
    keys = spark.createDataFrame(
        [("models/a/m1",), ("models/a/m2",), ("models/gone/x",)], ["repo_id"]
    )
    raw = map_fetch(keys, "repo_id", _siblings_fetcher, FILES_SCHEMA)
    out = normalize_repo_files(raw).collect()
    assert len(out) == 3  # missing repo fetched [] (defensive skip)
    by_fn = {r.filename: r for r in out}
    assert by_fn["model.bin"].lfs_size == 999
    assert by_fn["weights.pt"].lfs_size is None
    assert len({r.id for r in out}) == 3  # distinct surrogate keys


def test_pipeline_is_deterministic(spark):
    """Two independent runs over the same feeds produce identical
    tables — no arrival-order or partition-count dependence (the
    explicit-ordering contract of SURVEY §7's non-determinism risk)."""
    from hfcommunity_spark.etl import pipeline as P

    def build(shuffle):
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
        feeds = _feeds(spark)
        return P.run_offline(spark, *feeds)

    def snapshot(tables):
        return {
            name: sorted(
                tuple(str(v) for v in row) for row in df.collect()
            )
            for name, df in tables.items()
        }

    try:
        a = snapshot(build(4))
        b = snapshot(build(13))  # different parallelism
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", 8)
    assert a == b


def _feeds(spark):
    from hfcommunity_spark.etl import pipeline as P
    import json

    models = spark.createDataFrame(
        [
            dict(name="org/m1", author="org", sha="a" * 40,
                 last_modified=None, private=False, card_data=None,
                 gated="False", likes=1, disabled=False, tags=["x", "y"],
                 siblings=[], pipeline_tag=None, downloads=1,
                 library_name=None, config=None),
            dict(name="org/m2", author="org2", sha="b" * 40,
                 last_modified=None, private=False, card_data=None,
                 gated="manual", likes=2, disabled=False, tags=["y"],
                 siblings=[], pipeline_tag=None, downloads=2,
                 library_name=None, config=None),
        ],
        schema=P.MODEL_FEED_SCHEMA,
    )
    datasets = spark.createDataFrame([], schema=P.DATASET_FEED_SCHEMA)
    spaces = spark.createDataFrame([], schema=P.SPACE_FEED_SCHEMA)
    commits = spark.createDataFrame([], schema=P.COMMITS_FEED_SCHEMA)
    discussions = spark.createDataFrame([], schema=P.DISCUSSIONS_FEED_SCHEMA)
    return models, datasets, spaces, commits, discussions


def test_commit_threshold_skips_mega_repo(spark):
    """P4: a repo over the commit threshold loses its history (the
    repo itself survives — only populate_commits is skipped)."""
    from hfcommunity_spark.etl.pipeline import apply_commit_threshold

    rows = [("models/big/r", f"s{i:039d}") for i in range(5)] + [
        ("models/small/r", "t" + "0" * 39)
    ]
    feed = spark.createDataFrame(rows, ["repo_id", "sha"])
    out = apply_commit_threshold(feed, max_num_commits=3)
    assert [r.repo_id for r in out.collect()] == ["models/small/r"]
    assert apply_commit_threshold(feed, None).count() == 6
