"""Metric VALUE anchors: m1-m7 must reproduce the reference's
published Sept-2022 numbers (docs/metrics.html:244-392) on a fixture
engineered to embody them — not just return the right shape.

The fixture is generated entirely with spark.range + expressions (no
driver-side row lists): 77,086 repository rows (61,508 models / 7,887
datasets / 7,691 spaces — the published totals), the published top-10
model authors (huggingtweets 2,904 … masakhane 309), 2,801
discussion-having repos split 1,632/704/465 across types (the gauge
chart), discussion counts matching the donut {1: 2,284, 2-5: 460,
6-10: 42, >10: 15}, and comment/ownership classes for m6/m7.

m2's source chart counts 88,973 repos — more than the repository
total, because the published page mixes snapshot dates — so the
repo_file fixture reproduces its histogram standalone.  m6's published
x-axis is finer than our bucketing and m7's is log-scaled, so those
two anchor the same fixture classes mapped through our bucket
boundaries (documented inline).
"""

from __future__ import annotations

from functools import reduce

import pytest
from pyspark.sql import functions as F

from hfcommunity_spark.metrics import ALL_METRICS

TOP_AUTHORS = [  # docs/metrics.html:246 + :253 categories
    ("huggingtweets", 2904), ("Jeevesh8", 2402), ("Helsinki-NLP", 1384),
    ("jonatasgrosman", 1125), ("huseinzol05", 592), ("DOOGLAK", 564),
    ("CEBaB", 461), ("google", 379), ("facebook", 319), ("masakhane", 309),
]
N_MODELS, N_DATASETS, N_SPACES = 61508, 7887, 7691  # gauge denominators
D_MODELS, D_DATASETS, D_SPACES = 1632, 704, 465     # gauge numerators
N_FLAGGED = D_MODELS + D_DATASETS + D_SPACES        # 2,801
# donut "Repos per num of discussions" (:330-335): counts per bucket,
# realized as positions [0,2284) -> 1, … within the flagged ordering
DISC_CLASSES = [(2284, 1), (460, 2), (42, 6), (15, 11)]
# m6 comment classes mapped through our buckets: published categories
# 1/(1,1.5]/(1.5,2) sum to 2,079 repos with avg in [1,2) -> "1-2";
# 2/(2,5] sum to 680 -> "2-5"; (5,12] is 42 -> ">=5"
COMMENT_CLASSES = [(2079, 1), (680, 3), (42, 6)]
# m7 ownership classes (chart :366-392 is log-scaled so exact counts
# aren't recoverable; these anchor the operator's bucket semantics):
# first 100 flagged repos 0% owner-started, 131 two-discussion repos
# at 50%, the rest 100%
M7_ZERO, M7_HALF = 100, 131


def _steps(col, classes, values=None):
    """CASE over cumulative position ranges: classes=[(n, v), ...]."""
    out, lo = None, 0
    for n, v in classes:
        cond = col < F.lit(lo + n)
        lit = F.lit(v)
        out = F.when(cond, lit) if out is None else out.when(cond, lit)
        lo += n
    return out


@pytest.fixture(scope="module")
def tables(spark):
    # --- repository + model + dataset --------------------------------
    author_cases, lo = None, 0
    for name, n in TOP_AUTHORS:
        cond = F.col("id") < F.lit(lo + n)
        author_cases = (
            F.when(cond, name) if author_cases is None
            else author_cases.when(cond, name)
        )
        lo += n
    model_repo = spark.range(N_MODELS).select(
        F.concat(F.lit("models/r"), "id").alias("id"),
        F.lit("model").alias("type"),
        author_cases.otherwise(F.concat(F.lit("u"), "id")).alias("author"),
    )
    dataset_repo = spark.range(N_DATASETS).select(
        F.concat(F.lit("datasets/r"), "id").alias("id"),
        F.lit("dataset").alias("type"),
        F.concat(F.lit("du"), "id").alias("author"),
    )
    space_repo = spark.range(N_SPACES).select(
        F.concat(F.lit("spaces/r"), "id").alias("id"),
        F.lit("space").alias("type"),
        F.concat(F.lit("su"), "id").alias("author"),
    )
    repository = model_repo.unionByName(dataset_repo).unionByName(space_repo)
    model = model_repo.select(F.col("id").alias("model_id"))
    dataset = spark.range(N_DATASETS).select(
        F.concat(F.lit("datasets/r"), "id").alias("dataset_id"),
        F.when(F.col("id") < 596, F.concat(F.lit("pwc"), "id"))
        .alias("paperswithcode_id"),  # yes 596 / no 7291 (:292-293)
    )

    # --- repo_file: the published files-per-repo histogram (:248-255
    # of the donut block) with one representative count per bucket ----
    file_classes = [(13043, 1), (24672, 3), (31065, 8),
                    (12832, 13), (5227, 20), (1134, 60)]
    repo_file = (
        spark.range(sum(n for n, _ in file_classes))
        .select(
            F.concat(F.lit("f"), "id").alias("repo_id"),
            _steps(F.col("id"), file_classes).alias("cnt"),
        )
        .select("repo_id", F.explode(F.expr("sequence(1, cnt)")).alias("k"))
        .drop("k")
    )

    # --- discussions: flagged repos in a fixed global ordering -------
    # position p: models p<1632 -> models/r{p}; datasets -> p-1632;
    # spaces -> p-2336
    pos = spark.range(N_FLAGGED)
    repo_id = (
        F.when(F.col("id") < D_MODELS, F.concat(F.lit("models/r"), F.col("id")))
        .when(
            F.col("id") < D_MODELS + D_DATASETS,
            F.concat(F.lit("datasets/r"), F.col("id") - D_MODELS),
        )
        .otherwise(
            F.concat(F.lit("spaces/r"), F.col("id") - D_MODELS - D_DATASETS)
        )
    )
    flagged = pos.select(
        F.col("id").alias("p"),
        repo_id.alias("repo_id"),
        _steps(F.col("id"), DISC_CLASSES).alias("n_disc"),
        _steps(F.col("id"), COMMENT_CLASSES).alias("n_comments"),
    ).join(repository.select(F.col("id").alias("repo_id"),
                             F.col("author").alias("owner")), "repo_id")
    discussion = flagged.select(
        "p", "repo_id", "owner", "n_comments",
        F.explode(F.expr("sequence(1, n_disc)")).alias("num"),
    ).select(
        "repo_id",
        "num",
        "n_comments",
        # m7 classes: p<100 -> stranger-only; 131 two-discussion repos
        # (p in [2284, 2415)) -> num 2 by a stranger; else owner
        F.when(F.col("p") < M7_ZERO, F.lit("stranger"))
        .when(
            (F.col("p") >= 2284) & (F.col("p") < 2284 + M7_HALF)
            & (F.col("num") == 2),
            F.lit("stranger"),
        )
        .otherwise(F.col("owner"))
        .alias("author"),
    )
    discussion_event = discussion.select(
        "repo_id",
        F.col("num").alias("discussion_num"),
        F.explode(F.expr("sequence(1, n_comments)")).alias("k"),
    ).select(
        "repo_id", "discussion_num", F.lit("comment").alias("event_type")
    )
    return {
        "repository": repository,
        "model": model,
        "dataset": dataset,
        "repo_file": repo_file,
        "discussion": discussion.drop("n_comments"),
        "discussion_event": discussion_event,
    }


def test_m1_top_orgs_published_values(tables):
    got = [(r.author, r.n_models)
           for r in ALL_METRICS["m1_top_orgs"](tables).collect()]
    assert got == TOP_AUTHORS  # huggingtweets 2,904 first (:246)


def test_m2_files_per_repo_published_hist(tables):
    got = {r.bucket: r.n_repos
           for r in ALL_METRICS["m2_files_per_repo_hist"](tables).collect()}
    assert got == {"1": 13043, "2-5": 24672, "6-10": 31065,
                   "11-15": 12832, "16-50": 5227, ">50": 1134}


def test_m3_paperswithcode_published_split(tables):
    got = {r.has_pwc: r.n_datasets
           for r in ALL_METRICS["m3_paperswithcode_split"](tables).collect()}
    assert got == {True: 596, False: 7291}


def test_m4_discussion_gauge_published_values(tables):
    rows = ALL_METRICS["m4_pct_repos_with_discussions"](tables).collect()
    got = {r.type: (r.n_repos, r.n_with_discussions) for r in rows}
    assert got == {"model": (N_MODELS, D_MODELS),
                   "dataset": (N_DATASETS, D_DATASETS),
                   "space": (N_SPACES, D_SPACES)}
    pct = {r.type: r.pct_with_discussions for r in rows}
    # the gauge chart computes exactly n/total*100 (:311-313)
    assert pct["model"] == pytest.approx(1632 / 61508 * 100)
    assert pct["dataset"] == pytest.approx(704 / 7887 * 100)
    assert pct["space"] == pytest.approx(465 / 7691 * 100)


def test_m5_discussions_per_repo_published_donut(tables):
    got = {r.bucket: r.n_repos
           for r in ALL_METRICS["m5_discussions_per_repo_hist"](tables).collect()}
    assert got == {"1": 2284, "2-5": 460, "6-10": 42, ">10": 15}


def test_m6_avg_comments_buckets(tables):
    got = {r.bucket: r.n_repos
           for r in ALL_METRICS["m6_avg_comments_per_discussion"](tables).collect()}
    assert got == {"1-2": 2079, "2-5": 680, ">=5": 42}


def test_m7_owner_share_buckets(tables):
    got = {r.bucket: r.n_repos
           for r in ALL_METRICS["m7_owner_discussion_share"](tables).collect()}
    assert got == {"0%": M7_ZERO, "<100%": M7_HALF,
                   "100%": N_FLAGGED - M7_ZERO - M7_HALF}


def test_m8_file_modification_counts(spark):
    """The heatmap metric: per-file commit-touch counts through the
    modified_file -> files_in_commit -> commits chain, scopable to one
    repository like the published example."""
    mf = spark.createDataFrame(
        [("f1", "README.md"), ("f2", "model.bin")],
        ["modified_file_id", "rfilename"],
    )
    fic = spark.createDataFrame(
        [("s1", "f1"), ("s2", "f1"), ("s2", "f2")],
        ["sha", "modified_file_id"],
    )
    commits = spark.createDataFrame(
        [("s1", "models/org/m1"), ("s2", "models/org/m1")],
        ["sha", "repo_id"],
    )
    tables = {"modified_file": mf, "files_in_commit": fic,
              "commits": commits}
    out = {
        r.rfilename: r.n_modifications
        for r in ALL_METRICS["m8_file_modification_counts"](
            tables, "models/org/m1"
        ).collect()
    }
    assert out == {"README.md": 2, "model.bin": 1}
    assert ALL_METRICS["m8_file_modification_counts"](
        tables, "other/repo"
    ).count() == 0
