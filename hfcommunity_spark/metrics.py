"""The reference's published metrics catalog (docs/metrics.html,
computed Sept 1 2022) as named queries over the 17-table schema.

Each function takes the table dict (name → DataFrame, schemas per
``schema.SCHEMAS``) and returns exactly the chart shape of the
reference page (docs/metrics.html:244-392 holds the original result
data).  All are thin Catalyst plans: broadcast dim joins + grouped
counts; every one scales as a scan + one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FILE_BUCKETS = ((1, "1"), (5, "2-5"), (10, "6-10"), (15, "11-15"), (50, "16-50"))
DISC_BUCKETS = ((1, "1"), (5, "2-5"), (10, "6-10"))


def _bucketize(cnt: Column, edges, last: str) -> Column:
    out = None
    prev = 0
    for hi, label in edges:
        cond = cnt.between(prev + 1, hi)
        out = F.when(cond, label) if out is None else out.when(cond, label)
        prev = hi
    return out.otherwise(last)


def m1_top_orgs(tables: dict[str, DataFrame], k: int = 10) -> DataFrame:
    """'Most active organization creating models' — top-k authors by
    model count (docs/metrics.html:83-93; top hit was huggingtweets
    with 2,904 models, :244-266)."""
    model = tables["model"]
    repo = tables["repository"]
    joined = model.join(
        repo.select(F.col("id").alias("model_id"), "author"), "model_id"
    ).filter(F.col("author").isNotNull())
    return (
        joined.groupBy("author")
        .agg(F.count(F.lit(1)).alias("n_models"))
        .orderBy(F.desc("n_models"), F.asc("author"))
        .limit(k)
    )


def m2_files_per_repo_hist(tables: dict[str, DataFrame]) -> DataFrame:
    """Repos bucketed by file count {1,2-5,6-10,11-15,16-50,>50}
    (docs/metrics.html:268-288; 14.8% of repos have a single file)."""
    per_repo = tables["repo_file"].groupBy("repo_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bucket = _bucketize(F.col("cnt"), FILE_BUCKETS, ">50")
    return per_repo.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_repos")
    )


def m3_paperswithcode_split(tables: dict[str, DataFrame]) -> DataFrame:
    """Datasets with vs without a paperswithcode_id (596 / 7291 on the
    reference snapshot, docs/metrics.html:290-303)."""
    return tables["dataset"].groupBy(
        F.col("paperswithcode_id").isNotNull().alias("has_pwc")
    ).agg(F.count(F.lit(1)).alias("n_datasets"))


def m4_pct_repos_with_discussions(tables: dict[str, DataFrame]) -> DataFrame:
    """Gauge: % of repos with ≥1 discussion, per repo type (1632/61508
    models, 704/7887 datasets, 465/7691 spaces —
    docs/metrics.html:305-321)."""
    repo = tables["repository"]
    with_disc = tables["discussion"].select("repo_id").distinct()
    flagged = repo.join(
        with_disc, repo["id"] == with_disc["repo_id"], "left"
    ).select("type", F.col("repo_id").isNotNull().alias("has_disc"))
    return flagged.groupBy("type").agg(
        F.count(F.lit(1)).alias("n_repos"),
        F.sum(F.col("has_disc").cast("long")).alias("n_with_discussions"),
        (
            F.sum(F.col("has_disc").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
            * 100
        ).alias("pct_with_discussions"),
    )


def m5_discussions_per_repo_hist(tables: dict[str, DataFrame]) -> DataFrame:
    """Repos bucketed by discussion count {1,2-5,6-10,>10}
    (docs/metrics.html:323-344)."""
    per_repo = tables["discussion"].groupBy("repo_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bucket = _bucketize(F.col("cnt"), DISC_BUCKETS, ">10")
    return per_repo.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_repos")
    )


def m6_avg_comments_per_discussion(tables: dict[str, DataFrame]) -> DataFrame:
    """Average comment events per discussion, per repo, bucketed
    (docs/metrics.html:346-364)."""
    comments = (
        tables["discussion_event"]
        .filter(F.col("event_type") == "comment")
        .groupBy("repo_id", "discussion_num")
        .agg(F.count(F.lit(1)).alias("n_comments"))
    )
    disc = tables["discussion"].select(
        "repo_id", F.col("num").alias("discussion_num")
    )
    per_disc = disc.join(comments, ["repo_id", "discussion_num"], "left").select(
        "repo_id", F.coalesce("n_comments", F.lit(0)).alias("n_comments")
    )
    per_repo = per_disc.groupBy("repo_id").agg(
        F.avg("n_comments").alias("avg_comments")
    )
    bucket = (
        F.when(F.col("avg_comments") < 1, "<1")
        .when(F.col("avg_comments") < 2, "1-2")
        .when(F.col("avg_comments") < 5, "2-5")
        .otherwise(">=5")
    )
    return per_repo.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_repos")
    )


def m7_owner_discussion_share(tables: dict[str, DataFrame]) -> DataFrame:
    """Who starts discussions: per repo, % authored by the repo owner,
    log-bucketed (docs/metrics.html:191-214, chart :366-392 — the
    inequality join discussion.author <> repository.author)."""
    disc = tables["discussion"].alias("d")
    repo = tables["repository"].alias("r")
    joined = disc.join(repo, F.col("d.repo_id") == F.col("r.id")).select(
        F.col("d.repo_id").alias("repo_id"),
        # null-safe: a NULL owner (or NULL discussion author) is NOT an
        # owner-authored discussion — the plain == would make every
        # comparison NULL, the per-repo sum NULL, and the bucket CASE
        # fall through to '100%' (round-6 review finding; eqNullSafe
        # would be wrong the other way, counting NULL==NULL as owned)
        F.coalesce(
            F.col("d.author") == F.col("r.author"), F.lit(False)
        ).alias("by_owner"),
    )
    per_repo = joined.groupBy("repo_id").agg(
        (
            F.sum(F.col("by_owner").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
            * 100
        ).alias("pct_owner")
    )
    bucket = (
        F.when(F.col("pct_owner") == 0, "0%")
        .when(F.col("pct_owner") <= 1, "<=1%")
        .when(F.col("pct_owner") <= 10, "<=10%")
        .when(F.col("pct_owner") < 100, "<100%")
        .otherwise("100%")
    )
    return per_repo.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_repos")
    )


def m8_file_modification_counts(
    tables: dict[str, DataFrame], repo_id: str | None = None
) -> DataFrame:
    """'How often a file is modified in a repository?' — the heatmap's
    data (docs/metrics.html, resources/figs/heatmap.png): per file,
    how many commits touched it, optionally scoped to one repository
    like the published example.  modified_file → files_in_commit →
    commits chain; at scale two equi-joins on surrogate/sha keys with
    a (repo, file) partial-agg rollup."""
    mf = tables["modified_file"].select("modified_file_id", "rfilename")
    fic = tables["files_in_commit"]
    commits = tables["commits"].select("sha", "repo_id")
    j = (
        mf.join(fic, "modified_file_id")
        .join(commits, "sha")
    )
    if repo_id is not None:
        j = j.filter(F.col("repo_id") == repo_id)
    return j.groupBy("repo_id", "rfilename").agg(
        F.count(F.lit(1)).alias("n_modifications")
    )


ALL_METRICS = {
    "m1_top_orgs": m1_top_orgs,
    "m2_files_per_repo_hist": m2_files_per_repo_hist,
    "m3_paperswithcode_split": m3_paperswithcode_split,
    "m4_pct_repos_with_discussions": m4_pct_repos_with_discussions,
    "m5_discussions_per_repo_hist": m5_discussions_per_repo_hist,
    "m6_avg_comments_per_discussion": m6_avg_comments_per_discussion,
    "m7_owner_discussion_share": m7_owner_discussion_share,
    "m8_file_modification_counts": m8_file_modification_counts,
}
