"""Watermark incrementality (SURVEY §2.2 P2 / §2.7 U3 / §2.8 D3).

The reference's ``-i N`` flag computes ``limit_date`` = month-floor of
now − N months in UTC (databaseImport.py:858-868; epoch default :860)
and splits repos into:
- fresh  (last_modified ≥ limit_date): full re-extract via upsert
- stale  (last_modified <  limit_date): cheap partial UPDATE of
  likes (repository) / downloads (model, dataset) only (:609-618,
  :697-706, :777-781)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hfcommunity_spark.operators.mergeops import partial_update, upsert


def limit_date(last_n_months: int | None) -> Column:
    """Month-floor of now − n months, UTC; epoch when no window is set
    (databaseImport.py:858-868).  Resolved ONCE on the driver
    (:func:`limit_date_value`) — embedding ``current_timestamp()``
    would re-evaluate per Spark action, splitting stale/fresh
    differently across a multi-action run (round-5 review finding)."""
    return F.lit(limit_date_value(last_n_months))


def split_by_watermark(
    incoming: DataFrame, wm: Column, ts_col: str = "last_modified"
) -> tuple[DataFrame, DataFrame]:
    """(fresh, stale) partition of the incoming scan — the predicate at
    databaseImport.py:608 (:696, :776). NULL last_modified is treated
    as fresh (the reference's `<` comparison would throw row-at-a-time;
    set semantics must decide — fresh is the safe side)."""
    is_stale = F.col(ts_col).isNotNull() & (F.col(ts_col) < wm)
    return incoming.filter(~is_stale), incoming.filter(is_stale)


def incremental_repository_load(
    existing: DataFrame,
    incoming: DataFrame,
    wm: Column,
    stale_update_cols: tuple[str, ...] = ("likes",),
    pk: tuple[str, ...] = ("id",),
) -> DataFrame:
    """One-pass incremental load of a repository-shaped table:
    fresh rows take the full upsert path (D2, databaseImport.py:641),
    stale rows update only ``stale_update_cols`` (D3, :609-618).

    This is the MIXED-incoming variant (one frame holding fresh and
    stale rows together).  The release CLI instead splits stale repos
    out of the feeds before the pipeline runs and merges with
    :func:`incremental_release_merge` — use this form when incoming
    rows arrive pre-built (e.g. a notebook upsert against one
    table)."""
    fresh, stale = split_by_watermark(incoming, wm)
    # deterministic within-batch dedup, same discipline as
    # incremental_release_merge's det_order: newest-first recency for
    # the upsert path, then the remaining columns as a total
    # tie-break — a bare dropDuplicates pick would let two identical
    # runs publish different rows (round-6 review finding)
    def _order(df: DataFrame):
        cols = [c for c in df.columns if c not in pk]
        rec = [F.desc(c) for c in ("last_modified",) if c in cols]
        rest = [F.col(c) for c in sorted(cols) if c != "last_modified"]
        return (rec + rest) or None

    out = upsert(existing, fresh, pk=list(pk), order_by=_order(fresh))
    return partial_update(
        out, stale, pk=list(pk), update_cols=list(stale_update_cols),
        order_by=_order(stale),
    )


def limit_date_value(last_n_months: int | None):
    """Driver-side twin of :func:`limit_date`: ONE resolved datetime
    per run, like the reference pinning limit_date at startup
    (:858-868).  Embedding ``current_timestamp()`` in the plan instead
    would re-evaluate per Spark ACTION — a 17-table snapshot written
    across a month boundary would then split stale/fresh differently
    per table (round-5 review finding)."""
    from datetime import datetime, timezone

    # tz-AWARE values: PySpark converts a naive datetime literal via
    # the driver's OS timezone (time.mktime), which would shift the
    # watermark by the host's UTC offset (round-5 review finding)
    if last_n_months is None:
        return datetime(1970, 1, 1, tzinfo=timezone.utc)
    now = datetime.now(timezone.utc)
    months = now.year * 12 + now.month - 1 - last_n_months
    return datetime(months // 12, months % 12 + 1, 1,
                    tzinfo=timezone.utc)


# Per-table merge strategy for incremental releases, mirroring the
# reference's write statements: INSERT IGNORE tables keep the
# first-ever row (:277 tags, :392-396 author stubs, :401 commits);
# upsert tables take the newest row (:285-317 repo_file, :640
# repository); discussion updates only its status (:490-492); author
# merges by source priority (mergeops.author_priority_merge).
INSERT_IGNORE_TABLES = frozenset({
    "tag", "commits", "tags_in_repo", "models_in_space",
    "datasets_in_space", "commit_parents", "files_in_commit",
    "conflicting_files_discussion", "discussion_event", "modified_file",
})


def incremental_release_merge(
    prev_tables: dict[str, DataFrame],
    cur_tables: dict[str, DataFrame],
    stale_updates: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Carry a previous release forward under each table's own merge
    semantics, then apply the stale repos' likes/downloads refresh
    (the reference's UPDATE-then-CONTINUE path, :608-619, as set
    operations).  ``cur_tables`` must already exclude stale repos'
    contributions (the CLI splits them out of the feeds);
    ``stale_updates`` maps repo type → (id, likes[, downloads]).

    Every merge carries an explicit deterministic ``order_by`` (the
    sorted non-PK columns): Spark has no insertion order, so without
    one a duplicate-PK row in the current run would be resolved by an
    arbitrary pick and two identical runs could publish different
    releases (round-5 review finding)."""
    from hfcommunity_spark.operators.mergeops import (
        author_priority_merge,
        insert_ignore,
    )
    from hfcommunity_spark.schema import PRIMARY_KEYS, SCHEMAS

    # Recency columns sort first, direction per merge contract: upsert
    # tables are last-writer-wins ("order_by descending-first should be
    # arranged by the caller" — mergeops.upsert), so a duplicate-PK feed
    # row resolves to the NEWEST version; INSERT IGNORE tables are
    # first-writer-wins (MariaDB keeps the first arrival), so there a
    # within-batch duplicate resolves to the OLDEST version — ascending
    # recency (round-5 review finding; round-5 ADVICE divergence fix).
    recency = ("last_modified", "created_at", "author_date",
               "committer_date")

    def det_order(df: DataFrame, pk: list[str], newest_first: bool):
        cols = [c for c in df.columns if c not in pk]
        direction = F.desc if newest_first else F.asc
        rec = [direction(c) for c in recency if c in cols]
        rest = [F.col(c) for c in sorted(cols) if c not in recency]
        # None for pk-only link tables: the row IS its key, so the
        # dropDuplicates fallback is already deterministic there
        return (rec + rest) or None

    out: dict[str, DataFrame] = {}
    for name in SCHEMAS:
        prev, cur = prev_tables[name], cur_tables[name]
        pk = list(PRIMARY_KEYS[name])
        order = det_order(cur, pk,
                          newest_first=name not in INSERT_IGNORE_TABLES)
        if name == "author":
            out[name] = author_priority_merge(prev, cur)
        elif name in INSERT_IGNORE_TABLES:
            out[name] = insert_ignore(prev, cur, pk=pk, order_by=order)
        elif name == "discussion":
            out[name] = upsert(
                prev, cur, pk=pk, update_cols=["status"], order_by=order
            )
        else:
            out[name] = upsert(prev, cur, pk=pk, order_by=order)

    if stale_updates:
        likes = stale_updates["model"].select("id", "likes")
        for t in ("dataset", "space"):
            likes = likes.unionByName(
                stale_updates[t].select("id", "likes")
            )
        out["repository"] = partial_update(
            out["repository"], likes, pk=["id"], update_cols=["likes"],
            order_by=[F.desc("likes")],  # duplicate stale rows: counters
            # only grow, so the max is the latest observation
        )
        for t in ("model", "dataset"):
            idcol = f"{t}_id"
            out[t] = partial_update(
                out[t],
                stale_updates[t].select(
                    F.col("id").alias(idcol), "downloads"
                ),
                pk=[idcol], update_cols=["downloads"],
                order_by=[F.desc("downloads")],
            )
    return out
