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
    (databaseImport.py:858-868)."""
    if last_n_months is None:
        return F.to_timestamp(F.lit("1970-01-01 00:00:00"))
    return F.date_trunc(
        "month", F.add_months(F.current_timestamp(), -last_n_months)
    )


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
    stale rows update only ``stale_update_cols`` (D3, :609-618)."""
    fresh, stale = split_by_watermark(incoming, wm)
    out = upsert(existing, fresh, pk=list(pk))
    return partial_update(
        out, stale, pk=list(pk), update_cols=list(stale_update_cols)
    )
