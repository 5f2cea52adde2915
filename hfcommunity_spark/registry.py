"""Declared-query registry.

Every operator from SURVEY.md §2 that we claim as implemented registers
here with (a) a Spark builder ``(spark, sf_dir) -> DataFrame`` and
(b) an equivalent ANSI-SQL oracle string for DuckDB, or ``None`` for
genuinely non-SQL-expressible ops (streaming state, iterative algos).

Determinism contract (the driver hash-compares values):
- Every computed/aggregate column is aliased identically on both sides.
- Floating-point aggregates go through exact DECIMAL arithmetic and are
  cast to DOUBLE at the end, so Spark and DuckDB produce bit-identical
  doubles regardless of partial-aggregation order.
- Top-k / ranking queries carry a total-order tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB, None => rows-only check
    survey_ids: tuple[str, ...]  # SURVEY.md §2 operator ids covered


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, survey: str = ""):
    """Decorator registering a declared query."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            spark=fn,
            oracle=oracle,
            survey_ids=tuple(s.strip() for s in survey.split(",") if s.strip()),
        )
        return fn

    return deco
