"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` exposes every declared operator from SURVEY.md §2 as a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` provides
the DuckDB-equivalent SQL for the value-hash correctness gate.
Implementation lives in ``hfcommunity_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hfcommunity_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the final-mile export composite (round 6): the
    five-stage curation survivor set, ranked by DSIR importance and
    cut to the top-K, dealt into seeded epoch shards and packed into
    token-budget context windows per shard — the complete
    curate → select → shard → pack chain a pretraining run exports,
    in one declared, oracle-checked query."""
    from hfcommunity_spark.operators.curation import (
        pipe_curate_select_pack_shard,
    )

    return pipe_curate_select_pack_shard(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; omitted for genuinely
    non-SQL-expressible ops (driver then records a rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
