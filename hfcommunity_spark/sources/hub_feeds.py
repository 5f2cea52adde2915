"""JSONL feed readers: the scale path for the Hub listing scans.

The reference pages the live API sorted+limited (databaseImport.py:597,
:685, :765) — fine for one thread, hopeless for a cluster.  At 100 TB
the listing is landed as JSONL dumps (one line per repo, the same
fields the API returns) and read with an explicit schema — no
inference pass, full partition parallelism, and the watermark filter
(P2) prunes at the scan.

Schemas are the exact feed StructTypes the pipeline consumes
(etl.pipeline.*_FEED_SCHEMA), so ``run_offline`` runs unchanged from
files on disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hfcommunity_spark.etl.pipeline import (
    COMMITS_FEED_SCHEMA,
    DATASET_FEED_SCHEMA,
    DISCUSSIONS_FEED_SCHEMA,
    MODEL_FEED_SCHEMA,
    SPACE_FEED_SCHEMA,
)

FEED_SCHEMAS = {
    "models": MODEL_FEED_SCHEMA,
    "datasets": DATASET_FEED_SCHEMA,
    "spaces": SPACE_FEED_SCHEMA,
    "commits": COMMITS_FEED_SCHEMA,
    "discussions": DISCUSSIONS_FEED_SCHEMA,
}


def read_feed(spark: SparkSession, path: str, kind: str) -> DataFrame:
    """Schema-enforced JSONL read of one feed.  Malformed lines fail
    fast (FAILFAST) — a corrupt dump should stop the load, mirroring
    the reference's fail-and-log behavior rather than silently
    nulling."""
    if kind not in FEED_SCHEMAS:
        raise ValueError(f"unknown feed kind {kind!r}; one of {sorted(FEED_SCHEMAS)}")
    return (
        spark.read.schema(FEED_SCHEMAS[kind])
        .option("mode", "FAILFAST")
        # [XXXXX] accepts 'Z', '+00:00', and any numeric offset —
        # datetime.isoformat() of a tz-aware value emits '+00:00',
        # which the previous literal-'Z'-only pattern FAILFASTed on
        # (round-6 review finding); naive values still parse
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][XXXXX]")
        .json(path)
    )


def read_all_feeds(spark: SparkSession, base_dir: str) -> dict[str, DataFrame]:
    """Read the five feeds from ``{base_dir}/{kind}.jsonl``."""
    return {k: read_feed(spark, f"{base_dir}/{k}.jsonl", k) for k in FEED_SCHEMAS}
