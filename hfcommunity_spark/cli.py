"""Reference-parity ETL entry point.

Mirrors the reference's ``python databaseImport.py`` CLI
(reference/extractor/databaseImport.py:828-951) flag for flag, on the
set-at-a-time architecture:

  -c              create the 17-table schema and exit (:885-890)
  -t TYPE         model | dataset | space | all (:840)
  -i N            month window: watermark = month-floor(now − N months)
                  (:858-868); with --prev-release, stale repository
                  rows take the partial-update path (likes only, D3
                  :609-618) instead of the full upsert
  -s MAX_COMMITS  commit-count threshold skip (:374-382)
  --skiplist      comma-separated repo ids to exclude (P3, :624)

Where the reference pages the live API row-at-a-time into MariaDB,
this entry point reads the five JSONL feeds (``sources/hub_feeds.py``
— the landed-dump scale path; ``etl/hub_live.py`` produces the same
rows from the live API when ``huggingface_hub`` is installed), builds
all 17 tables as one declarative plan (``etl/pipeline.run_offline``),
and writes immutable release snapshots (``io.write_snapshot`` —
directory-commit idempotency instead of INSERT IGNORE).  The closing
wall-clock report mirrors :946-951.

Usage:
  python -m hfcommunity_spark.cli --feeds DIR --base DIR --release R \\
      [-t all] [-i 6] [-s 10000] [--prev-release R0] [--skiplist a,b]
  python -m hfcommunity_spark.cli --base DIR -c
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import SparkSession

from hfcommunity_spark.etl import pipeline
from hfcommunity_spark.etl.incremental import (
    incremental_repository_load,
    limit_date,
)
from hfcommunity_spark.io import write_snapshot
from hfcommunity_spark.schema import SCHEMAS
from hfcommunity_spark.sources import hub_feeds

REPO_TYPES = ("model", "dataset", "space")


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hfcommunity_spark.cli",
        description="HFCommunity ETL: JSONL feeds -> 17-table snapshot",
    )
    p.add_argument("-t", "--type", default="all",
                   choices=(*REPO_TYPES, "all"))
    p.add_argument("-i", "--months", type=int, default=None,
                   help="watermark window in months (month-floored)")
    p.add_argument("-s", "--max-commits", type=int, default=None,
                   help="skip commit history of repos above this count")
    p.add_argument("-c", "--create-schema", action="store_true",
                   help="create the 17-table schema and exit")
    p.add_argument("--feeds", help="directory of {kind}.jsonl feeds")
    p.add_argument("--base", required=True,
                   help="snapshot root (and schema location for -c)")
    p.add_argument("--release", default=None,
                   help="release tag for this snapshot run")
    p.add_argument("--prev-release", default=None,
                   help="previous release to load incrementally against")
    p.add_argument("--skiplist", default="",
                   help="comma-separated repo ids to exclude (P3)")
    p.add_argument("--sql", default=None, metavar="QUERY",
                   help="analysis mode: run SQL over the release's 17 "
                        "tables (registered as views) and print rows")
    p.add_argument("--metric", default=None,
                   help="analysis mode: run a published metric by name "
                        "(metrics.ALL_METRICS) over the release")
    p.add_argument("--limit", type=int, default=50,
                   help="max rows printed in analysis mode")
    return p


def _register_release(spark: SparkSession, base: str,
                      release: str) -> dict[str, "object"]:
    """Register the 17 snapshot tables of one release as temp views —
    the analysis entry point the reference delegates to the MariaDB
    client (SURVEY §3.3): user SQL goes straight to Catalyst."""
    tables = {}
    for name in SCHEMAS:
        df = spark.read.schema(SCHEMAS[name]).parquet(
            f"{base}/{name}/release={release}"
        )
        df.createOrReplaceTempView(name)
        tables[name] = df
    return tables


def run(spark: SparkSession, args: argparse.Namespace) -> dict[str, int]:
    """The populate lifecycle (:828 main body).  Returns per-table row
    counts (the :946-951 report data)."""
    feeds = hub_feeds.read_all_feeds(spark, args.feeds)
    # -t: unselected repo types flow as empty frames — the pipeline
    # plan is identical, the scans are zero-row
    selected = REPO_TYPES if args.type == "all" else (args.type,)
    for kind, t in (("models", "model"), ("datasets", "dataset"),
                    ("spaces", "space")):
        if t not in selected:
            feeds[kind] = feeds[kind].limit(0)

    skiplist = tuple(s for s in args.skiplist.split(",") if s)
    tables = pipeline.run_offline(
        spark,
        feeds["models"], feeds["datasets"], feeds["spaces"],
        feeds["commits"], feeds["discussions"],
        skiplist=skiplist,
        max_num_commits=args.max_commits,
    )

    if args.prev_release is not None:
        # D2/D3 incremental: fresh rows full-upsert onto the previous
        # release, stale rows (older than the -i watermark) update
        # likes only — databaseImport.py:608-619 as one set operation
        prev = spark.read.schema(SCHEMAS["repository"]).parquet(
            f"{args.base}/repository/release={args.prev_release}"
        )
        tables["repository"] = incremental_repository_load(
            prev, tables["repository"], limit_date(args.months)
        )

    counts: dict[str, int] = {}
    for name, df in tables.items():
        write_snapshot(df, args.base, name, args.release)
        counts[name] = spark.read.parquet(
            f"{args.base}/{name}/release={args.release}"
        ).count()
    return counts


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    from hfcommunity_spark.session import get_spark

    spark = get_spark(app_name="hfcommunity-etl")
    if args.create_schema:
        from hfcommunity_spark.catalog import create_schema

        created = create_schema(spark, args.base)
        print(f"schema: created {len(created)} tables at {args.base}")
        return 0
    if args.sql or args.metric:
        if not args.release:
            print("error: --release is required for analysis mode",
                  file=sys.stderr)
            return 2
        tables = _register_release(spark, args.base, args.release)
        if args.sql:
            df = spark.sql(args.sql)
        else:
            from hfcommunity_spark.metrics import ALL_METRICS

            if args.metric not in ALL_METRICS:
                print(f"error: unknown metric {args.metric!r}; one of "
                      f"{sorted(ALL_METRICS)}", file=sys.stderr)
                return 2
            df = ALL_METRICS[args.metric](tables)
        df.show(args.limit, truncate=False)
        return 0
    if not args.feeds or not args.release:
        print("error: --feeds and --release are required for a load",
              file=sys.stderr)
        return 2

    t0 = time.monotonic()
    counts = run(spark, args)
    elapsed = time.monotonic() - t0
    for name in sorted(counts):
        print(f"{name:24s} {counts[name]:>10d}")
    print(f"populated {len(counts)} tables in {elapsed:.1f}s "
          f"(release={args.release})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
