"""SparkSession factory.

Defaults chosen for correctness parity with the reference's MariaDB
environment (UTC wall-clock timestamps — reference
extractor/databaseImport.py:860,:866 pins pytz.UTC) and for scale
(AQE on, skew-join handling, Arrow for any pandas exchange).

On a real cluster the same factory applies; only ``master`` and the
shuffle-partition count change (rule of thumb: 2-3× total executor
cores, here tied to local core count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "hfcommunity-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    shuffle = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Reference pins UTC for every DATETIME (databaseImport.py:860)
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime coalescing, skew-join splitting, dynamic join
        # strategy switch — load-bearing at 100 TB (mega-repo skew is a
        # documented reference pathology, databaseImport.py:374-382).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # allow Python data sources (sources/hubfeed_datasource.py) to
        # receive pushed filters
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # guarded limit(max+1) collects are the codebook's bounded-
        # collect discipline (graph merge probe, span delta, a16 cap);
        # the default CollectLimit scans 1 partition then scales up in
        # rounds — 3-4 jobs of pure overhead per guard when the limit
        # is not reached (the common case).  Scanning at session width
        # from the start makes every guard a single job.
        .config("spark.sql.limit.initialNumPartitions", str(shuffle))
        # local mode: one JVM is driver AND all 32 executor threads,
        # plus every session-persisted index frame (shingle posting
        # list, minhash bands, cosine pair set, ...).  8g measurably
        # GC-thrashes late in the 127-query bench (samp_* family ran
        # 2-5x slower than in isolation); 24g restores isolation-level
        # timings.  On a real cluster executors carry the cached
        # frames and the driver default can drop back down.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
