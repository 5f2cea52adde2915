"""Streaming → snapshot merge sink: the bridge from Structured
Streaming to the ETL's merge semantics.

``foreachBatch`` hands each micro-batch to the same ``insert_ignore``
/ ``upsert`` operators the batch ETL uses (SURVEY §2.8), so a stream
of repo/event updates lands in the Parquet snapshot with identical
conflict semantics to a monthly batch run — D1/D2 are the contract,
batch or streaming.

State note: cross-batch dedup belongs to the stream side
(dropDuplicatesWithinWatermark, bounded state); the sink-side
insert_ignore guards against replays beyond the watermark horizon
(at-least-once file sources, checkpoint recovery) at the cost of one
PK join against the snapshot per micro-batch — bounded by snapshot
partition pruning on the PK's partition column in production.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from hfcommunity_spark.operators.mergeops import insert_ignore

BUCKET_COL = "pk_bucket"


class SnapshotMergeSink:
    """foreachBatch target maintaining a PK-unique parquet snapshot.

    ``n_buckets=None`` (legacy) rewrites the whole snapshot per
    micro-batch — O(snapshot) writes, fine at monthly cadence.  With
    ``n_buckets=N`` the snapshot is hash-partitioned on
    ``pk_bucket = pmod(xxhash64(pk), N)`` and each micro-batch:

    1. computes the batch's dirty buckets (≤ N values, driver-side
       metadata only),
    2. reads ONLY those partitions back (partition pruning on the
       filter — O(batch), not O(snapshot)),
    3. merges with D1 semantics, and
    4. rewrites only the dirty partitions via dynamic partition
       overwrite — untouched partitions keep their files byte-for-byte
       (asserted in tests/test_views_and_sink.py).

    At 100 TB this is the difference between a streaming sink and a
    nightly job: per-batch work scales with the batch and the bucket
    count, never the accumulated snapshot."""

    def __init__(self, path: str, pk: Sequence[str],
                 order_by: Sequence[str],
                 n_buckets: int | None = None) -> None:
        self.path = path
        self.pk = list(pk)
        self.order_by = list(order_by)
        self.n_buckets = n_buckets

    def read(self, spark) -> DataFrame:
        """The snapshot without the internal bucket column."""
        df = spark.read.parquet(self.path)
        return df.drop(BUCKET_COL) if self.n_buckets else df

    def _snapshot_exists(self, spark) -> bool:
        """Explicit bootstrap detection through the Hadoop FS API (works
        for any scheme the snapshot path uses, not just local files).
        The bare try/except that used to guard the read treated EVERY
        read failure as 'no snapshot yet' — a transient error (perms,
        corrupt footer) would then dynamic-partition-overwrite dirty
        buckets without merging, silently dropping sunk rows (ADVICE
        r4).  Now only true absence bootstraps; real read errors
        propagate so the micro-batch fails and retries.

        True absence includes an existing directory with NO committed
        data file: a crash during the very first write leaves the dir
        with only ``_temporary``/marker entries, and treating that as
        an existing snapshot would fail schema inference on every
        retry — the stream could never bootstrap (round-5 review
        finding).  A committed parquet footer that is merely corrupt
        still counts as existing, so that failure mode continues to
        propagate instead of overwriting."""
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return False
        base = fs.makeQualified(jpath).toString().rstrip("/")
        it = fs.listFiles(jpath, True)  # recursive over partition dirs
        while it.hasNext():
            p = it.next().getPath().toString()
            rel = p[len(base):].lstrip("/")
            # committed data files only: every path segment must be
            # visible (skips _temporary/** leftovers, _SUCCESS markers,
            # dot-hidden commit metadata) — the same rule Spark's own
            # file listing applies
            if all(not seg.startswith(("_", ".")) for seg in rel.split("/")):
                return True
        return False

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.n_buckets is None:
            if self._snapshot_exists(spark):
                existing = spark.read.parquet(self.path)
            else:  # first batch: no snapshot yet
                existing = batch_df.limit(0)
            merged = insert_ignore(
                existing, batch_df, self.pk, self.order_by
            )
            # localCheckpoint materializes the merge before the overwrite
            # truncates its own input (read-modify-write on one path)
            merged.localCheckpoint(eager=True).write.mode(
                "overwrite"
            ).parquet(self.path)
            return
        batch = batch_df.withColumn(
            BUCKET_COL,
            F.pmod(F.xxhash64(*self.pk), F.lit(self.n_buckets)).cast("int"),
        )
        dirty = sorted(
            r[0] for r in batch.select(BUCKET_COL).distinct().collect()
        )
        if self._snapshot_exists(spark):
            existing = spark.read.parquet(self.path).filter(
                F.col(BUCKET_COL).isin(dirty)
            )
        else:  # first batch: no snapshot yet
            existing = batch.limit(0)
        merged = insert_ignore(existing, batch, self.pk, self.order_by)
        (
            merged.localCheckpoint(eager=True)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .parquet(self.path)
        )

    def attach(self, stream_df: DataFrame, checkpoint: str) -> StreamingQuery:
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .start()
        )
