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
from pyspark.sql.streaming import StreamingQuery

from hfcommunity_spark.operators.mergeops import insert_ignore


class SnapshotMergeSink:
    """foreachBatch target maintaining a PK-unique parquet snapshot."""

    def __init__(self, path: str, pk: Sequence[str],
                 order_by: Sequence[str]) -> None:
        self.path = path
        self.pk = list(pk)
        self.order_by = list(order_by)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            existing = spark.read.parquet(self.path)
        except Exception:  # first batch: no snapshot yet
            existing = batch_df.limit(0)
        merged = insert_ignore(existing, batch_df, self.pk, self.order_by)
        # localCheckpoint materializes the merge before the overwrite
        # truncates its own input (read-modify-write on one path)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            self.path
        )

    def attach(self, stream_df: DataFrame, checkpoint: str) -> StreamingQuery:
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .start()
        )
