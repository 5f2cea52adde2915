"""Streaming transforms, written mode-agnostically: each takes a
DataFrame (batch or streaming — Spark's unified API) and returns the
transformed frame, so the identical plan is testable in batch and
runs under ``readStream`` with state + watermarking in production.

X1 source    : ``read_event_stream`` (file source here; swap format
               for kafka/rate in production — the plan is unchanged)
X2 watermark : ``withWatermark`` on event time, the streaming analog
               of the reference's batch limit_date (:858-868)
X3 windows   : tumbling + sliding via ``window()``
X4 sessions  : ``session_window`` with a 30 min gap
X5 dedup     : ``dropDuplicatesWithinWatermark`` — D1 INSERT IGNORE
               semantics under bounded state
X6 late data : watermark-discard, exercised in tests
X7 enrich    : stream-static broadcast join against a dim table

Scale notes: windowed aggregations shuffle on (window, key) — uniform
by construction; state store size is bounded by watermark horizon ×
key cardinality; the static side of X7 is broadcast so the stream
never shuffles for the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DEFAULT_WATERMARK = "10 minutes"
SESSION_GAP = "30 minutes"


def read_event_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """X1: file-based event stream with explicit schema (streaming
    sources cannot infer).  One file per micro-batch when
    ``max_files_per_trigger=1`` — the test harness for watermark and
    state semantics."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def tumbling_counts(events: DataFrame,
                    size: str = "1 hour",
                    watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """X2+X3: event-time tumbling window counts + sums.  A tumbling
    window IS a sliding window whose slide equals its size — delegate
    so the X3 twins cannot drift (their agg/projection used to be two
    verbatim copies; round-6 review finding)."""
    return sliding_counts(events, size=size, slide=size,
                          watermark=watermark)


def sliding_counts(events: DataFrame,
                   size: str = "1 hour", slide: str = "30 minutes",
                   watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """X3: sliding windows — each event lands in size/slide windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts(events: DataFrame, gap: str = SESSION_GAP,
                   watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """X4: gap-based session windows per user; a session closes once
    the watermark passes last-event + gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            "n_events",
            "last_ts",
        )
    )


def dedup_events(events: DataFrame,
                 watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """X5: stateful dedup on event_id with bounded state — streaming
    INSERT IGNORE (D1, databaseImport.py:277).

    ``dropDuplicatesWithinWatermark`` is streaming-only; the batch
    projection of the same pipeline is plain key dedup (state horizon
    is irrelevant when the whole input is one batch)."""
    if events.isStreaming:
        return events.withWatermark(
            "ts", watermark
        ).dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


def enrich_with_dim(events: DataFrame, dim: DataFrame,
                    stream_key: str, dim_key: str) -> DataFrame:
    """X7: stream-static join — dim broadcast per micro-batch, stream
    side never shuffles."""
    return events.join(
        F.broadcast(dim), events[stream_key] == dim[dim_key], "left"
    )


INTERVAL_HORIZON = "1 hour"


def interval_join(views: DataFrame, purchases: DataFrame,
                  watermark: str = DEFAULT_WATERMARK,
                  horizon: str = INTERVAL_HORIZON,
                  how: str = "inner") -> DataFrame:
    """X9/X18: stream-stream interval join — every purchase paired
    with the same user's views in the preceding ``horizon``.

    Both sides carry event-time watermarks and the join condition is
    an equi-key plus a bounded time range, which is exactly what Spark
    requires to age out join state: view state is kept at most
    ``watermark + horizon``, purchase state at most ``watermark``.
    Shuffle is on user_id for both streams (co-partitioned by the
    join).  In batch mode the same plan is a plain range join (the
    oracle's formulation); watermarks are no-ops there.

    ``how`` extends the face to the OUTER variants (X18 uses
    ``right_outer`` to preserve view-less purchases): in streaming,
    Spark emits the null-padded row only once the watermark proves no
    match can still arrive — the row is late by up to
    ``watermark + horizon``, never wrong.

    Inputs must be pre-projected: views(user_id, view_id, view_ts),
    purchases(user_id_p, purchase_id, purchase_ts) — distinct names
    because stream-stream joins reject ambiguous columns."""
    v = (
        views.withWatermark("view_ts", watermark)
        if views.isStreaming else views
    )
    p = (
        purchases.withWatermark("purchase_ts", watermark)
        if purchases.isStreaming else purchases
    )
    return v.join(
        p,
        (v["user_id"] == p["user_id_p"])
        & (v["view_ts"] <= p["purchase_ts"])
        & (v["view_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {horizon}")),
        how,
    )


def split_views_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project the two join legs out of the unified event stream with
    the disambiguated names ``interval_join`` expects."""
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id_p"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return views, purchases
