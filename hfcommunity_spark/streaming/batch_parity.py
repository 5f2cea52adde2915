"""Oracle-checked batch twins of the streaming operators (X3/X4/X7).

Spark's unified API means the *same* transform functions from
``jobs.py`` run here on a batch frame — the oracle checks the window
semantics (alignment, session merging, join shape) that the streaming
runs rely on.  Watermarks are no-ops in batch mode, so late-data
discard (X2/X6) and stateful dedup (X5) are covered by the streaming
tests instead (not SQL-expressible — the driver records those ops via
the rows-only ``x5`` entry)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query
from hfcommunity_spark.streaming import jobs


@query(
    "x3_tumbling_hourly",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY window_start, event_type
    """,
    survey="X1,X2,X3,F6",
)
def x3_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows via window() — epoch-aligned, so the oracle
    is date_trunc('hour')."""
    return jobs.tumbling_counts(read_table(spark, sf_dir, "events"))


@query(
    "x3_sliding_halfhour",
    """
    WITH b AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS s1, event_type, value
      FROM events
    ), u AS (
      SELECT s1 AS window_start, event_type, value FROM b
      UNION ALL
      SELECT s1 - INTERVAL '30 minutes', event_type, value FROM b
    )
    SELECT window_start, event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM u GROUP BY window_start, event_type
    """,
    survey="X3",
)
def x3_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30min windows: every event belongs to exactly two
    windows (its 30-min bucket and the one before) — the oracle builds
    the same assignment with time_bucket + UNION ALL."""
    return jobs.sliding_counts(read_table(spark, sf_dir, "events"))


@query(
    "x4_session_windows",
    """
    WITH o AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, MAX(ts) AS last_ts
    FROM s GROUP BY user_id, sid
    """,
    survey="X4",
)
def x4_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(gap=30min) — oracle is the gaps-and-islands
    formulation with the same strict-gap merge rule (an event extends a
    session iff its gap is strictly under 30 min)."""
    return jobs.session_counts(read_table(spark, sf_dir, "events"))


@query(
    "x8_hourly_gap_fill",
    """
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events WHERE user_id < 10 GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS h
      FROM bounds
    ),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n_events
      FROM events WHERE user_id < 10 GROUP BY user_id, h
    )
    SELECT g.user_id, g.h AS hour,
           COALESCE(hourly.n_events, 0) AS n_events,
           (hourly.h IS NULL) AS gap_filled
    FROM grid g LEFT JOIN hourly
      ON g.user_id = hourly.user_id AND g.h = hourly.h
    """,
    survey="X3,F6,J8",
)
def x8_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill: a dense hourly grid per user
    (sequence + explode — generate_series, Spark-style) left-joined to
    the actual hourly counts; silent hours appear as explicit zero rows
    flagged gap_filled.  The grid is derived per key, so the operator
    is one agg + one narrow explode + one equi join at any scale."""
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    return grid.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.col("n").isNull().alias("gap_filled"),
    )


@query(
    "x5_streaming_dedup",
    """
    SELECT event_id, ts, user_id, event_type FROM events
    """,
    survey="X5,X6,D1",
)
def x5_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch projection of the stateful-dedup pipeline, hash-checkable:
    the input is doubled (union with itself — a replayed source, the
    exact failure mode X5 exists for) and deduped; duplicate rows are
    bit-identical, so whichever copy ``dropDuplicates`` keeps, the
    VALUE is deterministic and equals the original table.  The
    streaming-only semantics — bounded state, cross-batch dedup, late
    discard — are locked by the streaming tests; the watermark is a
    no-op in batch."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    return jobs.dedup_events(ev.unionAll(ev))


@query(
    "x7_stream_static_enrich",
    """
    SELECT c_mktsegment AS segment, COUNT(*) AS n_events,
           COUNT(c_custkey) AS n_matched
    FROM events LEFT JOIN customer ON user_id = c_custkey
    GROUP BY segment
    """,
    survey="X7,J8",
)
def x7_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: events joined to the broadcast
    customer dim (same plan the streaming job runs per micro-batch)."""
    from pyspark.sql import functions as F

    events = read_table(spark, sf_dir, "events")
    customer = read_table(spark, sf_dir, "customer")
    enriched = jobs.enrich_with_dim(events, customer, "user_id", "c_custkey")
    return enriched.groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("c_custkey").alias("n_matched"),
    )


@query(
    "x9_stream_stream_interval_join",
    """
    SELECT p.event_id AS purchase_id,
           COUNT(*) AS n_views_1h,
           MAX(v.ts) AS last_view_ts
    FROM events p JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view'
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    survey="X2,X6,J10",
)
def x9_stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join: purchases with
    the same user's views in the trailing hour (count + most recent).
    The joined pair stream is what the streaming job emits; this twin
    aggregates it so the oracle hash-checks the pairing exactly."""
    from pyspark.sql import functions as F

    events = read_table(spark, sf_dir, "events")
    views, purchases = jobs.split_views_purchases(events)
    pairs = jobs.interval_join(views, purchases)
    return pairs.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_views_1h"),
        F.max("view_ts").alias("last_view_ts"),
    )


@query(
    "x18_stream_outer_interval_join",
    """
    SELECT p.event_id AS purchase_id,
           CAST(COUNT(v.ts) AS BIGINT) AS n_views_1h,
           MAX(v.ts) AS last_view_ts
    FROM events p LEFT JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view'
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    survey="X6,J8,J10",
)
def x18_stream_outer_interval_join(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream OUTER interval join: EVERY
    purchase, view-less ones included (n_views_1h = 0, NULL
    last_view_ts) — the attribution query x9's inner join silently
    drops rows from.  Same transform, ``how='right_outer'`` so the
    purchase side is preserved; in streaming Spark holds the purchase
    row until the watermark proves no in-horizon view can still
    arrive, then emits it null-padded (state bounded by
    watermark + horizon, the x9 contract — locked under real
    micro-batches in tests/test_streaming.py).  COUNT over the view
    timestamp counts only matched rows, so the zero bucket is exact."""
    from pyspark.sql import functions as F

    events = read_table(spark, sf_dir, "events")
    views, purchases = jobs.split_views_purchases(events)
    pairs = jobs.interval_join(views, purchases, how="right_outer")
    return pairs.groupBy("purchase_id").agg(
        F.count("view_ts").alias("n_views_1h"),
        F.max("view_ts").alias("last_view_ts"),
    )


def _x10_oracle() -> str:
    """Built from the MinHash oracle fragments so the two stay in
    lockstep with the Spark-side constants."""
    from hfcommunity_spark.operators.dedup import (
        MAX_BUCKET,
        MINHASH_K,
        _MINHASH_BAND_SELECTS,
        _MINHASH_MINS_SQL,
        _MINHASH_SHINGLE_CTE,
    )

    matches = " + ".join(
        f"(CASE WHEN i.m{k} = c.m{k} THEN 1 ELSE 0 END)"
        for k in range(MINHASH_K)
    )
    return f"""
    WITH {_MINHASH_SHINGLE_CTE},
    sig AS (SELECT doc_id,
           {_MINHASH_MINS_SQL}
           FROM sh GROUP BY doc_id),
    bands AS ({_MINHASH_BAND_SELECTS}),
    capped AS (SELECT * FROM
               (SELECT *, COUNT(*) OVER (PARTITION BY band, bhash) AS bsize
                FROM bands) WHERE bsize <= {MAX_BUCKET}),
    inc AS (SELECT * FROM bands WHERE doc_id % 10 = 0),
    pairs AS (SELECT DISTINCT i.doc_id, c.doc_id AS c_doc,
                     CAST({matches} AS DOUBLE) / {MINHASH_K} AS est
              FROM inc i JOIN capped c
                ON i.band = c.band AND i.bhash = c.bhash
                   AND i.doc_id <> c.doc_id),
    agg AS (SELECT doc_id, COUNT(*) AS n_near_dups,
                   MAX(est) AS max_est_similarity
            FROM pairs GROUP BY doc_id)
    SELECT s.doc_id,
           COALESCE(a.n_near_dups, 0) AS n_near_dups,
           a.max_est_similarity
    FROM (SELECT DISTINCT doc_id FROM sig WHERE doc_id % 10 = 0) s
    LEFT JOIN agg a ON a.doc_id = s.doc_id
    """


@query("x10_stream_neardup_gate", _x10_oracle(), survey="X7,J9,X-UD5")
def x10_stream_neardup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming near-dup admission gate: a slice of
    documents (doc_id % 10 = 0, standing in for an arriving
    micro-batch) is signed and probed against the session-persisted
    corpus band index — the same stream-static shape the streaming
    test drives through foreachBatch micro-batches.  sha2 hash mode so
    the whole gate (signatures, banding, corpus cap, candidate count,
    best similarity) is value-checked against DuckDB."""
    from pyspark.sql import functions as F

    from hfcommunity_spark.operators.dedup import (
        minhash_band_index,
        neardup_gate,
    )

    docs = read_table(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    idx = minhash_band_index(spark, sf_dir, hash_mode="sha2")
    return neardup_gate(incoming, idx, hash_mode="sha2")
