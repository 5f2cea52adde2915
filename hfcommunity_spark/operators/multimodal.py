"""Multimodal column plumbing (north-star X-UD5): image/audio/video as
opaque ``binary`` columns with typed metadata.

The Spark-side machinery is real and tested — schemas, Arrow-batched
``mapInPandas`` feature extraction, partition-sized batch flow.  The
actual codec step (JPEG decode, audio resample, frame sampling) is
STUBBED behind ``decode_media`` with a clearly marked
NotImplementedError: the image/audio libraries are not in this
container.  ``byte_features`` is a deterministic, library-free
feature extractor exercising the identical plumbing.

At 100 TB: binary payloads ride in parquet with metadata columns for
partition pruning (media_type/width/dt); mapInPandas processes one
Arrow batch at a time so executor memory is bounded by
``maxRecordsPerBatch`` × payload size, and the decode stage is a
narrow transformation — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("distinct_bytes", T.IntegerType(), True),
        T.StructField("head_hex", T.StringType(), True),
    ]
)


def decode_media(payload: bytes, media_type: str):
    """STUB — real codecs (Pillow/libsndfile/ffmpeg) are not available
    in this environment.  The Spark plumbing around this call (schema,
    batching, partitioning) is real; swap this function for the actual
    decoder on a cluster with the codec libraries installed."""
    raise NotImplementedError(
        "media decode is stubbed: no codec libraries in this container "
        f"(requested media_type={media_type!r}, {len(payload)} bytes)"
    )


def byte_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads —
    deterministic and library-free (numpy only), standing in for the
    decode+featurize stage with identical dataflow shape.

    Vectorized per batch (r15, guide §4.2: hand whole batches to
    native kernels instead of looping rows in Python — the old
    per-row ``np.frombuffer``/``mean``/``unique`` loop cost ~35 µs/row;
    the sf1.0 50k-row extract measured 1.77 s -> 0.74 s): one
    concatenated uint8 buffer, per-row sums via ``np.add.reduceat``
    over an exact int64 view, per-row distinct counts via one
    ``np.bincount`` over (row_index << 8 | byte) codes.  Values are
    bit-identical to the per-row loop: byte sums are exact integers
    far under 2**53, so mean = sum/len matches ``arr.mean()``
    regardless of summation order (locked by the parity test in
    tests/test_llmops.py)."""
    import numpy as np

    cols = ["media_id", "n_bytes", "byte_mean", "distinct_bytes",
            "head_hex"]
    for pdf in batches:
        ids = pdf["media_id"].to_numpy()
        payloads = pdf["payload"].tolist()
        n = len(payloads)
        if n == 0:
            yield pd.DataFrame({c: [] for c in cols})
            continue
        null = np.fromiter((p is None for p in payloads), bool, n)
        lens = np.fromiter(
            (0 if p is None else len(p) for p in payloads),
            np.int64, n,
        )
        buf = np.frombuffer(
            b"".join(p for p in payloads if p is not None and len(p)),
            dtype=np.uint8,
        )
        nz = ~null & (lens > 0)
        starts = np.zeros(n, np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        # per-row exact integer byte sums -> one double division each
        sums = np.zeros(n, np.int64)
        if buf.size:
            sums[nz] = np.add.reduceat(
                buf.astype(np.int64), starts[nz]
            )
        # per-row distinct byte counts: one bincount over
        # (row << 8 | byte) codes, then a presence-sum per 256-bin row
        # slice — O(bytes + 256·rows) with no sort.  Executor-measured
        # (reused workers, default 10k-row batches): the sf1.0 50k-row
        # extract went 1.77 s (per-row loop) -> 0.74 s; a sort-based
        # np.unique over the coded array was the slower vectorization
        # (1.12-1.24 s).  Scratch memory is ~(256·rows + bytes)·8 B
        # per batch — ~20 MB at the default batch size.
        distinct = np.zeros(n, np.int64)
        if buf.size:
            row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            occ = np.bincount((row_idx << 8) | buf, minlength=n << 8)
            distinct += np.add.reduceat(
                occ > 0, np.arange(0, n << 8, 256)
            )
        head_hex = [
            None if p is None else bytes(p[:8]).hex() for p in payloads
        ]
        # masked extension arrays built directly from the vectors —
        # a None here must reach Arrow as a NULL, exactly like the old
        # object columns (a plain float64 NaN would NOT be null on the
        # Spark side), and per-element masked list-comps cost more
        # than the kernels they package
        means = sums / np.where(nz, lens, 1)
        yield pd.DataFrame({
            "media_id": ids,
            "n_bytes": lens,
            "byte_mean": pd.arrays.FloatingArray(means, ~nz),
            "distinct_bytes": pd.arrays.IntegerArray(
                distinct.astype(np.int32), null.copy()
            ),
            "head_hex": head_hex,
        })


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table: document text bytes as payload
    (UTF-8), typed per the MEDIA_SCHEMA contract."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/fake").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.lit(None).cast("int").alias("meta_duration_ms"),
    )


@query(
    "mm_byte_features",
    """
    SELECT doc_id AS media_id,
           CAST(LENGTH(text) AS BIGINT) AS n_bytes
    FROM documents WHERE text IS NOT NULL
    """,
    survey="X-UD5,UD2,UD4",
)
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.  The oracle
    checks the relational spine (id + byte length — text is ASCII so
    octet length == char length); the float features ride along in the
    rows-only twin ``mm_byte_features_full``."""
    media = media_from_documents(spark, sf_dir)
    feats = (
        media.filter(F.col("payload").isNotNull())
        .select("media_id", "payload")
        .mapInPandas(byte_features_batches, schema=FEATURE_SCHEMA)
    )
    return feats.select("media_id", "n_bytes")


_MM_FULL_SQL = """
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(ascii(c)) AS DOUBLE) / COUNT(*) AS byte_mean,
             CAST(COUNT(DISTINCT c) AS INTEGER) AS distinct_bytes
      FROM ch GROUP BY doc_id
    )
    SELECT d.doc_id AS media_id,
           CAST(LENGTH(d.text) AS BIGINT) AS n_bytes,
           agg.byte_mean, agg.distinct_bytes,
           lower(hex(left(d.text, 8))) AS head_hex
    FROM documents d JOIN agg ON agg.doc_id = d.doc_id
    WHERE LENGTH(d.text) > 0
    """


@query(
    "mm_byte_features_full",
    _MM_FULL_SQL,
    survey="X-UD5,UD2,UD4",
)
def mm_byte_features_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full feature set from the Arrow-batched extractor (byte mean,
    distinct count, head hex).

    Oracle-checkable after all: payloads are ASCII text bytes, so the
    oracle recomputes every feature relationally (ascii() sums for the
    mean — an exact-integer sum with ONE final double division, so the
    float hashes identically; hex(left(...)) for the head bytes).
    numpy's pairwise mean is safe because a uint8 sum stays exact in
    float64 far beyond any payload size here."""
    media = media_from_documents(spark, sf_dir)
    # empty/NULL payloads are excluded on BOTH sides: the oracle's
    # char-split aggregate has no rows for them, so the inner join
    # would drop them from one side only (round-6 review finding)
    return (
        media.filter(F.col("payload").isNotNull() & (F.length("payload") > 0))
        .select("media_id", "payload")
        .mapInPandas(byte_features_batches, schema=FEATURE_SCHEMA)
    )


# --- round 9: the media feature table under a STREAM of deliveries ---

X20_DELIVERIES = 3

_MM_FEATS_CACHE = None  # set lazily to a SessionCache


def _mm_base_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing feature table over the base media slice — extracted
    ONCE per session (at 100 TB: the feature parquet beside the media
    table; deliveries only ever append)."""
    global _MM_FEATS_CACHE
    if _MM_FEATS_CACHE is None:
        from hfcommunity_spark.session_cache import SessionCache

        _MM_FEATS_CACHE = SessionCache(persist=True)

    def build() -> DataFrame:
        from hfcommunity_spark.operators.dedup import _DELTA_SPLIT_MOD

        media = media_from_documents(spark, sf_dir)
        base = media.filter(
            F.col("media_id") % _DELTA_SPLIT_MOD != 0
        )
        return (
            base.filter(
                F.col("payload").isNotNull() & (F.length("payload") > 0)
            )
            .select("media_id", "payload")
            .mapInPandas(byte_features_batches, schema=FEATURE_SCHEMA)
        )

    return _MM_FEATS_CACHE.get_or_build(
        spark, ("mm_base_features", sf_dir), build
    )


def _x20_oracle() -> str:
    from hfcommunity_spark.operators.dedup import _DELTA_SPLIT_MOD

    arms = []
    for k in range(X20_DELIVERIES):
        pred = (
            f"doc_id % {_DELTA_SPLIT_MOD} <> 0 OR "
            f"(doc_id // {_DELTA_SPLIT_MOD}) % {X20_DELIVERIES} <= {k}"
        )
        body = _MM_FULL_SQL.replace(
            "FROM documents",
            f"FROM (SELECT * FROM documents WHERE {pred})",
        )
        arms.append(
            f"""
    SELECT CAST({k} AS INTEGER) AS delivery_id, media_id, n_bytes,
           byte_mean, distinct_bytes, head_hex
    FROM ({body}) m{k}"""
        )
    return "\nUNION ALL\n".join(arms)


@query("x20_stream_media_features", _x20_oracle(),
       survey="X7,D3,UD2,UD4,X-UD5")
def x20_stream_media_features(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The media FEATURE table maintained under a STREAM of media
    deliveries and served after each — the multimodal member of the
    streamed maintained convention (x14 BM25, x15 clusters, x16 ANN,
    x17 spans, x19 SCD2).  Features are per-payload pure functions, so
    the fold is the cheapest possible maintenance: run the
    Arrow-batched extractor over ONLY the arriving batch and append —
    each payload is decoded/featurized exactly once across the stream
    (the thing a naive per-delivery recompute gets wrong at 100 TB,
    where the extractor — here the library-free byte featurizer
    standing in for real codecs, see ``decode_media`` — is the
    dominant cost).  The oracle restates each prefix corpus's full
    feature table relationally; hash equality proves append-only
    serving equals a rebuild at every delivery, float features
    included (exact-integer byte sums, one final double division)."""
    from hfcommunity_spark.operators.dedup import _DELTA_SPLIT_MOD
    from hfcommunity_spark.operators.graph import (
        _eager_checkpoint,
        _free_checkpoint,
    )

    feats = _mm_base_features(spark, sf_dir)
    feats.count()  # force the session cache before the block diff
    media = media_from_documents(spark, sf_dir).filter(
        (F.col("media_id") % _DELTA_SPLIT_MOD == 0)
        & F.col("payload").isNotNull() & (F.length("payload") > 0)
    )

    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    served: list[DataFrame] = []
    for k in range(X20_DELIVERIES):
        batch = media.filter(
            F.expr(
                f"(media_id DIV {_DELTA_SPLIT_MOD}) % {X20_DELIVERIES}"
            ) == k
        )
        # checkpoint ONLY the batch's extracted features (the Arrow
        # extractor runs exactly once per payload); the standing table
        # stays a union of the session-cached base + prior pieces —
        # never re-materialized per fold (the round-11 lifecycle rule:
        # fold cost must not scale with the standing index)
        new_feats, _ids = _eager_checkpoint(
            batch.select("media_id", "payload").mapInPandas(
                byte_features_batches, schema=FEATURE_SCHEMA
            )
        )
        feats = feats.unionByName(new_feats)
        served.append(
            feats.select(
                F.lit(k).cast("int").alias("delivery_id"),
                "media_id", "n_bytes", "byte_mean",
                "distinct_bytes", "head_hex",
            )
        )
    out = served[0]
    for s in served[1:]:
        out = out.unionByName(s)
    m = jsc.getPersistentRDDs()
    created = [
        i for i in set(m.keySet().toArray()) - before
        if (r := m.get(i)) is not None and r.rdd().isLocallyCheckpointed()
    ]
    out = out.localCheckpoint()
    _free_checkpoint(spark, created)
    return out


FRAME_BYTES = 128  # fixed "frame" size in the byte stream
FRAME_STRIDE = 4  # keep every 4th frame
FRAME_HEAD = 32  # bytes of each sampled frame carried downstream


def frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """One-to-many frame sampling over binary payloads: the payload is
    cut into fixed FRAME_BYTES frames and every FRAME_STRIDE-th frame
    is emitted (frame_idx, head bytes).  This is the video
    frame-sampling dataflow — UDTF-shaped mapInPandas, output bounded
    to len(payload)/(FRAME_BYTES*FRAME_STRIDE) rows per input row, no
    shuffle.  A real codec would decode before cutting; see
    ``decode_media``."""
    for pdf in batches:
        ids, idxs, heads = [], [], []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            if payload is None:
                continue
            for i in range(0, -(-len(payload) // FRAME_BYTES), FRAME_STRIDE):
                frame = payload[i * FRAME_BYTES: (i + 1) * FRAME_BYTES]
                ids.append(media_id)
                idxs.append(i)
                # hex, not UTF-8 decode: a generic binary frame head
                # (real media bytes, or a multi-byte char split at the
                # cut) would crash the task otherwise — the sibling
                # extractors emit hex for the same reason (round-6
                # review finding)
                heads.append(bytes(frame[:FRAME_HEAD]).hex())
        yield pd.DataFrame(
            {"media_id": ids, "frame_idx": idxs, "frame_head": heads}
        )


@query(
    "mm_frame_sample",
    # BYTE-based oracle: the Python side cuts and heads the payload in
    # BYTES, so the oracle must too — DuckDB's substring is VARCHAR-
    # only (characters), but hex(encode(text)) is a 2-chars-per-byte
    # string, so a byte slice [a, a+k) is exactly substr(hex, 2a+1, 2k)
    # and frame count comes from octet_length.  Agrees with the Python
    # slice on any UTF-8 text, multi-byte included (ADVICE r6).
    f"""
    SELECT doc_id AS media_id, frame_idx,
           lower(substr(hex(encode(text)),
                        frame_idx * {FRAME_BYTES} * 2 + 1,
                        {FRAME_HEAD} * 2)) AS frame_head
    FROM documents,
         LATERAL unnest(range(0, CAST(ceil(octet_length(encode(text))
                                           / {FRAME_BYTES}.0)
                                       AS BIGINT), {FRAME_STRIDE}))
           AS t(frame_idx)
    WHERE LENGTH(text) > 0
    """,
    survey="X-UD5,UD2,P1",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the fake media table (payload = UTF-8 text
    bytes; the oracle slices the SAME bytes via hex(encode(text)), so
    frame boundaries and heads agree even on multi-byte text)."""
    media = media_from_documents(spark, sf_dir)
    return media.select("media_id", "payload").mapInPandas(
        frame_sample_batches,
        schema="media_id long, frame_idx long, frame_head string",
    )


RESIZE_STRIDE = 4  # keep every 4th byte — the deterministic stand-in
# for codec-backed spatial downsampling
RESIZE_HEAD = 16


def resize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Byte-stride "resize" over binary payloads (payload[::STRIDE]) —
    the decode→downsample→re-encode dataflow with a deterministic fake
    kernel (a real codec slots into the same batch shape; see
    ``decode_media``).  Narrow one-to-one transform, no shuffle."""
    for pdf in batches:
        ids, lens, heads = [], [], []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            if payload is None:
                continue
            small = bytes(payload[::RESIZE_STRIDE])
            ids.append(media_id)
            lens.append(len(small))
            heads.append(small[:RESIZE_HEAD].hex())
        yield pd.DataFrame(
            {"media_id": ids, "resized_len": lens, "resized_head_hex": heads}
        )


@query(
    "mm_resize_thumbnail",
    f"""
    SELECT doc_id AS media_id,
           CAST((LENGTH(text) + {RESIZE_STRIDE - 1}) // {RESIZE_STRIDE}
                AS BIGINT) AS resized_len,
           lower(hex(left(array_to_string(
             list_transform(range(1, LENGTH(text) + 1, {RESIZE_STRIDE}),
                            i -> substr(text, CAST(i AS BIGINT), 1)),
             ''), {RESIZE_HEAD}))) AS resized_head_hex
    FROM documents
    """,
    survey="X-UD5,UD2,P1",
)
def mm_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail/downsample plumbing: every payload strided down 4×
    inside an Arrow-batched ``mapInPandas``; the oracle rebuilds the
    same stride relationally (ASCII text payloads, so byte stride ==
    char stride) and hex-compares the first {RESIZE_HEAD} bytes."""
    media = media_from_documents(spark, sf_dir)
    out = media.select("media_id", "payload").mapInPandas(
        resize_batches,
        schema="media_id long, resized_len long, resized_head_hex string",
    )
    return out
