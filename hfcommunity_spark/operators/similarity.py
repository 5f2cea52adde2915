"""Similarity search over embedding columns (north-star X-UD5) on the
``embeddings`` table (vec_id, embedding array<float>, label).

Two tiers, as a 100 TB ANN story requires:
- brute-force cosine top-k — the exact baseline; one broadcast of the
  query vector, one pass, TakeOrderedAndProject for the top-k.
- hyperplane-LSH bucketed top-k — the scale path: 16 fixed random
  hyperplanes give a 16-bit bucket id; the probe touches only the
  query's bucket (and is trivially extended to multi-probe).  Bucket
  assignment is a narrow projection; at 100 TB the bucket id becomes a
  partition key so a probe is a partition-pruned scan, not a full pass.

All vector math is JVM array ops (zip_with/aggregate) in double
precision — no Python, no UDF.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query

DIM = 64
N_PLANES = 16
TOP_K = 20


def dot(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


@query(
    "sim_bruteforce_topk",
    f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT vec_id,
             list_cosine_similarity(embedding, q_emb) AS sim
      FROM embeddings, q WHERE vec_id <> 0
    )
    SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id)
                        AS INTEGER) AS rank
    FROM scored ORDER BY sim DESC, vec_id LIMIT {TOP_K}
    """,
    survey="X-UD5,O1,J9",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k of vec_id 0's neighbors.  Output is
    rank-only (ids ordered by similarity): similarities agree across
    engines to ~1e-12, far below the neighbor spacing, so ranks hash
    identically while raw float output would not."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cosine("embedding", "q_emb").alias("sim"))
    )
    w = Window.orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("vec_id", "rank")
    )


def _hyperplanes(seed: int = 42) -> list[list[float]]:
    """Fixed projection planes — deterministic, baked into the plan as
    literals (no data dependency, no broadcast needed)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((N_PLANES, DIM)).tolist()


def lsh_bucket(emb: str | Column) -> Column:
    """16-bit hyperplane signature: bit i = sign(<emb, plane_i>)."""
    e = F.col(emb) if isinstance(emb, str) else emb
    planes = _hyperplanes()
    acc = F.lit(0)
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        proj = F.aggregate(
            F.zip_with(e, lit_plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        acc = acc + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return acc


MULTIPROBE_HAMMING = 4


@query("sim_lsh_bucketed_topk", None, survey="X-UD5,J9,A12")
def sim_lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via hyperplane LSH with multi-probe: score vectors
    whose 16-bit bucket signature is within hamming distance 4 of the
    query's (sign flips on near-orthogonal planes are the common miss;
    multi-probe recovers them without touching the full corpus).
    Approximate by construction → rows-only check (the exact baseline
    above is the oracle-checked twin)."""
    emb = read_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", lsh_bucket("embedding")
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    near_bucket = (
        F.bit_count(
            F.col("bucket").bitwiseXOR(F.col("q_bucket"))
        )
        <= MULTIPROBE_HAMMING
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), near_bucket)
        .select("vec_id", cosine("embedding", "q_emb").alias("sim"))
    )
    w = Window.orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("vec_id", "rank", F.round("sim", 4).alias("sim_rounded"))
    )


@query(
    "dd_embedding_nearest_neighbor",
    """
    SELECT vec_id, nn_id FROM (
      SELECT a.vec_id, b.vec_id AS nn_id,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                        b.vec_id) AS rn
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ) WHERE rn = 1
    """,
    survey="X-UD5,J6,W1",
)
def dd_embedding_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup baseline: every vector's exact nearest
    neighbor — the ground truth the LSH/IVF variants approximate.

    Scale design: the candidate side is a broadcast numpy matrix and
    each Arrow batch of query vectors does one BLAS GEMM against it —
    a per-pair SQL lambda fold is ~50× slower because higher-order-
    function lambdas are interpreted per element.  At 100 TB the
    candidate matrix is blocked (loop over broadcast chunks, keep a
    running top-1), which is this same kernel in a loop; the row-level
    tie-break (max sim, then min id) matches the oracle exactly."""
    import numpy as np
    import pandas as pd

    emb = read_table(spark, sf_dir, "embeddings")
    cand = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in cand], dtype=np.int64)
    m = np.array([r.embedding for r in cand], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mn))

    def nn_batches(batches):
        c_ids, c_mn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            an = a / np.linalg.norm(a, axis=1, keepdims=True)
            sims = an @ c_mn.T
            out = []
            for i, qid in enumerate(pdf["vec_id"]):
                row = sims[i]
                row = np.where(c_ids == qid, -np.inf, row)
                best = np.lexsort((c_ids, -row))[0]  # max sim, then min id
                out.append((int(qid), int(c_ids[best])))
            yield pd.DataFrame(out, columns=["vec_id", "nn_id"])

    return emb.select("vec_id", "embedding").mapInPandas(
        nn_batches, "vec_id long, nn_id long"
    )


@query("sim_ivf_topk", None, survey="X-UD5,J9,A12")
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: label centroids act as the coarse quantizer
    (k-means stand-in); every vector is assigned to its nearest
    centroid cell, and the query probes only its own cell.  rows-only
    (approximate by construction; dd_embedding_nearest_neighbor is the
    exact recall oracle)."""
    emb = read_table(spark, sf_dir, "embeddings")
    # coarse quantizer: per-label mean vectors (cheap, deterministic)
    cent = (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg((F.sum(F.col("v").cast("double")) / F.count(F.lit(1))).alias("m"))
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm")
        )
        .select(
            F.col("label").alias("cell"),
            F.expr("transform(dm, x -> x.m)").alias("centroid"),
        )
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("sim_c"), F.asc("cell")
    )
    assigned = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("sim_c", cosine("embedding", "centroid"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell")
    )
    q = assigned.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("cell").alias("q_cell")
    )
    scored = (
        assigned.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), F.col("cell") == F.col("q_cell"))
        .select("vec_id", cosine("embedding", "q_emb").alias("sim"))
    )
    w = Window.orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("vec_id", "rank", F.round("sim", 4).alias("sim_rounded"))
    )


@query("sim_kmeans_ivf_topk", None, survey="X-UD5,J9,A12")
def sim_kmeans_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a REAL learned quantizer: distributed Lloyd's k-means
    (k=8, 3 iterations — operators/kmeans.py) trains the cell
    centroids, then the query probes only its own cell.  Iterative
    algorithm → rows-only check per the driver contract."""
    from hfcommunity_spark.operators.kmeans import assign_cells, kmeans_fit

    # cache: Lloyd's makes 2 passes per iteration over the same frame
    emb = read_table(spark, sf_dir, "embeddings").persist()
    centroids = kmeans_fit(emb, k=8, iters=3)
    assigned = assign_cells(emb, centroids).select("vec_id", "embedding", "cell")
    q = assigned.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("cell").alias("q_cell")
    )
    scored = (
        assigned.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), F.col("cell") == F.col("q_cell"))
        .select("vec_id", cosine("embedding", "q_emb").alias("sim"))
    )
    w = Window.orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("vec_id", "rank", F.round("sim", 4).alias("sim_rounded"))
    )


@query(
    "sim_label_centroid_topk",
    """
    WITH dims AS (SELECT unnest(range(1, 65)) AS dim),
    per_dim AS (
      SELECT label, dim,
             CAST(SUM(CAST(embedding[dim] AS DECIMAL(18,8))) AS DOUBLE)
               / COUNT(*) AS m
      FROM embeddings, dims GROUP BY label, dim
    ),
    c AS (SELECT label, list(m ORDER BY dim) AS centroid
          FROM per_dim GROUP BY label)
    SELECT e.vec_id, e.label,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY e.label
             ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC,
                      e.vec_id) AS INTEGER) AS rank
    FROM embeddings e JOIN c ON e.label = c.label
    QUALIFY rank <= 5
    """,
    survey="X-UD5,A7,W1",
)
def sim_label_centroid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (exact decimal mean per dimension) and the 5
    most-central members of each label — the IVF building block
    (centroid assignment) expressed relationally."""
    emb = read_table(spark, sf_dir, "embeddings")
    # exact per-dimension mean: decimal accumulation, final double div
    per_dim = emb.select(
        "label",
        "vec_id",
        "embedding",
        F.posexplode(F.col("embedding")).alias("dim", "v"),
    )
    cent = (
        per_dim.groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("m")))
            ).alias("dm")
        )
        .select(
            "label", F.expr("transform(dm, x -> x.m)").alias("centroid")
        )
    )
    from pyspark.sql import Window

    scored = emb.join(F.broadcast(cent), "label").select(
        "vec_id", "label", cosine("embedding", "centroid").alias("sim")
    )
    w = Window.partitionBy("label").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("vec_id", "label", "rank")
    )
