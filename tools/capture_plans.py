#!/usr/bin/env python
"""Capture .explain('formatted') output for declared queries into
plans/<tag>/<query>_<suffix>.txt (the judged plan-evidence artifact).

For the maintained-lifecycle faces the declared function's returned
frame is a materialized union (the fold work happens in jobs before
it), so alongside the face plan this also captures the load-bearing
INTERNAL plans the round's claims reference:
  - x17/span: the bucketed probe (PartitionFilters + pushed In) and
    the changed-stats delta plan over the pristine layouts
  - x15: the pruned endpoint-resolution plan over the vertex layout

Usage: python tools/capture_plans.py <tag> <suffix> <query> [...]
   e.g. python tools/capture_plans.py r14 after x17_stream_maintained_spans
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = os.path.join(_REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from bench import _sf_dir, _warm

    from hfcommunity_spark.queries import all_queries
    from hfcommunity_spark.session import get_spark

    spark = get_spark(app_name="hfc-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    _warm(spark)
    sf = _sf_dir()
    specs = all_queries()

    for name in names:
        parts = [f"== {name} @ {sf} — declared-face final frame ==\n"]
        parts.append(_explain(specs[name].spark(spark, sf)))
        if name.startswith(("x17", "dd_span")):
            from pyspark.sql import functions as F
            from hfcommunity_spark.operators import dedup as dd

            pristine = dd._x17_pristine_layouts(spark, sf)
            pdir = os.path.join(pristine, "postings")
            sdir = os.path.join(pristine, "stats")
            arriving = dd._delta_arriving_docs(spark, sf).filter(
                F.expr(f"(doc_id DIV {dd._DELTA_SPLIT_MOD}) "
                       f"% {dd.X17_DELIVERIES}") == 0
            )
            batch = dd.span_postings_frame(
                arriving, wide=False
            ).localCheckpoint()
            probe = dd._bucketed_span_probe(
                spark, pdir, batch, dd.SPAN_H_BUCKETS
            )
            parts.append(
                "\n== internal: bucketed span probe (PartitionFilters"
                " on h_bucket + pushed In on h) ==\n"
            )
            parts.append(_explain(probe))
            _sch = getattr(dd, "_SPAN_STATS_READ_SCHEMA", None)
            rd = (spark.read.schema(_sch) if _sch is not None
                  else spark.read)
            stats = rd.parquet(sdir).select(
                "doc_id", "n_spans", "n_dup_spans"
            )
            changed = dd._span_delta_changed_stats(
                probe.localCheckpoint(), batch, stats
            )
            parts.append(
                "\n== internal: changed-stats delta frame ==\n"
            )
            parts.append(_explain(changed))
            # r15 fused fold: the ONE-collect delta rollup (the frame
            # _span_fold_distributed collects) and the snapshot-read
            # stats-upsert write frame — the two plans the fusion's
            # claims rest on
            from pyspark.sql import Window as _W

            import pyarrow as _pa

            wh = _W.partitionBy("h")
            pre = (
                batch.withColumn("tag", F.lit(1))
                .unionByName(probe.withColumn("tag", F.lit(0)))
                .withColumn("nd_batch", F.sum("tag").over(wh))
                .withColumn("nd_old", F.sum(1 - F.col("tag")).over(wh))
                .groupBy("doc_id")
                .agg(
                    F.max("tag").alias("is_new"),
                    F.sum(F.when(F.col("tag") == 1, F.col("c"))
                          .otherwise(0)).alias("n_spans_new"),
                    F.sum(F.when(
                        (F.col("tag") == 1)
                        & (F.col("nd_old") + F.col("nd_batch") >= 2),
                        F.col("c")).otherwise(0)).alias("dup_new"),
                    F.sum(F.when(
                        (F.col("tag") == 0) & (F.col("nd_old") == 1),
                        F.col("c")).otherwise(0)).alias("inc"),
                )
                .filter((F.col("is_new") == 1) | (F.col("inc") > 0))
            )
            parts.append(
                "\n== internal (r15): one-collect changed-doc rollup"
                " (the _span_fold_distributed toArrow frame) ==\n"
            )
            parts.append(_explain(pre))
            from hfcommunity_spark.operators.graph import _bucket_expr
            batch_rel = spark.createDataFrame(_pa.table({
                "doc_id": _pa.array([1], _pa.int64()),
                "n_spans": _pa.array([1], _pa.int64()),
                "n_dup_spans": _pa.array([0], _pa.int64()),
            }))
            inc_rel = spark.createDataFrame(_pa.table({
                "doc_id": _pa.array([2], _pa.int64()),
                "inc": _pa.array([1], _pa.int64()),
            }))
            upsert = (
                stats
                .join(F.broadcast(batch_rel.select("doc_id")),
                      "doc_id", "left_anti")
                .join(F.broadcast(inc_rel), "doc_id", "left")
                .select(
                    "doc_id", "n_spans",
                    (F.col("n_dup_spans")
                     + F.coalesce(F.col("inc"),
                                  F.lit(0).cast("bigint")))
                    .alias("n_dup_spans"),
                )
                .unionByName(batch_rel)
                .withColumn("d_bucket",
                            _bucket_expr("doc_id",
                                         dd.SPAN_STATS_BUCKETS))
            )
            parts.append(
                "\n== internal (r15): snapshot-read stats-upsert write"
                " frame (broadcast local relations; no pre-write"
                " checkpoint) ==\n"
            )
            parts.append(_explain(upsert))
        if name.startswith("x15"):
            from pyspark.sql import functions as F
            from hfcommunity_spark.operators import dedup as dd
            from hfcommunity_spark.operators import graph as G

            pristine = dd._x15_pristine_layouts(spark, sf)
            vdir = os.path.join(pristine, "vassign")
            verts = spark.range(5).select(
                F.col("id").alias("vertex")
            )
            resolved = G.resolve_assign_pruned(
                spark, spark.read.parquet(vdir), verts,
                dd.X15_BUCKETS,
            )
            parts.append(
                "\n== internal: pruned endpoint resolution over the"
                " vertex layout ==\n"
            )
            parts.append(_explain(resolved))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write("".join(parts))
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
