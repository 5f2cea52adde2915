#!/usr/bin/env python
"""Experiment (guide §1): sub-phase timing of the bucketed span probe
and read-schema variants, on the pristine x17 postings layout."""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tools.dist_bench import _pin_caps, _sf_dir  # noqa: E402


def main() -> None:
    _pin_caps()
    from bench import _warm

    from pyspark.sql import functions as F
    from hfcommunity_spark.operators import dedup as dd
    from hfcommunity_spark.session import get_spark

    spark = get_spark(app_name="hfc-exp-probe")
    spark.sparkContext.setLogLevel("ERROR")
    _warm(spark)

    sf = _sf_dir()
    pristine = dd._x17_pristine_layouts(spark, sf)
    pdir = os.path.join(pristine, "postings")
    arriving = dd._delta_arriving_docs(spark, sf).filter(
        F.expr(f"(doc_id DIV {dd._DELTA_SPLIT_MOD}) "
               f"% {dd.X17_DELIVERIES}") == 0
    )
    batch = dd.span_postings_frame(arriving, wide=False).localCheckpoint()
    batch.count()
    buckets = dd.SPAN_H_BUCKETS

    for rep in range(3):
        t0 = time.monotonic()
        sample = (batch.select("h").distinct()
                  .limit(dd._SPAN_PROBE_INSET_MAX + 1).toArrow())
        t1 = time.monotonic()
        h_list = sample.column("h").to_pylist()
        hit = sorted({h % buckets for h in h_list})
        expr = dd._bigint_in_expr("h", h_list)
        t2 = time.monotonic()
        pruned = spark.read.parquet(pdir).filter(
            F.col("h_bucket").isin(hit))
        probe = pruned.filter(expr).select("doc_id", "h", "c")
        ck = probe.localCheckpoint()
        t3 = time.monotonic()
        print(f"rep{rep}: sample={t1-t0:.3f} expr={t2-t1:.3f} "
              f"scan+ckpt={t3-t2:.3f} nh={len(h_list)} "
              f"nprobe={ck.count()}")

    # explicit schema variant (skip footer inference)
    schema = "doc_id BIGINT, h BIGINT, c BIGINT, h_bucket INT"
    for rep in range(3):
        sample = (batch.select("h").distinct()
                  .limit(dd._SPAN_PROBE_INSET_MAX + 1).toArrow())
        h_list = sample.column("h").to_pylist()
        hit = sorted({h % buckets for h in h_list})
        expr = dd._bigint_in_expr("h", h_list)
        t2 = time.monotonic()
        pruned = spark.read.schema(schema).parquet(pdir).filter(
            F.col("h_bucket").isin(hit))
        ck = pruned.filter(expr).select(
            "doc_id", "h", "c").localCheckpoint()
        t3 = time.monotonic()
        print(f"rep{rep}: schema-scan+ckpt={t3-t2:.3f} n={ck.count()}")

    # semi-join alternative (the documented rejected shape)
    for rep in range(2):
        t0 = time.monotonic()
        hs = batch.select("h").distinct().localCheckpoint()
        hit = sorted(r.b for r in hs.select(
            F.pmod(F.col("h"), F.lit(buckets)).cast("int").alias("b")
        ).distinct().collect())
        pruned = spark.read.parquet(pdir).filter(
            F.col("h_bucket").isin(hit))
        ck = pruned.join(F.broadcast(hs), "h", "left_semi").select(
            "doc_id", "h", "c").localCheckpoint()
        t3 = time.monotonic()
        print(f"rep{rep}: semijoin total={t3-t0:.3f} n={ck.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
