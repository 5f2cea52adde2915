#!/usr/bin/env python
"""Experiment (guide §1/§2.4): where does the per-fold postings
append cost go, and does the writer-task shape matter?

Times, on hardlink copies of the pristine x17 postings layout:
  a) current shape: repartition(h_bucket) at session shuffle width
  b) repartition(_write_tasks(buckets), h_bucket)  (the stats
     writer's 4-task shape)
  c) b + explicit read schema on nothing (write only — control that
     the delta is the exchange/task count, not planning)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tools.dist_bench import _pin_caps, _sf_dir  # noqa: E402


def main() -> None:
    _pin_caps()
    from bench import _warm

    from pyspark.sql import functions as F
    from hfcommunity_spark.operators import dedup as dd
    from hfcommunity_spark.operators.graph import _write_tasks
    from hfcommunity_spark.session import get_spark

    spark = get_spark(app_name="hfc-exp-append")
    spark.sparkContext.setLogLevel("ERROR")
    _warm(spark)

    sf = _sf_dir()
    pristine = dd._x17_pristine_layouts(spark, sf)
    arriving = dd._delta_arriving_docs(spark, sf).filter(
        F.expr(f"(doc_id DIV {dd._DELTA_SPLIT_MOD}) "
               f"% {dd.X17_DELIVERIES}") == 0
    )
    batch = dd.span_postings_frame(arriving, wide=False).localCheckpoint()
    n = batch.count()
    buckets = dd.SPAN_H_BUCKETS
    print(f"batch rows: {n}, buckets: {buckets}, "
          f"write_tasks: {_write_tasks(buckets)}")

    def _copy(src):
        d = tempfile.mkdtemp(prefix="hfc_exp_append_")
        dst = os.path.join(d, "postings")
        shutil.copytree(src, dst, copy_function=lambda s, t: (
            os.link(s, t)))
        return d, dst

    def time_write(label, writer, reps=3):
        for i in range(reps):
            d, dst = _copy(os.path.join(pristine, "postings"))
            t0 = time.monotonic()
            writer(dst)
            dt = time.monotonic() - t0
            print(f"  {label:34s} rep{i} {dt:6.3f}s")
            shutil.rmtree(d, ignore_errors=True)

    wb = batch.withColumn(
        "h_bucket", F.pmod(F.col("h"), F.lit(buckets)).cast("int")
    )

    def cur(dst):
        (wb.repartition(F.col("h_bucket"))
         .write.mode("append").partitionBy("h_bucket").parquet(dst))

    def few(dst):
        (wb.repartition(_write_tasks(buckets), F.col("h_bucket"))
         .write.mode("append").partitionBy("h_bucket").parquet(dst))

    def one(dst):
        (wb.repartition(1)
         .write.mode("append").partitionBy("h_bucket").parquet(dst))

    time_write("current repartition(col)@32", cur)
    time_write("repartition(4, col)", few)
    time_write("repartition(1)", one)
    # and a no-partitionBy control: how much is the 64-dir commit?
    def flat(dst):
        (wb.repartition(1)
         .write.mode("append").parquet(dst + "_flat"))
    time_write("flat single-dir append (control)", flat)
    spark.stop()


if __name__ == "__main__":
    main()
