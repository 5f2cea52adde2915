"""Order-flip attribution for cross-scale cold steps (VERDICT r10 #6,
r11 #3): when a query's sf1→sf3 COLD step looks steep, decide whether
it is real plan growth or session fixed cost (Python-worker / Arrow /
codegen warmup billed to whichever scale runs first).

Protocol (the x13 experiment, mechanized): per ORDER, one fresh
subprocess session, footer+UDF-warmed on BOTH corpora, then each scale
runs 3 reps (cold = rep0, warm = min of the rest) in that order.  If
the inflated cold follows the POSITION (first-run scale absorbs it in
both orders), it is session fixed cost; if it follows the SCALE, it is
real growth.

Usage: python tools/orderflip_attrib.py QUERY [QUERY ...]
       python tools/orderflip_attrib.py --worker ORDER QUERY  (internal)

Prints one JSON block per query; the caller records the conclusion in
ARCHITECTURE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = {
    "sf1": os.path.join(REPO, ".rehearsal", "sf1.0"),
    "sf3": os.path.join(REPO, ".rehearsal", "sf3.0"),
}
ORDERS = (("sf1", "sf3"), ("sf3", "sf1"))


def _worker(order: list[str], name: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hfcommunity_spark.io import read_table
    from hfcommunity_spark.queries import all_queries

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # rehearsal corpora need a large driver; smaller hosts can dial
    # it down instead of failing outright at JVM launch (ADVICE r12)
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", driver_mem)
        .appName(f"orderflip-{name}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # footer-warm BOTH corpora + the Python-worker pool, so neither
    # scale's first rep absorbs what the other scale's would not
    for sdir in SCALES.values():
        read_table(spark, sdir, "documents").count()

    @F.pandas_udf("long")
    def _noop(c):
        return c

    spark.range(10_000, numPartitions=int(cpus)).select(
        _noop("id")
    ).count()
    spec = all_queries()[name]
    out = {}
    for scale in order:
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            spec.spark(spark, SCALES[scale]).count()
            times.append(time.monotonic() - t0)
        out[scale] = {
            "cold": round(times[0], 3),
            "warm": round(min(times[1:]), 3),
        }
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not names:
        # RuntimeError, not assert: asserts vanish under python -O and
        # would turn bad usage / a dead worker into a downstream parse
        # crash (ADVICE r12)
        raise RuntimeError("usage: orderflip_attrib.py QUERY [QUERY ...]")
    here = os.path.abspath(__file__)
    for name in names:
        result = {}
        for order in ORDERS:
            key = "->".join(order)
            proc = subprocess.run(
                [sys.executable, here, "--worker", ",".join(order), name],
                capture_output=True, text=True, timeout=1800,
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"orderflip worker failed for {name} ({key}, "
                    f"rc={proc.returncode}):\n{proc.stderr[-2000:]}"
                )
            result[key] = json.loads(
                proc.stdout.strip().splitlines()[-1]
            )
        first_colds = [
            result["sf1->sf3"]["sf1"]["cold"],
            result["sf3->sf1"]["sf3"]["cold"],
        ]
        second_colds = [
            result["sf1->sf3"]["sf3"]["cold"],
            result["sf3->sf1"]["sf1"]["cold"],
        ]
        result["position_effect"] = round(
            sum(first_colds) / 2 - sum(second_colds) / 2, 3
        )
        print(json.dumps({name: result}, indent=1), flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        _worker(sys.argv[i + 1].split(","), sys.argv[i + 2])
    else:
        main()
