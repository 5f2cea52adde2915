"""In-suite ORDER attribution for the diffuse sub-second floor
(VERDICT r12 #3): r12's recordings showed ~25 tiny, mostly untouched
queries +0.1-0.3 s vs r11 in both regimes, reading as a fixed-cost
floor.  Hypothesis A: session-state leakage — the early-alphabet
heavyweight faces (dd_*, the maintained lifecycles) leave state
(layout scratch, Arrow buffers, GC pressure, catalog growth) that
taxes later tiny queries.  Hypothesis B: host/environment drift.

Protocol: one fresh subprocess per ORDER, bench-identical regime
(same warmup, best-of-2 per query), the FULL declared inventory run
in that order.  Orders:

- ``alpha``         — the bench's order (tiny faces interleave after
                      the dd_* heavies)
- ``fastest_first`` — every tiny face runs BEFORE any heavyweight
                      (zero leakage exposure; ranking from a prior
                      BENCH_FULL.json)
- ``slowest_first`` — every tiny face runs AFTER all heavyweights
                      (maximum leakage exposure)

If a tiny face's time tracks its POSITION relative to the heavies
(fastest_first < alpha < slowest_first beyond noise), the floor is
session-state leakage and worth chasing; if the three orders agree,
the floor is environment and the calibration block adjudicates it.

Usage: python tools/suiteorder_attrib.py [alpha fastest_first ...]
       python tools/suiteorder_attrib.py --worker ORDER   (internal)

Prints one JSON block: per-order totals plus the per-query times of
the 30 fastest (by the ranking file) faces under each order.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RANKING = os.path.join(REPO, "BENCH_FULL.json")
DEFAULT_ORDERS = ("alpha", "fastest_first", "slowest_first")
N_WATCH = 30  # tiny faces reported individually


def _ranked_names() -> list[str]:
    """Inventory names ascending by the last recorded bench time.
    BENCH_FULL.json is serialized with sort_keys=True, so the stored
    map is ALPHABETICAL — sort by value here (the round-13 first run
    missed this, degenerating fastest_first to a second alphabetical
    pass; usefully, that accident measured identical-order
    run-to-run variance at ~30% on an ambient-loaded host)."""
    with open(RANKING) as fh:
        q = json.load(fh)["queries"]
    return sorted(q, key=q.get)


def _order_names(order: str) -> list[str]:
    ranked = _ranked_names()
    if order == "alpha":
        return sorted(ranked)
    if order == "fastest_first":
        return ranked
    if order == "slowest_first":
        return list(reversed(ranked))
    raise RuntimeError(f"unknown order {order!r} "
                       f"(expected one of {DEFAULT_ORDERS})")


def _worker(order: str) -> None:
    from bench import _time_queries, _warm

    from hfcommunity_spark.session import get_spark

    spark = get_spark(app_name=f"suiteorder-{order}")
    spark.sparkContext.setLogLevel("ERROR")
    _warm(spark)
    print(json.dumps(_time_queries(spark, _order_names(order))))
    spark.stop()


def main() -> None:
    orders = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not orders:
        orders = list(DEFAULT_ORDERS)
    here = os.path.abspath(__file__)
    watch = _ranked_names()[:N_WATCH]
    out: dict = {"watch": watch, "orders": {}}
    for order in orders:
        proc = subprocess.run(
            [sys.executable, here, "--worker", order],
            capture_output=True, text=True, timeout=1800,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"suiteorder worker failed for {order} "
                f"(rc={proc.returncode}):\n{proc.stderr[-2000:]}"
            )
        timings = json.loads(proc.stdout.strip().splitlines()[-1])
        out["orders"][order] = {
            "total": round(sum(timings.values()), 2),
            "watch_total": round(sum(timings[w] for w in watch), 3),
            "watch": {w: timings[w] for w in watch},
        }
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        _worker(sys.argv[sys.argv.index("--worker") + 1])
    else:
        main()
