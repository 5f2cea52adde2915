#!/usr/bin/env python
"""Regenerate COVERAGE.md's declared-query table from the registry.

Run after adding/renaming queries:  python tools/gen_coverage.py
The ETL/runtime half of COVERAGE.md (below the marker) is maintained
by hand and preserved verbatim.
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hfcommunity_spark.queries import DRIVER_WINDOW, all_queries

MARKER = "## ETL / runtime operators"

HEADER = """# COVERAGE — SURVEY.md §2 operator inventory → implementation

How to read: the first table maps every SURVEY §2 operator id that is
exercised by a **declared query** (an entry in `__spark_entry__.queries()`,
hash-checked against its DuckDB oracle unless marked `*` = rows-only /
approximate-by-construction; `†` = outside the driver's 50-query
CORRECTNESS window, still locked by the local DuckDB-parity suite).
The second table maps the operator ids whose natural home is the
ETL/runtime layer — each points at the implementing module and the
test that locks its semantics.

## Declared queries (driver-checked at sf0.01)

| SURVEY §2 id | queries |
|---|---|
"""


def main() -> None:
    specs = all_queries()
    window = set(DRIVER_WINDOW)
    by_id: dict[str, list[str]] = defaultdict(list)
    for name, spec in specs.items():
        mark = "" if spec.oracle else " *"
        mark += "" if name in window else " †"
        for sid in spec.survey_ids:
            by_id[sid].append(f"`{name}{mark}`")

    def sort_key(sid: str):
        m = re.match(r"([A-Za-z-]+)(\d*)", sid)
        return (m.group(1), int(m.group(2) or 0))

    lines = [HEADER]
    for sid in sorted(by_id, key=sort_key):
        qs = ", ".join(sorted(by_id[sid]))
        lines.append(f"| {sid} | {qs} |\n")

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COVERAGE.md")
    old = open(path).read()
    tail = old[old.index(MARKER):] if MARKER in old else ""
    with open(path, "w") as f:
        f.writelines(lines)
        f.write("\n")
        f.write(tail)
    print(f"wrote {path}: {len(by_id)} survey ids, {len(specs)} queries")


if __name__ == "__main__":
    main()
