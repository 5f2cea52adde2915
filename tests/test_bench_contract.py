"""The bench stdout contract: one JSON line that survives the driver's
2000-char tail capture (the round-1 regression: a 3KB line clipped at
the head, parsed=null) while keeping metric/value/unit/queries/sf."""

from __future__ import annotations

import json

from bench import TAIL_BUDGET, build_payloads


def _fake_timings(n):
    return {f"some_rather_long_query_name_{i:04d}": 0.1 + (i % 37) * 0.13
            for i in range(n)}


def test_line_fits_tail_budget_at_any_inventory_size():
    for n in (1, 50, 109, 400):
        full, line = build_payloads(_fake_timings(n), 0.1)
        assert len(line) <= TAIL_BUDGET + 1
        d = json.loads(line)
        assert {"metric", "value", "unit", "queries", "sf",
                "n_queries"} <= set(d)
        assert d["n_queries"] == n == len(full["queries"])
        assert round(sum(full["queries"].values()), 4) == d["value"]


def test_line_keeps_the_slowest_queries():
    timings = _fake_timings(400)
    _, line = build_payloads(timings, 0.1)
    d = json.loads(line)
    shown = d["queries"]
    cutoff = min(shown.values())
    omitted = [v for k, v in timings.items() if k not in shown]
    assert all(v <= cutoff + 0.005 for v in omitted)  # fastest omitted
    assert d["queries_omitted_fastest"] == 400 - len(shown)
