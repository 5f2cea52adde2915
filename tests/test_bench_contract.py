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


def test_solo_regime_rides_the_line_and_full_payload():
    """The dual-regime contract (round 10): when a solo map is passed,
    BOTH artifacts carry it — the stdout line under 'solo' (rounded)
    and BENCH_FULL under 'solo' + 'solo_regime' — and the line still
    fits the driver's tail budget at a large inventory."""
    timings = _fake_timings(200)
    solo = {"g_merge_base": 1.2345, "x15_stream_maintained_clusters": 7.89}
    full, line = build_payloads(timings, 0.1, solo)
    assert len(line) <= TAIL_BUDGET + 1
    d = json.loads(line)
    assert d["solo"] == {"g_merge_base": 1.23,
                         "x15_stream_maintained_clusters": 7.89}
    assert full["solo"] == dict(sorted(solo.items()))
    assert "fresh-session" in full["solo_regime"]
    # and without a solo map neither artifact grows the keys
    full2, line2 = build_payloads(timings, 0.1, None)
    assert "solo" not in full2 and "solo" not in json.loads(line2)
