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


def test_calibration_rides_both_payloads_and_fits_budget():
    """The host-calibration sentinel (round-11 verdict: BENCH_r11
    carried phantom 2-4x regressions from a contended host that only
    a re-run could adjudicate): when a calibration map is passed,
    BENCH_FULL carries the full map + note and the stdout line carries
    the two timing fields — still inside the driver's tail budget at a
    large inventory; without one, neither payload grows the keys."""
    from bench import _CAL_CPU_N, _CAL_SCAN_ROWS

    timings = _fake_timings(400)
    cal = {"cpu_loop_sec": 0.3123, "cpu_loop_n": _CAL_CPU_N,
           "spark_scan_sec": 0.4567, "spark_scan_rows": _CAL_SCAN_ROWS}
    solo = {"g_merge_base": 1.2345}
    full, line = build_payloads(timings, 0.1, solo, cal)
    assert len(line) <= TAIL_BUDGET + 1
    d = json.loads(line)
    assert d["calibration"] == {"cpu_loop_sec": 0.3123,
                                "spark_scan_sec": 0.4567}
    assert full["calibration"] == cal
    assert "normalize" in full["calibration_note"]
    # fixed work units are part of the artifact so a changed unit is
    # visible, not silently incomparable
    assert full["calibration"]["cpu_loop_n"] == _CAL_CPU_N
    assert full["calibration"]["spark_scan_rows"] == _CAL_SCAN_ROWS
    full2, line2 = build_payloads(timings, 0.1)
    assert "calibration" not in full2
    assert "calibration" not in json.loads(line2)


def test_scan_normalized_ratios_ride_the_full_payload():
    """Round-13 (VERDICT r12 #4): with a calibration present, the full
    payload carries per-query time/spark_scan_sec ratios and a
    normalized total, and the stdout line carries the normalized total
    — host-independent deltas readable without re-derivation.  The
    ratios must be exactly time/scan over the SAME query set."""
    timings = _fake_timings(300)
    cal = {"cpu_loop_sec": 0.3, "cpu_loop_n": 1,
           "spark_scan_sec": 0.16, "spark_scan_rows": 1}
    full, line = build_payloads(timings, 0.1, None, cal)
    assert len(line) <= TAIL_BUDGET + 1
    norm = full["queries_scan_normalized"]
    assert set(norm) == set(timings)
    for k, v in timings.items():
        assert norm[k] == round(v / 0.16, 3)
    assert full["value_scan_normalized"] == round(full["value"] / 0.16, 2)
    assert json.loads(line)["value_scan_norm"] == (
        full["value_scan_normalized"]
    )
    assert "spark_scan_sec" in full["scan_normalized_note"]
    # a zero/absent scan sentinel must not divide by zero
    full2, _ = build_payloads(timings, 0.1, None, {"cpu_loop_sec": 0.3})
    assert "queries_scan_normalized" not in full2
    # end-of-pass sentinels ride the full calibration map verbatim
    cal3 = dict(cal, cpu_loop_sec_end=0.31, spark_scan_sec_end=0.11)
    full3, line3 = build_payloads(timings, 0.1, None, cal3)
    assert full3["calibration"]["cpu_loop_sec_end"] == 0.31
    assert full3["calibration"]["spark_scan_sec_end"] == 0.11
    assert len(line3) <= TAIL_BUDGET + 1
