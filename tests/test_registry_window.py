"""Locks the driver-window ordering contract.

The driver oracle-checks only the first 50 entries of
``__spark_entry__.queries()``; round-1 lost all 37 north-star queries
to registration order.  These tests pin: the window is exactly the
first 50, every declared SURVEY §2 id keeps a hash-checkable
representative inside the window, and the north-star families are all
present.
"""

from __future__ import annotations

from hfcommunity_spark.queries import DRIVER_WINDOW, all_queries


def test_window_is_first_50():
    qs = list(all_queries())
    assert len(DRIVER_WINDOW) == 50
    assert qs[:50] == list(DRIVER_WINDOW)
    assert len(set(DRIVER_WINDOW)) == 50


def test_window_names_all_registered():
    qs = all_queries()
    missing = [n for n in DRIVER_WINDOW if n not in qs]
    assert not missing, f"window names not registered: {missing}"


def test_every_declared_survey_id_covered_inside_window():
    """Any SURVEY id covered by some registered query must keep at
    least one window query; if the id has an oracle-equipped query
    anywhere, the window representative must be oracle-equipped too
    (hash-green evidence, not rows-only)."""
    qs = all_queries()
    window = set(DRIVER_WINDOW)
    all_ids: set[str] = set()
    oracle_ids: set[str] = set()
    win_ids: set[str] = set()
    win_oracle_ids: set[str] = set()
    for name, spec in qs.items():
        all_ids.update(spec.survey_ids)
        if spec.oracle is not None:
            oracle_ids.update(spec.survey_ids)
        if name in window:
            win_ids.update(spec.survey_ids)
            if spec.oracle is not None:
                win_oracle_ids.update(spec.survey_ids)
    assert all_ids - win_ids == set(), f"ids with no window query: {all_ids - win_ids}"
    assert oracle_ids - win_oracle_ids == set(), (
        f"ids whose window representative is rows-only: "
        f"{oracle_ids - win_oracle_ids}"
    )


def test_no_declared_query_escapes_driver_evidence():
    """Round-6 invariant (VERDICT r5 ask #1): every declared query is
    either cumulatively driver-stamped (a row in some committed
    CORRECTNESS_r*.json) or inside the CURRENT window — i.e. stamped
    within one rotation of landing.  This is what let four round-5
    queries (including the flagship composite) sit unstamped for a
    whole round."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stamped: set[str] = set()
    # r* not r0*: the round-10 file is CORRECTNESS_r10.json, and the
    # narrower glob silently dropped its stamps (masked until the
    # first r10 entrant rotated out, in round 11)
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            stamped.update(json.load(fh))
    window = set(DRIVER_WINDOW)
    orphans = [
        n for n in all_queries() if n not in stamped and n not in window
    ]
    assert not orphans, (
        f"declared queries with no driver evidence and no window slot: "
        f"{orphans}"
    )


def test_north_star_families_inside_window():
    window = set(DRIVER_WINDOW)
    # d5 carries the merge-family evidence (d1/d2/d3 keep their
    # earlier stamps; D3's window slot moved to the two maintained-
    # index parity faces in round 8); "x1" pins the stream-static gate
    # slot (x10 in round 4, the x12 DSIR gate since round 6); "pipe_"
    # pins the curation composites; "ret_" the maintained BM25 index,
    # "j12" the record-linkage face, "g_" the commit-DAG ancestry.
    # ("layout_" and "mm_" rotated out in round 6 with their r5 stamps
    # intact — UD2/UD4 driver evidence now rides ud2_chunk_udtf and
    # the MMR grouped map; the no-orphan test above guards every
    # rotated query's cumulative evidence.)
    # ("x9" became "x18" and "d5" became "x19" in round 9: the outer
    # interval join subsumes the inner pairing, the streamed SCD2
    # dimension subsumes the batch timeline; both rotated queries keep
    # their earlier stamps.)
    for prefix in ("dd_", "sim_", "t_", "ud", "x19",
                   "u1", "samp_", "pipe_", "ret_", "j12", "g_",
                   "x3", "x4", "x5", "x18", "x1"):
        assert any(n.startswith(prefix) for n in window), prefix
