"""Per-fold Spark-job BUDGETS for the maintained-index family
(VERDICT r11 ask #4): the round-10/11 fold-cost surgery eliminated
fixed per-fold job overhead face by face — these tests pin each
family's per-fold job count so a regression flips a test instead of
silently drifting a bench number (the `tests/test_graph.py` zero-job
assertion, generalized).

Budgets, by design of each fold:

- x19 (SCD2): :func:`scd2_delta_split` is PURE PLAN CONSTRUCTION —
  zero jobs; materializing a fold costs exactly 3: AQE builds the
  anti- and semi-probe broadcast stages (one each — the shared
  delivery-keys frame is not exchange-reused across join types) plus
  the eager checkpoint's job.  A single left join + marker column
  would share one broadcast build (2 jobs) but needs a real DISTINCT
  shuffle on the delivery keys first — the semi/anti forms dedup for
  free in the build-side hash map, the better trade at 100 TB where
  the delivery is large and job-launch overhead is noise.
- x14 (BM25): :func:`bm25_index_delta` appends postings/doclens and
  folds the 1-row stats with a broadcast cross join — all lazy, zero
  jobs; serving pays the jobs.
- x16 (IVF): :func:`ivf_index_delta` materializes the DELIVERY's
  assigned piece (by contract — every serve consumes it twice), so
  the fold budget is the checkpoint's single job.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _job_budget(spark, budget: int, what: str):
    """Run the body under a throwaway job group and assert it
    scheduled at most ``budget`` Spark jobs."""
    sc = spark.sparkContext
    group = f"hfc-job-budget-{what}"
    sc.setJobGroup(group, what)
    try:
        yield
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert len(jobs) <= budget, (
        f"{what}: fold scheduled {len(jobs)} jobs "
        f"(budget {budget}): {sorted(jobs)}"
    )


def test_scd2_fold_job_budget(spark):
    """scd2_delta_split schedules ZERO jobs (plan construction only);
    materializing the fold is a CONSTANT 3 jobs — two broadcast-probe
    builds + the eager checkpoint — independent of history depth
    (see module docstring for why not 2)."""
    from hfcommunity_spark.operators.graph import (
        _eager_checkpoint,
        _free_checkpoint,
    )
    from hfcommunity_spark.operators.mergeops import scd2_delta_split

    open_rows = spark.createDataFrame(
        [(1, "a", 10, None, 12), (2, "b", 5, None, 5)],
        "user_id int, state string, valid_from int, valid_to int, "
        "_last_event_ts int",
    )
    changes = spark.createDataFrame(
        [(1, "b", 20, 100), (3, "a", 21, 101)],
        "user_id int, event_type string, ts int, event_id int",
    )
    with _job_budget(spark, 0, "scd2-plan"):
        parts = scd2_delta_split(
            open_rows, changes, key="user_id", state="event_type",
            ts="ts", tiebreak="event_id",
        )
    with _job_budget(spark, 3, "scd2-fold"):
        folded, ids = _eager_checkpoint(parts.coalesce(2))
    # the fold actually folded: key 1 closed at ts 20, key 3 is fresh
    got = {(r.user_id, r.state, r.valid_from, r.valid_to)
           for r in folded.collect()}
    assert (1, "a", 10, 20) in got and (1, "b", 20, None) in got
    assert (3, "a", 21, None) in got and (2, "b", 5, None) in got
    _free_checkpoint(spark, ids)


def test_bm25_fold_job_budget(spark):
    """bm25_index_delta — postings/doclen appends + the broadcast
    stats fold — schedules ZERO jobs; ranking pays them at serve."""
    from hfcommunity_spark.operators.retrieval import (
        _bm25_frames,
        bm25_index_delta,
    )

    base = spark.createDataFrame(
        [(1, "data spark model"), (2, "spark spark")],
        "doc_id long, text string",
    )
    arriving = spark.createDataFrame(
        [(3, "model data"),], "doc_id long, text string",
    )
    tf0, dl0, st0 = _bm25_frames(base)
    with _job_budget(spark, 0, "bm25-fold"):
        tf, dl, st = bm25_index_delta(tf0, dl0, st0, arriving)
    stats = st.collect()[0]
    assert stats.n == 3 and stats.sum_dl == 7
    assert dl.count() == 3


def test_x19_local_twin_job_budget(spark):
    """The x19 driver-local one-scan fold schedules exactly 2 jobs
    when the caller supplies the parquet-footer row-count hint (the
    Arrow collect + the final local-relation checkpoint), and 4
    without one (the bounded gate count runs as two incremental-limit
    jobs) — independent of delivery count (VERDICT r12 #5: a future
    edit that sneaks a per-delivery job into the twin flips this
    test, not a bench number)."""
    from hfcommunity_spark.io import read_table
    from hfcommunity_spark.operators.mergeops import (
        _parquet_row_count,
        _x19_fold_local,
    )

    ev = read_table(spark, "/root/testdata/sf0.01", "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    ev.schema  # footer/schema job billed to the read, not the fold
    hint = _parquet_row_count("/root/testdata/sf0.01/events.parquet")
    # the hint is EXACT: footer metadata equals the real count
    assert hint == ev.count()
    with _job_budget(spark, 2, "x19-local-twin-hinted"):
        out = _x19_fold_local(spark, ev, 8, n_rows_hint=hint)
    assert out is not None and len(out.columns) == 5
    with _job_budget(spark, 4, "x19-local-twin-unhinted"):
        out2 = _x19_fold_local(spark, ev, 8)
    assert out2 is not None
    # an over-cap hint gates out with ZERO jobs (the 100 TB shape)
    with _job_budget(spark, 0, "x19-local-twin-overcap"):
        assert _x19_fold_local(
            spark, ev, 8, n_rows_hint=10**12
        ) is None
    # unreadable/remote paths yield no hint, never a wrong one
    assert _parquet_row_count("/nonexistent/events.parquet") is None


def test_pagerank_local_twin_job_budget(spark):
    """The PageRank driver-local twin is ONE guarded Arrow collect —
    a single job covers gate + transfer (the documented no-pre-gate
    trade: the edge frame is typically a corpus DISTINCT, a count
    pre-gate would pay that shuffle twice)."""
    from hfcommunity_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1)], "src long, dst long"
    )
    with _job_budget(spark, 1, "pagerank-local-twin"):
        out = pagerank_fixed(edges, 3)
    assert set(out.columns) == {"node", "pr"}


def test_ancestors_local_twin_job_budget(spark):
    """The ancestors driver-local twin schedules exactly 4 jobs: the
    compact start-set Arrow collect (1), the bounded edge COUNT
    pre-gate (2 incremental-limit jobs — ships nothing, ADVICE r12),
    and the single edge Arrow collect (1)."""
    from hfcommunity_spark.operators.graph import ancestors

    edges = spark.createDataFrame(
        [("c", "b"), ("b", "a"), ("d", "c")],
        "commit_sha string, parent_sha string",
    )
    starts = spark.createDataFrame([("d",), ("c",)], "sha string")
    with _job_budget(spark, 4, "ancestors-local-twin"):
        out = ancestors(edges, starts, 3)
    assert set(out.columns) == {"sha", "ancestor_sha", "hops"}


def test_ivf_fold_job_budget(spark):
    """ivf_index_delta materializes exactly the delivery's assigned
    piece — ONE checkpoint job, never a job over the standing lists."""
    from hfcommunity_spark.operators.similarity import ivf_index_delta

    base_lists = spark.createDataFrame(
        [(1, 0, [0.0, 0.0]), (2, 1, [1.0, 1.0])],
        "vec_id long, cell int, embedding array<double>",
    )
    arriving = spark.createDataFrame(
        [(3, [0.9, 1.1]), (4, [0.1, -0.1])],
        "vec_id long, embedding array<double>",
    )
    cents = [[0.0, 0.0], [1.0, 1.0]]
    with _job_budget(spark, 1, "ivf-fold"):
        folded = ivf_index_delta(base_lists, arriving, cents)
    got = {(r.vec_id, r.cell) for r in
           folded.select("vec_id", "cell").collect()}
    assert got == {(1, 0), (2, 1), (3, 1), (4, 0)}
