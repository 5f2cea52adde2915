"""Physical-plan audit: the scale properties ARCHITECTURE.md claims
must actually appear in the optimized plans — filter/projection
pushdown to the parquet scan, broadcast joins on dims, heap top-k,
semi/anti join strategies.  A regression here is a perf bug even when
results stay correct."""

from __future__ import annotations

import pytest

from hfcommunity_spark.queries import all_queries
from tests.conftest import SF_ORACLE

SPECS = all_queries()


def _formatted_plan(spark, name: str) -> str:
    df = SPECS[name].spark(spark, SF_ORACLE)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


@pytest.mark.parametrize(
    "name,needles",
    [
        # conjunctive predicates reach the parquet scan; projection pruned
        ("p12_q6_revenue_pushdown",
         ["PushedFilters: [IsNotNull(l_shipdate)", "GreaterThanOrEqual(l_shipdate"]),
        # top-k compiles to a heap, never a full sort
        ("a4_topk_customers_by_orders",
         ["TakeOrderedAndProject", "BroadcastHashJoin"]),
        ("o1_top_lineitems_by_price", ["TakeOrderedAndProject"]),
        # similarity top-k: heap + k-row merge, never a global-window
        # single-partition sort (round-1 scale-killer)
        ("sim_bruteforce_topk", ["TakeOrderedAndProject"]),
        ("sim_lsh_bucketed_topk", ["TakeOrderedAndProject"]),
        ("sim_ivf_topk", ["TakeOrderedAndProject"]),
        ("sim_kmeans_ivf_topk", ["TakeOrderedAndProject"]),
        # dims broadcast; fact side never builds the hash table
        ("j3_orders_per_nation", ["BroadcastHashJoin"]),
        ("q5_supplier_nation_volume", ["BroadcastHashJoin"]),
        ("x7_stream_static_enrich", ["BroadcastHashJoin"]),
        # existence checks stay semi/anti — no row multiplication
        ("j2_semi_join_customers_with_orders", ["LeftSemi"]),
        ("u3_anti_join_customers_without_orders", ["LeftAnti"]),
        # round-2 TPC-H composites keep the same disciplines
        ("q10_returned_revenue_topk",
         ["TakeOrderedAndProject", "BroadcastHashJoin"]),
        ("q4_priority_late_ship", ["LeftSemi"]),
        ("q18_large_order_customers", ["LeftSemi"]),
        # round-4 pipeline actions: existence via semi, removal via
        # anti — leaking ids never multiply rows
        ("samp_decontaminated_train", ["LeftSemi", "LeftAnti"]),
        # round-10 TPC-H faces: Q1's shipdate bound reaches the scan;
        # Q19's per-side conjunct unions push to BOTH scans (the
        # quantity range union onto lineitem, brand/size onto part)
        # while the cross-table disjunction stays post-join
        ("q1_pricing_summary",
         ["PushedFilters: [IsNotNull(l_shipdate)",
          "LessThanOrEqual(l_shipdate"]),
        ("q19_disjunctive_revenue",
         ["Or(And(GreaterThanOrEqual(l_quantity,1.0)",
          "Or(And(EqualTo(p_brand,Brand#12)",
          "BroadcastHashJoin"]),
        # round-11 TPC-H faces: Q8's dimension filters prune at the
        # scans and every dim edge broadcasts; Q17's brand filter
        # prunes the part broadcast
        ("q8_national_market_share",
         ["EqualTo(p_type,ECONOMY)",
          "EqualTo(r_name,ASIA)",
          "GreaterThanOrEqual(o_orderdate,1996-01-01",
          "BroadcastHashJoin"]),
        ("q17_small_quantity_revenue",
         ["EqualTo(p_brand,Brand#12)",
          "BroadcastHashJoin"]),
    ],
)
def test_plan_contains(spark, name, needles):
    plan = _formatted_plan(spark, name)
    for needle in needles:
        assert needle in plan, f"{name}: expected {needle!r} in plan"


def test_lsh_probe_is_a_pruning_filter(spark):
    """The multi-probe is a single hamming predicate on the bucket
    column (references only the partition column at scale, so it prunes
    partitions) — NOT a nested-loop join condition over the corpus (the
    round-1 scale-killer), and NOT the round-2 2,517-literal INSET
    (whose per-probe analysis cost ~0.5s).  The probe path must also be
    Python-free: candidate scoring is JVM-side."""
    plan = _formatted_plan(spark, "sim_lsh_bucketed_topk")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "bit_count" in plan
    # the only Python eval is the one-time signature build INSIDE the
    # cached InMemoryRelation; the per-probe path above the cache scan
    # (filter + scoring + top-k) must be Python-free
    if "ArrowEvalPython" in plan:
        assert plan.index("ArrowEvalPython") > plan.index("InMemoryRelation")


def test_pq_adc_plan_shape(spark):
    """The PQ/ADC scale claims, plan-asserted (r14): the face reads
    ONLY (vec_id, embedding) with the vec_id filter pushed to the
    scan, runs exactly ONE Python stage (the vectorized encode — the
    ADC arithmetic downstream of the codes column is pure JVM
    element_at/sqrt over literal arrays), and the top-k is the
    TakeOrderedAndProject heap with no exchange below it."""
    plan = _formatted_plan(spark, "sim_pq_adc_topk")
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "vec_id" in read_schema and "embedding" in read_schema
    assert "label" not in read_schema  # pruned: 2 of the 3 columns
    assert "Not(EqualTo(vec_id,0))" in plan
    import re

    # formatted plans print each node twice (tree + detail section):
    # count node HEADERS — exactly one Python stage
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # heap merge, no shuffle anywhere
    assert "element_at" in plan  # the ADC LUT reads stayed JVM-side


def test_sim_topk_no_global_window(spark):
    """No single-partition Exchange feeding a Window in any sim_* plan:
    rank is derived after the k-row limit, so the only unpartitioned
    window runs over ≤k rows post-TakeOrderedAndProject."""
    for name in ("sim_bruteforce_topk", "sim_lsh_bucketed_topk",
                 "sim_ivf_topk", "sim_kmeans_ivf_topk", "sim_pq_adc_topk"):
        plan = _formatted_plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        # formatted plans print the root first, so the rank Window must
        # appear ABOVE (= consume the ≤k-row output of) the heap top-k
        assert plan.index("Window") < plan.index("TakeOrderedAndProject"), name


def test_q6_reads_only_needed_columns(spark):
    plan = _formatted_plan(spark, "p12_q6_revenue_pushdown")
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    # 4 of lineitem's 11 columns — projection pruning reached the scan
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read_schema
    for col in ("l_orderkey", "l_partkey", "l_comment", "l_returnflag"):
        assert col not in read_schema


def test_exact_pair_kernel_no_driver_transit():
    """Round-2 scale defect, fixed in round 3: the exact cosine-pair
    kernel must be fully executor-side — no per-chunk collect(), no
    sparkContext.broadcast of data, no toPandas.  Enforced at the
    source level so a regression cannot hide behind a cached plan."""
    import inspect

    from hfcommunity_spark.operators import similarity as sim

    for fn in (
        sim._block_pair_grouped,
        sim.blocked_cosine_pairs,
        sim.exact_nearest_neighbor,
        sim.dd_embedding_nearest_neighbor,
        sim.dd_cosine_threshold_pairs,
        sim.dd_semantic_dedup_quality_gate,
    ):
        src = inspect.getsource(fn)
        assert ".collect()" not in src, fn.__name__
        assert "sparkContext.broadcast" not in src, fn.__name__
        assert ".toPandas()" not in src, fn.__name__


def test_block_pair_kernel_multiblock_parity(spark):
    """Forcing tiny blocks (many cross-block GEMM groups) must give
    bit-identical results to the single-block diagonal path — every
    unordered pair is scored in exactly one group."""
    from hfcommunity_spark.operators.similarity import (
        blocked_cosine_pairs,
        exact_nearest_neighbor,
    )
    from hfcommunity_spark.io import read_table

    emb = read_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", "embedding"
    )
    one = {tuple(r) for r in blocked_cosine_pairs(spark, emb, 0.4).collect()}
    many = {
        tuple(r)
        for r in blocked_cosine_pairs(spark, emb, 0.4, block_rows=64).collect()
    }
    assert one == many and len(one) > 0

    nn_one = {tuple(r) for r in exact_nearest_neighbor(spark, emb).collect()}
    nn_many = {
        tuple(r)
        for r in exact_nearest_neighbor(spark, emb, block_rows=64).collect()
    }
    assert nn_one == nn_many and len(nn_one) > 0


def test_block_pair_kernel_empty_input(spark):
    """ADVICE r2: an empty embeddings frame (e.g. the semantic-dedup
    quality gate filtering out every doc) must yield an empty result
    with the declared schema, not IndexError."""
    from hfcommunity_spark.operators.similarity import (
        blocked_cosine_pairs,
        exact_nearest_neighbor,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    pairs = blocked_cosine_pairs(spark, emb, 0.4)
    assert pairs.columns == ["vec_a", "vec_b"] and pairs.count() == 0
    nn = exact_nearest_neighbor(spark, emb)
    assert nn.columns == ["vec_id", "nn_id"] and nn.count() == 0


def test_no_cartesian_products_in_inventory(spark):
    """Only intentional scalar-combiner cross joins (tiny 1-row sides)
    may appear; anything else is a missing join condition."""
    allowed = {
        "a6_ratio_customers_with_orders",  # two 1-row aggregates
        "a12_sketch_tolerance",            # two 1-row aggregates
        "ri_orphan_audit",                 # two 1-row aggregates
        "sim_label_centroid_topk",         # K-row broadcast centroids
        "j10_asof_last_view_before_purchase",
    }
    for name in SPECS:
        if name in allowed:
            continue
        plan = _formatted_plan(spark, name)
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"


def test_round5_lm_and_mrl_plan_shapes(spark):
    """Round-5 additions keep the module disciplines: DSIR and the
    matryoshka funnel end in a heap top-k with broadcast stat/candidate
    sides; the perplexity terciles window is PARTITIONED (per
    language), never a single-partition global sort."""
    for name in ("samp_dsir_select", "sim_matryoshka_rerank"):
        plan = _formatted_plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "BroadcastHashJoin" in plan, name
        # the rank Window consumes only the k-row heap output
        assert plan.index("Window") < plan.index("TakeOrderedAndProject"), name

    plan = _formatted_plan(spark, "t_unigram_ppl_buckets")
    assert "Window" in plan
    # the tercile window's Exchange is hashpartitioning on lang — a
    # SinglePartition exchange feeding the Window would be the global
    # sort the design forbids
    assert "SinglePartition" not in plan

    # BM25: posting-slice filter + heap top-k, stat sides broadcast
    plan = _formatted_plan(spark, "sim_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan

    # epoch shard plan: the ordering window is partitioned per shard —
    # a SinglePartition exchange would be the ORDER BY rand() global
    # shuffle the operator exists to avoid
    plan = _formatted_plan(spark, "samp_epoch_shard_plan")
    assert "Window" in plan
    assert "SinglePartition" not in plan

    # Z-order audit: two keyed partial-agg rollups, no cartesian wider
    # than the 1-row chunk-size broadcast
    plan = _formatted_plan(spark, "layout_zorder_pruning_audit")
    assert "CartesianProduct" not in plan


def test_final_export_plan_shape(spark):
    """Round-6 composite discipline: the selection still ends in the
    heap top-k, the shard/pack stage adds exactly ONE window and it is
    PARTITIONED by shard (its windowspecdefinition leads with the
    shard key; no Exchange appears only because the heap's k-row
    output already satisfies any clustering), and nothing in the added
    stage introduces a cartesian product.  The only unpartitioned
    window is the k-row rank over the heap output — bounded by
    construction, the ranked_topk discipline."""
    plan = _formatted_plan(spark, "pipe_curate_select_pack_shard")
    assert "TakeOrderedAndProject" in plan
    assert "windowspecdefinition(shard" in plan
    assert "CartesianProduct" not in plan


def test_round6_operator_plan_shapes(spark):
    """The two round-6 operators keep the module disciplines: the
    repeat schedule's NTILE window is PARTITIONED per source (a
    SinglePartition exchange would be the global sort the
    t_unigram_ppl_buckets discipline forbids), and the source hygiene
    gate is one keyed partial agg over the persisted span stats — no
    cartesian, no single-partition stage anywhere."""
    plan = _formatted_plan(spark, "samp_repeat_schedule")
    assert "windowspecdefinition(source" in plan
    assert "hashpartitioning(source" in plan
    assert "CartesianProduct" not in plan
    # (one SinglePartition exchange IS expected: the 1-row DSIR corpus
    # totals aggregate inside the persisted weight-frame build —
    # bounded by construction, the same shape as samp_dsir_select.)

    plan = _formatted_plan(spark, "dd_source_hygiene_audit")
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_adaptive_quality_gate_plan_shape(spark):
    """The per-source adaptive gate's scale claim, pinned to the
    physical plan: the ONLY full-data window is keyed by BOTH
    (source, score) — a window partitioned by source alone would sort
    1/|sources| of the corpus in single tasks — the score histogram
    reaches the document side through a BroadcastHashJoin (never a
    shuffled join of the corpus against its own histogram), and no
    stage collapses to SinglePartition."""
    plan = _formatted_plan(spark, "t_source_relative_quality_filter")
    assert "windowspecdefinition(source#" in plan or (
        "windowspecdefinition(source" in plan
    )
    # every window over the document-side columns must carry the score
    # key; source-only windows are allowed only on the tiny histogram
    import re

    doc_windows = [
        w for w in re.findall(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan)
    ]
    assert doc_windows, "expected the tie-break row_number window"
    for spec in doc_windows:
        assert "score" in spec, f"doc-side window missing score key: {spec}"
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_filter_cascade_plan_shape(spark):
    """The rule cascade is ONE scan + one partial-aggregated shuffle:
    no join, no window, no UDF — the audit's cost is a single pass
    regardless of corpus size."""
    plan = _formatted_plan(spark, "t_filter_cascade_audit")
    assert "Join" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # partial->final agg exchange (+AQE read)


def test_mmr_plan_shape(spark):
    """MMR's scale contract: candidate selection is the heap top-k
    (TakeOrderedAndProject), the sequential greedy loop is ONE Arrow
    grouped map over the bounded pool, and nothing shuffles the full
    corpus into a single partition before the heap."""
    plan = _formatted_plan(spark, "sim_mmr_diversify_topk")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("FlatMapGroupsInPandas (") == 1  # tree node form
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # rank comes from the grouped map


def test_w1_ntile_no_global_window(spark):
    """Round-7 fix of the last scale-weak plan: ntile/percent_rank
    are computed from a histogram-decomposed rank, so the plan must
    carry NO SinglePartition exchange (the old global-window sort)
    — the only Window left is the per-bucket tie-break, partitioned
    by the whole-dollar cell."""
    plan = _formatted_plan(spark, "w1_ntile_percent_rank")
    assert "SinglePartition" not in plan
    # the tie-break window must be partitioned: its Exchange is
    # hashpartitioning on bkt, never a global order-by exchange
    assert "rangepartitioning(c_acctbal" not in plan


# The corpus' SF-scaled tables (row counts grow linearly with SF) vs
# the constant-size dims (nation/region/supplier/part).  A HARD
# F.broadcast on a scaled table is a 100×-scale OOM hazard: the hint
# bypasses the planner's size check entirely (round-11 verdict).
_SF_SCALED_TABLES = (
    "customer", "orders", "lineitem", "events", "documents",
    "embeddings",
)


def test_no_hard_broadcast_hint_on_sf_scaled_tables():
    """Source-level invariant: no operator applies F.broadcast()
    directly to an SF-scaled base table (by its canonical variable
    name, with or without a .select/.filter chain) — those joins route
    through skew.maybe_broadcast, whose gate re-checks Catalyst's size
    estimate against autoBroadcastJoinThreshold at plan time."""
    import pathlib
    import re

    pkg = pathlib.Path("hfcommunity_spark")
    pat = re.compile(
        r"F\.broadcast\(\s*(?:%s)\b" % "|".join(_SF_SCALED_TABLES)
    )
    hits = [
        f"{p}:{i}: {line.strip()}"
        for p in sorted(pkg.rglob("*.py"))
        for i, line in enumerate(p.read_text().splitlines(), 1)
        if pat.search(line)
    ]
    assert not hits, (
        "hard broadcast hint on an SF-scaled table (use "
        "maybe_broadcast):\n" + "\n".join(hits)
    )


@pytest.mark.parametrize(
    "name",
    [
        # the six faces that hard-hinted customer through round 11
        "p4_resource_threshold_skip",
        "a4_topk_customers_by_orders",
        "j3_orders_per_nation",
        "q3_unshipped_revenue_topk",
        "a15_exact_mode_per_segment",
        "q8_national_market_share",
    ],
)
def test_size_gated_customer_broadcast_keeps_plan_shape(spark, name):
    """At oracle scale customer's Catalyst size estimate sits far
    under autoBroadcastJoinThreshold, so the size-gated hint must
    still fire and the physical plan keeps its round-11 shape — a
    BroadcastHashJoin, never a sort-merge exchange on the customer
    edge."""
    plan = _formatted_plan(spark, name)
    assert "BroadcastHashJoin" in plan, name
    assert "SortMergeJoin" not in plan, name


def test_maybe_broadcast_gate_respects_threshold(spark):
    """The gate itself: under the session threshold the hint is
    applied (analyzed plan carries ResolvedHint); with the threshold
    pinned below the frame's estimate, the frame comes back unhinted
    so the planner/AQE keep the runtime decision; threshold -1
    disables hinting outright."""
    from hfcommunity_spark.io import read_table
    from hfcommunity_spark.operators.skew import maybe_broadcast

    cust = read_table(spark, SF_ORACLE, "customer")

    def hinted(df):
        return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()

    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "10MB")
        assert hinted(maybe_broadcast(cust))
        spark.conf.set(key, "1b")
        assert not hinted(maybe_broadcast(cust))
        spark.conf.set(key, "-1")
        assert not hinted(maybe_broadcast(cust))
    finally:
        spark.conf.set(key, prev)


def test_maybe_broadcast_estimate_memoized(spark):
    """The Catalyst size estimate is memoized per (session, plan,
    input-file fingerprint): one optimizer round-trip per distinct
    (plan, file state), the gate decision thereafter reads the cache
    (VERDICT r12 #2).  The poisoned-cache step proves the second call
    consults the cache rather than re-deriving the estimate."""
    from hfcommunity_spark.io import read_table
    from hfcommunity_spark.operators import skew

    cache = skew._session_cache(spark)
    before = dict(cache)
    cache.clear()
    try:
        skew.maybe_broadcast(read_table(spark, SF_ORACLE, "customer"))
        assert len(cache) == 1
        cache_key, est = next(iter(cache.items()))
        assert est > 0
        # the same plan REBUILT from scratch over UNCHANGED files
        # lands on the same slot
        skew.maybe_broadcast(read_table(spark, SF_ORACLE, "customer"))
        assert len(cache) == 1
        # poison: a huge cached estimate must flip the gate to
        # unhinted even though the real frame is tiny
        cache[cache_key] = 1 << 60
        out = skew.maybe_broadcast(
            read_table(spark, SF_ORACLE, "customer")
        )
        analyzed = out._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed
    finally:
        cache.clear()
        cache.update(before)


def test_maybe_broadcast_cache_misses_on_grown_inputs(spark, tmp_path):
    """The staleness fix (ADVICE r13): Spark never demotes an explicit
    broadcast hint, so a cached small estimate over inputs that have
    since GROWN must not keep forcing the hint.  Growing the parquet
    dir changes the input-file fingerprint → the same logical plan
    re-derives its estimate; with the threshold pinned between the
    two sizes, the hint flips off.  Also: non-file inputs are never
    memoized, and the per-session cache is capped."""
    from pyspark.sql import functions as F

    from hfcommunity_spark.operators import skew

    p = str(tmp_path / "growing_dim")
    spark.range(10).withColumn("pad", F.lit("x" * 100)).write.mode(
        "overwrite"
    ).parquet(p)
    cache = skew._session_cache(spark)
    before = dict(cache)
    cache.clear()
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)

    def hinted(df):
        return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()

    try:
        small_est = skew._size_estimate(spark.read.parquet(p))
        spark.conf.set(key, str(small_est * 10) + "b")
        assert hinted(skew.maybe_broadcast(spark.read.parquet(p)))
        assert len(cache) == 1
        # grow the table ~1000x past the pinned threshold; same path,
        # same logical plan — but new files, so a NEW cache slot and
        # a fresh (large) estimate that flips the gate
        spark.range(200_000).withColumn(
            "pad", F.lit("y" * 100)
        ).write.mode("append").parquet(p)
        out = skew.maybe_broadcast(spark.read.parquet(p))
        assert not hinted(out)
        assert len(cache) == 2  # old slot dead, new slot recorded
        # in-memory (non-file) inputs never earn a slot
        mem = spark.createDataFrame([(1,)], "a int")
        assert skew._input_fingerprint(mem) is None
        skew.maybe_broadcast(mem)
        assert len(cache) == 2
        # the cap bounds the cache: fill to MAX with synthetic slots,
        # then one real insertion must evict rather than grow
        cache.clear()
        for i in range(skew._EST_CACHE_MAX):
            cache[("synthetic", i)] = 1
        p2 = str(tmp_path / "second_dim")
        spark.range(5).write.parquet(p2)
        assert skew._size_estimate(spark.read.parquet(p2)) is not None
        assert len(cache) == skew._EST_CACHE_MAX
        assert ("synthetic", 0) not in cache  # FIFO victim
    finally:
        spark.conf.set(key, prev)
        cache.clear()
        cache.update(before)


def test_maybe_broadcast_estimate_failure_warns_once(spark):
    """A failed size estimate (private API drift) must be OBSERVABLE:
    one RuntimeWarning for the process, every affected frame returned
    unhinted — never a silent regime change (ADVICE r12)."""
    import warnings

    from hfcommunity_spark.io import read_table
    from hfcommunity_spark.operators import skew

    class _Boom:
        def queryExecution(self):
            raise RuntimeError("private API changed shape")

    prev_flag = skew._WARNED_NO_ESTIMATE
    skew._WARNED_NO_ESTIMATE = False
    try:
        # .alias() wraps a FRESH python DataFrame: read_table memoizes
        # the analyzed relation per (app, sf_dir, table), so mutating
        # the returned object in place would corrupt the shared frame
        # for every later test in the process (the r14 order-dependent
        # failure pair in test_views_and_sink)
        bad = read_table(spark, SF_ORACLE, "nation").alias("estfail")
        bad._jdf = _Boom()
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            out1 = skew.maybe_broadcast(bad)
            out2 = skew.maybe_broadcast(bad)
        runtime = [r for r in rec
                   if issubclass(r.category, RuntimeWarning)
                   and "maybe_broadcast" in str(r.message)]
        assert len(runtime) == 1, runtime
        assert out1 is bad and out2 is bad
    finally:
        skew._WARNED_NO_ESTIMATE = prev_flag
