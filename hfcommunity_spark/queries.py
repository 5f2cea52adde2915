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


# The first 50 registry entries — the driver's correctness window.
#
# Round-4 rotation: rounds 1-3 stamped 87 of the 109 declared queries;
# this window contains the 24 queries with no driver evidence yet, the
# two hash-family dedup queries whose oracles are new this round
# (seeded-sha2 mode), and 24 coverage representatives chosen by set
# cover so every SURVEY §2 id keeps an oracle-equipped in-window query
# (``tests/test_registry_window.py`` asserts the invariant).  After
# this round every declared query has a driver CORRECTNESS row in some
# round.  Queries rotated out (e.g. the round-2/3 similarity and text
# stamps) keep their prior-round driver rows plus the local DuckDB
# parity suite (``tests/test_oracle_parity.py``).
DRIVER_WINDOW: tuple[str, ...] = (
    # --- never-stamped until round 4 -------------------------------
    # relational / TPC-H composite shapes
    "a15_exact_mode_per_segment",  # A4, W1, W4
    "q4_priority_late_ship",  # A4, J2, P12
    "q10_returned_revenue_topk",  # A4, J3, J4, O1
    "q14_promo_revenue_ratio",  # A6, F11, J3
    "q18_large_order_customers",  # A7, J2, W4
    # event-analytics composites
    "w5_funnel_conversion",  # A5, P9, W4
    "w6_retention_cohorts",  # A5, F6, J3
    # text analysis
    "t_token_stats",  # F12, X-UD5
    "t_stopword_ratio",  # F12, X-UD5
    "t_bpe_token_count",  # F12, X-UD5
    "t_rolling_hash_fingerprint",  # X-UD5
    "t_repetition_filter",  # A4, F11, X-UD5
    "t_pii_scrub_stats",  # F1, F12, X-UD5
    "t_rarity_score",  # A7, X-UD5
    # dedup / similarity
    "dd_cosine_threshold_pairs",  # J6, P12, X-UD5
    # multimodal
    "mm_byte_features_full",  # UD2, UD4, X-UD5
    "mm_resize_thumbnail",  # P1, UD2, X-UD5
    "ud2_chunk_udtf",  # P1, UD2 (real Python UDTF under LATERAL)
    # sampling / packing (samp_pack_token_budget = the distributed
    # prefix-scan sequence packer, strongest unstamped evidence)
    "samp_stratified_topn",  # F1, W1, X-UD5
    "samp_hash_split_counts",  # A5, P8, X-UD5
    "samp_mixture_weights",  # A7, J9, X-UD5
    "samp_pack_token_budget",  # A10, W3, X-UD5
    # streaming twins
    "x3_sliding_halfhour",  # X3
    "x8_hourly_gap_fill",  # F6, J8, X3
    # --- hash-family dedup, oracle'd this round (seeded sha2 mode) --
    "dd_minhash_lsh_pairs",
    "dd_simhash_near_dups",
    # --- round-4 additions, stamped on arrival -------------------
    # (d1_insert_ignore and x7_stream_static_enrich rotate out: both
    # carry r1-r3 stamps, and their ids stay covered — D1 via
    # x5_streaming_dedup, A9/U1 via samp_split_contamination and
    # u1_priority_union_sources, X7/J8 via the gate and
    # x8_hourly_gap_fill)
    "samp_decontaminated_train",  # A9, J2, U3, X-UD5
    "x10_stream_neardup_gate",  # X7, J9, X-UD5
    # (samp_split_contamination rotates out with r2/r3 stamps: J5 via
    # the semantic-clusters composite, A9 via samp_decontaminated)
    # --- round-5 addition, stamped on arrival ---------------------
    # (dd_semantic_dup_clusters — the exact oracle twin — rotates out
    # with its r4 hash-green stamp; the production LSH-fed composite
    # covers the same X-UD5/J5/J6 ids and adds J9)
    "dd_semantic_dup_clusters_lsh",  # X-UD5, J5, J6, J9
    # --- coverage representatives (set cover over SURVEY ids) ------
    "d3_partial_update_stale",  # D3, P2
    "d5_scd2_user_state",  # D2, D4, W2
    "u1_priority_union_sources",  # U1, U2
    "ri_orphan_audit",  # S13, J2, U3
    "p10_oversize_text_guard",  # F5, P10
    "f2_prefixed_ids",  # F2
    "f3_clean_text",  # F3, UD1
    "f4_json_projection",  # F4, F12
    "t_clean_corpus_stats",  # A8, P12, W4, X-UD5
    "ud3_grouped_agg_cents",  # A7, UD3
    "skew_salted_agg_parity",  # A10, J9
    "sim_label_centroid_topk",  # A7, W1, X-UD5
    "a4_topk_customers_by_orders",  # A4, J3, O2
    "a11_rollup_customers",  # A11, J4
    "a12_sketch_tolerance",  # A12
    "j7_composite_key_first_line",  # J7, W4
    "o3_order_offset_page",  # O3
    "x3_tumbling_hourly",  # F6, X1, X2, X3
    "x4_session_windows",  # X4
    "x5_streaming_dedup",  # D1, X5, X6
    "x9_stream_stream_interval_join",  # J10, X2, X6
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
