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
# 35 north-star LLM-pipeline/streaming/merge queries, then 15
# relational representatives chosen so every SURVEY §2 id keeps at
# least one hash-checkable query inside the window.
DRIVER_WINDOW: tuple[str, ...] = (
    # merge semantics (D1-D3, U1/U2)
    "d1_insert_ignore_first_writer",
    "d2_upsert_last_writer",
    "d3_partial_update_stale",
    "u1_priority_union_sources",
    # text analysis + corpus dedup materialization (X-UD5, F1/F3/F12, P1, A5)
    # (t_token_stats / t_stopword_ratio / t_bpe_token_count yield their
    # slots to the round-2 composite pipeline queries below; their
    # semantics stay locked by the local oracle suite, and
    # t_clean_corpus_stats exercises the same token-count expression
    # inside the driver window)
    "t_lang_id_heuristic",
    "t_quality_score",
    "t_doc_fingerprint",
    "dd_corpus_dedup_keep_first",
    "t_chunk_documents",
    "t_clean_corpus_stats",
    "f3_clean_text",
    # train/test split hygiene (X-UD5, J5, A9)
    "samp_split_contamination",
    # SCD2 timeline build — the only D4-tagged oracle row
    # (p2_watermark_split_counts yields the slot: P2 keeps window
    # cover via d3_partial_update_stale, U3 via ri_orphan_audit)
    "d5_scd2_user_state",
    # deduplication family (X-UD5, A9, J1, J5, J9, UD1)
    "dd_exact_duplicates",
    "dd_ngram_jaccard_pairs",
    "dd_minhash_lsh_pairs",
    "dd_simhash_near_dups",
    # iterative connected-components canonicalization, hash-checked
    # against a recursive-CTE oracle (evidence no other entry gives)
    "dd_dup_clusters",
    # similarity / ANN family (X-UD5, O1, J6, J9, W1, A7)
    "sim_bruteforce_topk",
    "sim_lsh_bucketed_topk",
    "dd_embedding_nearest_neighbor",
    "sim_ivf_topk",
    "sim_kmeans_ivf_topk",
    "sim_label_centroid_topk",
    # multimodal plumbing (UD2, UD4, P1)
    "mm_byte_features",
    "mm_frame_sample",
    # pandas-UDF tiers (UD1, UD3, UD4, A7)
    "ud1_ascii_ratio",
    "ud3_grouped_agg_cents",
    "ud4_grouped_map_profile",
    # skew mitigation (A10, J9)
    "skew_salted_agg_parity",
    # streaming batch-parity twins (X1-X7, F6, J8)
    "x3_tumbling_hourly",
    # (x3_sliding_halfhour yields its slot: X3 keeps two in-window
    # covers via x3_tumbling_hourly + x8_hourly_gap_fill)
    "x4_session_windows",
    # x8_hourly_gap_fill yields its slot (X3/J8 keep window covers via
    # x3_tumbling_hourly and x7_stream_static_enrich) to the
    # stream-stream interval join, the only oracle-equipped X2/X6 row
    "x9_stream_stream_interval_join",
    "x5_streaming_dedup",
    "x7_stream_static_enrich",
    # relational representatives (one per remaining SURVEY id)
    "a4_topk_customers_by_orders",  # A4, O2, J3
    "a6_ratio_customers_with_orders",  # A6
    "a8_null_partition_count",  # A8, P8
    "a11_rollup_customers",  # A11, J4
    "a12_sketch_tolerance",  # A12 (exact value + in-bounds flags)
    "a14_pivot_event_counts",  # P9, A5, A10
    "f2_prefixed_ids",  # F2
    "f4_json_projection",  # F4, F12
    "p10_oversize_text_guard",  # P10, F5
    "p12_q6_revenue_pushdown",  # P12, F11
    "j7_composite_key_first_line",  # J7, W4
    "j10_asof_last_view_before_purchase",  # J10, W3
    "o3_order_offset_page",  # O3
    "ri_orphan_audit",  # S13, J2, U3
    # w2_lag_event_value_delta yields its slot (W2 keeps window cover
    # via d5_scd2_user_state) to the quality-gate → semantic-dedup
    # pipeline composite
    "dd_semantic_dedup_quality_gate",
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
