"""sf1.0 scale rehearsal (VERDICT r4 ask #5): synthesize a 10× corpus
from sf0.1, run the most expensive query families at both scales, and
record measured scaling exponents vs the design claims in
BENCH_SF1.json.

Synthesis (into the gitignored .rehearsal/sf1.0/ — /root/testdata is
read-only and stays untouched):
- documents: 10 replicas, keys offset, every word of replicas 1-9
  suffixed "_rK" — intra-replica shingle/dup structure is preserved
  exactly while cross-replica shingles are disjoint, so candidate
  volume in the text-dedup families scales linearly by construction.
- embeddings: 10 replicas, keys offset, each replica rotated by its
  own random ORTHOGONAL matrix — intra-replica cosines are exactly
  preserved; cross-replica cosines follow the random-pair law, which
  is also how the real generator scales (sf0.01→sf0.1 grew n 4× and
  τ-pairs 16×: the τ=0.4 pair set IS the random tail, so its quadratic
  growth is a property of the data, not an artifact).
- orders/lineitem/customer: 10 replicas with key offsets; dimension
  tables copied as-is (10× fan-in on fixed dims, the realistic shape).

Usage: python tools/scale_rehearsal.py [--regen]
       python tools/scale_rehearsal.py --only NAME [NAME ...]

``--only`` times just the named QUERIES rows (same 3-rep cold/warm
protocol at both scales) and MERGES them into the existing
BENCH_SF1.json — for late-round entrants, without re-running the full
hour-long sweep.  The trio step and saturation sections are left
untouched in merge mode.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

BASE = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".rehearsal", "sf1.0")
FACTOR = 10
OUT_JSON = os.path.join(REPO, "BENCH_SF1.json")

# (query, family, predicted exponent in n) — families per the design
# claims being verified: exact oracles are inherently quadratic, every
# bucketed candidate path and relational aggregate is ~linear.
QUERIES = [
    ("dd_cosine_threshold_pairs", "exact-oracle", 2.0),
    ("dd_embedding_nearest_neighbor", "exact-oracle", 2.0),
    ("dd_semantic_dup_clusters", "exact-oracle+cc", 2.0),
    ("dd_semantic_dup_clusters_lsh", "bucketed-lsh+cc", 1.0),
    ("dd_minhash_lsh_pairs", "bucketed-lsh", 1.0),
    ("dd_simhash_near_dups", "bucketed-lsh", 1.0),
    ("dd_ngram_jaccard_pairs", "bucketed-postings", 1.0),
    ("dd_dup_clusters", "bucketed-postings+cc", 1.0),
    ("samp_decontaminated_train", "bucketed-postings", 1.0),
    ("pipe_curation_end_to_end", "bucketed-postings+cc", 1.0),
    ("sim_ivf_topk", "bucketed-ivf", 1.0),
    ("q5_supplier_nation_volume", "relational", 1.0),
    ("q10_returned_revenue_topk", "relational", 1.0),
    ("q18_large_order_customers", "relational", 1.0),
    # round-5 additions: every candidate path is posting-list / keyed
    # (linear by design); none carries a pairwise stage.
    ("sim_bm25_topk", "bucketed-postings", 1.0),
    ("samp_dsir_select", "bucketed-postings", 1.0),
    ("sim_matryoshka_rerank", "coarse-prune-rerank", 1.0),
    ("dd_lsh_recall_audit", "bucketed-postings", 1.0),
    ("x12_stream_dsir_gate", "bucketed-postings", 1.0),
    ("samp_dsir_resample", "bucketed-postings", 1.0),
    ("layout_zorder_pruning_audit", "keyed-agg", 1.0),
    ("pipe_curation_dsir_topk", "bucketed-postings+cc", 1.0),
    ("t_unigram_ppl_buckets", "bucketed-postings", 1.0),
    ("dd_dup_span_ratio", "bucketed-postings", 1.0),
    ("emb_centroid_outlier_prune", "centroid-window", 1.0),
    ("w_event_anomaly_zscore", "keyed-window", 1.0),
    # round 6: the final-mile export composite (curate -> select ->
    # shard -> pack); everything beyond the selection is a shard-keyed
    # window over the top-K frame.
    ("pipe_curate_select_pack_shard", "bucketed-postings+cc", 1.0),
    # round 6: the exact-substring strip transform — two positional
    # explodes + keyed joins, linear in corpus tokens by design.
    ("dd_strip_dup_spans", "bucketed-postings", 1.0),
    # round 6: the streaming hygiene twin — the before-side span
    # stats rebuild is the only fresh work (linear); the after side
    # probes the persisted index.
    ("x13_stream_source_hygiene", "bucketed-postings", 1.0),
    # round 6: quality operators — the cascade is one scan + one
    # tiny-group agg; the adaptive gate's rank is decomposed through
    # the bounded score histogram (window keys are (source, score));
    # MMR's corpus-scale stage is the top-16 heap, the greedy loop is
    # constant work over the pool.
    ("t_filter_cascade_audit", "single-pass-agg", 1.0),
    ("t_source_relative_quality_filter", "histogram-window", 1.0),
    ("sim_mmr_diversify_topk", "coarse-prune-rerank", 1.0),
    # round 8: the histogram-decomposed global rank (the round-7 w1
    # fix traded 0.5s at sf0.1 for scale safety — this row is the
    # payoff evidence: the replaced plan was a single-task sort of the
    # WHOLE table, this one's per-task work is bounded by the ≤11k
    # whole-dollar histogram cells at any scale).
    ("w1_ntile_percent_rank", "histogram-window", 1.0),
    # round 8: the maintained-index delta faces — cold builds the
    # base-slice standing state (linear, charged to the build like
    # every session index), warm is the delivery probe, which must
    # stay flat-ish (it is bounded by the delivery, not the corpus).
    ("dd_maintained_pairs_parity", "delta-probe", 1.0),
    ("dd_maintained_components_parity", "delta-probe", 1.0),
    # round 8 #2: the new driver entrants whose inputs the rehearsal
    # actually scales (j12_fuzzy_blocked_join reads only the `part`
    # dimension, which the synthesis copies as-is — excluded).  The
    # retrieval/ANN maintained faces are delta probes (cold charges
    # the standing-index build, warm is the delivery fold); RRF/SQ8
    # are pool-bounded rerank funnels; PageRank is 3 edge-keyed
    # shuffles over the lineitem-derived edge list; the UniMax
    # allocator and the BPE merge step are one corpus aggregate each
    # (everything after runs on source-/vocabulary-bounded frames).
    ("ret_maintained_bm25_parity", "delta-probe", 1.0),
    ("sim_maintained_ivf_parity", "delta-probe", 1.0),
    ("sim_hybrid_rrf_topk", "coarse-prune-rerank", 1.0),
    ("sim_sq8_rerank_topk", "coarse-prune-rerank", 1.0),
    ("g_pagerank_fixed_iter", "keyed-agg", 1.0),
    ("samp_unimax_budget", "single-pass-agg", 1.0),
    ("t_bpe_merge_pairs", "single-pass-agg", 1.0),
    # round 9: the TPC-H distribution/waiting faces are keyed
    # aggregates/joins over the scaled fact tables (linear); the two
    # streamed maintained faces are per-delivery folds — the
    # delivery and its writer work grow with the corpus slice here
    # (the arriving slice is 1/8 of documents), but the per-fold job
    # count is FIXED, so the measured shape should be dominated by
    # that fixed per-delivery overhead (near-flat cold→warm, exponent
    # well below 1 until data dwarfs overhead).
    ("q13_customer_order_distribution", "relational", 1.0),
    ("q21_suppliers_kept_waiting", "relational", 1.0),
    ("x15_stream_maintained_clusters", "delta-probe", 1.0),
    ("x16_stream_maintained_ann", "delta-probe", 1.0),
    # round 10: the streamed BM25 face joins the rehearsal so every
    # documents-fed streamed maintained face carries growth evidence.
    ("x14_stream_maintained_index", "delta-probe", 1.0),
    # round 9 #2: the streamed span-audit face (per-fold probe bounded
    # by the delivery's hash set) and the outer interval join (same
    # range join as x9 plus the null bucket).
    ("x17_stream_maintained_spans", "delta-probe", 1.0),
    ("x18_stream_outer_interval_join", "keyed-window", 1.0),
    # round 9 #3: the streamed SCD2 dimension (per-fold work bounded
    # by the delivery + affected keys) and the Q15 scalar-max face
    # (one lineitem aggregate + broadcast scalar).
    ("x19_stream_scd2_dim", "delta-probe", 1.0),
    ("q15_top_supplier_revenue", "relational", 1.0),
    # round 9 #4: exact percentiles via the two-pass value histogram —
    # pass 1 is one map-side-combined count bounded by the value
    # domain, pass 2 reads only the target cells; the flat shape is
    # the whole point (the naive plan sorts whole segments).
    ("a16_exact_percentiles", "histogram-window", 1.0),
    # round 9 #5: the streamed media-feature face — per-delivery work
    # is the batch's Arrow extraction; the standing table appends.
    ("x20_stream_media_features", "delta-probe", 1.0),
    # round 10: the learned-quantizer IVF rotated into the window with
    # its new exact unrolled-Lloyd oracle — cold charges the 3-round
    # Lloyd fit (per round: one GEMM assignment pass + one k×dim
    # partial agg, linear in rows), warm probes the session codebook
    # (cell-pruned scoring, ~flat).
    ("sim_kmeans_ivf_topk", "coarse-prune-rerank", 1.0),
    # round 14: product-quantization ADC — cold charges the one-pass
    # multi-subspace PQ fit (per iteration: one vectorized encode +
    # one (m, cell, dim)-keyed partial agg, linear in rows) and the
    # encode; warm probes the session codebook (codes scan + literal
    # LUT arithmetic, linear scan with a top-k heap, ~flat
    # per-row cost).
    ("sim_pq_adc_topk", "coarse-prune-rerank", 1.0),
    # round 11 (r10 verdict #4, closing r9 ask #8): the two TPC-H
    # faces added in r10 — both scan-bound single-pass aggregates
    # over lineitem with plan-asserted pushdown (q19 additionally
    # broadcast-joins the fixed part dimension), so the expected
    # cold exponent is ~1.0 and warm likewise (no standing state).
    ("q1_pricing_summary", "single-pass-agg", 1.0),
    ("q19_disjunctive_revenue", "relational", 1.0),
    # round 11 entrants (same-round rehearsal discipline): Q8 is one
    # fact-fact exchange + broadcast dims; Q17 is a per-part agg
    # sharing its shuffle with the join-back — both linear by design.
    ("q8_national_market_share", "relational", 1.0),
    ("q17_small_quantity_revenue", "relational", 1.0),
]

# The steepest warm exponents of the r6/r7 rehearsals (cascade 0.75,
# adaptive-quartile 0.63, unigram-ppl 0.59) get a SECOND growth step
# (sf1.0 → sf3.0, documents-only corpus at 30x sf0.1) so the fitted
# law rests on two independent steps instead of one possibly
# overhead-skewed point (VERDICT r6 ask #5 / r7 ask #5).
TRIO = (
    "t_filter_cascade_audit",
    "t_source_relative_quality_filter",
    "t_unigram_ppl_buckets",
)

# Queries eligible for the sf3 corpus (DOCUMENTS-ONLY synthesis): the
# trio plus the documents-fed streamed maintained faces.  A static
# allowlist, not a plan-construction probe — the lifecycle faces
# execute their folds EAGERLY inside the query function, so "building
# the plan" to check table usage would run the query and poison the
# cold rep (round-10 review follow-up).
SF3_DOCUMENTS_ONLY = TRIO + (
    "x13_stream_source_hygiene",
    "x14_stream_maintained_index",
    "x15_stream_maintained_clusters",
    "x17_stream_maintained_spans",
    "dd_maintained_pairs_parity",
    "dd_maintained_components_parity",
    "ret_maintained_bm25_parity",
    # events-fed (the sf3 corpus carries a 30x events feed too —
    # replicated with id+time offsets, so the dense/time-ordered
    # invariant x19 leans on holds by construction)
    "x19_stream_scd2_dim",
    "x18_stream_outer_interval_join",
    # embeddings-fed (30 orthogonal-rotation replicas) and the
    # media face (payloads synthesized from documents)
    "x16_stream_maintained_ann",
    "x20_stream_media_features",
)
FACTOR3 = 30
OUT3 = os.path.join(REPO, ".rehearsal", "sf3.0")


def _gen_embeddings(con: duckdb.DuckDBPyConnection, n_base: int,
                    factor: int = FACTOR, out_dir: str | None = None,
                    ) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = out_dir or OUT
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{BASE}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.stack([np.asarray(r[1], np.float32) for r in rows])
    labels = np.array([r[2] for r in rows], dtype=np.int32)
    dim = m.shape[1]
    out_ids, out_vecs, out_labels = [], [], []
    for k in range(factor):
        if k == 0:
            q = np.eye(dim)
        else:
            # QR of a seeded gaussian → Haar-ish orthogonal rotation
            q, _ = np.linalg.qr(
                np.random.RandomState(9000 + k).standard_normal((dim, dim))
            )
        out_ids.append(ids + k * n_base)
        out_vecs.append((m.astype(np.float64) @ q.T).astype(np.float32))
        out_labels.append(labels)
    vecs = np.concatenate(out_vecs)
    tab = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), dim
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(np.concatenate(out_labels)),
        }
    )
    pq.write_table(tab, os.path.join(out_dir, "embeddings.parquet"))


def generate() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def strides(table: str, key: str) -> int:
        return con.execute(
            f"SELECT MAX({key}) + 1 FROM read_parquet('{BASE}/{table}.parquet')"
        ).fetchone()[0]

    n_doc = strides("documents", "doc_id")
    n_vec = strides("embeddings", "vec_id")
    n_ord = strides("orders", "o_orderkey")
    n_cust = strides("customer", "c_custkey")

    # documents: word-salt replicas 1..9 (replica 0 byte-identical)
    con.execute(f"""
        COPY (
          SELECT doc_id + k * {n_doc} AS doc_id,
                 CASE WHEN k = 0 THEN text
                      ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                                       w -> w || '_r' || k::VARCHAR), ' ')
                 END AS text,
                 lang, source, n_chars
          FROM read_parquet('{BASE}/documents.parquet'),
               (SELECT unnest(range({FACTOR})) AS k)
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
    """)
    _gen_embeddings(con, n_vec)
    con.execute(f"""
        COPY (
          SELECT o_orderkey + k * {n_ord} AS o_orderkey,
                 o_custkey + k * {n_cust} AS o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM read_parquet('{BASE}/orders.parquet'),
               (SELECT unnest(range({FACTOR})) AS k)
        ) TO '{OUT}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT l_orderkey + k * {n_ord} AS l_orderkey,
                 l_partkey, l_suppkey, l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax, l_returnflag,
                 l_linestatus, l_shipdate
          FROM read_parquet('{BASE}/lineitem.parquet'),
               (SELECT unnest(range({FACTOR})) AS k)
        ) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT c_custkey + k * {n_cust} AS c_custkey,
                 c_name, c_nationkey, c_acctbal, c_mktsegment
          FROM read_parquet('{BASE}/customer.parquet'),
               (SELECT unnest(range({FACTOR})) AS k)
        ) TO '{OUT}/customer.parquet' (FORMAT PARQUET)
    """)
    # events: 10 replicas with key offsets, timestamps as-is.  The
    # replicas interleave inside each per-type frame (shared ts, the
    # event_id tie-break keeps the order total), which is exactly the
    # right timing shape: per-key partitions grow 10×, so the keyed
    # windows' sort+scan should scale ~linearly in row count.
    n_evt = strides("events", "event_id")
    n_usr = strides("events", "user_id")
    con.execute(f"""
        COPY (
          SELECT event_id + k * {n_evt} AS event_id, ts,
                 user_id + k * {n_usr} AS user_id,
                 event_type, value, props
          FROM read_parquet('{BASE}/events.parquet'),
               (SELECT unnest(range({FACTOR})) AS k)
        ) TO '{OUT}/events.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "supplier", "part"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{BASE}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )


def generate_sf3_documents() -> None:
    """Documents + events 30x corpus for the second growth step —
    documents use the same word-salt replica scheme as the sf1.0
    generator (intra-replica structure preserved, cross-replica
    shingles disjoint); events replicate with id AND time offsets so
    the feed stays dense and event-time-ordered (the x19 invariant:
    id order == time order), each replica's users offset into a
    disjoint id range (30x keys, per-key history shape preserved)."""
    os.makedirs(OUT3, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    n_doc = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM read_parquet('{BASE}/documents.parquet')"
    ).fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT doc_id + k * {n_doc} AS doc_id,
                 CASE WHEN k = 0 THEN text
                      ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                                       w -> w || '_r' || k::VARCHAR), ' ')
                 END AS text,
                 lang, source, n_chars
          FROM read_parquet('{BASE}/documents.parquet'),
               (SELECT unnest(range({FACTOR3})) AS k)
        ) TO '{OUT3}/documents.parquet' (FORMAT PARQUET)
    """)
    n_ev, n_user, span_us = con.execute(f"""
        SELECT MAX(event_id) + 1, MAX(user_id) + 1,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts))
        FROM read_parquet('{BASE}/events.parquet')
    """).fetchone()
    con.execute(f"""
        COPY (
          SELECT event_id + k * {n_ev} AS event_id,
                 ts + to_microseconds(k * ({span_us} + 3600000000)) AS ts,
                 user_id + k * {n_user} AS user_id,
                 event_type, value, props
          FROM read_parquet('{BASE}/events.parquet'),
               (SELECT unnest(range({FACTOR3})) AS k)
        ) TO '{OUT3}/events.parquet' (FORMAT PARQUET)
    """)
    n_vec = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM read_parquet('{BASE}/embeddings.parquet')"
    ).fetchone()[0]
    _gen_embeddings(con, n_vec, factor=FACTOR3, out_dir=OUT3)


def lsh_bucket_saturation(spark) -> dict:
    """The 100 TB knob the rehearsal is designed to expose: with fixed
    8-bit tables, 10× the corpus saturates the MAX_BUCKET cap and the
    candidate path degrades; growing bits with log₂(n) (8→12) restores
    bounded occupancy.  Returns candidate-pair counts per (scale, bits)."""
    from pyspark.sql import functions as F

    from hfcommunity_spark.io import read_table
    from hfcommunity_spark.operators.similarity import (
        lsh_table_candidate_pairs,
        lsh_table_rows,
    )

    out = {}
    for name, d in (("sf0.1", BASE), ("sf1.0", OUT)):
        emb = read_table(spark, d, "embeddings").select("vec_id", "embedding")
        n = emb.count()
        for bits in (8, 12):
            rows = lsh_table_rows(emb, bits=bits)
            kept = rows.count()
            cand = lsh_table_candidate_pairs(rows).count()
            out[f"{name}/B={bits}"] = {
                "n_vecs": n,
                "banded_rows_kept": kept,
                "candidate_pairs": cand,
            }
    return out


def _growth_entry(sf3: dict, row: dict) -> dict:
    """sf3.0 timing entry + step2/fitted exponents against a query's
    existing sf0.1/sf1.0 rows — shared by the full-run trio stage and
    --sf3 merge mode so the math cannot drift.  Zero-rounded baseline
    times skip the affected exponent instead of feeding log10(0) into
    the fit (NaN would make the JSON unparseable)."""
    ent: dict = {"sf3.0": sf3}
    for mode in ("cold", "warm"):
        t01, t10 = row["sf0.1"][mode], row["sf1.0"][mode]
        if t10:
            ent[f"step2_exponent_{mode}"] = round(
                float(np.log10(max(sf3[mode] / t10, 1e-9))
                      / np.log10(3.0)), 2
            )
        if t01 and t10:
            xs = np.log10([1.0, 10.0, 30.0])
            ys = np.log10([t01, t10, max(sf3[mode], 1e-9)])
            ent[f"fitted_exponent_{mode}"] = round(
                float(np.polyfit(xs, ys, 1)[0]), 2
            )
    return ent


def sf3_merge(names: list[str]) -> None:
    """Second growth step (sf1.0 → sf3.0, documents-only 30x corpus)
    for named documents-only queries, merged into the existing
    payload's ``steep_warm_trio_sf3.queries`` — the trio mechanism
    opened to the streamed maintained faces without a full refresh.
    Each named query must already carry sf0.1/sf1.0 rows in
    ``payload["queries"]`` (full run or ``--only`` merge), validated
    BEFORE the timed reps."""
    known = {name for name, _f, _p in QUERIES}
    unknown = [n for n in names if n not in known]
    assert not unknown, f"--sf3 names not in QUERIES: {unknown}"
    off_corpus = [n for n in names if n not in SF3_DOCUMENTS_ONLY]
    assert not off_corpus, (
        f"--sf3 corpus is documents-only; not allowlisted: {off_corpus}"
    )
    with open(OUT_JSON) as f:
        payload = json.load(f)
    missing = [n for n in names if n not in payload.get("queries", {})]
    assert not missing, (
        f"--sf3 names lack sf0.1/sf1.0 rows in {OUT_JSON}: {missing}"
    )
    # freshness check covers ALL THREE feeds (ADVICE r10): a
    # pre-round-10 .rehearsal/sf3.0 was documents-only, and skipping
    # generation on documents.parquet alone left the events/
    # embeddings-fed merges to fail after the Spark session was up
    if not all(
        os.path.exists(os.path.join(OUT3, f"{t}.parquet"))
        for t in ("documents", "events", "embeddings")
    ):
        t0 = time.monotonic()
        generate_sf3_documents()
        print(f"generated {OUT3} in {time.monotonic() - t0:.1f}s",
              flush=True)

    from pyspark.sql import SparkSession

    from hfcommunity_spark.io import read_table
    from hfcommunity_spark.queries import all_queries

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .appName("scale-rehearsal-sf3")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    # same pre-timing warmup protocol as the full run: footer reads
    # plus the Python-worker/Arrow pool (otherwise the first query's
    # "cold" rep absorbs worker startup the sf1.0 numbers never paid)
    read_table(spark, OUT3, "documents").count()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _noop(c):
        return c

    spark.range(10_000, numPartitions=int(cpus)).select(
        _noop("id")
    ).count()
    trio = payload.setdefault("steep_warm_trio_sf3", {}).setdefault(
        "queries", {}
    )
    for name in names:
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            specs[name].spark(spark, OUT3).count()
            times.append(time.monotonic() - t0)
        sf3 = {"cold": round(times[0], 3), "warm": round(min(times[1:]), 3)}
        ent = _growth_entry(sf3, payload["queries"][name])
        trio[name] = ent
        print(f"sf3 {name:35s} cold {sf3['cold']:.2f}s "
              f"warm {sf3['warm']:.2f}s "
              f"{ {k: v for k, v in ent.items() if 'exponent' in k} }",
              flush=True)
    with open(OUT_JSON, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"merged sf3 rows for {sorted(names)} into {OUT_JSON}")
    spark.stop()


def main() -> None:
    if "--sf3" in sys.argv:
        names = []
        for tok in sys.argv[sys.argv.index("--sf3") + 1:]:
            if tok.startswith("--"):
                break
            names.append(tok)
        assert names, "--sf3 requires at least one query name"
        sf3_merge(names)
        return
    if "--regen" in sys.argv or not os.path.exists(
        os.path.join(OUT, "embeddings.parquet")
    ):
        t0 = time.monotonic()
        generate()
        print(f"generated {OUT} in {time.monotonic() - t0:.1f}s", flush=True)

    from pyspark.sql import SparkSession

    from hfcommunity_spark.queries import all_queries

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .appName("scale-rehearsal")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # Session warmup per scale BEFORE any timing (bench.py does the
    # same): JVM/Python-worker startup and first-scan footer reads
    # otherwise land on whichever query runs first and poison its
    # "cold" number.
    from pyspark.sql import functions as F

    from hfcommunity_spark.io import read_table
    from hfcommunity_spark.operators.similarity import pair_cosine_udf

    for d in (BASE, OUT):
        docs = read_table(spark, d, "documents")
        docs.count()
        emb = read_table(spark, d, "embeddings").limit(64)
        emb.select(
            pair_cosine_udf(F.col("embedding"), F.col("embedding"))
        ).count()
        read_table(spark, d, "lineitem").count()

    only: list[str] = []
    if "--only" in sys.argv:
        # operands stop at the next flag (ADVICE r9: greedy-to-end
        # consumption turned a trailing flag into an unknown-name
        # assert)
        for tok in sys.argv[sys.argv.index("--only") + 1:]:
            if tok.startswith("--"):
                break
            only.append(tok)
        assert only, "--only requires at least one query name"
        known = {name for name, _f, _p in QUERIES}
        unknown = [n for n in only if n not in known]
        assert not unknown, (
            f"--only names not in the rehearsal QUERIES list: {unknown}"
        )
        # merge mode appends to the existing payload AFTER the timed
        # reps — validate it exists and parses BEFORE burning the run
        # (ADVICE r9)
        with open(OUT_JSON) as f:
            merge_base = json.load(f)
        assert "queries" in merge_base, (
            f"{OUT_JSON} has no 'queries' map to merge into"
        )

    results: dict[str, dict] = {}
    for name, family, predicted in QUERIES:
        if only and name not in only:
            continue
        spec = specs[name]
        rec: dict = {"family": family, "predicted_exponent": predicted}
        for scale, d in (("sf0.1", BASE), ("sf1.0", OUT)):
            times = []
            for _ in range(3):
                t0 = time.monotonic()
                spec.spark(spark, d).count()
                times.append(time.monotonic() - t0)
            # cold = first run (pays session-index builds), warm = best
            # repeat (probes them)
            rec[scale] = {"cold": round(times[0], 3),
                          "warm": round(min(times[1:]), 3)}
        for mode in ("cold", "warm"):
            r = rec["sf1.0"][mode] / rec["sf0.1"][mode]
            rec[f"measured_exponent_{mode}"] = round(
                float(np.log10(max(r, 1e-9))), 2
            )
        results[name] = rec
        print(f"{name:35s} {family:22s} "
              f"cold {rec['sf0.1']['cold']:7.2f}s → {rec['sf1.0']['cold']:7.2f}s "
              f"(exp {rec['measured_exponent_cold']:+.2f}) "
              f"warm exp {rec['measured_exponent_warm']:+.2f}", flush=True)

    if only:
        # merge mode: update just these rows in the (pre-validated)
        # existing payload — re-read in case another run landed rows
        # while this one measured
        with open(OUT_JSON) as f:
            payload = json.load(f)
        payload["queries"].update(results)
        with open(OUT_JSON, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"merged {sorted(results)} into {OUT_JSON}")
        spark.stop()
        return

    # --- steep-warm trio: second growth step (sf1.0 -> sf3.0) ------
    if "--regen" in sys.argv or not os.path.exists(
        os.path.join(OUT3, "documents.parquet")
    ):
        t0 = time.monotonic()
        generate_sf3_documents()
        print(f"generated {OUT3} in {time.monotonic() - t0:.1f}s",
              flush=True)
    from hfcommunity_spark.io import read_table as _rt

    _rt(spark, OUT3, "documents").count()  # footer/scan warmup
    trio: dict[str, dict] = {}
    for name in TRIO:
        spec = specs[name]
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            spec.spark(spark, OUT3).count()
            times.append(time.monotonic() - t0)
        sf3 = {"cold": round(times[0], 3), "warm": round(min(times[1:]), 3)}
        # every TRIO member is also in QUERIES, so the sf0.1 and
        # sf1.0 points always exist and all three get the full
        # 3-point fit (shared math with --sf3 merge mode)
        ent = _growth_entry(sf3, results[name])
        trio[name] = ent
        print(f"trio {name:35s} sf3.0 cold {sf3['cold']:.2f}s "
              f"warm {sf3['warm']:.2f}s "
              f"{ {k: v for k, v in ent.items() if 'exponent' in k} }",
              flush=True)
    saturation = lsh_bucket_saturation(spark)
    # preserve sf3 rows previously landed via --sf3 merge mode for
    # queries this full run did not re-measure (round-10 review: a
    # refresh silently dropped the streamed faces' growth steps)
    if os.path.exists(OUT_JSON):
        try:
            with open(OUT_JSON) as f:
                prior = json.load(f).get(
                    "steep_warm_trio_sf3", {}
                ).get("queries", {})
        except Exception:
            prior = {}
        trio = {**prior, **trio}
    payload = {
        "factor": FACTOR,
        "base": BASE,
        "scaled_dir": OUT,
        "note": (
            "measured_exponent = log10(t_sf1.0 / t_sf0.1) for a 10x "
            "row-count step; cold includes session-index builds, warm "
            "probes them.  Sub-second sf0.1 times carry fixed per-job "
            "overhead that deflates small exponents."
        ),
        "queries": results,
        "steep_warm_trio_sf3": {
            "factor_vs_base": FACTOR3,
            "scaled_dir": OUT3,
            "note": (
                "second growth step for the steepest warm exponents: "
                "documents-only 30x corpus; step2 exponent is the "
                "sf1.0->sf3.0 slope, fitted is the least-squares "
                "log-log slope over all three points"
            ),
            "queries": trio,
        },
        "lsh_bucket_saturation": saturation,
    }
    with open(OUT_JSON, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {OUT_JSON}")
    spark.stop()


if __name__ == "__main__":
    main()
