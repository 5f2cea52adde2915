"""MMR diversity re-rank: behavioral lock + cross-engine parity on a
CONSTRUCTED corpus where diversification is provable, not incidental.

Two clusters are planted: a tight bundle of near-duplicates hugging
the query direction (highest relevance, mutually redundant) and a
second direction with moderate relevance.  Pure top-k fills with the
bundle; MMR must pay the redundancy penalty and pull in the second
cluster — asserted structurally (a candidate whose relevance rank is
beyond MMR_K gets selected) and value-for-value against the recursive
DuckDB oracle on the same parquet.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from hfcommunity_spark.operators.similarity import (
    _MMR_ORACLE,
    MMR_K,
    sim_mmr_diversify_topk,
)
from tests.oracle_utils import assert_frames_match


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    rng = np.random.RandomState(7)
    dim = 64
    q = np.zeros(dim)
    q[0] = 1.0
    # Bundle A: slightly MORE query-relevant but mutually ~identical
    # (pairwise cosine ≈ 1).  Cluster B: a hair less relevant but a
    # different direction (cosine to A ≈ 0.79).  With λ=0.7 the
    # marginal score of a second A (0.7·0.894 − 0.3·1.0 ≈ 0.33) loses
    # to the first B (0.7·0.886 − 0.3·0.79 ≈ 0.38), so MMR must
    # interleave while pure top-k takes only A's.
    a_dir = np.zeros(dim)
    a_dir[0], a_dir[1] = 1.0, 0.5
    b_dir = np.zeros(dim)
    b_dir[0], b_dir[2] = 0.95, 0.5
    rows = [(0, q)]
    vid = 1
    for _ in range(12):  # bundle: fills a pure top-12
        rows.append((vid, a_dir + rng.normal(0, 0.002, dim)))
        vid += 1
    for _ in range(8):
        rows.append((vid, b_dir + rng.normal(0, 0.002, dim)))
        vid += 1
    pdf = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [
                np.asarray(r[1], dtype=np.float32).tolist() for r in rows
            ],
            "label": [0] * len(rows),
        }
    )
    out = tmp_path_factory.mktemp("mmr") / "case"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    return str(out)


def test_mmr_promotes_diverse_candidates(spark, clustered_dir):
    got = (
        sim_mmr_diversify_topk(spark, clustered_dir)
        .toPandas()
        .sort_values("mmr_rank")
    )
    assert len(got) == MMR_K
    assert got.iloc[0]["rel_rank"] == 1  # seed pick is pure relevance
    # diversification: some selected candidate would NOT make a pure
    # relevance top-MMR_K (the bundle alone fills those slots)
    assert (got["rel_rank"] > MMR_K).any()


def test_mmr_matches_recursive_oracle_on_clusters(spark, clustered_dir):
    got = sim_mmr_diversify_topk(spark, clustered_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{clustered_dir}/embeddings.parquet/*.parquet')"
    )
    want = con.execute(_MMR_ORACLE).df()
    con.close()
    assert_frames_match(got, want, "sim_mmr_diversify_topk")
