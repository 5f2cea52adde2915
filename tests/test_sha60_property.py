"""Property check for the cross-engine oracle hash: for ANY string,
Spark's ``dedup.sha60`` must equal DuckDB's ``_sha60_sql`` twin
bit-for-bit.  This seam underwrites every hash-checked MinHash /
SimHash / rolling-fingerprint driver row, so it gets its own lock
instead of relying on the corpus happening to exercise edge cases
(unicode, quotes, whitespace, long strings)."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hfcommunity_spark.operators.dedup import sha60

# unicode without surrogates; excludes NUL (no operator transports NUL
# inside literals)
_TEXT = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00"
    ),
    max_size=64,
)


@given(s=_TEXT)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sha60_matches_duckdb(spark, s):
    got = (
        spark.range(1).select(sha60(F.lit(s), 7).alias("h")).collect()[0].h
    )
    want = duckdb.connect().execute(
        "SELECT ('0x' || substr(sha256('7:' || ?), 1, 15))::BIGINT", [s]
    ).fetchone()[0]
    assert got == want
