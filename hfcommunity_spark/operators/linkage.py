"""Record linkage: blocked fuzzy matching over entity names (J6/J9
theta-join family; beyond-reference — the reference's join surface is
delegated to MariaDB, reference/extractor/databaseImport.py:1).

The canonical entity-resolution shape for a 100 TB catalog:

1. **Distinct-first.** Collapse the record stream to its distinct
   names WITH multiplicities before any pairwise work — the quadratic
   kernel runs over ``|distinct names|``, not ``|records|`` (at TPC-H
   scale: 64 distinct part names vs 200M part rows).
2. **Blocking.** Pairs are only formed inside an equi-join block (the
   head noun of the name); the O(n²) term is bounded per block by the
   distinct-name count of that block, and the block join is an
   ordinary shuffled equi-join — never a cartesian product.
3. **Cheap-filter-last.** ``levenshtein`` (JVM built-in, codegen) runs
   only on the surviving in-block pairs.

Determinism: names and counts are exact strings/integers, edit
distance is an exact integer in both engines — no float boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hfcommunity_spark.io import read_table
from hfcommunity_spark.registry import query

# Max edit distance for a fuzzy match: 2 catches single-token typo
# variants ("cold anvil" ~ "old anvil") without flooding the output
# with unrelated adjective swaps.
FUZZY_MAX_DIST = 2


def distinct_blocked_names(records: DataFrame, name_col: str,
                           block_expr) -> DataFrame:
    """(name, block, n_records): the distinct-first collapse.  One
    shuffle on the name; multiplicities ride along so matched pairs
    can report the record volume they would merge."""
    return (
        records.select(
            F.col(name_col).alias("name"), block_expr.alias("block")
        )
        .groupBy("name", "block")
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


def fuzzy_blocked_pairs(names: DataFrame,
                        max_dist: int = FUZZY_MAX_DIST) -> DataFrame:
    """In-block distinct-name pairs within ``max_dist`` edits.
    ``name_a < name_b`` canonical orientation; the block equi-join is
    the only shuffle and the edit distance is evaluated JVM-side on
    in-block pairs only."""
    a = names.select(
        F.col("name").alias("name_a"),
        "block",
        F.col("n_records").alias("cnt_a"),
    )
    b = names.select(
        F.col("name").alias("name_b"),
        F.col("block").alias("block_b"),
        F.col("n_records").alias("cnt_b"),
    )
    return (
        a.join(b, (F.col("block") == F.col("block_b"))
               & (F.col("name_a") < F.col("name_b")))
        .withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "block", "dist", "cnt_a", "cnt_b")
    )


_FUZZY_ORACLE = f"""
    WITH dn AS (
      SELECT p_name AS name, split_part(p_name, ' ', 2) AS block,
             CAST(COUNT(*) AS BIGINT) AS n_records
      FROM part GROUP BY 1, 2
    )
    SELECT a.name AS name_a, b.name AS name_b, a.block,
           CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist,
           a.n_records AS cnt_a, b.n_records AS cnt_b
    FROM dn a JOIN dn b
      ON a.block = b.block AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
    """


@query("j12_fuzzy_blocked_join", _FUZZY_ORACLE, survey="J6,J9,F12,A9")
def j12_fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy part-name linkage: which distinct catalog names are
    edit-distance neighbors inside their noun block, and how many
    records each side of the merge carries.

    Plan shape (asserted in tests/test_round8_ops.py::
    test_fuzzy_join_plan_is_blocked, plus the inventory-wide
    no-CartesianProduct audit in tests/test_plan_audit.py):
    distinct-first aggregate → blocked equi-join → codegen
    ``levenshtein`` on in-block pairs only."""
    part = read_table(spark, sf_dir, "part")
    # NULL-safe block extraction: under ANSI mode (the Spark 4
    # default, and the driver's vanilla session) an out-of-bounds
    # array index THROWS, so a one-word name would crash the query;
    # F.get() returns NULL instead, coalesced to '' to match the
    # oracle's split_part semantics so both engines join the same rows
    names = distinct_blocked_names(
        part, "p_name",
        F.coalesce(F.get(F.split(F.col("p_name"), " "), 1), F.lit("")),
    )
    return fuzzy_blocked_pairs(names).select(
        "name_a",
        "name_b",
        "block",
        F.col("dist").cast("int").alias("dist"),
        "cnt_a",
        "cnt_b",
    )
