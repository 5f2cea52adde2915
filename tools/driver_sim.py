"""Driver-contract simulation: vanilla SparkSession + DuckDB oracle
sweep over every declared query, exactly as the external driver runs
them (see .claude/skills/verify/SKILL.md).

Usage: python tools/driver_sim.py [name-substring ...]
With arguments, only queries whose name contains one of the substrings
are swept (plus the entry() smoke check).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
SF_DIR = "/root/testdata/sf0.01"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if sorted(a.columns) != sorted(b.columns) or len(a) != len(b):
        return False
    a, b = _norm(a), _norm(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True
            )
        else:
            ok = av.astype(object).where(pd.notna(av), None).equals(
                bv.astype(object).where(pd.notna(bv), None)
            )
        if not ok:
            return False
    return True


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    pats = sys.argv[1:]
    spark = SparkSession.builder.master("local[8]").getOrCreate()

    ent = e.entry(spark)
    rows = ent.collect()
    print(f"entry(): {len(rows)} rows, schema={[f.name for f in ent.schema]}")
    assert len(rows) >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries, oracles = e.queries(), e.oracle_sql()
    names = [
        n for n in queries
        if not pats or any(p in n for p in pats)
    ]
    n_pass = n_rows_only = 0
    failed: list[str] = []
    for name in names:
        spark_pdf = queries[name](spark, SF_DIR).toPandas()
        sql = oracles.get(name)
        if sql is None:
            n_rows_only += 1
            print(f"  {name}: rows-only ({len(spark_pdf)} rows)")
            continue
        oracle_pdf = con.execute(sql).df()
        if _equal(spark_pdf, oracle_pdf):
            n_pass += 1
            print(f"  {name}: OK ({len(spark_pdf)} rows)")
        else:
            failed.append(name)
            print(
                f"  {name}: MISMATCH spark={len(spark_pdf)} "
                f"oracle={len(oracle_pdf)} "
                f"cols {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
            )
    print(
        f"swept {len(names)}: {n_pass} pass, {n_rows_only} rows-only, "
        f"{len(failed)} FAIL {failed or ''}"
    )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
