"""Local replica of the driver's DuckDB-oracle comparison.

Runs a declared query in Spark and its oracle SQL in DuckDB on the same
parquet tables, canonicalizes (columns sorted by name, rows sorted by
all columns), and asserts exact equality — bit-exact for floats, which
our DECIMAL-accumulation convention makes achievable.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("bool")
        elif isinstance(s.dtype, pd.CategoricalDtype):
            df[c] = s.astype(str)
        else:
            df[c] = s.astype(object).where(s.notna(), None)
    sort_cols = list(df.columns)
    if sort_cols:
        df = df.sort_values(sort_cols, na_position="first", kind="mergesort")
    return df.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame,
                        name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs "
        f"{sorted(duck_pdf.columns)}"
    )
    # strict physical-type agreement (int widths included): the driver's
    # schema comparison may not normalize int32 vs int64 the way the
    # value comparison below does
    for c in sorted(spark_pdf.columns):
        a, b = str(spark_pdf[c].dtype), str(duck_pdf[c].dtype)
        norm = lambda d: ("datetime" if d.startswith("datetime") else
                          "object" if d in ("object", "category", "string") else d)
        assert norm(a) == norm(b), (
            f"{name}: dtype mismatch on {c}: spark={a} duck={b}"
        )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating):
            ok = np.array_equal(av, bv, equal_nan=True)
        else:
            ok = (
                pd.Series(av).fillna("\0NULL")
                == pd.Series(bv).fillna("\0NULL")
            ).all()
        assert ok, (
            f"{name}: column {c} differs\nspark: {av[:10]}\nduck : {bv[:10]}"
        )


def run_compare(spark, con, spec, sf_dir: str) -> int:
    sdf = spec.spark(spark, sf_dir).toPandas()
    ddf = con.execute(spec.oracle).df()
    assert_frames_match(sdf, ddf, spec.name)
    return len(sdf)
