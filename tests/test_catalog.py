"""Catalog DDL layer: create/drop the 17-table schema, probe for
missing tables, write+read a snapshot through the catalog."""

from __future__ import annotations

from pyspark.sql import functions as F

from hfcommunity_spark import catalog
from hfcommunity_spark.io import write_snapshot
from hfcommunity_spark.schema import SCHEMAS


def test_create_probe_drop_schema(spark, tmp_path):
    base = str(tmp_path / "warehouse")
    try:
        assert sorted(catalog.missing_tables(spark)) == sorted(SCHEMAS)
        created = catalog.create_schema(spark, base)
        assert sorted(created) == sorted(SCHEMAS)
        assert catalog.missing_tables(spark) == []
        assert catalog.table_exists(spark, "repository")

        # idempotent re-create (IF NOT EXISTS, :909-914)
        assert catalog.create_schema(spark, base) == []

        # typed empty table is queryable with the declared schema
        # (DDL roundtrip loses nullability — compare names and types)
        df = spark.table("commits")
        got = [(f.name, f.dataType) for f in df.schema.fields]
        want = [(f.name, f.dataType) for f in SCHEMAS["commits"].fields]
        assert got == want
        assert df.count() == 0
    finally:
        catalog.drop_schema(spark)
    assert sorted(catalog.missing_tables(spark)) == sorted(SCHEMAS)


def test_snapshot_roundtrip(spark, tmp_path):
    base = str(tmp_path / "snap")
    df = spark.createDataFrame([("t1",), ("t2",)], ["name"])
    path = write_snapshot(df, base, "tag", "2024-06")
    back = spark.read.parquet(path)
    assert sorted(r.name for r in back.collect()) == ["t1", "t2"]
    # idempotent re-run of the same release overwrites atomically (D4)
    write_snapshot(df.filter(F.col("name") == "t1"), base, "tag", "2024-06")
    assert spark.read.parquet(path).count() == 1
