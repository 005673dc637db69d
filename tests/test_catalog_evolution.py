"""LakeCatalog namespace DDL + additive schema evolution on append."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake.catalog import LakeCatalog

SCHEMA = StructType([StructField("id", LongType()), StructField("v", LongType())])


def test_catalog_ddl_roundtrip(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    cat.create_database("db1")
    assert cat.databases() == ["db1"]
    t = cat.create_table("db1", "t1", SCHEMA, properties={"enableChangeDataFeed": "true"})
    t.append(spark.createDataFrame([(1, 10), (2, 20)], SCHEMA))
    assert cat.tables("db1") == ["t1"]

    cat.register_views("db1")
    got = spark.sql("SELECT sum(v) AS s FROM db1_t1").collect()[0]["s"]
    assert got == 30

    with pytest.raises(ValueError, match="not empty"):
        cat.drop_database("db1")
    cat.drop_table("db1", "t1")
    assert cat.tables("db1") == []
    cat.drop_database("db1", cascade=True)
    assert cat.databases() == []

    with pytest.raises(ValueError, match="no such table"):
        cat.table("db1", "t1")


def test_schema_evolution_append(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "cat2"))
    t = cat.create_table("db", "evolving", SCHEMA)
    t.append(spark.createDataFrame([(1, 10)], SCHEMA))

    widened = StructType(SCHEMA.fields + [StructField("tag", StringType())])
    t.append(spark.createDataFrame([(2, 20, "new")], widened), merge_schema=True)

    df = t.to_df()
    assert set(df.columns) == {"id", "v", "tag"}
    got = {r["id"]: (r["v"], r["tag"]) for r in df.collect()}
    # pre-evolution rows read the new column as NULL
    assert got == {1: (10, None), 2: (20, "new")}

    # without merge_schema, columns unknown to the table are dropped
    extra = StructType(widened.fields + [StructField("unknown_col", StringType())])
    t.append(spark.createDataFrame([(3, 30, "t3", "dropme")], extra))
    df3 = t.to_df()
    assert "unknown_col" not in df3.columns
    assert {r["id"] for r in df3.collect()} == {1, 2, 3}
