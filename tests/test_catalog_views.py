"""Persistent views in the lake catalog: ``CREATE [OR REPLACE] VIEW``
stored as metastore entries (reserved ``__views__`` namespace), DROP
VIEW / SHOW VIEWS, late-bound reads through the catalog-resolved SELECT
front door, and name-collision guards against tables — the reference's
temp-view idiom (``demo-notebook.py:236``) made durable."""

import os

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.catalog import (
    LakeCatalog,
    Lakehouse,
)

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("v", StringType())]
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, str(tmp_path / "cat"))
    c.create_database("db1")
    t = c.create_table("db1", "t", SCHEMA)
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], SCHEMA))
    return c


def test_create_show_read_drop_view(cat, spark):
    cat.sql("CREATE VIEW db1.v AS SELECT v, count(*) AS n FROM db1.t GROUP BY v")
    assert cat.sql("SHOW VIEWS IN db1") == ["v"]
    rows = {r["v"]: r["n"] for r in cat.read_view("db1", "v").collect()}
    assert rows == {"a": 2, "b": 1}
    # SELECT through the front door binds the view by name
    got = cat.sql("SELECT n FROM db1.v WHERE v = 'a'").collect()
    assert [r["n"] for r in got] == [2]
    cat.sql("DROP VIEW db1.v")
    assert cat.views("db1") == []
    with pytest.raises(ValueError, match="no such view"):
        cat.read_view("db1", "v")


def test_view_is_late_bound(cat, spark):
    cat.create_view("db1", "v", "SELECT count(*) AS n FROM db1.t")
    assert cat.read_view("db1", "v").collect()[0]["n"] == 3
    cat.table("db1", "t").append(spark.createDataFrame([(4, "c")], SCHEMA))
    assert cat.read_view("db1", "v").collect()[0]["n"] == 4  # sees new data


def test_view_persists_across_instances(cat, spark, tmp_path):
    cat.create_view("db1", "v", "SELECT max(id) AS m FROM db1.t")
    fresh = LakeCatalog(spark, cat.root)
    assert fresh.views("db1") == ["v"]
    assert fresh.read_view("db1", "v").collect()[0]["m"] == 3


def test_view_over_view_and_cycle_guard(cat):
    cat.create_view("db1", "base", "SELECT id, v FROM db1.t WHERE id > 1")
    cat.create_view("db1", "top", "SELECT count(*) AS n FROM db1.base")
    assert cat.read_view("db1", "top").collect()[0]["n"] == 2
    # manufacture a cycle by replacing base to read top
    cat.create_view(
        "db1", "base", "SELECT 1 AS id, 'x' AS v FROM db1.top",
        or_replace=True,
    )
    with pytest.raises(ValueError, match="view cycle"):
        cat.read_view("db1", "top")


def test_create_view_validates_eagerly(cat):
    with pytest.raises(Exception):
        cat.create_view("db1", "bad", "SELECT nope_col FROM db1.t")
    assert cat.views("db1") == []
    with pytest.raises(ValueError, match="no such database"):
        cat.create_view("nodb", "v", "SELECT 1 AS x")


def test_or_replace_required_to_overwrite(cat):
    cat.create_view("db1", "v", "SELECT id FROM db1.t")
    with pytest.raises(ValueError, match="view exists"):
        cat.create_view("db1", "v", "SELECT v FROM db1.t")
    cat.sql("CREATE OR REPLACE VIEW db1.v AS SELECT v FROM db1.t")
    assert cat.read_view("db1", "v").columns == ["v"]


def test_view_table_namespace_collisions(cat, spark, tmp_path):
    cat.create_view("db1", "v", "SELECT id FROM db1.t")
    with pytest.raises(ValueError, match="is a view"):
        cat.create_table("db1", "v", SCHEMA)
    with pytest.raises(ValueError, match="is a view"):
        cat.sql("DROP TABLE db1.v")
    with pytest.raises(ValueError, match="is a table"):
        cat.drop_view("db1", "t")
    with pytest.raises(ValueError, match="cannot shadow"):
        cat.create_view("db1", "t", "SELECT 1 AS x")
    ext = str(tmp_path / "ext")
    LakeTable.create(spark, ext, SCHEMA)
    with pytest.raises(ValueError, match="is a view"):
        cat.register_table("db1", "v", ext)


def test_drop_database_covers_views(cat):
    cat.create_view("db1", "v", "SELECT id FROM db1.t")
    with pytest.raises(ValueError, match="not empty"):
        cat.drop_database("db1")
    cat.drop_database("db1", cascade=True)
    assert cat.views("db1") == []
    # an empty db with ONLY a view also blocks non-cascade drops
    cat.create_database("db2")
    cat.create_view("db2", "v2", "SELECT 1 AS x")
    with pytest.raises(ValueError, match="not empty"):
        cat.drop_database("db2")


def test_string_literals_never_rewritten(cat, spark):
    cat.table("db1", "t").append(
        spark.createDataFrame([(9, "from db1.t")], SCHEMA)
    )
    got = cat.sql(
        "SELECT count(*) AS n FROM db1.t WHERE v = 'from db1.t'"
    ).collect()
    assert got[0]["n"] == 1


def test_if_exists_drop_view(cat):
    assert cat.sql("DROP VIEW IF EXISTS db1.missing") is None
    cat.create_view("db1", "v", "SELECT id FROM db1.t")
    cat.sql("DROP VIEW IF EXISTS db1.v")
    assert cat.views("db1") == []


def test_insert_select_reads_catalog_objects(cat, spark):
    """INSERT INTO ... SELECT through the catalog front door binds
    catalog tables AND views in the SELECT part."""
    cat.create_table("db1", "sink", SCHEMA)
    cat.create_view("db1", "v", "SELECT id, v FROM db1.t WHERE id > 1")
    cat.sql("INSERT INTO db1.sink SELECT id, v FROM db1.v")
    got = sorted(r["id"] for r in cat.table("db1", "sink").to_df().collect())
    assert got == [2, 3]


def test_lakehouse_three_level_views(spark, tmp_path):
    lh = Lakehouse(spark, str(tmp_path / "lh"))
    lh.sql("CREATE CATALOG dev")
    lh.sql("CREATE DATABASE dev.db1")
    lh.sql(
        "CREATE TABLE dev.db1.t (id BIGINT, v STRING)"
    )
    lh.sql("INSERT INTO dev.db1.t VALUES (1, 'a'), (2, 'b')")
    lh.sql(
        "CREATE VIEW dev.db1.v AS SELECT count(*) AS n FROM dev.db1.t"
    )
    assert lh.sql("SHOW VIEWS IN dev.db1") == ["v"]
    assert lh.sql("SELECT n FROM dev.db1.v").collect()[0]["n"] == 2
    lh.sql("DROP VIEW dev.db1.v")
    assert lh.sql("SHOW VIEWS IN dev.db1") == []


def test_cte_shadows_catalog_table(cat):
    """A CTE named like a catalog table takes precedence (standard SQL
    scoping) — the rewriter must not bind it to the table."""
    got = cat.sql(
        "WITH t AS (SELECT 111 AS one) SELECT one FROM t",
        default_db="db1",
    ).collect()
    assert [r["one"] for r in got] == [111]
    # a db-QUALIFIED reference still reads the table even with the CTE
    got = cat.sql(
        "WITH t AS (SELECT 111 AS one) SELECT count(*) AS n FROM db1.t"
    ).collect()
    assert got[0]["n"] == 3


def test_double_quoted_literals_never_rewritten(cat, spark):
    cat.table("db1", "t").append(
        spark.createDataFrame([(9, "copied FROM t")], SCHEMA)
    )
    got = cat.sql(
        'SELECT count(*) AS n FROM db1.t WHERE v = "copied FROM t"'
    ).collect()
    assert got[0]["n"] == 1
