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


# ---------------------------------------------------------------------------
# ALTER TABLE ADD COLUMNS / DROP COLUMN (metadata-only)
# ---------------------------------------------------------------------------


def test_add_drop_column(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_statement

    schema = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema)
    r = {"t": t}
    execute_statement(spark, "INSERT INTO t VALUES (1, 'a')", r)
    n_files_before = len(t.files())

    execute_statement(spark, "ALTER TABLE t ADD COLUMNS (score BIGINT, tag STRING)", r)
    # metadata-only: no data files touched
    assert len(t.files()) == n_files_before
    assert t.schema().fieldNames() == ["id", "name", "score", "tag"]
    # pre-widening rows read NULL for the new columns
    assert t.to_df().where("score IS NULL AND tag IS NULL").count() == 1
    execute_statement(spark, "INSERT INTO t VALUES (2, 'b', 20, 'x')", r)
    assert {(x.id, x.score) for x in t.to_df().collect()} == {(1, None), (2, 20)}

    execute_statement(spark, "ALTER TABLE t DROP COLUMN tag", r)
    assert t.schema().fieldNames() == ["id", "name", "score"]
    assert len(t.files()) == n_files_before + 1  # still no rewrite
    # time travel still sees the wide schema
    assert "tag" in t.to_df(version=t.version() - 1).columns

    # dependency guards
    import pytest as _pytest
    with _pytest.raises(ValueError, match="already exists"):
        t.add_columns([("score", LongType())])
    with _pytest.raises(ValueError, match="no such column"):
        t.drop_column("bogus")
    t.add_constraint("score_pos", "score IS NULL OR score > 0")
    with _pytest.raises(ValueError, match="constraint"):
        t.drop_column("score")
    # executor errors must propagate through the ALTER dispatch, not be
    # mistaken for "try the next grammar"
    with _pytest.raises(ValueError, match="constraint"):
        execute_statement(spark, "ALTER TABLE t DROP COLUMN score", r)


# ---------------------------------------------------------------------------
# Property: random ADD/DROP/RENAME/append sequences vs a Python model
# ---------------------------------------------------------------------------


def test_schema_evolution_random_sequences(spark, tmp_path):
    """Deterministic pseudo-random walks over the schema-evolution ops.
    A Python model tracks, per version, the expected (schema, rows); every
    few steps the head AND one historical version are checked against it —
    guarding the versioned-schema time-travel contract."""
    import random

    from pyspark.sql.types import LongType, StructField, StructType

    from incremental_etl_on_lakehouse_spark.lake import LakeTable

    rng = random.Random(42)
    for trial in range(3):
        t = LakeTable.create(
            spark,
            str(tmp_path / f"evo{trial}"),
            StructType([StructField("id", LongType()), StructField("c0", LongType())]),
        )
        cols = ["id", "c0"]          # model: current schema
        rows = {}                    # model: id -> {col: value}
        history = {t.version(): (list(cols), {})}
        next_col = 1
        next_id = 0
        for step in range(8):
            op = rng.choice(["append", "append", "add", "drop", "rename"])
            if op == "append":
                vals = {c: rng.randrange(100) for c in cols if c != "id"}
                vals["id"] = next_id
                df = spark.createDataFrame(
                    [tuple(vals[c] for c in cols)],
                    ", ".join(f"{c} long" for c in cols),
                )
                t.append(df)
                rows[next_id] = dict(vals)
                next_id += 1
            elif op == "add":
                name = f"c{next_col}"
                next_col += 1
                t.add_columns([(name, LongType())])
                cols.append(name)
            elif op == "drop" and len(cols) > 2:
                victim = rng.choice([c for c in cols if c != "id"])
                t.drop_column(victim)
                cols.remove(victim)
            elif op == "rename" and len(cols) > 2:
                victim = rng.choice([c for c in cols if c != "id"])
                new = f"r{next_col}"
                next_col += 1
                t.rename_column(victim, new)
                cols[cols.index(victim)] = new
                for r in rows.values():
                    if victim in r:
                        r[new] = r.pop(victim)
            else:
                continue
            history[t.version()] = (
                list(cols),
                {i: dict(r) for i, r in rows.items()},
            )

        def check(version, expect_cols, expect_rows):
            df = t.to_df(version=version)
            assert df.columns == expect_cols, (version, df.columns, expect_cols)
            got = {r["id"]: r.asDict() for r in df.collect()}
            assert set(got) == set(expect_rows)
            for i, r in got.items():
                for c in expect_cols:
                    assert r[c] == expect_rows[i].get(c), (version, i, c)

        # head + two random historical versions
        head_v = max(history)
        check(None if False else head_v, *history[head_v])
        for v in rng.sample(sorted(history), min(2, len(history))):
            check(v, *history[v])


# ------------------------------------------------------ CREATE OR REPLACE


def test_create_or_replace_table(spark, tmp_path):
    """REPLACE swaps schema + data + properties in one commit; history
    survives (time travel reads the pre-replace table)."""
    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_create_table

    path = str(tmp_path / "t")
    t = execute_create_table(
        spark,
        "CREATE TABLE t (id BIGINT, name STRING) "
        "TBLPROPERTIES (enableChangeDataFeed = true)",
        dest_path=path,
    )
    t.append(spark.createDataFrame([(1, "a")], "id bigint, name string"))
    v_old = t.version()
    t2 = execute_create_table(
        spark,
        "CREATE OR REPLACE TABLE t (k STRING NOT NULL, score DOUBLE)",
        dest_path=path,
    )
    assert [f.name for f in t2.schema().fields] == ["k", "score"]
    assert t2.to_df().count() == 0
    # properties REPLACED, not merged: CDF property gone
    assert "enableChangeDataFeed" not in t2.properties()
    # NOT NULL from the new definition enforced
    import pytest as _pytest

    with _pytest.raises(Exception):
        t2.append(spark.createDataFrame([(None, 1.0)], "k string, score double"))
    t2.append(spark.createDataFrame([("x", 1.5)], "k string, score double"))
    assert {(r.k, r.score) for r in t2.to_df().collect()} == {("x", 1.5)}
    # time travel to before the replace: old schema, old data
    old = t2.to_df(version=v_old)
    assert [f.name for f in old.schema.fields] == ["id", "name"]
    assert {(r.id, r.name) for r in old.collect()} == {(1, "a")}


def test_create_or_replace_as_select(spark, tmp_path):
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_create_table

    path = str(tmp_path / "t")
    execute_create_table(
        spark, "CREATE TABLE t AS SELECT 1 AS a", dest_path=path
    )
    t = execute_create_table(
        spark,
        "CREATE OR REPLACE TABLE t AS SELECT 'x' AS b, 2 AS c",
        dest_path=path,
    )
    assert {(r.b, r.c) for r in t.to_df().collect()} == {("x", 2)}


def test_or_replace_with_if_not_exists_rejected():
    import pytest as _pytest

    from incremental_etl_on_lakehouse_spark.lake.sql import parse_create_table

    with _pytest.raises(ValueError, match="cannot also be"):
        parse_create_table(
            "CREATE OR REPLACE TABLE IF NOT EXISTS t (id BIGINT)"
        )


def test_replace_preserves_txn_guards(spark, tmp_path):
    """CREATE OR REPLACE wipes configuration but NOT txn.<app> replay
    guards — a crash-replay of a pre-replace batch must stay a no-op."""
    from pyspark.sql.types import LongType, StructField, StructType

    from incremental_etl_on_lakehouse_spark.lake import LakeTable

    schema = StructType([StructField("id", LongType())])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema)
    t.append(spark.createDataFrame([(1,)], schema), txn_app_id="app", txn_version=7)
    assert t.txn_version("app") == 7
    t.replace_definition(schema)
    assert t.txn_version("app") == 7  # survives the definition reset
    # the guard still suppresses a replayed batch
    t.append(spark.createDataFrame([(9,)], schema), txn_app_id="app", txn_version=7)
    assert t.to_df().count() == 0


def test_execute_script_dest_paths_routing(spark, tmp_path):
    """dest_paths reaches only CREATE statements (two CREATEs get their
    own paths); other statement kinds never see a dest_path kwarg."""
    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_script

    tables = {}

    def resolve(name):
        return tables[name]

    res = execute_script(
        spark,
        """
        CREATE TABLE a (id BIGINT);
        CREATE TABLE b (id BIGINT);
        """,
        resolve,
        dest_paths={"a": str(tmp_path / "a"), "b": str(tmp_path / "b")},
    )
    tables["a"], tables["b"] = res[0], res[1]
    assert res[0].path != res[1].path
    # a mixed script: the MERGE statement must not receive dest_path
    execute_script(
        spark,
        """
        INSERT INTO a VALUES (1);
        MERGE INTO a USING (SELECT CAST(2 AS BIGINT) AS id) s ON a.id = s.id
          WHEN NOT MATCHED THEN INSERT *;
        """,
        resolve,
        dest_paths={"a": str(tmp_path / "a")},
    )
    assert {r.id for r in tables["a"].to_df().collect()} == {1, 2}
