"""UPDATE command + SQL UPDATE/DELETE front-end, and the delete-NULL fix.

The regression test pins a real data-loss bug: a DELETE whose condition
evaluates NULL for a row sharing a file with a matching row used to drop
that row from BOTH the kept and deleted sides of the rewrite.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.sql import (
    execute_delete,
    execute_update,
    parse_delete,
    parse_update,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("grp", StringType()),
        StructField("x", LongType()),
    ]
)


def make(spark, tmp_path, rows, cdf=False, name="t"):
    props = {"enableChangeDataFeed": "true"} if cdf else None
    t = LakeTable.create(spark, str(tmp_path / name), SCHEMA, properties=props)
    t.append(spark.createDataFrame(rows, SCHEMA).coalesce(1))
    return t


def content(t):
    return sorted((r.id, r.grp, r.x) for r in t.to_df().collect())


def test_delete_keeps_null_condition_rows(spark, tmp_path):
    t = make(spark, tmp_path, [(1, "a", 10), (2, "a", None), (3, "a", 2)])
    t.delete("x > 5")
    assert content(t) == [(2, "a", None), (3, "a", 2)]


def test_update_rewrites_only_matching_rows(spark, tmp_path):
    t = make(spark, tmp_path, [(1, "a", 10), (2, "b", None), (3, "a", 2)])
    v = t.update({"x": "x * 100"}, "grp = 'a'")
    assert content(t) == [(1, "a", 1000), (2, "b", None), (3, "a", 200)]
    assert t.history()[-1]["operation"] == "UPDATE" or any(
        h["operation"] == "UPDATE" and h["version"] == v for h in t.history()
    )
    # NULL-evaluating condition keeps the row unmodified
    t.update({"x": "0"}, "x > 500")
    assert content(t) == [(1, "a", 0), (2, "b", None), (3, "a", 200)]


def test_update_unknown_column_rejected(spark, tmp_path):
    t = make(spark, tmp_path, [(1, "a", 1)])
    with pytest.raises(ValueError, match="unknown columns"):
        t.update({"nope": "1"})


def test_update_emits_cdf_pre_and_post(spark, tmp_path):
    t = make(spark, tmp_path, [(1, "a", 10), (2, "b", 20)], cdf=True)
    v = t.update({"x": "x + 1"}, "grp = 'a'")
    ch = t.read_changes(starting_version=v).where(
        F.col("_change_type").isin("update_preimage", "update_postimage")
    )
    got = sorted((r["_change_type"], r.id, r.x) for r in ch.collect())
    assert got == [("update_postimage", 1, 11), ("update_preimage", 1, 10)]


def test_sql_update_delete_roundtrip(spark, tmp_path):
    t = make(spark, tmp_path, [(1, "a", 10), (2, "b", 5), (3, "a", 2)])
    execute_update(
        spark,
        "UPDATE t AS u SET u.x = u.x * 10 -- scale\n WHERE u.grp = 'a'",
        resolve={"t": t},
    )
    execute_delete(spark, "DELETE FROM t WHERE x >= 100", resolve={"t": t})
    assert content(t) == [(2, "b", 5), (3, "a", 20)]
    # DELETE without WHERE truncates
    execute_delete(spark, "DELETE FROM t", resolve={"t": t})
    assert content(t) == []


def test_parsers():
    tbl, assigns, cond = parse_update(
        "UPDATE tgt AS t SET t.a = t.a + 1, b = 'x, y' WHERE t.a > 0"
    )
    assert tbl == "tgt"
    assert assigns == {"a": "a + 1", "b": "'x, y'"}
    assert cond == "a > 0"

    tbl, cond = parse_delete("DELETE FROM tgt t WHERE t.a > 0 AND b = 1")
    assert (tbl, cond) == ("tgt", "a > 0 AND b = 1")
    tbl, cond = parse_delete("DELETE FROM tgt")
    assert (tbl, cond) == ("tgt", None)
    with pytest.raises(ValueError):
        parse_update("DELETE FROM t")
    with pytest.raises(ValueError):
        parse_delete("UPDATE t SET x = 1")


def test_condition_ranges_extraction():
    from incremental_etl_on_lakehouse_spark.lake.table import condition_ranges

    cr = condition_ranges("id = 5 AND x > 3 AND name = 'a''b'", ["id", "x", "name"])
    assert cr == {"id": (5, 5), "x": (3, None), "name": ("a'b", "a'b")}
    # reversed literal, <= bounds, non-stats columns ignored
    assert condition_ranges("10 >= id AND y < 2", ["id"]) == {"id": (None, 10)}
    # top-level OR gives no sound bounds
    assert condition_ranges("id = 5 OR id = 9", ["id"]) == {}
    # OR inside parens within an AND conjunct: the other conjunct still binds
    assert condition_ranges("id <= 7 AND (a = 1 OR b = 2)", ["id"]) == {
        "id": (None, 7)
    }
    # opaque shapes contribute nothing
    assert condition_ranges("id % 2 = 0", ["id"]) == {}


def test_delete_and_update_skip_files_by_stats(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, properties={"statsColumns": "id"}
    )
    # three disjoint-id files: [0..9], [10..19], [20..29]
    for base in (0, 10, 20):
        t.append(
            spark.createDataFrame(
                [(base + i, "g", base + i) for i in range(10)], SCHEMA
            ).coalesce(1)
        )
    assert len(t.files()) == 3
    before = set(t.files())

    t.delete("id = 5")
    hist = {h["version"]: h for h in t.history()}
    assert hist[t.version()]["metrics"]["num_touched_files"] == 1
    # the two non-overlapping files were never rewritten
    assert len(before & set(t.files())) == 2
    assert t.to_df().count() == 29

    t.update({"x": "x + 1000"}, "id >= 20 AND id <= 24")
    hist = {h["version"]: h for h in t.history()}
    assert hist[t.version()]["metrics"]["num_touched_files"] == 1
    assert t.to_df().where("x >= 1000").count() == 5


def test_mismatched_literal_type_keeps_files(spark, tmp_path):
    """A string literal probed against numeric stats must not crash the
    skip — the file is conservatively kept and the row filter decides."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, properties={"statsColumns": "id"}
    )
    t.append(spark.createDataFrame([(1, "a", 1), (2, "a", 2)], SCHEMA).coalesce(1))
    # id is BIGINT; '1' is a string bound -> type-mismatched stats probe
    t.delete("id = '1'")
    assert sorted(r.id for r in t.to_df().collect()) == [2]


def test_parse_update_where_inside_string_literal():
    tbl, assigns, cond = parse_update(
        "UPDATE t SET note = 'no WHERE here', x = 1 WHERE x > 0"
    )
    assert assigns == {"note": "'no WHERE here'", "x": "1"}
    assert cond == "x > 0"
    tbl, assigns, cond = parse_update("UPDATE t SET note = 'WHERE'")
    assert assigns == {"note": "'WHERE'"}
    assert cond is None


def test_strip_alias_preserves_string_literals():
    """Alias stripping must not rewrite text INSIDE string literals:
    ``'see t.example.com'`` once became ``'see example.com'`` because the
    ``t.`` substitution ran over the whole expression (r3 advisor)."""
    tbl, assigns, cond = parse_update(
        "UPDATE t SET note = 'see t.example.com', x = t.x + 1 "
        "WHERE t.grp = 'a.t. literal t.dot'"
    )
    assert assigns["note"] == "'see t.example.com'"
    assert assigns["x"] == "x + 1"
    assert cond == "grp = 'a.t. literal t.dot'"

    # doubled-quote escape inside a literal stays one literal span
    _, assigns2, _ = parse_update(
        "UPDATE t SET note = 'it''s t.co', y = t.y WHERE t.y = 0"
    )
    assert assigns2["note"] == "'it''s t.co'"
    assert assigns2["y"] == "y"

    tbl, cond = parse_delete("DELETE FROM tgt t WHERE t.note = 'by t.me'")
    assert cond == "note = 'by t.me'"


def test_sql_alter_table_constraint_roundtrip(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from incremental_etl_on_lakehouse_spark.lake.sql import (
        execute_alter_constraint,
        parse_alter_constraint,
    )
    from incremental_etl_on_lakehouse_spark.lake.table import (
        ConstraintViolationError,
    )

    assert parse_alter_constraint(
        "ALTER TABLE t ADD CONSTRAINT c CHECK (x > 0 AND (y < 2))"
    ) == ("t", "add", "c", "x > 0 AND (y < 2)")
    assert parse_alter_constraint(
        "alter table t drop constraint if exists c;"
    ) == ("t", "drop", "c", None)

    schema = StructType([StructField("x", LongType())])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema)
    execute_alter_constraint(
        spark, "ALTER TABLE t ADD CONSTRAINT pos CHECK (x > 0)", {"t": t}
    )
    assert t.constraints() == {"pos": "x > 0"}
    import pytest as _pytest

    with _pytest.raises(ConstraintViolationError):
        t.append(spark.createDataFrame([(-1,)], schema))
    execute_alter_constraint(spark, "ALTER TABLE t DROP CONSTRAINT pos", {"t": t})
    # IF EXISTS no-op on missing
    v = t.version()
    assert (
        execute_alter_constraint(
            spark, "ALTER TABLE t DROP CONSTRAINT IF EXISTS pos", {"t": t}
        )
        == v
    )
    t.append(spark.createDataFrame([(-1,)], schema))
    assert t.to_df().count() == 1


def test_sql_alter_table_rename_column(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from incremental_etl_on_lakehouse_spark.lake.sql import (
        execute_alter_rename_column,
        parse_alter_rename_column,
    )

    assert parse_alter_rename_column(
        "ALTER TABLE t RENAME COLUMN a TO b;"
    ) == ("t", "a", "b")
    schema = StructType([StructField("x", LongType())])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema)
    t.append(spark.createDataFrame([(5,)], schema))
    execute_alter_rename_column(
        spark, "ALTER TABLE t RENAME COLUMN x TO y", {"t": t}
    )
    assert [r["y"] for r in t.to_df().collect()] == [5]


def test_sql_utility_statements(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from incremental_etl_on_lakehouse_spark.lake.sql import (
        execute_statement,
        parse_utility,
    )

    assert parse_utility("OPTIMIZE t ZORDER BY (a, b)") == (
        "optimize", "t", {"zorder_by": ["a", "b"], "where": None},
    )
    assert parse_utility("OPTIMIZE t WHERE day = 'd0' ZORDER BY (a)") == (
        "optimize", "t", {"zorder_by": ["a"], "where": "day = 'd0'"},
    )
    assert parse_utility("VACUUM t RETAIN 0 HOURS DRY RUN") == (
        "vacuum", "t", {"retain_hours": 0, "dry_run": True, "lite": False},
    )
    assert parse_utility("VACUUM t LITE RETAIN 0 HOURS") == (
        "vacuum", "t", {"retain_hours": 0, "dry_run": False, "lite": True},
    )
    assert parse_utility("RESTORE TABLE t TO VERSION AS OF 2") == (
        "restore", "t", {"version": 2},
    )
    assert parse_utility("CREATE TABLE c SHALLOW CLONE t") == (
        "clone", "t", {"dest": "c", "shallow": True},
    )
    assert parse_utility("CREATE TABLE c LIKE t") == (
        "create_like", "t", {"dest": "c", "if_not_exists": False},
    )

    schema = StructType([StructField("x", LongType())])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema)
    for i in range(3):
        t.append(spark.createDataFrame([(i,)], schema).coalesce(1))
    v = execute_statement(spark, "OPTIMIZE t", {"t": t})
    assert len(t.files()) == 1 and t.to_df().count() == 3
    execute_statement(spark, "RESTORE TABLE t TO VERSION AS OF 2", {"t": t})
    assert t.to_df().count() == 2
    deleted = execute_statement(spark, "VACUUM t RETAIN 0 HOURS", {"t": t})
    assert isinstance(deleted, list)
    clone = execute_statement(
        spark,
        "CREATE TABLE c SHALLOW CLONE t",
        {"t": t},
        dest_path=str(tmp_path / "c"),
    )
    assert clone.to_df().count() == 2
    # dispatcher routes DML too
    execute_statement(spark, "DELETE FROM t WHERE x = 0", {"t": t})
    assert t.to_df().count() == 1


# ---------------------------------------------------------------------------
# INSERT INTO / INSERT OVERWRITE statements
# ---------------------------------------------------------------------------


def test_insert_statements(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from incremental_etl_on_lakehouse_spark.lake.sql import (
        execute_statement,
        parse_insert,
    )

    assert parse_insert("INSERT INTO t VALUES (1, 'x')") == (
        "t", None, "into", "VALUES (1, 'x')")
    assert parse_insert("INSERT OVERWRITE TABLE t (a, b) SELECT 1, 2") == (
        "t", ["a", "b"], "overwrite", "SELECT 1, 2")

    schema = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("n", LongType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "ins"), schema)
    r = {"t": t}
    execute_statement(spark, "INSERT INTO t VALUES (1, 'a', 10), (2, 'b', 20)", r)
    assert t.to_df().count() == 2
    # column subset: n fills as NULL
    execute_statement(spark, "INSERT INTO t (id, name) VALUES (3, 'c')", r)
    assert {(x.id, x.n) for x in t.to_df().collect()} == {
        (1, 10), (2, 20), (3, None)}
    # SELECT source over a temp view
    spark.createDataFrame([(4, "d", 40)], schema).createOrReplaceTempView("src_v")
    execute_statement(spark, "INSERT INTO t SELECT * FROM src_v", r)
    assert t.to_df().count() == 4
    # OVERWRITE replaces everything in one commit; history preserved
    v = execute_statement(spark, "INSERT OVERWRITE t VALUES (9, 'z', 90)", r)
    assert [(x.id, x.name, x.n) for x in t.to_df().collect()] == [(9, "z", 90)]
    assert t.to_df(version=v - 1).count() == 4

    # errors: wrong arity without a column list; unknown column with one
    import pytest as _pytest
    with _pytest.raises(ValueError, match="all 3 columns"):
        execute_statement(spark, "INSERT INTO t VALUES (1, 'x')", r)
    with _pytest.raises(ValueError, match="unknown columns"):
        execute_statement(spark, "INSERT INTO t (id, bogus) VALUES (1, 2)", r)


# ---------------------------------------------------------------------------
# CREATE TABLE statements (column DDL + CTAS)
# ---------------------------------------------------------------------------


def test_create_table_statement(spark, tmp_path):
    from incremental_etl_on_lakehouse_spark.lake.sql import (
        execute_statement,
        parse_create_table,
    )

    p = parse_create_table(
        "CREATE TABLE IF NOT EXISTS cat.db.t (\n"
        "  id BIGINT NOT NULL,\n"
        "  country STRING,\n"
        "  visit_timestamp TIMESTAMP,\n"
        "  day STRING GENERATED ALWAYS AS (substring(country, 1, 2)),\n"
        "  rid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 5)\n"
        ") PARTITIONED BY (country)\n"
        "TBLPROPERTIES (delta.enableChangeDataFeed = true)"
    )
    assert p["table"] == "cat.db.t" and p["if_not_exists"]
    assert p["columns"][0] == ("id", "BIGINT") and p["not_null"] == ["id"]
    assert p["generated"] == {"day": "substring(country, 1, 2)"}
    assert p["identity"] == {"rid": (10, 5)}
    assert p["partition_by"] == ["country"]
    assert p["properties"] == {"enableChangeDataFeed": "true"}

    # column-DDL create, then exercise the constraint + identity + CDF
    t = execute_statement(
        spark,
        "CREATE TABLE t (id BIGINT NOT NULL, name STRING,"
        " rid BIGINT GENERATED ALWAYS AS IDENTITY)"
        " TBLPROPERTIES (delta.enableChangeDataFeed = true)",
        {},
        dest_path=str(tmp_path / "t1"),
    )
    assert t.cdf_enabled()
    execute_statement(spark, "INSERT INTO t (id, name) VALUES (1, 'a')", {"t": t})
    assert [r.rid for r in t.to_df().collect()] == [1]
    import pytest as _pytest
    from incremental_etl_on_lakehouse_spark.lake.table import (
        ConstraintViolationError,
    )
    with _pytest.raises(ConstraintViolationError):
        execute_statement(
            spark, "INSERT INTO t (id, name) VALUES (NULL, 'b')", {"t": t}
        )

    # CTAS
    spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string"
        ).createOrReplaceTempView("ctas_src")
    t2 = execute_statement(
        spark,
        "CREATE TABLE t2 AS SELECT k, upper(v) AS v FROM ctas_src",
        {},
        dest_path=str(tmp_path / "t2"),
    )
    assert {(r.k, r.v) for r in t2.to_df().collect()} == {(1, "X"), (2, "Y")}
