"""SQL MERGE INTO front-end: parser units + executing the reference's text.

The centerpiece check runs the reference's CDC MERGE statement
(``notebooks/demo-notebook.py:244-280``) verbatim — modulo table/column
names — through ``execute_merge`` and asserts the table state equals the
independently computed expected snapshot.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.sql import (
    execute_merge,
    parse_merge,
    rewrite_qualify,
    strip_comments,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("country", StringType()),
        StructField("data_hash", StringType()),
        StructField("num_visitors", LongType()),
    ]
)


def test_strip_comments_preserves_strings():
    s = "SELECT '--not a comment' AS x -- real comment\nFROM t"
    out = strip_comments(s)
    assert "'--not a comment'" in out and "real comment" not in out


def test_rewrite_qualify_wraps_owning_select():
    s = (
        "SELECT id, country FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY ts DESC) as rnk "
        "FROM batch QUALIFY rnk = 1)"
    )
    out = rewrite_qualify(s)
    assert "QUALIFY" not in out.upper()
    assert "WHERE rnk = 1" in out


def test_parse_reference_shapes():
    stmt = parse_merge(
        """
        MERGE INTO gold target
        USING ( select country, sum(d) as d from x group by country ) as source
        on source.country = target.country
        -- Update only the modified records based on delta calculated
        WHEN MATCHED
            THEN UPDATE SET target.sum_visitors = target.sum_visitors + source.d
        WHEN NOT MATCHED
            THEN INSERT (country, sum_visitors) values (source.country, source.d)
        """
    )
    assert stmt.target_name == "gold" and stmt.source_is_subquery
    assert stmt.on_condition == "source.country = target.country"
    upd, ins = stmt.clauses
    assert upd.kind == "update" and upd.condition is None
    assert upd.assignments == {"sum_visitors": "target.sum_visitors + source.d"}
    assert ins.kind == "insert"
    assert ins.assignments == {
        "country": "source.country",
        "sum_visitors": "source.d",
    }


def test_parse_rewrites_nonstandard_aliases():
    stmt = parse_merge(
        "MERGE INTO tbl t USING src s ON s.id = t.id "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert stmt.on_condition == "source.id = target.id"
    assert stmt.clauses[0].condition == "source.op = 'D'"
    assert stmt.clauses[1].assignments == "*"


def test_reference_merge_text_verbatim(spark, tmp_path):
    """The reference's exact MERGE statement shape — subquery source with
    QUALIFY dedup, comments, DELETE / hash-guarded UPDATE SET * / INSERT * —
    executes against a lake table with Delta-equivalent results."""
    t = LakeTable.create(spark, str(tmp_path / "silver"), SCHEMA)
    t.append(
        spark.createDataFrame(
            [(1, "England", "h1", 10), (2, "Wales", "h2", 20), (3, "Scotland", "h3", 30)],
            SCHEMA,
        )
    )
    batch = spark.createDataFrame(
        [
            # id 1: two quick-succession updates -> only ts=5 survives dedup
            (1, "England", "h1b", 99, "UPDATE", 4),
            (1, "England", "h1c", 100, "UPDATE", 5),
            # id 2: same hash -> no-op (inter-batch dedup)
            (2, "Wales", "h2", 20, "UPDATE", 5),
            # id 3: delete
            (3, "Scotland", "h3", 30, "DELETE", 5),
            # id 4: new
            (4, "Australia", "h4", 40, "UPDATE", 5),
        ],
        StructType(
            SCHEMA.fields
            + [StructField("cdc_operation", StringType()), StructField("cdc_timestamp", LongType())]
        ),
    )
    batch.createOrReplaceTempView("silver_microbatch")
    metrics = execute_merge(
        spark,
        """
        MERGE INTO silver_table target
        USING
        (
              SELECT id
                  , country
                  , data_hash
                  , num_visitors
                  , cdc_operation
              FROM
              (
                      -- Remove duplicates within a batch (e.g. quick succession UPDATES)
                      SELECT    *
                              , ROW_NUMBER() OVER (PARTITION BY id ORDER BY cdc_timestamp DESC) as rnk
                      FROM silver_microbatch
                      QUALIFY rnk = 1
              )
          ) source
          on source.id = target.id
          WHEN MATCHED
              AND source.cdc_operation = 'DELETE'
              THEN DELETE
          -- Only processes UPDATEs when there is a data change / removes inter-batch duplicates
          WHEN MATCHED
              AND source.cdc_operation = 'UPDATE'
              AND source.data_hash <> target.data_hash
              THEN UPDATE SET *
          WHEN NOT MATCHED
              THEN INSERT *
        """,
        resolve={"silver_table": t},
    )
    assert metrics["num_deleted_rows"] == 1
    assert metrics["num_updated_rows"] == 1  # id 1 only (id 2 is a no-op)
    assert metrics["num_inserted_rows"] == 1
    got = {r["id"]: (r["num_visitors"], r["data_hash"]) for r in t.to_df().collect()}
    assert got == {1: (100, "h1c"), 2: (20, "h2"), 4: (40, "h4")}


def test_aggregate_merge_text(spark, tmp_path):
    """The reference's Gold additive merge (demo-notebook.py:393-425):
    UPDATE SET col = col + delta / INSERT (cols) VALUES (...)."""
    gold_schema = StructType(
        [StructField("country", StringType()), StructField("sum_visitors", LongType())]
    )
    g = LakeTable.create(spark, str(tmp_path / "gold"), gold_schema)
    g.append(spark.createDataFrame([("England", 100)], gold_schema))
    spark.createDataFrame(
        [("England", 15), ("Wales", 7)], "country string, delta_visitors long"
    ).createOrReplaceTempView("gold_deltas")
    execute_merge(
        spark,
        """
        MERGE INTO gold_table target
        USING ( select country, sum(delta_visitors) as delta_visitors
                from gold_deltas group by country ) as source
        on source.country = target.country
        WHEN MATCHED
            THEN UPDATE SET target.sum_visitors = target.sum_visitors + source.delta_visitors
        WHEN NOT MATCHED
            THEN INSERT (country, sum_visitors) values (source.country, source.delta_visitors)
        """,
        resolve=lambda name: {"gold_table": g}[name],
    )
    got = {r["country"]: r["sum_visitors"] for r in g.to_df().collect()}
    assert got == {"England": 115, "Wales": 7}


def test_unsupported_action_raises():
    with pytest.raises(ValueError, match="unsupported MERGE action"):
        parse_merge(
            "MERGE INTO t USING s ON s.id = t.id WHEN MATCHED THEN FROBNICATE"
        )


# ------------------------------------------------ property: parser round-trip


def test_parser_roundtrip_property():
    """Generated MERGE statements over random aliases/conditions/assignment
    orders parse to the canonical clause structure."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    idents = st.text("abcdefgz_", min_size=1, max_size=8).filter(
        lambda s: s.upper() not in {"ON", "AS", "USING", "WHEN", "MERGE", "SET"}
    )

    @settings(max_examples=60, deadline=None)
    @given(
        talias=idents,
        salias=idents,
        n_upd=st.integers(0, 3),
        with_delete=st.booleans(),
        insert_star=st.booleans(),
    )
    def run(talias, salias, n_upd, with_delete, insert_star):
        if talias == salias:
            return
        clauses = []
        if with_delete:
            clauses.append(
                f"WHEN MATCHED AND {salias}.op = 'D' THEN DELETE"
            )
        sets = ", ".join(
            f"{talias}.c{i} = {salias}.c{i} + {i}" for i in range(n_upd)
        )
        if n_upd:
            clauses.append(f"WHEN MATCHED THEN UPDATE SET {sets}")
        if insert_star:
            clauses.append("WHEN NOT MATCHED THEN INSERT *")
        else:
            clauses.append(
                f"WHEN NOT MATCHED THEN INSERT (k, v) VALUES ({salias}.k, {salias}.v)"
            )
        sql = (
            f"MERGE INTO tbl {talias} USING src {salias} "
            f"ON {salias}.k = {talias}.k " + " ".join(clauses)
        )
        stmt = parse_merge(sql)
        assert stmt.on_condition == "source.k = target.k"
        kinds = [c.kind for c in stmt.clauses]
        expected = (["delete"] if with_delete else []) + (
            ["update"] if n_upd else []
        ) + ["insert"]
        assert kinds == expected
        for c in stmt.clauses:
            if c.kind == "update":
                assert c.assignments == {
                    f"c{i}": f"source.c{i} + {i}" for i in range(n_upd)
                }
            if c.kind == "insert" and not insert_star:
                assert c.assignments == {"k": "source.k", "v": "source.v"}

    run()


def test_merge_with_schema_evolution(spark, tmp_path):
    """``MERGE WITH SCHEMA EVOLUTION INTO`` widens the target with source
    columns it lacks: UPDATE/INSERT * assign them, rows in untouched files
    read NULL (schema-on-read, no rewrite), and a plain MERGE of the same
    wide source silently drops the extra column (Delta's default)."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "evo"),
        StructType([StructField("k", LongType()), StructField("v", LongType())]),
    )
    t.append(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    t.append(spark.createDataFrame([(3, 30)], "k long, v long"))
    wide = spark.createDataFrame(
        [(2, 200, "gold"), (9, 900, "new")], "k long, v long, tier string"
    )
    wide.createOrReplaceTempView("wide_src")

    metrics = execute_merge(
        spark,
        "MERGE WITH SCHEMA EVOLUTION INTO tbl t USING wide_src s ON s.k = t.k"
        " WHEN MATCHED THEN UPDATE SET *"
        " WHEN NOT MATCHED THEN INSERT *",
        {"tbl": t},
    )
    assert metrics["num_updated_rows"] == 1 and metrics["num_inserted_rows"] == 1
    assert "tier" in t.schema().fieldNames()
    got = {r["k"]: (r["v"], r["tier"]) for r in t.to_df().collect()}
    assert got == {1: (10, None), 2: (200, "gold"), 3: (30, None), 9: (900, "new")}
    # the untouched file (k=3 alone in its file) was NOT rewritten
    assert metrics["num_touched_files"] == 1

    # plain MERGE (no evolution clause): extra source columns are ignored
    t2 = LakeTable.create(
        spark,
        str(tmp_path / "plain"),
        StructType([StructField("k", LongType()), StructField("v", LongType())]),
    )
    t2.append(spark.createDataFrame([(1, 10)], "k long, v long"))
    execute_merge(
        spark,
        "MERGE INTO tbl t USING wide_src s ON s.k = t.k"
        " WHEN NOT MATCHED THEN INSERT *",
        {"tbl": t2},
    )
    assert "tier" not in t2.schema().fieldNames()
    assert {r["k"] for r in t2.to_df().collect()} == {1, 2, 9}


def test_merge_literal_with_alias_dot_survives(spark, tmp_path):
    """A string literal containing '<alias>.' in an INSERT VALUES list must
    be written byte-for-byte, not rewritten by alias canonicalization."""
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_merge

    schema = StructType(
        [StructField("id", LongType()), StructField("note", StringType())]
    )
    t = LakeTable.create(spark, str(tmp_path / "lit"), schema)
    src = spark.createDataFrame([(1,)], "id long")
    execute_merge(
        spark,
        "MERGE INTO tgt USING src s ON tgt.id = s.id "
        "WHEN NOT MATCHED THEN INSERT (id, note) VALUES (s.id, 's. means source');",
        {"tgt": t},
        source_df=src,
    )
    assert [r["note"] for r in t.to_df().collect()] == ["s. means source"]


def test_create_table_tblproperties_before_partitioned_by(spark, tmp_path):
    """Clause order must not corrupt property values: TBLPROPERTIES
    followed by PARTITIONED BY once swallowed the rest of the statement
    into the property value (lazy regex backtracking)."""
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_statement

    t = execute_statement(
        spark,
        "CREATE TABLE t (a INT, b STRING) USING delta "
        "TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true') "
        "PARTITIONED BY (b);",
        {},
        dest_path=str(tmp_path / "ordered"),
    )
    assert t.cdf_enabled()
    assert t.partition_columns() == ["b"]


def test_create_table_unbalanced_tblproperties_raises_valueerror(spark, tmp_path):
    """Malformed DDL with an unbalanced TBLPROPERTIES '(' must surface as
    ValueError (what callers catch as a parse failure), not a bare
    StopIteration escaping from next()."""
    import pytest

    from incremental_etl_on_lakehouse_spark.lake.sql import parse_create_table

    with pytest.raises(ValueError, match="TBLPROPERTIES"):
        parse_create_table(
            "CREATE TABLE t (a INT) USING delta "
            "TBLPROPERTIES ('k' = 'v'"
        )
