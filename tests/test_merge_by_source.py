"""WHEN NOT MATCHED BY SOURCE — the target-sided MERGE clause family.

Delta's full-sync grammar: target rows with no source match can be DELETEd
or UPDATEd (target-only condition/assignments). The engine plans them with
one target-sided anti join (the batch-scale source broadcasts), extends the
touched-file set with the firing rows' files, and emits their CDF images
from that probe. Stats pruning is disabled for these merges — rows in
pruned files can't match, which makes them by-source candidates by
definition.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.sql import execute_merge, parse_merge
from incremental_etl_on_lakehouse_spark.lake.table import MergeClause

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("val", StringType()),
        StructField("active", BooleanType()),
    ]
)


def _mk(spark, tmp_path, rows, cdf=False):
    props = {"enableChangeDataFeed": "true"} if cdf else None
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, properties=props)
    t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def _state(t):
    return {r["id"]: (r["val"], r["active"]) for r in t.to_df().collect()}


def _src(spark, rows):
    return spark.createDataFrame(
        rows, "id bigint, val string"
    )


def test_full_sync_mirror(spark, tmp_path):
    """update matched, insert new, delete target rows absent from source."""
    t = _mk(
        spark,
        tmp_path,
        [(1, "a", True), (2, "b", True), (3, "c", True)],
    )
    m = t.merge(
        _src(spark, [(2, "B"), (4, "D")]),
        "source.id = target.id",
        [
            MergeClause("update", None, {"val": "source.val"}),
            MergeClause("insert", None, {"id": "source.id", "val": "source.val", "active": "true"}),
            MergeClause("delete_by_source", None),
        ],
    )
    assert _state(t) == {2: ("B", True), 4: ("D", True)}
    assert m["num_deleted_rows"] == 2  # ids 1 and 3, by source
    assert m["num_updated_rows"] == 1
    assert m["num_inserted_rows"] == 1


def test_by_source_update_with_condition(spark, tmp_path):
    """conditional by-source UPDATE: only active unmatched rows get flagged."""
    t = _mk(
        spark,
        tmp_path,
        [(1, "a", True), (2, "b", False), (3, "c", True)],
    )
    t.merge(
        _src(spark, [(3, "C")]),
        "source.id = target.id",
        [
            MergeClause("update", None, {"val": "source.val"}),
            MergeClause(
                "update_by_source",
                "target.active = true",
                {"active": "false"},
            ),
        ],
    )
    # id 1: unmatched + active -> deactivated; id 2: unmatched, inactive ->
    # condition false, kept as-is; id 3: matched update
    assert _state(t) == {1: ("a", False), 2: ("b", False), 3: ("C", True)}


def test_by_source_clause_order_first_wins(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", True), (2, "b", False)])
    t.merge(
        _src(spark, []),
        "source.id = target.id",
        [
            MergeClause("delete_by_source", "target.active = true"),
            MergeClause("update_by_source", None, {"val": "'stale'"}),
        ],
    )
    assert _state(t) == {2: ("stale", False)}


def test_by_source_cdf_images(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", True), (2, "b", True)], cdf=True)
    v0 = t.version()
    t.merge(
        _src(spark, [(2, "B")]),
        "source.id = target.id",
        [
            MergeClause("update", None, {"val": "source.val"}),
            MergeClause("delete_by_source", None),
        ],
    )
    ch = {
        (r["id"], r["_change_type"]): r["val"]
        for r in t.read_changes(starting_version=v0 + 1).collect()
    }
    assert ch[(1, "delete")] == "a"
    assert ch[(2, "update_preimage")] == "b"
    assert ch[(2, "update_postimage")] == "B"


def test_by_source_ignores_stats_prune(spark, tmp_path):
    """key-range pruning must not hide by-source candidates."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    # two separate files with disjoint key ranges
    t.append(spark.createDataFrame([(1, "a", True), (2, "b", True)], SCHEMA))
    t.append(spark.createDataFrame([(100, "x", True), (101, "y", True)], SCHEMA))
    t.merge(
        _src(spark, [(1, "A")]),
        "source.id = target.id",
        [
            MergeClause("update", None, {"val": "source.val"}),
            MergeClause("delete_by_source", None),
        ],
        stats_prune={"id": "id"},
    )
    # the 100s file is outside the batch key range; its rows are unmatched
    # and must still be deleted
    assert _state(t) == {1: ("A", True)}


def test_empty_source_deletes_everything_firing(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", True), (2, "b", True)])
    m = t.merge(
        _src(spark, []),
        "source.id = target.id",
        [MergeClause("delete_by_source", None)],
    )
    assert _state(t) == {}
    assert m["num_deleted_rows"] == 2


def test_update_by_source_star_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", True)])
    with pytest.raises(ValueError, match="explicit"):
        t.merge(
            _src(spark, []),
            "source.id = target.id",
            [MergeClause("update_by_source", None, "*")],
        )


# ---------------------------------------------------------------- SQL grammar


def test_parse_by_source_clauses():
    stmt = parse_merge(
        """
        MERGE INTO t USING s ON s.id = t.id
        WHEN MATCHED THEN UPDATE SET val = s.val
        WHEN NOT MATCHED BY TARGET THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.active = true THEN UPDATE SET active = false
        WHEN NOT MATCHED BY SOURCE THEN DELETE
        """
    )
    kinds = [c.kind for c in stmt.clauses]
    assert kinds == ["update", "insert", "update_by_source", "delete_by_source"]
    upd = stmt.clauses[2]
    assert upd.condition == "target.active = true"
    assert upd.assignments == {"active": "false"}


def test_parse_matched_by_source_rejected():
    with pytest.raises(ValueError, match="not valid MERGE grammar"):
        parse_merge(
            "MERGE INTO t USING s ON s.id = t.id "
            "WHEN MATCHED BY SOURCE THEN DELETE"
        )


def test_parse_by_source_insert_rejected():
    with pytest.raises(ValueError, match="unsupported NOT MATCHED BY SOURCE"):
        parse_merge(
            "MERGE INTO t USING s ON s.id = t.id "
            "WHEN NOT MATCHED BY SOURCE THEN INSERT *"
        )


def test_execute_full_sync_sql(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", True), (2, "b", True), (3, "c", True)])
    spark.createDataFrame([(2, "B"), (4, "D")], "id bigint, val string") \
        .createOrReplaceTempView("sync_src")
    execute_merge(
        spark,
        """
        MERGE INTO t USING sync_src s ON s.id = t.id
        WHEN MATCHED THEN UPDATE SET val = s.val
        WHEN NOT MATCHED THEN INSERT (id, val, active) VALUES (s.id, s.val, true)
        WHEN NOT MATCHED BY SOURCE THEN DELETE
        """,
        {"t": t},
    )
    assert _state(t) == {2: ("B", True), 4: ("D", True)}


# ------------------------------------------------------- property-based model

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_IDS = st.integers(min_value=0, max_value=9)
_TGT = st.dictionaries(_IDS, st.integers(0, 99), max_size=8)
_SRC = st.dictionaries(_IDS, st.integers(0, 99), max_size=8)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(tgt=_TGT, src=_SRC)
def test_full_sync_matches_python_model(spark, tmp_path, tgt, src):
    """full-sync merge == the source dict with by-source deletes, for any
    random target/source pair (including empty sides)."""
    import uuid as _uuid

    t = LakeTable.create(
        spark,
        str(tmp_path / f"t{_uuid.uuid4().hex[:8]}"),
        StructType(
            [StructField("id", LongType()), StructField("n", LongType())]
        ),
    )
    if tgt:
        t.append(
            spark.createDataFrame(sorted(tgt.items()), "id bigint, n bigint")
        )
    src_df = spark.createDataFrame(
        sorted(src.items()) or [], "id bigint, n bigint"
    ) if src else spark.createDataFrame([], "id bigint, n bigint")
    m = t.merge(
        src_df,
        "source.id = target.id",
        [
            MergeClause("update", None, {"n": "source.n"}),
            MergeClause("insert", None, "*"),
            MergeClause("delete_by_source", None),
        ],
    )
    got = {r["id"]: r["n"] for r in t.to_df().collect()}
    assert got == src
    assert m["num_deleted_rows"] == len(set(tgt) - set(src))
    assert m["num_updated_rows"] == len(set(tgt) & set(src))
    assert m["num_inserted_rows"] == len(set(src) - set(tgt))


def test_by_source_large_source_not_force_broadcast(spark, tmp_path):
    """The probe's broadcast hint must gate on the (exactly known) source
    row count — a table-scale full-snapshot sync source stays unhinted so
    AQE sizes the anti join instead of an unconditional broadcast."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        StructType([StructField("id", LongType()), StructField("n", LongType())]),
    )
    t.append(spark.createDataFrame([(i, i) for i in range(10)], "id bigint, n bigint"))
    big_src = spark.range(0, 2_000_000).selectExpr("id", "id AS n")
    m = t.merge(
        big_src,
        "source.id = target.id",
        [
            MergeClause("update", None, {"n": "source.n"}),
            MergeClause("delete_by_source", None),
        ],
    )
    # all 10 target rows match (ids 0-9 are in the snapshot), none deleted
    assert m["num_updated_rows"] == 10 and m["num_deleted_rows"] == 0


def test_by_source_unqualified_refs_auto_qualified(spark, tmp_path):
    """BY SOURCE conditions/assignments reference target columns only by
    contract, so unqualified names are auto-qualified to target. —
    previously an unqualified column resolved fine in the target-only
    planning probe but hit AMBIGUOUS_REFERENCE in the two-sided rewrite
    join, i.e. only when a by-source row landed in a touched file."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from incremental_etl_on_lakehouse_spark.lake.table import MergeClause

    schema = StructType(
        [StructField("id", LongType()), StructField("v", StringType())]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema)
    t.append(spark.createDataFrame([(i, "x") for i in range(6)], schema))
    src = spark.createDataFrame([(0, "U"), (9, "N")], schema)
    t.merge(
        src,
        "source.id = target.id",
        [
            MergeClause("update", None, "*"),
            MergeClause("insert", None, "*"),
            # both the condition AND the assignment use unqualified names
            MergeClause("update_by_source", "id % 2 = 1", {"v": "concat(v, '!')"}),
            MergeClause("delete_by_source", "id = 4"),
        ],
    )
    vals = {r.id: r.v for r in t.to_df().collect()}
    assert vals == {0: "U", 1: "x!", 2: "x", 3: "x!", 5: "x!", 9: "N"}, vals
