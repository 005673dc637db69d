"""Round-12 review fixes (ADVICE.md, round 11):

1. ``mode_from_state`` numeric tiebreak — negating the value column
   crashed under ANSI mode on LongType MIN_VALUE and let NaN win
   "smallest value" count ties on float/double (NaN survives negation
   and sorts greatest).
2. ``LakeStreamReader._commit_bytes`` — append-mode batches read only
   the added data files, so the CDF sidecar must not count toward the
   byte budget in that mode.
3. VACUUM grammar — the LITE keyword was position-locked
   (``VACUUM t DRY RUN LITE`` silently dropped it) and a table literally
   named LITE shadowed the keyword.
4. ``__extern_orphans__`` growth — markers for deleted data directories
   are pruned at metastore checkpoint time.
"""

import math
import os

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.catalog import (
    META_CHECKPOINT_EVERY,
    LakeCatalog,
)
from incremental_etl_on_lakehouse_spark.lake.sql import parse_utility
from incremental_etl_on_lakehouse_spark.lake.streaming import LakeStreamReader
from incremental_etl_on_lakehouse_spark.operators.cdc import mode_from_state

LONG_MIN = -(2**63)


# ------------------------------------------------------------ mode tiebreak


def _long_state(spark, tmp_path, rows):
    schema = StructType(
        [
            StructField("grp", StringType()),
            StructField("val", LongType()),
            StructField("cnt", LongType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "state"), schema)
    t.append(spark.createDataFrame(rows, schema))
    return t


def test_mode_long_min_value_no_ansi_overflow(spark, tmp_path):
    """LongType MIN_VALUE in the state must not crash the mode read
    (bare negation throws ARITHMETIC_OVERFLOW under ANSI mode) and must
    win a count tie as the smallest value."""
    t = _long_state(
        spark,
        tmp_path,
        [("a", LONG_MIN, 2), ("a", 5, 2), ("a", 7, 1), ("b", 3, 1)],
    )
    got = {
        r["grp"]: r["mode"]
        for r in mode_from_state(t, ["grp"], "val").collect()
    }
    assert got == {"a": LONG_MIN, "b": 3}


def test_mode_double_nan_loses_count_ties(spark, tmp_path):
    """Spark's total order puts NaN above +inf, so on a count tie every
    real value (including +inf) is smaller than NaN and must win; NaN
    still wins outright when its count is strictly larger."""
    schema = StructType(
        [
            StructField("grp", StringType()),
            StructField("val", DoubleType()),
            StructField("cnt", LongType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "dstate"), schema)
    nan, inf = float("nan"), float("inf")
    t.append(
        spark.createDataFrame(
            [
                ("tie", nan, 2),
                ("tie", 3.0, 2),
                ("nanwins", nan, 3),
                ("nanwins", 1.0, 2),
                ("infnan", inf, 2),
                ("infnan", nan, 2),
            ],
            schema,
        )
    )
    got = {
        r["grp"]: r["mode"]
        for r in mode_from_state(t, ["grp"], "val").collect()
    }
    assert got["tie"] == 3.0
    assert math.isnan(got["nanwins"])
    assert got["infnan"] == inf and not math.isnan(got["infnan"])


# ------------------------------------------------ append-mode byte pacing


def test_commit_bytes_excludes_cdf_sidecar_in_append_mode(spark, tmp_path):
    """On a CDF-enabled table the same commit must charge LESS to an
    append-mode reader (data files only) than to a cdf-mode reader
    (data files + sidecar) — charging the sidecar in append mode
    systematically under-fills batches."""
    schema = StructType([StructField("id", LongType())])
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        schema,
        properties={"enableChangeDataFeed": "true"},
    )
    t.append(spark.createDataFrame([(i,) for i in range(8)], schema).coalesce(1))
    # an UPDATE rewrites files AND emits a row-level sidecar — the commit
    # shape where the two modes' byte charges genuinely differ
    t.update({"id": "id + 100"}, "id < 2")
    commit = t._commits()[-1]
    assert commit.cdf_path, "fixture must produce a CDF sidecar"
    assert commit.add, "fixture must also add data files"
    append_bytes = LakeStreamReader(
        t, str(tmp_path / "ck_a.json"), mode="append", starting_version=1
    )._commit_bytes(commit)
    cdf_bytes = LakeStreamReader(
        t, str(tmp_path / "ck_c.json"), mode="cdf", starting_version=1
    )._commit_bytes(commit)
    assert 0 < append_bytes < cdf_bytes
    add_sizes = sum(
        os.path.getsize(t._abs(a["path"])) for a in commit.add
    )
    assert append_bytes == add_sizes


# ------------------------------------------------------------ VACUUM LITE


def test_vacuum_clauses_any_order():
    for sql in (
        "VACUUM t LITE RETAIN 0 HOURS DRY RUN",
        "VACUUM t RETAIN 0 HOURS LITE DRY RUN",
        "VACUUM t DRY RUN RETAIN 0 HOURS LITE",
    ):
        kind, table, opts = parse_utility(sql)
        assert (kind, table) == ("vacuum", "t"), sql
        assert opts == {"retain_hours": 0, "dry_run": True, "lite": True}, sql
    assert parse_utility("VACUUM t DRY RUN LITE")[2] == {
        "retain_hours": None,
        "dry_run": True,
        "lite": True,
    }
    assert parse_utility("VACUUM t") == (
        "vacuum",
        "t",
        {"retain_hours": None, "dry_run": False, "lite": False},
    )


def test_vacuum_bare_lite_identifier_rejected():
    """`VACUUM LITE` is a misplaced keyword, not a table named LITE."""
    with pytest.raises(ValueError, match="backtick"):
        parse_utility("VACUUM LITE")
    with pytest.raises(ValueError, match="backtick"):
        parse_utility("VACUUM lite DRY RUN")
    # a table genuinely named LITE is reachable via backticks
    kind, table, opts = parse_utility("VACUUM `LITE` LITE")
    assert (kind, table, opts["lite"]) == ("vacuum", "LITE", True)


def test_vacuum_unknown_or_duplicate_clause_errors():
    with pytest.raises(ValueError, match="cannot parse clause"):
        parse_utility("VACUUM t LITE LITE")
    with pytest.raises(ValueError, match="cannot parse clause"):
        parse_utility("VACUUM t FROBNICATE")


# ------------------------------------------- extern-orphan marker pruning


SCHEMA2 = StructType(
    [StructField("id", LongType()), StructField("v", StringType())]
)


def test_extern_orphan_markers_pruned_at_checkpoint(spark, tmp_path):
    """A marker whose data directory no longer exists is inert; the
    metastore checkpoint prunes it so drop-heavy workloads don't grow
    __extern_orphans__ (and its per-DROP stat cost) without bound. A
    marker whose data SURVIVES must outlive the same checkpoint."""
    root = str(tmp_path / "cat")
    cat = LakeCatalog(spark, root)
    cat.create_database("db1")
    dead = os.path.join(root, "db1", "dead")
    live = os.path.join(root, "db1", "live")
    for p in (dead, live):
        LakeTable.create(spark, p, SCHEMA2)
        cat.register_table("db1", os.path.basename(p), p)
        cat.drop_table("db1", os.path.basename(p))  # unregister -> marker
    _, state = cat._meta_state()
    assert set(state.get("__extern_orphans__", {})) == {
        os.path.abspath(dead),
        os.path.abspath(live),
    }
    LakeTable.drop(dead)  # the owner removed its data: marker now inert
    # drive the log to the next checkpoint boundary
    while cat._meta_state()[0] % META_CHECKPOINT_EVERY != 0:
        cat.create_database(f"pad{cat._meta_state()[0]}")
    _, state = LakeCatalog(spark, root)._meta_state()  # fresh fold
    assert set(state.get("__extern_orphans__", {})) == {os.path.abspath(live)}
    # the surviving marker still blocks directory-convention deletion
    with pytest.raises(ValueError, match="externally-owned"):
        LakeCatalog(spark, root).drop_table("db1", "live")
