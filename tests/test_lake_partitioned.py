"""Partitioned lake tables + compaction: layout, pruning, CDF invisibility."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark import plans
from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.table import MergeClause

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("day", StringType()),
        StructField("v", LongType()),
    ]
)


def test_partitioned_roundtrip_and_pruning(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "p"), SCHEMA, partition_by=["day"]
    )
    rows = [(i, f"2024-01-{(i % 3) + 1:02d}", i * 10) for i in range(30)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    df = t.to_df()
    assert df.count() == 30
    assert set(df.columns) == {"id", "day", "v"}
    got = {(r["id"], r["day"], r["v"]) for r in df.collect()}
    assert got == set(rows)
    # data files live under day=... hive dirs
    assert any("day=2024-01-01" in f for f in t.files())
    # partition filter prunes the scan to one directory's files
    one_day = df.where(F.col("day") == "2024-01-01")
    scan_plan = plans.formatted_plan(one_day)
    assert one_day.count() == 10
    assert "PartitionFilters" in scan_plan


def test_partitioned_merge(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "pm"), SCHEMA, partition_by=["day"]
    )
    t.append(
        spark.createDataFrame(
            [(1, "2024-01-01", 1), (2, "2024-01-02", 2)], SCHEMA
        )
    )
    src = spark.createDataFrame([(1, "2024-01-01", 99), (3, "2024-01-03", 3)], SCHEMA)
    m = t.merge(
        src,
        "source.id = target.id",
        [MergeClause("update", None, "*"), MergeClause("insert", None, "*")],
    )
    assert m["num_updated_rows"] == 1 and m["num_inserted_rows"] == 1
    got = {r["id"]: (r["day"], r["v"]) for r in t.to_df().collect()}
    assert got == {1: ("2024-01-01", 99), 2: ("2024-01-02", 2), 3: ("2024-01-03", 3)}
    # only the day=2024-01-01 file was touched
    assert m["num_touched_files"] == 1


def test_compaction_is_cdf_invisible(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "c"),
        SCHEMA,
        properties={"enableChangeDataFeed": "true"},
    )
    for i in range(4):
        t.append(spark.createDataFrame([(i, "d", i)], SCHEMA))
    assert len(t.files()) >= 4
    changes_before = t.read_changes(starting_version=1).count()
    v = t.compact()
    assert len(t.files()) == 1
    assert t.to_df().count() == 4
    # no new change rows, streams see nothing new
    assert t.read_changes(starting_version=1).count() == changes_before
    assert t.read_changes(starting_version=v).count() == 0
    # time travel still sees the pre-compaction snapshot
    assert t.to_df(version=v - 1).count() == 4


def test_stats_data_skipping(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "s"),
        SCHEMA,
        properties={"statsColumns": "id"},
    )
    # three appends with disjoint id ranges -> three files with known stats
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, "d", i) for i in range(10)], SCHEMA
            ).coalesce(1)
        )
    assert len(t.files()) == 3
    # range query skips non-overlapping files
    assert len(t.files_matching({"id": (100, 105)})) == 1
    assert len(t.files_matching({"id": (0, 300)})) == 3
    assert len(t.files_matching({"id": (500, 600)})) == 0

    # merge with stats pruning touches only the overlapping file
    src = spark.createDataFrame([(101, "d", 999)], SCHEMA)
    m = t.merge(
        src,
        "source.id = target.id",
        [MergeClause("update", None, "*"), MergeClause("insert", None, "*")],
        stats_prune={"id": "id"},
    )
    assert m["num_updated_rows"] == 1
    assert m["num_touched_files"] == 1
    got = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert got[101] == 999 and len(got) == 30
    # stats recorded for rewritten files too
    assert len(t.files_matching({"id": (200, 300)})) >= 1


def test_clustered_compaction_tightens_stats(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "z"),
        SCHEMA,
        properties={"statsColumns": "id"},
    )
    # interleaved appends: every file spans nearly the whole id range
    for start in range(3):
        t.append(
            spark.createDataFrame(
                [(i, "d", i) for i in range(start, 300, 3)], SCHEMA
            ).coalesce(1)
        )
    assert len(t.files_matching({"id": (10, 20)})) == 3  # no skipping possible
    t.compact(target_file_rows=100, cluster_by=["id"])
    assert len(t.files()) == 3
    assert t.to_df().count() == 300
    # disjoint ranges after clustering: narrow range hits exactly one file
    assert len(t.files_matching({"id": (10, 20)})) == 1


XY_SCHEMA = StructType(
    [
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("v", LongType()),
    ]
)


def _xy_table(spark, path, stats="x,y"):
    """16x16 grid written as interleaved appends: every file spans the full
    x AND y ranges, so no pruning is possible before clustering."""
    t = LakeTable.create(
        spark, str(path), XY_SCHEMA, properties={"statsColumns": stats}
    )
    rows = [(i % 16, i // 16, i) for i in range(256)]
    for start in range(4):
        t.append(spark.createDataFrame(rows[start::4], XY_SCHEMA).coalesce(1))
    return t


def test_zorder_compaction_prunes_every_dimension(spark, tmp_path):
    t = _xy_table(spark, tmp_path / "z2d")
    assert len(t.files_matching({"x": (3, 4)})) == 4  # nothing skippable
    assert len(t.files_matching({"y": (3, 4)})) == 4
    before = {(r["x"], r["y"], r["v"]) for r in t.to_df().collect()}

    t.compact(target_file_rows=16, zorder_by=["x", "y"])

    # purely physical: same logical table
    assert {(r["x"], r["y"], r["v"]) for r in t.to_df().collect()} == before
    n = len(t.files())
    assert n >= 8
    # a narrow slice in EITHER dimension now skips most files — the property
    # lexicographic sort can't give for the second column
    assert len(t.files_matching({"x": (3, 4)})) <= n // 2
    assert len(t.files_matching({"y": (3, 4)})) <= n // 2
    # point cell: a handful of files at most
    assert len(t.files_matching({"x": (5, 5), "y": (5, 5)})) <= max(1, n // 4)


def test_lexicographic_cluster_cannot_prune_second_column(spark, tmp_path):
    t = _xy_table(spark, tmp_path / "lex")
    t.compact(target_file_rows=16, cluster_by=["x", "y"])
    n = len(t.files())
    assert n >= 8
    assert len(t.files_matching({"x": (3, 4)})) <= n // 2  # first col prunes
    # second column spans ~the full range in every file: no skipping
    assert len(t.files_matching({"y": (3, 4)})) == n


def test_zorder_handles_strings_and_nulls(spark, tmp_path):
    schema = StructType(
        [StructField("s", StringType()), StructField("k", LongType())]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "zs"), schema, properties={"statsColumns": "s,k"}
    )
    rows = [(None if i % 50 == 0 else f"w{i % 40:03d}", i % 20) for i in range(200)]
    t.append(spark.createDataFrame(rows, schema))
    before = sorted(((r["s"] or ""), r["k"]) for r in t.to_df().collect())
    t.compact(target_file_rows=25, zorder_by=["s", "k"])
    assert sorted(((r["s"] or ""), r["k"]) for r in t.to_df().collect()) == before
    n = len(t.files())
    assert n >= 4
    # string ranges prune too (sampled split points are type-agnostic)
    assert len(t.files_matching({"s": ("w010", "w015")})) < n


def test_describe_detail_partitioned(spark, tmp_path):
    """DESCRIBE DETAIL reports partition columns and live file count on a
    partitioned table; SHOW TBLPROPERTIES round-trips via the front door."""
    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_statement
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    t = LakeTable.create(
        spark,
        str(tmp_path / "pd"),
        StructType(
            [StructField("id", LongType()), StructField("grp", StringType())]
        ),
        partition_by=["grp"],
    )
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a")], "id long, grp string"
        )
    )
    d = execute_statement(spark, "DESCRIBE DETAIL pd", {"pd": t})
    assert d["partitionColumns"] == ["grp"]
    assert d["numFiles"] == len(t.files()) and d["numFiles"] >= 2
    assert d["version"] == 1 and d["format"] == "lake-parquet"
    assert execute_statement(spark, "SHOW TBLPROPERTIES pd", {"pd": t}) == t.properties()


def test_optimize_where_compacts_only_matching_partition(spark, tmp_path):
    """OPTIMIZE ... WHERE <partition predicate>: only files in matching
    hive partitions are rewritten — the scheduled per-partition
    maintenance shape; other partitions' files are untouched."""
    t = LakeTable.create(
        spark, str(tmp_path / "p"), SCHEMA, partition_by=["day"]
    )
    # 3 appends x 2 partitions -> 3 small files per partition
    for batch in range(3):
        rows = [(batch * 10 + i, f"d{i % 2}", i) for i in range(6)]
        t.append(spark.createDataFrame(rows, SCHEMA))
    before = t.files()
    d0_before = [f for f in before if "day=d0" in f]
    d1_before = [f for f in before if "day=d1" in f]
    assert len(d0_before) >= 3 and len(d1_before) >= 3
    t.compact(where="day = 'd0'")
    after = t.files()
    d0_after = [f for f in after if "day=d0" in f]
    d1_after = [f for f in after if "day=d1" in f]
    assert len(d0_after) == 1  # compacted
    assert sorted(d1_after) == sorted(d1_before)  # untouched, same files
    assert t.to_df().count() == 18  # no rows lost
    # SQL spelling, with ZORDER alongside WHERE
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_statement

    execute_statement(spark, "OPTIMIZE p WHERE day = 'd1' ZORDER BY (id)", {"p": t})
    d1_final = [f for f in t.files() if "day=d1" in f]
    assert len(d1_final) == 1
    assert t.to_df().count() == 18


def test_optimize_where_on_unpartitioned_rejected(spark, tmp_path):
    import pytest

    t = LakeTable.create(spark, str(tmp_path / "u"), SCHEMA)
    t.append(spark.createDataFrame([(1, "d0", 1)], SCHEMA))
    with pytest.raises(ValueError, match="partitioned"):
        t.compact(where="day = 'd0'")


def test_execute_script_multi_statement(spark, tmp_path):
    """A migrated notebook cell: several statements, one call."""
    from incremental_etl_on_lakehouse_spark.lake.sql import (
        execute_script,
        split_statements,
    )

    # splitter: quoted/parenthesized semicolons don't split
    parts = split_statements(
        "INSERT INTO t VALUES (1, 'a;b'); -- c;d\nDELETE FROM t WHERE id = 9;"
    )
    assert len(parts) == 2 and "a;b" in parts[0]

    t = LakeTable.create(spark, str(tmp_path / "s"), SCHEMA)
    results = execute_script(
        spark,
        """
        INSERT INTO s VALUES (1, 'd0', 10), (2, 'd1', 20);
        UPDATE s SET v = 99 WHERE id = 1;
        DELETE FROM s WHERE id = 2;
        """,
        {"s": t},
    )
    assert len(results) == 3
    assert {(r.id, r.v) for r in t.to_df().collect()} == {(1, 99)}
