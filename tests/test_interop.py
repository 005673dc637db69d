"""External-reader interop: the symlink-manifest export must make a lake
table's live snapshot readable by an engine that only understands parquet.

The custom commit-log format is the one deliberate divergence from the
reference's Delta storage contract (delta-spark is not installed here);
``generate_manifest`` is the documented escape hatch, so this test IS the
contract: DuckDB reads a merged + deleted + vacuumed + compacted table's
snapshot byte-for-byte equal to the engine's own read.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.table import MergeClause

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("grp", StringType()),
        StructField("val", LongType()),
    ]
)

def duck_rows(manifest: str):
    with open(manifest) as f:
        paths = [line.strip() for line in f if line.strip()]
    con = duckdb.connect()
    try:
        return sorted(
            map(
                str,
                con.execute(
                    "SELECT * FROM read_parquet(?, union_by_name=true)", [paths]
                ).fetchall(),
            )
        )
    finally:
        con.close()


def spark_rows(df):
    return sorted(str(tuple(r)) for r in df.collect())


def test_manifest_snapshot_after_merge_vacuum_compact(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(
        spark.createDataFrame(
            [(i, "ab"[i % 2], i * 10) for i in range(100)], SCHEMA
        )
    )
    # merge: update half, insert a few, delete one slice
    src = spark.createDataFrame(
        [(i, "ab"[i % 2], i * 1000) for i in range(0, 100, 2)]
        + [(i, "c", i) for i in range(100, 110)],
        SCHEMA,
    )
    t.merge(
        src,
        "source.id = target.id",
        [
            MergeClause("update", None, "*"),
            MergeClause("insert", None, "*"),
        ],
    )
    t.delete("id >= 90 AND id < 100")
    t.vacuum(retention_ms=0)
    t.compact(target_file_rows=32)

    manifest = t.generate_manifest()
    assert duck_rows(manifest) == spark_rows(t.to_df())


def test_manifest_after_schema_evolution_reads_null(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(spark.createDataFrame([(1, "a", 10)], SCHEMA))
    widened = StructType(SCHEMA.fields + [StructField("extra", StringType())])
    t.append(
        spark.createDataFrame([(2, "b", 20, "x")], widened), merge_schema=True
    )
    manifest = t.generate_manifest()
    # files written pre-evolution lack the column; union_by_name -> NULL
    assert duck_rows(manifest) == spark_rows(t.to_df())


def test_manifest_is_point_in_time(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(spark.createDataFrame([(1, "a", 10)], SCHEMA))
    manifest = t.generate_manifest()
    before = duck_rows(manifest)
    t.append(spark.createDataFrame([(2, "b", 20)], SCHEMA))
    # stale until regenerated — Delta's manifest contract
    assert duck_rows(manifest) == before
    t.generate_manifest()
    assert duck_rows(manifest) == spark_rows(t.to_df())


def test_manifest_after_dv_lifecycle(spark, tmp_path):
    """Deletion vectors block the manifest (external readers can't subtract
    rows); after compaction materializes them, DuckDB reads the exact
    post-delete snapshot."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "dvio"),
        SCHEMA,
        properties={"enableDeletionVectors": "true"},
    )
    t.append(
        spark.createDataFrame(
            [(i, "g", i * 10) for i in range(10)], SCHEMA
        )
    )
    t.delete("id % 3 = 0")
    with pytest.raises(ValueError, match="deletion vectors"):
        t.generate_manifest()
    t.compact()
    manifest = t.generate_manifest()
    duck = duck_rows(manifest)
    ours = spark_rows(t.to_df())
    assert duck == ours and len(duck) == 6
