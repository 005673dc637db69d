"""Regression tests for the round-9 review findings (ADVICE round 10):

1. vacuum() after cleanup_log() must never reclaim ACTIVE data files that
   survive only in the pinned boundary checkpoint (the orphan sweep used
   to build its referenced set from surviving commits alone).
2. The same interaction for files tombstoned recently but ADDED long ago:
   their dir mtime is old, but they are time-travel-readable within the
   vacuum retention window.
3. overwrite() / replace_definition() after cleanup_log() must compute the
   removed set from checkpoint-aware state, not a fold over the truncated
   commit list — otherwise pre-boundary files stay active and reads union
   stale rows with the new contents.
4. Catalog metastore put-if-absent collisions re-validate the precondition
   before retrying: two sessions racing create_table/register_table on the
   same name with different paths must NOT silently last-writer-overwrite
   the mapping.
5. drop_database(cascade=True) never deletes an external table's data,
   even when its location lies inside the database directory.
6. Pre-row-tracking checkpoint upgrade derives row-id bases in COMMIT
   order (by replaying available history), so the same untouched file
   reports the same _row_id at different time-travel versions.
"""

from __future__ import annotations

import os
from unittest import mock

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake import log as lakelog

SCHEMA = StructType([StructField("id", LongType())])

EIGHT_DAYS = 8 * 86400_000
SEVEN_DAYS = 7 * 86400_000


def _backdated_table(spark, path, n_appends=4, props=None):
    """A table whose create + n appends are committed '8 days ago' (so
    cleanup_log with 7-day retention truncates them), with the data-dir
    mtimes backdated to match (the orphan sweep is mtime-gated)."""
    real = lakelog.now_ms()
    with mock.patch.object(lakelog, "now_ms", lambda: real - EIGHT_DAYS):
        t = LakeTable.create(spark, path, SCHEMA, properties=props)
        for i in range(n_appends):
            t.append(spark.createDataFrame([(i,)], SCHEMA).coalesce(1))
    old = (real - EIGHT_DAYS) / 1000
    for top in ("data", "_cdf", "_dv"):
        d = os.path.join(path, top)
        if os.path.isdir(d):
            for name in os.listdir(d):
                p = os.path.join(d, name)
                os.utime(p, (old, old))
                for f in os.listdir(p) if os.path.isdir(p) else []:
                    os.utime(os.path.join(p, f), (old, old))
    return t


def test_vacuum_after_cleanup_keeps_checkpoint_only_active(spark, tmp_path):
    """Active files whose add commit was deleted by log retention survive
    only in the boundary checkpoint; vacuum's orphan sweep must not treat
    their uuid dirs as unreferenced."""
    path = str(tmp_path / "t")
    t = _backdated_table(spark, path)
    t.append(spark.createDataFrame([(99,)], SCHEMA))  # fresh head commit
    rows_before = {r.id for r in t.to_df().collect()}
    assert rows_before == {0, 1, 2, 3, 99}

    deleted = t.cleanup_log(retention_ms=SEVEN_DAYS)
    assert deleted, "cleanup_log should truncate the backdated prefix"

    # retention 0 + force: the most aggressive sweep allowed
    t.vacuum(retention_ms=0, force=True)
    t2 = LakeTable(spark, path)
    assert {r.id for r in t2.to_df().collect()} == rows_before


def test_vacuum_after_cleanup_keeps_retained_tombstones(spark, tmp_path):
    """A file added long ago (old dir mtime) but removed RECENTLY is still
    time-travel-readable within the vacuum retention window; the orphan
    sweep must not reclaim its dir just because its add commit is gone
    from the log and its mtime is old."""
    path = str(tmp_path / "t")
    t = _backdated_table(spark, path)
    t.delete("id = 2")  # fresh tombstone for an 8-day-old file
    boundary_v = t.version() - 1
    t.cleanup_log(retention_ms=SEVEN_DAYS)

    t.vacuum(retention_ms=SEVEN_DAYS, force=True)
    t2 = LakeTable(spark, path)
    assert {r.id for r in t2.to_df().collect()} == {0, 1, 3}
    # time travel to the pre-delete boundary version still reads id=2
    assert {r.id for r in t2.to_df(version=boundary_v).collect()} == {
        0,
        1,
        2,
        3,
    }


def test_overwrite_after_cleanup_removes_checkpoint_only_files(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    t = _backdated_table(spark, path)
    t.cleanup_log(retention_ms=SEVEN_DAYS)
    t.overwrite(spark.createDataFrame([(100,)], SCHEMA))
    t2 = LakeTable(spark, path)
    assert {r.id for r in t2.to_df().collect()} == {100}


def test_replace_definition_after_cleanup_drops_old_files(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _backdated_table(spark, path)
    t.cleanup_log(retention_ms=SEVEN_DAYS)
    new_schema = StructType([StructField("name", StringType())])
    t.replace_definition(new_schema)
    t2 = LakeTable(spark, path)
    assert t2.to_df().count() == 0
    assert [f.name for f in t2.schema().fields] == ["name"]


class _RacingStore:
    """Delegates to the real store, but the first put_if_absent of a
    numbered metastore entry is preceded by a competing writer taking the
    same slot with a DIFFERENT table->path mapping."""

    def __init__(self, inner, competing_entry):
        self._inner = inner
        self._competing = competing_entry
        self.fired = False

    def put_if_absent(self, path, text):
        import json

        name = os.path.basename(path)
        if (
            not self.fired
            and name.endswith(".json")
            and name.split(".")[0].isdigit()
            and json.loads(text).get("op") == "put_table"
        ):
            self.fired = True
            self._inner.put_if_absent(
                path, json.dumps(self._competing, sort_keys=True)
            )
        return self._inner.put_if_absent(path, text)

    def __getattr__(self, attr):
        return getattr(self._inner, attr)


def test_catalog_create_race_does_not_overwrite_mapping(spark, tmp_path):
    from incremental_etl_on_lakehouse_spark.lake.catalog import LakeCatalog
    from incremental_etl_on_lakehouse_spark.lake.logstore import (
        LocalLogStore,
        register_store,
    )

    root = str(tmp_path / "cat")
    other_path = str(tmp_path / "elsewhere" / "tbl")
    # the competing writer creates a REAL table at its own path and wins
    # the metastore slot between our state read and our put-if-absent
    LakeTable.create(spark, other_path, SCHEMA)
    competing = {
        "op": "put_table",
        "db": "db1",
        "table": "t",
        "path": other_path,
        "external": True,
    }
    racing = _RacingStore(LocalLogStore(), competing)
    prefix = os.path.abspath(root)
    register_store(prefix, racing)
    try:
        cat = LakeCatalog(spark, root)
        cat.create_database("db1")
        with pytest.raises(ValueError, match="table exists"):
            cat.create_table("db1", "t", SCHEMA)
        assert racing.fired
        # the competitor's mapping survived — no silent overwrite
        assert os.path.abspath(cat.table("db1", "t").path) == os.path.abspath(
            other_path
        )
    finally:
        register_store(prefix, None)


def test_catalog_register_race_same_path_is_idempotent(spark, tmp_path):
    from incremental_etl_on_lakehouse_spark.lake.catalog import LakeCatalog
    from incremental_etl_on_lakehouse_spark.lake.logstore import (
        LocalLogStore,
        register_store,
    )

    root = str(tmp_path / "cat")
    ext_path = str(tmp_path / "ext" / "tbl")
    LakeTable.create(spark, ext_path, SCHEMA)
    competing = {
        "op": "put_table",
        "db": "db1",
        "table": "t",
        "path": os.path.abspath(ext_path),
        "external": True,
    }
    racing = _RacingStore(LocalLogStore(), competing)
    prefix = os.path.abspath(root)
    register_store(prefix, racing)
    try:
        cat = LakeCatalog(spark, root)
        # same-path race: both writers register the identical mapping —
        # success, one entry, no conflict error
        t = cat.register_table("db1", "t", ext_path)
        assert racing.fired
        assert os.path.abspath(t.path) == os.path.abspath(ext_path)
        _, state = cat._meta_state()
        assert state["db1"]["t"]["path"] == os.path.abspath(ext_path)
    finally:
        register_store(prefix, None)


def test_drop_database_cascade_spares_external_data_inside_db_dir(
    spark, tmp_path
):
    from incremental_etl_on_lakehouse_spark.lake.catalog import LakeCatalog

    root = str(tmp_path / "cat")
    cat = LakeCatalog(spark, root)
    cat.create_database("db1")
    # external table whose location happens to live INSIDE the db dir
    ext_path = os.path.join(root, "db1", "adopted")
    LakeTable.create(spark, ext_path, SCHEMA)
    LakeTable(spark, ext_path).append(spark.createDataFrame([(7,)], SCHEMA))
    cat.register_table("db1", "ext", ext_path)
    # plus a managed table, which cascade SHOULD delete
    cat.create_table("db1", "managed", SCHEMA)

    cat.drop_database("db1", cascade=True)
    assert "db1" not in dict.fromkeys(
        cat._meta_state()[1]
    ), "db unregistered"
    assert LakeTable.exists(ext_path), "external data must survive cascade"
    assert {r.id for r in LakeTable(spark, ext_path).to_df().collect()} == {7}
    assert not os.path.isdir(os.path.join(root, "db1", "managed"))


def test_pre_row_tracking_checkpoint_upgrade_commit_order_bases(
    spark, tmp_path
):
    """Bases assigned when upgrading a pre-row-tracking checkpoint must
    match a from-zero commit replay, so _row_id for an untouched file is
    identical whether the fold starts at the checkpoint or below it."""
    path = str(tmp_path / "t")
    t = LakeTable.create(spark, path, SCHEMA)
    # append files whose COMMIT order differs from their path sort order
    # is not controllable directly, but 25 single-file commits make a
    # path-sorted assignment overwhelmingly unlikely to coincide
    for i in range(25):
        t.append(spark.createDataFrame([(i,)], SCHEMA).coalesce(1))
    # simulate a pre-row-tracking checkpoint: strip base/row_hwm from the
    # checkpoint the interval writer produced at v20
    import json

    ckpt = os.path.join(path, "_lake_log", f"{20:020d}.checkpoint.json")
    assert os.path.isfile(ckpt)
    state = json.loads(open(ckpt).read())
    state.pop("row_hwm", None)
    for a in state["active"].values():
        a.pop("base", None)
    open(ckpt, "w").write(json.dumps(state))

    t.set_properties({"enableRowTracking": "true"})
    t2 = LakeTable(spark, path)
    # latest read folds from the (upgraded) checkpoint; time travel to a
    # version below v20 folds from zero — ids must agree per key
    latest = {r.id: r._row_id for r in t2.to_df(with_row_ids=True).collect()}
    below = {
        r.id: r._row_id
        for r in t2.to_df(version=19, with_row_ids=True).collect()
    }
    for k, rid in below.items():
        assert latest[k] == rid, (k, rid, latest[k])


def test_property_driven_retention_and_checkpoint_interval(spark, tmp_path):
    """Delta-parity properties: deletedFileRetentionDuration /
    logRetentionDuration drive vacuum/cleanup_log defaults (plain ms or
    'interval N days'); checkpointInterval drives checkpoint cadence."""
    from incremental_etl_on_lakehouse_spark.lake import log as lakelog2

    path = str(tmp_path / "t")
    t = LakeTable.create(
        spark, path, SCHEMA, properties={"checkpointInterval": "3"}
    )
    for i in range(7):
        t.append(spark.createDataFrame([(i,)], SCHEMA).coalesce(1))
    _, ckpts = lakelog2.list_versions(path)
    assert ckpts == [3, 6], ckpts

    # interval parser: both spellings
    assert LakeTable._parse_interval_ms("86400000") == 86400000
    assert LakeTable._parse_interval_ms("interval 2 days") == 2 * 86400000
    assert LakeTable._parse_interval_ms("interval 1 hour") == 3600000
    with pytest.raises(ValueError, match="unparseable"):
        LakeTable._parse_interval_ms("fortnight")

    # property-driven vacuum retention: 0 ms => tombstoned files eligible
    # immediately (force lifts the orphan-safety floor only)
    t.set_properties({"deletedFileRetentionDuration": "0"})
    t.delete("id = 0")
    victims = t.vacuum(dry_run=True, force=True)
    assert victims, "0-retention property must make the tombstone eligible"
    # and a long retention protects it
    t.set_properties({"deletedFileRetentionDuration": "interval 7 days"})
    assert t.vacuum(dry_run=True, force=True) == []

    # property-driven log retention: 0 => prefix cleanup up to the head
    t.set_properties({"logRetentionDuration": "0"})
    deleted = t.cleanup_log()
    assert deleted and max(deleted) == t.version() - 1


def test_sql_generate_manifest(spark, tmp_path):
    """Delta's GENERATE symlink_format_manifest FOR TABLE t through the
    SQL front door: the manifest lists exactly the live snapshot's files."""
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_statement

    path = str(tmp_path / "t")
    t = LakeTable.create(spark, path, SCHEMA)
    t.append(spark.createDataFrame([(1,), (2,)], SCHEMA))
    out = execute_statement(
        spark,
        "GENERATE symlink_format_manifest FOR TABLE tbl",
        lambda name: t,
    )
    paths = [line.strip() for line in open(out) if line.strip()]
    assert sorted(paths) == sorted(t.files())


def test_malformed_checkpoint_interval_degrades_gracefully(spark, tmp_path):
    """A malformed checkpointInterval property must never brick writers:
    the value is evaluated AFTER the commit is durable, so parsing
    degrades to the default cadence instead of raising post-commit."""
    path = str(tmp_path / "t")
    t = LakeTable.create(spark, path, SCHEMA)
    t.set_properties({"checkpointInterval": "interval 1 day"})  # wrong kind
    for i in range(3):  # writes must keep working
        t.append(spark.createDataFrame([(i,)], SCHEMA))
    assert t.to_df().count() == 3
    # and a fresh-process-style resolve (cache seeded from state) also
    # survives the bad value
    from incremental_etl_on_lakehouse_spark.lake import log as lakelog2

    lakelog2.invalidate_ckpt_interval(path)
    t.append(spark.createDataFrame([(99,)], SCHEMA))
    assert t.to_df().count() == 4
