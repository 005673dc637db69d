"""Round-11 regression tests.

Covers the r10 verdict/advice findings:
- vacuum's eligibility clock vs the in-commit monotonic timestamp clamp
  (the r10 full-suite flake: a 0-ms-retention vacuum right after a delete
  returned [] when commits out-ran the wall clock),
- checkpoint-interval cache invalidation on drop/recreate (a recreated
  table must not inherit the dropped incarnation's cadence),
- DROP DATABASE CASCADE order-independence when an external table is
  registered inside the db directory (registered name sorting before the
  directory basename used to abort the cascade on the orphan guard),
- external data registered in a DIFFERENT database (or a sibling catalog,
  via the Lakehouse peer hook) whose location lies inside a dropped db's
  directory must survive — 'DROP never deletes external data',
- Lakehouse.sql CREATE DATABASE must not silently mint a typo'd catalog,
- the BPE trainer must return its final symbol table MATERIALIZED in the
  cache so bpe_encode's terminal aggregate never replays the multi-round
  window chain.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake import log as lakelog
from incremental_etl_on_lakehouse_spark.lake.catalog import (
    LakeCatalog,
    Lakehouse,
)

SCHEMA = StructType([StructField("id", LongType())])


def _append(spark, t, i):
    t.append(spark.createDataFrame([(i,)], SCHEMA).coalesce(1))


# --------------------------------------------------------------- vacuum clock


def test_vacuum_eligible_under_frozen_clock(spark, tmp_path, monkeypatch):
    """With the wall clock FROZEN, every commit is stamped ahead of
    now_ms() by write_commit's monotonic clamp — the adversarial version
    of the r10 flake (commits landing faster than the clock ticks). A
    0-ms-retention vacuum must still see the delete's tombstones: its
    eligibility clock is max(wall, latest commit ts + 1)."""
    t0 = lakelog.now_ms()
    monkeypatch.setattr(lakelog, "now_ms", lambda: t0)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    for i in range(3):
        _append(spark, t, i)
    t.delete("id = 0")
    victims = t.vacuum(retention_ms=0, dry_run=True, force=True)
    assert victims, "0-retention vacuum must see the delete's tombstone"
    assert t.vacuum(retention_ms=0, force=True)  # and really reclaims
    assert t.to_df().count() == 2  # live snapshot untouched


def test_vacuum_same_millisecond_delete(spark, tmp_path):
    """The non-frozen flavor: even when delete and vacuum land in the
    same wall-clock millisecond, the strict `t < horizon` compare must
    not exclude the tombstone at 0-ms retention (the +1 in the clock)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    for i in range(2):
        _append(spark, t, i)
    t.delete("id = 0")
    assert t.vacuum(retention_ms=0, dry_run=True, force=True)


def test_vacuum_long_retention_still_protects(spark, tmp_path, monkeypatch):
    """The clamp-aware clock must not erode real retention windows."""
    t0 = lakelog.now_ms()
    monkeypatch.setattr(lakelog, "now_ms", lambda: t0)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    for i in range(2):
        _append(spark, t, i)
    t.delete("id = 0")
    assert t.vacuum(retention_ms=7 * 86400000, dry_run=True, force=True) == []


# ------------------------------------------------- ckpt-interval cache


def test_ckpt_interval_cache_invalidated_on_recreate(spark, tmp_path):
    """A table recreated at a dropped table's path must follow ITS OWN
    checkpointInterval from the first commit, not the cached cadence of
    the previous incarnation."""
    path = str(tmp_path / "t")
    t = LakeTable.create(
        spark, path, SCHEMA, properties={"checkpointInterval": "3"}
    )
    for i in range(3):
        _append(spark, t, i)
    _, ckpts = lakelog.list_versions(path)
    assert ckpts == [3]
    LakeTable.drop(path)
    t2 = LakeTable.create(
        spark, path, SCHEMA, properties={"checkpointInterval": "2"}
    )
    for i in range(2):
        _append(spark, t2, i)
    _, ckpts = lakelog.list_versions(path)
    assert ckpts == [2], "recreate inherited the dropped table's cadence"


def test_ckpt_interval_cache_key_normalized(spark, tmp_path):
    """Raw and abspath spellings of the same table share one cache entry
    (invalidate_ckpt_interval pops both)."""
    path = str(tmp_path / "t")
    LakeTable.create(
        spark, path, SCHEMA, properties={"checkpointInterval": "5"}
    )
    assert lakelog._ckpt_cache_key(path) == lakelog._ckpt_cache_key(
        str(tmp_path) + "/./t"
    )
    LakeTable.drop(path)
    assert lakelog._ckpt_cache_key(path) not in lakelog._CKPT_INTERVAL_CACHE


# --------------------------------------------------- catalog external safety


def _mk_external(spark, loc):
    ext = LakeTable.create(spark, loc, SCHEMA)
    ext.append(spark.createDataFrame([(42,)], SCHEMA))
    return ext


@pytest.mark.parametrize("regname", ["aaa", "zzz9"])
def test_drop_database_cascade_order_independent(
    spark, tmp_path, regname
):
    """An external table registered INSIDE the db directory appears in
    tables(db) under both its registered name and its directory basename.
    CASCADE must succeed regardless of which sorts first ('aaa' < 'mid' <
    'zzz9' covers both orders), drop the managed tables, and leave the
    external bytes untouched."""
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    cat.create_database("db")
    loc = str(tmp_path / "cat" / "db" / "mid")
    _mk_external(spark, loc)
    cat.register_table("db", regname, loc)
    managed = cat.create_table("db", "managed1", SCHEMA)
    _append(spark, managed, 1)
    cat.drop_database("db", cascade=True)
    assert LakeTable.exists(loc), "cascade deleted external bytes"
    assert not LakeTable.exists(str(tmp_path / "cat" / "db" / "managed1"))
    assert "db" not in {
        d for d in cat.databases() if cat.tables(d)
    } or cat.tables("db") == ["mid"]  # only the external shell may remain


def test_drop_database_protects_external_in_other_db(spark, tmp_path):
    """External data whose LOCATION lies inside db1 but whose
    REGISTRATION lives in db2 must survive DROP DATABASE db1 CASCADE —
    previously only db1's own registrations were scanned and rmtree took
    the bytes."""
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    cat.create_database("db1")
    loc = str(tmp_path / "cat" / "db1" / "extdata")
    _mk_external(spark, loc)
    cat.register_table("db2", "ext", loc)
    managed = cat.create_table("db1", "managed", SCHEMA)
    _append(spark, managed, 1)
    cat.drop_database("db1", cascade=True)
    assert LakeTable.exists(loc), "cross-db external bytes deleted"
    assert cat.table("db2", "ext").to_df().count() == 1


def test_drop_table_directory_convention_respects_other_db_external(
    spark, tmp_path
):
    """drop_table on the directory-convention name must treat a path
    registered externally by ANOTHER database as an alias, not managed
    data."""
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    cat.create_database("db1")
    loc = str(tmp_path / "cat" / "db1" / "extdata")
    _mk_external(spark, loc)
    cat.register_table("db2", "ext", loc)
    cat.drop_table("db1", "extdata")  # must be a silent no-op
    assert LakeTable.exists(loc)


def test_lakehouse_sibling_catalog_external_protected(spark, tmp_path):
    """The Lakehouse peer hook: external data registered in catalog c2
    living inside c1's db directory survives DROP DATABASE in c1 —
    mirroring the drop_catalog blockers scan."""
    lh = Lakehouse(spark, str(tmp_path / "lh"))
    lh.create_catalog("c1")
    lh.create_catalog("c2")
    lh.catalog("c1").create_database("db")
    loc = str(tmp_path / "lh" / "c1" / "db" / "shared")
    _mk_external(spark, loc)
    lh.catalog("c2").register_table("d2", "ext", loc)
    lh.catalog("c1").drop_database("db", cascade=True)
    assert LakeTable.exists(loc), "sibling-catalog external bytes deleted"
    assert lh.catalog("c2").table("d2", "ext").to_df().count() == 1


def test_lakehouse_create_database_requires_catalog(spark, tmp_path):
    """CREATE DATABASE in a missing catalog errors (Unity Catalog's
    CREATE SCHEMA semantics) instead of silently minting the catalog;
    the built-in default catalog works out of the box."""
    lh = Lakehouse(spark, str(tmp_path / "lh"))
    with pytest.raises(ValueError, match="no such catalog"):
        lh.sql("CREATE DATABASE typo_cat.db1")
    assert "typo_cat" not in lh.catalogs()
    lh.sql("CREATE DATABASE db1")  # default catalog pre-exists
    assert "db1" in lh.catalog("main").databases()


# ------------------------------------------------------------ BPE caching


def test_bpe_final_symbol_table_is_materialized(spark):
    """_bpe_run must hand back the final symbol table CACHED AND
    MATERIALIZED (its parent's cache is released at loop exit, so an
    unmaterialized return would make bpe_encode's aggregate replay the
    whole multi-round window chain)."""
    from incremental_etl_on_lakehouse_spark.operators.text import _bpe_run

    sc = spark.sparkContext
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    words = spark.createDataFrame(
        [("abab", 3), ("ab", 2), ("cd", 1)], "w string, freq long"
    )
    merges, st = _bpe_run(words, 2)
    try:
        assert merges
        assert st.is_cached
        new_cached = [
            i
            for i in sc._jsc.sc().getRDDStorageInfo()
            if i.id() not in before and i.numCachedPartitions() > 0
        ]
        assert new_cached, "final symbol table returned unmaterialized"
    finally:
        st.unpersist(blocking=False)
