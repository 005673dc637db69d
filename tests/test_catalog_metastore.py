"""Persistent metastore: the catalog's name->path mapping survives
instances (stand-in for sessions), supports external tables, resolves
through the SQL front door, and keeps OCC under concurrent writers.

Reference parity: Unity Catalog's persistent 3-level namespace
(``notebooks/demo-notebook.py:80-110``) with S3-resident table locations
(``setup/incremental-etl-helper.py:6-19``).
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.catalog import (
    LakeCatalog,
    MetastoreConflictError,
)
from incremental_etl_on_lakehouse_spark.lake.sql import execute_statement

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("v", StringType())]
)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, SCHEMA)


def test_mapping_survives_catalog_instances(spark, tmp_path):
    root = str(tmp_path / "cat")
    cat = LakeCatalog(spark, root)
    t = cat.create_table("raw", "events", SCHEMA)
    t.append(_rows(spark, [(1, "a"), (2, "b")]))
    ext_path = str(tmp_path / "elsewhere" / "ext")
    ext = LakeTable.create(spark, ext_path, SCHEMA)
    ext.append(_rows(spark, [(9, "z")]))
    cat.register_table("raw", "landed", ext_path)

    # a FRESH instance (new session stand-in) sees both, including the
    # external mapping a directory listing could never recover
    cat2 = LakeCatalog(spark, root)
    assert cat2.tables("raw") == ["events", "landed"]
    assert cat2.table("raw", "landed").to_df().count() == 1
    assert cat2.is_external("raw", "landed")
    assert not cat2.is_external("raw", "events")


def test_external_drop_keeps_data_managed_drop_deletes(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    managed = cat.create_table("db1", "m", SCHEMA)
    managed.append(_rows(spark, [(1, "a")]))
    managed_path = managed.path
    ext_path = str(tmp_path / "ext")
    LakeTable.create(spark, ext_path, SCHEMA).append(_rows(spark, [(2, "b")]))
    cat.register_table("db1", "e", ext_path)

    cat.drop_table("db1", "e")
    assert "e" not in cat.tables("db1")
    assert LakeTable.exists(ext_path)  # data untouched

    cat.drop_table("db1", "m")
    assert not LakeTable.exists(managed_path)  # managed data gone
    assert cat.tables("db1") == []


def test_create_table_location_is_external(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    loc = str(tmp_path / "loc" / "t")
    t = cat.create_table("db", "t", SCHEMA, location=loc)
    t.append(_rows(spark, [(5, "e")]))
    assert cat.is_external("db", "t")
    cat.drop_table("db", "t")
    assert LakeTable.exists(loc)


def test_directory_convention_backcompat(spark, tmp_path):
    """Tables created as plain directories (pre-metastore catalogs) are
    still discovered, resolvable, and droppable."""
    root = tmp_path / "cat"
    (root / "legacy").mkdir(parents=True)
    LakeTable.create(spark, str(root / "legacy" / "old"), SCHEMA).append(
        _rows(spark, [(1, "x")])
    )
    cat = LakeCatalog(spark, str(root))
    assert "legacy" in cat.databases()
    assert cat.tables("legacy") == ["old"]
    assert cat.table("legacy", "old").to_df().count() == 1
    cat.drop_table("legacy", "old")
    assert cat.tables("legacy") == []


def test_resolver_routes_sql_front_door(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    t = cat.create_table("sales", "orders", SCHEMA)
    t.append(_rows(spark, [(1, "old"), (2, "keep")]))
    execute_statement(
        spark,
        "UPDATE sales.orders SET v = 'new' WHERE id = 1",
        cat.resolver(),
    )
    got = {(r.id, r.v) for r in cat.table("sales", "orders").to_df().collect()}
    assert got == {(1, "new"), (2, "keep")}
    # bare name via default_db (the USE <db> stand-in)
    execute_statement(
        spark, "DELETE FROM orders WHERE id = 2", cat.resolver(default_db="sales")
    )
    assert cat.table("sales", "orders").to_df().count() == 1
    with pytest.raises(ValueError, match="default_db"):
        cat.resolver()("orders")


def test_occ_between_two_catalog_instances(spark, tmp_path):
    """Two instances over one root interleave mutations; neither loses an
    update (every entry lands at a unique version; final state is the
    union)."""
    root = str(tmp_path / "cat")
    a, b = LakeCatalog(spark, root), LakeCatalog(spark, root)
    a.create_table("db", "t1", SCHEMA)
    b.create_table("db", "t2", SCHEMA)
    a.create_table("db", "t3", SCHEMA)
    assert LakeCatalog(spark, root).tables("db") == ["t1", "t2", "t3"]
    versions = sorted(
        int(n[:-5])
        for n in os.listdir(os.path.join(root, "_metastore"))
        if n.endswith(".json")
    )
    assert versions == list(range(len(versions)))  # gap-free, no clobber


def test_commit_collision_retries_then_raises(spark, tmp_path):
    """A saturated put-if-absent surface raises MetastoreConflictError
    instead of spinning or silently overwriting."""
    root = str(tmp_path / "cat")
    cat = LakeCatalog(spark, root)
    cat.create_database("db")

    class Saturated:
        def list_dir(self, path):
            return ["0000000.json"]

        def read_text(self, path):
            return json.dumps({"op": "create_db", "db": "db"})

        def mkdirs(self, path):
            pass

        def put_if_absent(self, path, text):
            raise FileExistsError(path)

    from incremental_etl_on_lakehouse_spark.lake import logstore

    logstore.register_store(root, Saturated())
    try:
        with pytest.raises(MetastoreConflictError):
            cat._meta_commit({"op": "create_db", "db": "x"})
    finally:
        logstore.register_store(root, None)


def test_duplicate_create_and_register_conflicts(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    cat.create_table("db", "t", SCHEMA)
    with pytest.raises(ValueError, match="table exists"):
        cat.create_table("db", "t", SCHEMA)
    # if_not_exists returns the existing table
    t = cat.create_table("db", "t", SCHEMA, if_not_exists=True)
    assert t.to_df().count() == 0
    other = str(tmp_path / "other")
    LakeTable.create(spark, other, SCHEMA)
    with pytest.raises(ValueError, match="table exists"):
        cat.register_table("db", "t", other)
    # re-registering the SAME path is idempotent
    ext = str(tmp_path / "ext2")
    LakeTable.create(spark, ext, SCHEMA)
    cat.register_table("db", "e", ext)
    cat.register_table("db", "e", ext)
    assert cat.tables("db") == ["e", "t"]


def test_drop_database_cascade_semantics(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    cat.create_table("db", "m", SCHEMA).append(_rows(spark, [(1, "a")]))
    ext = str(tmp_path / "ext3")
    LakeTable.create(spark, ext, SCHEMA)
    cat.register_table("db", "e", ext)
    with pytest.raises(ValueError, match="not empty"):
        cat.drop_database("db")
    cat.drop_database("db", cascade=True)
    assert "db" not in LakeCatalog(spark, str(tmp_path / "cat")).databases()
    assert LakeTable.exists(ext)  # external data survives the cascade


def test_register_views_includes_external(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    cat.create_table("gold", "agg", SCHEMA).append(_rows(spark, [(1, "a")]))
    ext = str(tmp_path / "ext4")
    LakeTable.create(spark, ext, SCHEMA).append(_rows(spark, [(2, "b")]))
    cat.register_table("gold", "ext", ext)
    cat.register_views("gold")
    assert spark.sql("SELECT count(*) c FROM gold_ext").collect()[0].c == 1
    assert spark.sql("SELECT count(*) c FROM gold_agg").collect()[0].c == 1


def test_sql_ddl_surface(spark, tmp_path):
    """The reference's notebook DDL runs verbatim against the catalog
    (demo-notebook.py:104-110, 211-227): database DDL, CREATE TABLE with
    properties, DML against db.table names, SHOW listings, DROP."""
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    cat.sql("CREATE DATABASE IF NOT EXISTS lakehouse_db")
    cat.sql("CREATE DATABASE IF NOT EXISTS lakehouse_db")  # idempotent
    with pytest.raises(ValueError, match="database exists"):
        cat.sql("CREATE DATABASE lakehouse_db")
    assert cat.sql("SHOW DATABASES") == ["lakehouse_db"]

    t = cat.sql(
        "CREATE TABLE lakehouse_db.visitors ("
        " id BIGINT NOT NULL, country STRING, num_visitors BIGINT)"
        " TBLPROPERTIES (delta.enableChangeDataFeed = true)"
    )
    assert t.cdf_enabled()
    cat.sql(
        "INSERT INTO lakehouse_db.visitors VALUES"
        " (1, 'AU', 100), (2, 'NZ', 50)"
    )
    cat.sql(
        "UPDATE lakehouse_db.visitors SET num_visitors = 101 WHERE id = 1"
    )
    got = {
        (r.id, r.num_visitors)
        for r in cat.table("lakehouse_db", "visitors").to_df().collect()
    }
    assert got == {(1, 101), (2, 50)}
    assert cat.sql("SHOW TABLES IN lakehouse_db") == ["visitors"]
    # bare names against a default db (the USE <db> stand-in)
    cat.sql("DELETE FROM visitors WHERE id = 2", default_db="lakehouse_db")
    assert cat.table("lakehouse_db", "visitors").to_df().count() == 1
    cat.sql("DROP TABLE IF EXISTS lakehouse_db.visitors")
    cat.sql("DROP TABLE IF EXISTS lakehouse_db.visitors")  # no-op
    assert cat.sql("SHOW TABLES IN lakehouse_db") == []
    cat.sql("DROP DATABASE lakehouse_db")
    assert cat.sql("SHOW DATABASES") == []


def test_sql_create_table_location_external(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    loc = str(tmp_path / "ext_loc")
    cat.sql(f"CREATE TABLE db.t (id BIGINT, v STRING) LOCATION '{loc}'")
    assert cat.is_external("db", "t")
    cat.sql("INSERT INTO db.t VALUES (1, 'a')")
    cat.sql("DROP TABLE db.t")
    assert LakeTable.exists(loc)  # external: data survives DROP
    # conflicting LOCATION for an already-registered name is rejected
    cat.sql(f"CREATE TABLE db.u (id BIGINT, v STRING) LOCATION '{loc}'")
    with pytest.raises(ValueError, match="registered at"):
        cat.sql(
            "CREATE TABLE IF NOT EXISTS db.u (id BIGINT, v STRING)"
            f" LOCATION '{tmp_path / 'elsewhere'}'"
        )


def test_metastore_checkpointing(spark, tmp_path):
    """Past META_CHECKPOINT_EVERY mutations a checkpoint lands, and a
    fresh catalog folds from it (entries below the checkpoint are never
    read) to the same state."""
    from incremental_etl_on_lakehouse_spark.lake.catalog import (
        META_CHECKPOINT_EVERY,
    )

    root = str(tmp_path / "cat")
    cat = LakeCatalog(spark, root)
    ext = str(tmp_path / "ext5")
    LakeTable.create(spark, ext, SCHEMA)
    n = META_CHECKPOINT_EVERY + 5
    for i in range(n):
        cat.register_table("db", f"t{i:03d}", ext)
    meta = os.path.join(root, "_metastore")
    ckpts = [f for f in os.listdir(meta) if f.startswith("_checkpoint.")]
    assert ckpts, "no checkpoint written"

    # a fresh instance reads checkpoint + tail only — prove it by
    # corrupting every entry below the checkpoint
    cp = max(int(f[len("_checkpoint."):-5]) for f in ckpts)
    for v in range(cp):
        with open(os.path.join(meta, f"{v:07d}.json"), "w") as f:
            f.write("{corrupt")
    cat2 = LakeCatalog(spark, root)
    assert cat2.tables("db") == sorted(f"t{i:03d}" for i in range(n))


def test_occ_threads_race_one_log(spark, tmp_path):
    """N threads x M mutations through independent catalog instances:
    every mutation lands (gap-free versions, all tables present)."""
    import threading

    root = str(tmp_path / "cat")
    LakeCatalog(spark, root).create_database("db")
    ext = str(tmp_path / "ext6")
    LakeTable.create(spark, ext, SCHEMA)
    errs = []

    def work(tid):
        try:
            c = LakeCatalog(spark, root)
            for i in range(8):
                c.register_table("db", f"w{tid}_{i}", ext)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=work, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    cat = LakeCatalog(spark, root)
    assert len(cat.tables("db")) == 32
    versions = sorted(
        int(n[:-5])
        for n in os.listdir(os.path.join(root, "_metastore"))
        if n.endswith(".json") and n[:-5].isdigit()
    )
    assert versions == list(range(len(versions)))


@pytest.mark.parametrize("seed", range(3))
def test_catalog_interleaving_fuzz(spark, tmp_path, seed):
    """Random create/drop/register/recreate sequences through TWO catalog
    instances over one root, checked against a pure-Python model — the
    checkpointed fold, OCC versioning, and external-vs-managed drop
    semantics under op mixes the fixed tests can't enumerate."""
    import random

    rng = random.Random(7700 + seed)
    root = str(tmp_path / "cat")
    cats = [LakeCatalog(spark, root), LakeCatalog(spark, root)]
    ext_pool = []
    for i in range(3):
        p = str(tmp_path / f"extsrc{i}")
        LakeTable.create(spark, p, SCHEMA)
        ext_pool.append(p)
    model: dict = {}  # db -> {name: ("managed"|"external", path)}
    vmodel: dict = {}  # db -> {view: referenced table name}
    n_table = 0

    for _ in range(24):
        cat = rng.choice(cats)
        op = rng.choice(
            ["create_db", "create_tbl", "register", "drop_tbl", "drop_db",
             "create_view", "drop_view", "collide"]
        )
        if op == "create_db":
            db = f"db{rng.randint(0, 2)}"
            cat.create_database(db)
            model.setdefault(db, {})
        elif op == "create_tbl":
            db = f"db{rng.randint(0, 2)}"
            name = f"t{n_table}"
            n_table += 1
            t = cat.create_table(db, name, SCHEMA)
            model.setdefault(db, {})[name] = ("managed", t.path)
        elif op == "register":
            db = f"db{rng.randint(0, 2)}"
            name = f"e{n_table}"
            n_table += 1
            p = rng.choice(ext_pool)
            cat.register_table(db, name, p)
            model.setdefault(db, {})[name] = ("external", p)
        elif op == "drop_tbl":
            nonempty = [d for d in model if model[d]]
            if not nonempty:
                continue
            db = rng.choice(nonempty)
            name = rng.choice(sorted(model[db]))
            kind, path = model[db].pop(name)
            cat.drop_table(db, name)
            # external data survives; managed data is gone
            assert LakeTable.exists(path) == (kind == "external"), (
                seed, db, name, kind,
            )
        elif op == "drop_db":
            if not model:
                continue
            db = rng.choice(sorted(model))
            cat.drop_database(db, cascade=True)
            model.pop(db)
            vmodel.pop(db, None)
        elif op == "create_view":
            # views racing table drops: a view may be created over any
            # live table; a later drop of that table leaves the view
            # registered (late binding) but unreadable
            candidates = [d for d in model if model[d]]
            if not candidates:
                continue
            db = rng.choice(candidates)
            tname = rng.choice(sorted(model[db]))
            vname = f"v{n_table}"
            n_table += 1
            cat.create_view(
                db, vname, f"SELECT count(*) AS n FROM {db}.{tname}"
            )
            vmodel.setdefault(db, {})[vname] = tname
        elif op == "drop_view":
            nonempty = [d for d in vmodel if vmodel[d]]
            if not nonempty:
                continue
            db = rng.choice(nonempty)
            vname = rng.choice(sorted(vmodel[db]))
            cat.drop_view(db, vname)
            vmodel[db].pop(vname)
        elif op == "collide":
            # namespace collisions must raise, never corrupt state
            tbl_dbs = [d for d in model if model[d]]
            if tbl_dbs:
                db = rng.choice(tbl_dbs)
                tname = rng.choice(sorted(model[db]))
                with pytest.raises(ValueError, match="cannot shadow"):
                    cat.create_view(db, tname, "SELECT 1 AS x")
            v_dbs = [d for d in vmodel if vmodel[d]]
            if v_dbs:
                db = rng.choice(v_dbs)
                vname = rng.choice(sorted(vmodel[db]))
                with pytest.raises(ValueError, match="is a view"):
                    cat.create_table(db, vname, SCHEMA)
                with pytest.raises(ValueError, match="is a view"):
                    cat.drop_table(db, vname)
        # a FRESH instance folds to exactly the model (cross-instance
        # persistence at every step, through any checkpoints)
        fresh = LakeCatalog(spark, root)
        assert set(fresh.databases()) == set(model), seed
        for d in model:
            assert fresh.tables(d) == sorted(model[d]), (seed, d)
            for name, (kind, _p) in model[d].items():
                assert fresh.is_external(d, name) == (kind == "external")
            assert fresh.views(d) == sorted(vmodel.get(d, {})), (seed, d)
            for vname, tname in vmodel.get(d, {}).items():
                if tname in model[d]:
                    # underlying table alive: the view reads one count row
                    assert fresh.read_view(d, vname).count() == 1
                else:
                    # table dropped from under the view: registration
                    # survives, the read errors (late binding)
                    with pytest.raises(Exception):
                        fresh.read_view(d, vname).collect()

    # the entry log is gap-free (no clobbered versions across 2 writers)
    meta = os.path.join(root, "_metastore")
    versions = sorted(
        int(n[:-5])
        for n in os.listdir(meta)
        if n.endswith(".json") and n[:-5].isdigit()
    )
    assert versions == list(range(len(versions)))


def test_pipeline_register_in_catalog(spark, tmp_path):
    """The medallion pipeline's tables register in a persistent catalog
    under the reference's ${db}.visitors_* naming; a FRESH catalog
    instance resolves and queries them by name, and dropping a name
    leaves pipeline data intact (external)."""
    import json as _json

    from incremental_etl_on_lakehouse_spark.pipeline import MedallionPipeline

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "f1.json").write_text(
        "\n".join(
            _json.dumps(
                {
                    "id": i,
                    "country": c,
                    "num_visitors": v,
                    "cdc_operation": "INSERT",
                    "cdc_timestamp": f"2026-01-01 00:00:0{i}",
                }
            )
            for i, (c, v) in enumerate([("AU", 100), ("NZ", 50)])
        )
    )
    p = MedallionPipeline(spark, str(tmp_path / "lake"), str(landing))
    p.run_available()
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    p.register_in(cat, "lakehouse_db")
    p.register_in(cat, "lakehouse_db")  # idempotent

    fresh = LakeCatalog(spark, str(tmp_path / "cat"))
    assert {"visitors_bronze", "visitors_silver", "visitors_gold"} <= set(
        fresh.tables("lakehouse_db")
    )
    got = {
        (r.country, r.sum_visitors)
        for r in fresh.table("lakehouse_db", "visitors_gold")
        .to_df()
        .collect()
    }
    assert got == {("AU", 100), ("NZ", 50)}
    # SQL against the registered name through the catalog front door
    n = (
        fresh.sql(
            "DELETE FROM lakehouse_db.visitors_silver WHERE country = 'NZ'"
        )
    )
    assert p.silver.to_df().count() == 1  # same storage, by design
    fresh.drop_table("lakehouse_db", "visitors_silver")
    assert LakeTable.exists(p.silver_path)  # external: data kept


# ---------------------------------------------------------------------------
# Three-level catalog.database.table namespace (Lakehouse)
# ---------------------------------------------------------------------------


@pytest.fixture
def lh(spark, tmp_path):
    from incremental_etl_on_lakehouse_spark.lake.catalog import Lakehouse

    return Lakehouse(spark, str(tmp_path / "lh"))


def test_lakehouse_catalog_ddl_and_resolution(spark, lh):
    lh.sql("CREATE CATALOG IF NOT EXISTS dev")
    lh.sql("CREATE CATALOG IF NOT EXISTS prod")
    assert lh.sql("SHOW CATALOGS") == ["dev", "prod"]
    with pytest.raises(ValueError, match="catalog exists"):
        lh.create_catalog("dev", if_not_exists=False)
    # the reference's flow: CREATE DATABASE with a catalog-qualified name
    lh.sql("CREATE DATABASE IF NOT EXISTS dev.raw")
    lh.sql("CREATE DATABASE IF NOT EXISTS prod.raw")
    assert lh.sql("SHOW DATABASES IN dev") == ["raw"]
    # 3-part CREATE TABLE routes to the owning catalog
    lh.sql("CREATE TABLE dev.raw.t1 (id BIGINT, name STRING)")
    lh.sql("CREATE TABLE prod.raw.t1 (id BIGINT, name STRING)")
    assert lh.sql("SHOW TABLES IN dev.raw") == ["t1"]
    # same table name, different catalogs, independent data
    lh.sql("INSERT INTO dev.raw.t1 VALUES (1, 'dev-row')")
    lh.sql("INSERT INTO prod.raw.t1 VALUES (2, 'prod-row')")
    assert [tuple(r) for r in lh.table("dev.raw.t1").to_df().collect()] == [
        (1, "dev-row")
    ]
    assert [tuple(r) for r in lh.table("prod.raw.t1").to_df().collect()] == [
        (2, "prod-row")
    ]


def test_lakehouse_use_catalog_and_database(spark, lh):
    lh.sql("CREATE CATALOG dev")
    lh.sql("CREATE DATABASE dev.raw")
    lh.sql("CREATE TABLE dev.raw.t (id BIGINT)")
    lh.sql("USE CATALOG dev")
    assert lh.current_catalog == "dev"
    # 2-part names now resolve in dev
    lh.sql("INSERT INTO raw.t VALUES (10)")
    lh.sql("USE dev.raw")
    # 1-part names resolve in dev.raw
    lh.sql("INSERT INTO t VALUES (11)")
    assert {r.id for r in lh.table("t").to_df().collect()} == {10, 11}
    assert lh.sql("SHOW TABLES") == ["t"]
    with pytest.raises(ValueError, match="no such catalog"):
        lh.sql("USE CATALOG nope")


def test_lakehouse_drop_catalog_cascade_spares_external(spark, lh, tmp_path):
    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("id", LongType())])
    lh.sql("CREATE CATALOG dev")
    lh.sql("CREATE DATABASE dev.raw")
    lh.sql("CREATE TABLE dev.raw.managed (id BIGINT)")
    ext = str(tmp_path / "ext_tbl")
    LakeTable.create(spark, ext, schema)
    lh.catalog("dev").register_table("raw", "adopted", ext)
    with pytest.raises(ValueError, match="not empty"):
        lh.sql("DROP CATALOG dev")
    lh.sql("DROP CATALOG dev CASCADE")
    assert "dev" not in lh.catalogs()
    assert LakeTable.exists(ext), "external data must survive catalog drop"
    # idempotent IF EXISTS
    assert lh.sql("DROP CATALOG IF EXISTS dev") is None


def test_lakehouse_cross_catalog_statement_rejected(spark, lh):
    lh.sql("CREATE CATALOG a")
    lh.sql("CREATE CATALOG b")
    lh.sql("CREATE DATABASE a.db")
    lh.sql("CREATE DATABASE b.db")
    lh.sql("CREATE TABLE a.db.t (id BIGINT)")
    lh.sql("CREATE TABLE b.db.t (id BIGINT)")
    with pytest.raises(ValueError, match="multiple catalogs"):
        lh.sql("INSERT INTO a.db.t SELECT id FROM b.db.t")


def test_lakehouse_full_dml_surface_on_3part_names(spark, lh):
    """MERGE/UPDATE/DELETE route through the stripped two-level front
    door with 3-part names."""
    lh.sql("CREATE CATALOG dev")
    lh.sql("CREATE DATABASE dev.raw")
    lh.sql("CREATE TABLE dev.raw.t (id BIGINT, v STRING)")
    lh.sql("INSERT INTO dev.raw.t VALUES (1, 'a'), (2, 'b')")
    lh.sql("UPDATE dev.raw.t SET v = 'z' WHERE id = 1")
    lh.sql("DELETE FROM dev.raw.t WHERE id = 2")
    assert [tuple(r) for r in lh.table("dev.raw.t").to_df().collect()] == [
        (1, "z")
    ]
    lh.sql("DROP TABLE dev.raw.t")
    assert lh.sql("SHOW TABLES IN dev.raw") == []


def test_lakehouse_persistence_across_instances(spark, lh, tmp_path):
    from incremental_etl_on_lakehouse_spark.lake.catalog import Lakehouse

    lh.sql("CREATE CATALOG dev")
    lh.sql("CREATE DATABASE dev.raw")
    lh.sql("CREATE TABLE dev.raw.t (id BIGINT)")
    lh.sql("INSERT INTO dev.raw.t VALUES (5)")
    lh2 = Lakehouse(spark, lh.root)
    assert lh2.catalogs() == ["dev"]
    assert {r.id for r in lh2.table("dev.raw.t").to_df().collect()} == {5}


@pytest.mark.parametrize("seed", range(2))
def test_lakehouse_interleaving_fuzz(spark, tmp_path, seed):
    """Random catalog-level op sequences (create/drop catalog, qualified
    database DDL, 3-part table DDL) through TWO Lakehouse instances over
    one root, checked against a pure-Python model — extends the two-level
    interleaving fuzzer one namespace level up."""
    import random

    from incremental_etl_on_lakehouse_spark.lake.catalog import Lakehouse

    rng = random.Random(9900 + seed)
    root = str(tmp_path / "lh")
    lhs = [Lakehouse(spark, root), Lakehouse(spark, root)]
    model: dict = {}  # cat -> {db -> set(tables)}
    n_table = 0

    for _ in range(20):
        lh = rng.choice(lhs)
        op = rng.choice(
            [
                "create_cat", "create_db", "create_tbl",
                "drop_tbl", "drop_db", "drop_cat",
            ]
        )
        if op == "create_cat":
            c = f"c{rng.randint(0, 1)}"
            lh.sql(f"CREATE CATALOG IF NOT EXISTS {c}")
            model.setdefault(c, {})
        elif op == "create_db":
            if not model:
                continue
            c = rng.choice(sorted(model))
            db = f"db{rng.randint(0, 1)}"
            lh.sql(f"CREATE DATABASE IF NOT EXISTS {c}.{db}")
            model[c].setdefault(db, set())
        elif op == "create_tbl":
            cands = [(c, d) for c in model for d in model[c]]
            if not cands:
                continue
            c, db = rng.choice(cands)
            name = f"t{n_table}"
            n_table += 1
            lh.sql(f"CREATE TABLE {c}.{db}.{name} (id BIGINT)")
            lh.sql(f"INSERT INTO {c}.{db}.{name} VALUES ({n_table})")
            model[c][db].add(name)
        elif op == "drop_tbl":
            cands = [
                (c, d, t) for c in model for d in model[c] for t in model[c][d]
            ]
            if not cands:
                continue
            c, db, t = rng.choice(sorted(cands))
            lh.sql(f"DROP TABLE {c}.{db}.{t}")
            model[c][db].discard(t)
        elif op == "drop_db":
            cands = [(c, d) for c in model for d in model[c]]
            if not cands:
                continue
            c, db = rng.choice(sorted(cands))
            lh.sql(f"DROP DATABASE {c}.{db} CASCADE")
            model[c].pop(db)
        elif op == "drop_cat":
            if not model:
                continue
            c = rng.choice(sorted(model))
            lh.sql(f"DROP CATALOG {c} CASCADE")
            model.pop(c)
        # a FRESH instance sees exactly the model at every step
        fresh = Lakehouse(spark, root)
        assert set(fresh.catalogs()) == set(model), seed
        for c in model:
            assert set(fresh.catalog(c).databases()) == set(model[c]), (
                seed, c,
            )
            for d in model[c]:
                assert set(fresh.catalog(c).tables(d)) == model[c][d], (
                    seed, c, d,
                )


@pytest.mark.parametrize("seed", range(4))
def test_lakehouse_external_interleaving_fuzz(spark, tmp_path, seed):
    """Round-11 op-mix extension (ROTATION.md handoff): EXTERNAL
    registrations join the Lakehouse interleaving fuzzer — register data
    INSIDE a db directory (possibly a different db than the registration),
    drop the registration (extern-orphan marker), drop its directory-name
    alias (silent no-op while registered, clean refusal once orphaned),
    re-register the orphaned path under a fresh name, and CASCADE drops
    that must never delete externally-owned bytes. Checked against a
    filesystem-level model (registrations + live lake paths + orphan
    markers) through fresh instances each step."""
    import os as _os
    import random

    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from incremental_etl_on_lakehouse_spark.lake.catalog import Lakehouse
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("id", LongType())])
    rng = random.Random(11_000 + seed)
    root = str(tmp_path / "lh")
    lhs = [Lakehouse(spark, root), Lakehouse(spark, root)]
    cats: set[str] = set()
    db_dirs: set[tuple[str, str]] = set()          # (cat, db) dirs that exist
    regs: dict[tuple[str, str, str], tuple[str, bool]] = {}  # -> (path, ext)
    live: set[str] = set()                         # paths holding a LakeTable
    orphans: dict[str, set[str]] = {}              # cat -> marker paths
    n = 0

    def db_path(c, d):
        return _os.path.join(root, c, d)

    def expected_tables(c, d):
        names = {t for (cc, dd, t) in regs if (cc, dd) == (c, d)}
        dp = db_path(c, d)
        names |= {
            _os.path.basename(p)
            for p in live
            if _os.path.dirname(p) == dp
        }
        return names

    def ext_alive_inside(c):
        cp = _os.path.join(root, c)
        ins = {
            p
            for (cc, _d, _t), (p, ext) in regs.items()
            if cc == c and ext and p.startswith(cp + _os.sep) and p in live
        }
        ins |= {p for p in orphans.get(c, set()) if p in live}
        return ins

    for _ in range(24):
        lh = rng.choice(lhs)
        op = rng.choice(
            ["create_cat", "create_db", "create_tbl", "reg_ext", "rereg",
             "drop_reg", "drop_alias", "drop_db", "drop_cat"]
        )
        if op == "create_cat":
            c = f"c{rng.randint(0, 1)}"
            lh.create_catalog(c)
            cats.add(c)
        elif op == "create_db" and cats:
            c = rng.choice(sorted(cats))
            d = f"db{rng.randint(0, 1)}"
            lh.catalog(c).create_database(d)
            db_dirs.add((c, d))
        elif op == "create_tbl" and db_dirs:
            c, d = rng.choice(sorted(db_dirs))
            t = f"m{n}"; n += 1
            lh.catalog(c).create_table(d, t, schema)
            regs[(c, d, t)] = (db_path(c, d) + _os.sep + t, False)
            live.add(db_path(c, d) + _os.sep + t)
        elif op == "reg_ext" and db_dirs:
            # plant external data INSIDE a db dir, register it (same
            # catalog, possibly a DIFFERENT db) under a distinct name
            c, d_home = rng.choice(sorted(db_dirs))
            home_dbs = sorted(dd for (cc, dd) in db_dirs if cc == c)
            d_reg = rng.choice(home_dbs)
            p = db_path(c, d_home) + _os.sep + f"x{n}"
            LakeTable.create(spark, p, schema)
            live.add(p)
            t = f"r{n}"; n += 1
            lh.catalog(c).register_table(d_reg, t, p)
            regs[(c, d_reg, t)] = (p, True)
        elif op == "rereg":
            # re-register a surviving unregistered external path
            registered = {p for (p, _e) in regs.values()}
            cands = sorted(
                p for p in live
                if p not in registered and p.startswith(root + _os.sep)
            )
            if not cands or not db_dirs:
                continue
            p = rng.choice(cands)
            c = p[len(root) + 1 :].split(_os.sep)[0]
            home_dbs = sorted(dd for (cc, dd) in db_dirs if cc == c)
            if not home_dbs:
                continue
            d = rng.choice(home_dbs)
            t = f"rr{n}"; n += 1
            lh.catalog(c).register_table(d, t, p)
            regs[(c, d, t)] = (p, True)
        elif op == "drop_reg" and regs:
            (c, d, t) = rng.choice(sorted(regs))
            p, ext = regs.pop((c, d, t))
            lh.catalog(c).drop_table(d, t)
            if not ext:
                live.discard(p)
            elif p in live and p.startswith(_os.path.join(root, c) + _os.sep):
                orphans.setdefault(c, set()).add(p)
        elif op == "drop_alias":
            # directory-convention drop on an external path's basename
            ext_paths = {p for (p, e) in regs.values() if e}
            cands = sorted(
                p for p in live
                if p.startswith(root + _os.sep)
                and not any(
                    pp == p and not e for (pp, e) in regs.values()
                )
                and _os.path.dirname(p) in {db_path(*cd) for cd in db_dirs}
            )
            if not cands:
                continue
            p = rng.choice(cands)
            c, d = p[len(root) + 1 :].split(_os.sep)[:2]
            alias = _os.path.basename(p)
            if p in ext_paths:
                lh.catalog(c).drop_table(d, alias)  # silent no-op
            elif p in orphans.get(c, set()):
                with pytest.raises(ValueError, match="externally-owned"):
                    lh.catalog(c).drop_table(d, alias)
            else:
                continue  # unreachable by construction
            assert p in live and LakeTable.exists(p), (seed, "alias drop")
        elif op == "drop_db" and db_dirs:
            c, d = rng.choice(sorted(db_dirs))
            lh.catalog(c).drop_database(d, cascade=True)
            dp = db_path(c, d)
            for key in sorted(k for k in regs if k[:2] == (c, d)):
                p, ext = regs.pop(key)
                if not ext:
                    live.discard(p)
                elif p in live and p.startswith(
                    _os.path.join(root, c) + _os.sep
                ):
                    orphans.setdefault(c, set()).add(p)
            if not any(_os.path.dirname(p) == dp for p in live):
                db_dirs.discard((c, d))
        elif op == "drop_cat" and cats:
            c = rng.choice(sorted(cats))
            if ext_alive_inside(c):
                with pytest.raises(ValueError, match="externally-owned"):
                    lhs[0].drop_catalog(c, cascade=True)
                continue
            lhs[0].drop_catalog(c, cascade=True)
            cp = _os.path.join(root, c)
            cats.discard(c)
            db_dirs = {(cc, dd) for (cc, dd) in db_dirs if cc != c}
            for key in sorted(k for k in regs if k[0] == c):
                p, _ext = regs.pop(key)
                live.discard(p)  # no alive externals inside (checked above)
            live = {p for p in live if not p.startswith(cp + _os.sep)}
            orphans.pop(c, None)
        else:
            continue

        fresh = Lakehouse(spark, root)
        assert set(fresh.catalogs()) == cats, (seed, op)
        for c in cats:
            got_dbs = set(fresh.catalog(c).databases())
            want_dbs = {d for (cc, d) in db_dirs if cc == c}
            assert got_dbs == want_dbs, (seed, op, c, got_dbs, want_dbs)
            for d in want_dbs:
                got = set(fresh.catalog(c).tables(d))
                want = expected_tables(c, d)
                assert got == want, (seed, op, c, d, got, want)
        # external bytes are NEVER deleted while any model path is live
        for p in live:
            assert LakeTable.exists(p), (seed, op, p)


def test_lakehouse_string_literals_not_rewritten(spark, lh):
    """Dotted values inside SQL string literals ('www.example.com') must
    not be parsed as catalog.db.table references."""
    lh.sql("CREATE CATALOG dev")
    lh.sql("CREATE DATABASE dev.raw")
    lh.sql("CREATE TABLE dev.raw.t (id BIGINT, url STRING)")
    lh.sql(
        "INSERT INTO dev.raw.t VALUES (1, 'www.example.com'),"
        " (2, 'a.b.c')"
    )
    got = {(r.id, r.url) for r in lh.table("dev.raw.t").to_df().collect()}
    assert got == {(1, "www.example.com"), (2, "a.b.c")}
    lh.sql("UPDATE dev.raw.t SET url = 'v1.2.3' WHERE id = 2")
    got = {(r.id, r.url) for r in lh.table("dev.raw.t").to_df().collect()}
    assert got == {(1, "www.example.com"), (2, "v1.2.3")}


def test_lakehouse_drop_database_typo_does_not_create_catalog(spark, lh):
    lh.sql("CREATE CATALOG real")
    assert lh.sql("DROP DATABASE IF EXISTS typo_cat.sales") is None
    assert lh.catalogs() == ["real"], "typo'd DROP must not mint a catalog"
    with pytest.raises(ValueError, match="no such catalog"):
        lh.sql("DROP DATABASE typo2.sales")
    assert lh.catalogs() == ["real"]


def test_lakehouse_drop_catalog_refuses_inside_tree_external(
    spark, lh, tmp_path
):
    """External DATA inside the catalog tree blocks DROP CATALOG: the
    metastore is the only record of its external ownership, so deleting
    the catalog would set the data up for a later directory-convention
    deletion. Data outside the tree never blocks."""
    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("id", LongType())])
    lh.sql("CREATE CATALOG dev")
    lh.sql("CREATE DATABASE dev.raw")
    inside = os.path.join(lh.root, "dev", "raw", "adopted")
    LakeTable.create(spark, inside, schema)
    LakeTable(spark, inside).append(spark.createDataFrame([(1,)], schema))
    lh.catalog("dev").register_table("raw", "adopted", inside)
    with pytest.raises(ValueError, match="externally-owned"):
        lh.sql("DROP CATALOG dev CASCADE")
    assert "dev" in lh.catalogs()
    assert LakeTable.exists(inside)
    # after the data is removed (owner's choice), the drop proceeds
    LakeTable.drop(inside)
    lh.sql("DROP CATALOG dev CASCADE")
    assert "dev" not in lh.catalogs()


def test_extern_orphan_marker_blocks_directory_convention_drop(
    spark, tmp_path
):
    """Unregistering an external table whose data lives inside the
    managed tree leaves a persistent ownership marker: the surviving
    directory is rediscovered by name, but DROP TABLE refuses to delete
    it as a directory-convention managed table — and re-registering it
    clears the marker."""
    root = str(tmp_path / "cat")
    cat = LakeCatalog(spark, root)
    cat.create_database("db1")
    inside = os.path.join(root, "db1", "adopted")
    LakeTable.create(spark, inside, SCHEMA)
    LakeTable(spark, inside).append(
        spark.createDataFrame([(7, "x")], SCHEMA)
    )
    cat.register_table("db1", "adopted", inside)
    cat.drop_table("db1", "adopted")  # unregister; data stays
    assert LakeTable.exists(inside)
    # rediscovered by directory convention...
    assert "adopted" in cat.tables("db1")
    # ...but a second DROP must refuse, not delete external data
    with pytest.raises(ValueError, match="externally-owned"):
        cat.drop_table("db1", "adopted")
    assert LakeTable.exists(inside)
    # a FRESH instance sees the marker too (it is persistent state)
    cat2 = LakeCatalog(spark, root)
    with pytest.raises(ValueError, match="externally-owned"):
        cat2.drop_table("db1", "adopted")
    # re-adoption clears the marker; the name resolves again
    cat2.register_table("db1", "adopted", inside)
    assert {r.id for r in cat2.table("db1", "adopted").to_df().collect()} == {
        7
    }


def test_meta_cache_survives_drop_and_recreate(spark, tmp_path):
    """ABA guard: a cached LakeCatalog instance must not serve pre-drop
    state after the metastore is deleted and recreated to the same
    version count by another instance."""
    import shutil as _sh

    from incremental_etl_on_lakehouse_spark.lake.catalog import Lakehouse

    root = str(tmp_path / "lh")
    lh_a = Lakehouse(spark, root)
    lh_b = Lakehouse(spark, root)
    lh_a.sql("CREATE CATALOG c")
    lh_a.sql("CREATE DATABASE c.d")
    lh_a.sql("CREATE TABLE c.d.t1 (id BIGINT)")
    # B caches the incarnation
    assert lh_b.sql("SHOW TABLES IN c.d") == ["t1"]
    # A drops the catalog and recreates the SAME names with a different
    # table — same entry count as before
    lh_a.sql("DROP CATALOG c CASCADE")
    lh_a.sql("CREATE CATALOG c")
    lh_a.sql("CREATE DATABASE c.d")
    lh_a.sql("CREATE TABLE c.d.t2 (id BIGINT)")
    assert lh_b.sql("SHOW TABLES IN c.d") == ["t2"], "stale ABA cache"
