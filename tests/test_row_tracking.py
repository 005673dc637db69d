"""Row tracking (Delta's ``enableRowTracking``): every row carries a
stable ``_row_id`` that survives OPTIMIZE, MERGE/UPDATE rewrites,
deletion-vector deletes, RESTORE, and CLONE; fresh rows always mint fresh
ids off the log's monotone high-water mark.

Design (lake/table.py: row_tracking_enabled): base ids are assigned in
the STATE FOLD (log.py table_state — each add entry gets ``base``; an
unrewritten row's id is base + file position), and rewrite paths
materialize ids into a physical ``__row_id`` column; reads coalesce the
two forms. RESTORE/CLONE copy folded add entries verbatim, which is what
carries bases across rollbacks and forks.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.table import MergeClause

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("v", StringType())]
)
RT = {"enableRowTracking": "true"}


def _t(spark, path, props=None, **kw):
    return LakeTable.create(
        spark, str(path), SCHEMA, properties={**RT, **(props or {})}, **kw
    )


def _ids(t):
    return {r.id: r._row_id for r in t.to_df(with_row_ids=True).collect()}


def test_fresh_ids_unique_and_monotone(spark, tmp_path):
    t = _t(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(i, "x") for i in range(5)], SCHEMA))
    t.append(spark.createDataFrame([(i, "y") for i in range(5, 8)], SCHEMA))
    ids = _ids(t)
    assert len(set(ids.values())) == 8  # unique
    first = {ids[i] for i in range(5)}
    second = {ids[i] for i in range(5, 8)}
    assert max(first) < min(second)  # later commit = higher range


def test_optimize_preserves_ids(spark, tmp_path):
    t = _t(spark, tmp_path / "t")
    for i in range(4):
        t.append(spark.createDataFrame([(i, "x")], SCHEMA).coalesce(1))
    before = _ids(t)
    assert len(t.files()) == 4
    t.compact(target_file_rows=1000)
    assert len(t.files()) == 1
    assert _ids(t) == before


def test_zorder_preserves_ids(spark, tmp_path):
    t = _t(spark, tmp_path / "t", props={"statsColumns": "id"})
    t.append(
        spark.createDataFrame([(i, chr(97 + i % 26)) for i in range(40)], SCHEMA)
    )
    before = _ids(t)
    t.compact(target_file_rows=10, zorder_by=["id", "v"])
    assert _ids(t) == before


def test_update_delete_merge_preserve_ids(spark, tmp_path):
    t = _t(spark, tmp_path / "t", props={"enableChangeDataFeed": "true"})
    t.append(spark.createDataFrame([(i, "x") for i in range(6)], SCHEMA))
    base = _ids(t)
    t.update({"v": "'U'"}, "id = 1")
    t.delete("id = 2")
    src = spark.createDataFrame([(0, "M"), (99, "NEW")], SCHEMA)
    t.merge(
        src,
        "source.id = target.id",
        [MergeClause("update", None, "*"), MergeClause("insert", None, "*")],
    )
    ids = _ids(t)
    survivors = {k: v for k, v in base.items() if k != 2}
    assert {k: ids[k] for k in survivors} == survivors
    assert ids[99] not in set(base.values())
    assert len(set(ids.values())) == len(ids)
    # CDF files never carry the id column (it is physical-layout metadata)
    changes = t.read_changes(1)
    assert "_row_id" not in changes.columns
    assert "__row_id" not in changes.columns


def test_dv_delete_and_update_preserve_ids(spark, tmp_path):
    t = _t(spark, tmp_path / "t", props={"enableDeletionVectors": "true"})
    t.append(spark.createDataFrame([(i, "x") for i in range(6)], SCHEMA))
    base = _ids(t)
    t.delete("id = 3")  # DV: zero rewrite — derived ids untouched
    ids = _ids(t)
    assert ids == {k: v for k, v in base.items() if k != 3}
    t.update({"v": "'U'"}, "id = 4")  # DV update: re-staged row keeps id
    ids2 = _ids(t)
    assert ids2 == ids


def test_replace_where_keeps_out_of_predicate_ids(spark, tmp_path):
    schema = StructType(SCHEMA.fields + [StructField("p", StringType())])
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema, properties=dict(RT)
    )
    t.append(
        spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")],
            "id long, v string, p string",
        ).coalesce(1)
    )
    before = {r.id: r._row_id for r in t.to_df(with_row_ids=True).collect()}
    t.overwrite_where(
        spark.createDataFrame([(9, "z", "x")], "id long, v string, p string"),
        "p = 'x'",
    )
    ids = {r.id: r._row_id for r in t.to_df(with_row_ids=True).collect()}
    assert ids[3] == before[3]  # out-of-predicate row in untouched state
    assert ids[9] not in set(before.values())  # replacement row = fresh id


def test_restore_and_clone_preserve_ids(spark, tmp_path):
    t = _t(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(i, "x") for i in range(4)], SCHEMA))
    t.update({"v": "'U'"}, "id = 0")
    ids = _ids(t)
    v = t.version()
    t.delete("id = 1")
    t.restore(v)
    assert _ids(t) == ids
    c = t.clone(str(tmp_path / "c"))
    assert _ids(c) == ids


def test_ids_survive_log_checkpoint(spark, tmp_path):
    """Bases ride the state checkpoint: a fold from checkpoint + tail
    assigns the same ids as a full replay."""
    from incremental_etl_on_lakehouse_spark.lake import log as lakelog

    t = _t(spark, tmp_path / "t")
    rows = [(0, "x")]
    t.append(spark.createDataFrame(rows, SCHEMA).coalesce(1))
    early = _ids(t)
    for i in range(1, lakelog.CHECKPOINT_INTERVAL + 2):
        t.append(spark.createDataFrame([(i, "x")], SCHEMA).coalesce(1))
    ckpts = [
        f
        for f in os.listdir(os.path.join(str(tmp_path / "t"), "_lake_log"))
        if f.endswith(".checkpoint.json")
    ]
    assert ckpts, "no checkpoint written"
    t2 = LakeTable(spark, str(tmp_path / "t"))
    ids = _ids(t2)
    assert ids[0] == early[0]
    assert len(set(ids.values())) == len(ids)


def test_partitioned_table_row_ids(spark, tmp_path):
    schema = StructType(SCHEMA.fields + [StructField("p", StringType())])
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        schema,
        properties=dict(RT),
        partition_by=["p"],
    )
    t.append(
        spark.createDataFrame(
            [(i, "v", "x" if i % 2 else "y") for i in range(8)],
            "id long, v string, p string",
        )
    )
    before = {r.id: r._row_id for r in t.to_df(with_row_ids=True).collect()}
    assert len(set(before.values())) == 8
    t.update({"v": "'U'"}, "id = 3")
    after = {r.id: r._row_id for r in t.to_df(with_row_ids=True).collect()}
    assert after == before


def test_row_ids_off_by_default_and_column_absent(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    assert "_row_id" not in t.to_df().columns
    # with_row_ids works even without the property (ids are a pure
    # function of the log); the property gates REWRITE materialization
    t2 = _t(spark, tmp_path / "t2")
    t2.append(spark.createDataFrame([(1, "a")], SCHEMA))
    assert "_row_id" not in t2.to_df().columns
    assert "_row_id" in t2.to_df(with_row_ids=True).columns


@pytest.mark.parametrize("dv", [False, True], ids=["rewrite", "dv"])
@pytest.mark.parametrize("seed", range(3))
def test_row_id_stability_under_random_interleavings(spark, tmp_path, seed, dv):
    """Maintenance-fuzzer companion: across random APPEND / UPDATE /
    DELETE / MERGE / OPTIMIZE / RESTORE interleavings, (a) row ids stay
    unique, (b) every surviving business key keeps its exact id, (c)
    fresh rows mint ids never seen before, (d) RESTORE reproduces the
    target version's id assignment, and (e) TIME TRAVEL to any produced
    version reconstructs that version's ids exactly."""
    import random

    rng = random.Random(9900 + 10 * seed + dv)
    props = {"enableRowTracking": "true"}
    if dv:
        props["enableDeletionVectors"] = "true"
    t = LakeTable.create(
        spark, str(tmp_path / f"rt_{seed}_{dv}"), SCHEMA, properties=props
    )
    next_id = 0
    ever_seen: set = set()

    def snapshot():
        return {
            r.id: r._row_id for r in t.to_df(with_row_ids=True).collect()
        }

    def do_append():
        nonlocal next_id
        k = rng.randint(2, 4)
        rows = [(next_id + j, rng.choice("abc")) for j in range(k)]
        next_id += k
        t.append(spark.createDataFrame(rows, SCHEMA))
        return {r[0] for r in rows}

    conds = ["id % 2 = 1", "v = 'a'", "id % 3 = 0"]
    do_append()
    rids = snapshot()
    ever_seen |= set(rids.values())
    history = {t.version(): dict(rids)}

    for _ in range(8):
        op = rng.choice(
            ["append", "update", "delete", "compact", "merge", "restore"]
        )
        fresh: set = set()
        if op == "append":
            fresh = do_append()
        elif op == "update":
            t.update({"v": "'u'"}, rng.choice(conds))
        elif op == "delete":
            t.delete(rng.choice(conds))
        elif op == "compact":
            t.compact(target_file_rows=3)
        elif op == "merge":
            existing = sorted(rids)
            batch = []
            if existing and rng.random() < 0.7:
                batch.append((rng.choice(existing), "m"))
            batch.append((next_id, "n"))
            fresh.add(next_id)
            next_id += 1
            t.merge(
                spark.createDataFrame(batch, SCHEMA),
                "source.id = target.id",
                [
                    MergeClause("update", None, "*"),
                    MergeClause("insert", None, "*"),
                ],
            )
        elif op == "restore":
            target = rng.choice(sorted(history))
            t.restore(target)
            new = snapshot()
            assert new == history[target], (seed, dv, "restore", target)
            rids = new
            history[t.version()] = dict(new)
            continue
        new = snapshot()
        # uniqueness
        assert len(set(new.values())) == len(new), (seed, dv, op)
        # survivors keep their exact id
        for k, rid in new.items():
            if k in rids and k not in fresh:
                assert rid == rids[k], (seed, dv, op, k)
        # fresh rows mint never-seen ids
        for k in fresh:
            if k in new:  # a later cond can't have deleted it intra-op
                assert new[k] not in ever_seen, (seed, dv, op, k)
        ever_seen |= set(new.values())
        rids = new
        history[t.version()] = dict(new)

    # time travel reconstructs every version's id assignment exactly
    for v, expected in history.items():
        got = {
            r.id: r._row_id
            for r in t.to_df(version=v, with_row_ids=True).collect()
        }
        assert got == expected, (seed, dv, "version", v)


def test_partitioned_merge_compact_preserve_ids(spark, tmp_path):
    """The hive-partitioned read branch surfaces materialized __row_id
    columns too: merge survivors, delete keeps, and compact all preserve
    ids on a partitioned table with stats pruning active."""
    schema = StructType(
        SCHEMA.fields + [StructField("p", StringType())]
    )
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        schema,
        properties={**RT, "statsColumns": "id"},
        partition_by=["p"],
    )
    t.append(
        spark.createDataFrame(
            [(i, "x", "a" if i % 2 else "b") for i in range(8)],
            "id long, v string, p string",
        )
    )
    ids0 = {r.id: r._row_id for r in t.to_df(with_row_ids=True).collect()}
    src = spark.createDataFrame([(0, "U", "b"), (50, "N", "a")], schema)
    t.merge(
        src,
        "source.id = target.id",
        [MergeClause("update", None, "*"), MergeClause("insert", None, "*")],
        stats_prune={"id": "id"},
    )
    ids1 = {r.id: r._row_id for r in t.to_df(with_row_ids=True).collect()}
    assert all(ids1[k] == v for k, v in ids0.items())
    assert len(set(ids1.values())) == len(ids1)
    t.delete("id = 3")
    t.compact(target_file_rows=100)
    ids2 = {r.id: r._row_id for r in t.to_df(with_row_ids=True).collect()}
    assert ids2 == {k: v for k, v in ids1.items() if k != 3}


def test_row_ids_with_column_mapping_and_schema_evolution(spark, tmp_path):
    """Row ids compose with column mapping and additive evolution: a
    RENAME (metadata-only, activates columnMapping) and an ADD COLUMN
    leave every id intact, and a post-rename UPDATE rewrite still
    materializes ids under the physical-name projection."""
    t = _t(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(i, "x") for i in range(5)], SCHEMA))
    base = _ids(t)
    t.rename_column("v", "val")
    t.add_columns([("extra", LongType())])
    ids = {r.id: r._row_id for r in t.to_df(with_row_ids=True).collect()}
    assert ids == base
    t.update({"val": "'u'"}, "id = 2")  # rewrite under mapped names
    ids2 = {r.id: r._row_id for r in t.to_df(with_row_ids=True).collect()}
    assert ids2 == base
    # protocol records both features
    feats = set(t.properties()["protocol.readerFeatures"].split(","))
    assert {"rowTracking", "columnMapping"} <= feats
