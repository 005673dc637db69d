"""The LogStore seam: put-if-absent contract, prefix dispatch, and the
OCC/rebase paths driven through a fault-injecting store.

The lake's object-store story (reference deploys on S3,
``setup/incremental-etl-helper.py:6-19``) hinges on ONE primitive —
atomic put-if-absent of a commit file. These tests pin the contract on
the local implementation, prove ``log.py`` has no hidden POSIX
dependency beyond the store (a pure in-memory store runs the whole
commit/checkpoint/table_state machinery), and drive the append
OCC/rebase logic in ``table.py`` deterministically by injecting racing
commits at the exact put-if-absent boundary — something a real race can
only produce probabilistically.
"""

from __future__ import annotations

import json
import os

import pytest

from incremental_etl_on_lakehouse_spark.lake import log as lakelog
from incremental_etl_on_lakehouse_spark.lake.log import Commit
from incremental_etl_on_lakehouse_spark.lake.logstore import (
    LocalLogStore,
    LogStore,
    register_store,
    store_for,
)
from incremental_etl_on_lakehouse_spark.lake.table import LakeTable


# ---------------------------------------------------------------- stores


class InMemoryStore(LogStore):
    """Object-store model: flat key->bytes map, no directories. mkdirs is
    a no-op (prefixes appear when keys do) — exactly S3/GCS semantics."""

    def __init__(self):
        self.objects: dict[str, str] = {}

    def put_if_absent(self, path, text):
        if path in self.objects:
            raise FileExistsError(path)
        self.objects[path] = text

    def read_text(self, path):
        return self.objects[path]

    def list_dir(self, path):
        prefix = path.rstrip("/") + "/"
        return [
            k[len(prefix):]
            for k in self.objects
            if k.startswith(prefix) and "/" not in k[len(prefix):]
        ]

    def mkdirs(self, path):
        pass


class FaultInjectingStore(LogStore):
    """Wraps the local store; runs ``on_put(path)`` hooks immediately
    BEFORE each put_if_absent — the window where a racing writer's commit
    lands in a real deployment."""

    def __init__(self):
        self.inner = LocalLogStore()
        # callable(path) -> truthy once it has fired; stays armed while it
        # returns falsy (lets a hook wait for the put it wants to race)
        self.on_put = None
        self.puts: list[str] = []

    def put_if_absent(self, path, text):
        if self.on_put is not None:
            hook, self.on_put = self.on_put, None  # disarm during the hook
            if not hook(path):
                self.on_put = hook  # not this put — re-arm
        self.puts.append(path)
        self.inner.put_if_absent(path, text)

    def read_text(self, path):
        return self.inner.read_text(path)

    def list_dir(self, path):
        return self.inner.list_dir(path)

    def mkdirs(self, path):
        self.inner.mkdirs(path)


@pytest.fixture()
def fault_store(tmp_path):
    store = FaultInjectingStore()
    register_store(str(tmp_path), store)
    yield store
    register_store(str(tmp_path), None)


# ------------------------------------------------- primitive contracts


def test_local_put_if_absent_is_exclusive(tmp_path):
    store = LocalLogStore()
    p = str(tmp_path / "0.json")
    store.put_if_absent(p, "first")
    with pytest.raises(FileExistsError):
        store.put_if_absent(p, "second")
    assert store.read_text(p) == "first"  # loser never clobbers
    assert store.list_dir(str(tmp_path)) == ["0.json"]  # no tmp litter


def test_register_store_longest_prefix_wins(tmp_path):
    a, b = InMemoryStore(), InMemoryStore()
    register_store("/mem", a)
    register_store("/mem/deeper", b)
    try:
        assert store_for("/mem/t1/_lake_log/x") is a
        assert store_for("/mem/deeper/t/_lake_log/x") is b
        assert isinstance(store_for(str(tmp_path)), LocalLogStore)
    finally:
        register_store("/mem", None)
        register_store("/mem/deeper", None)
    assert isinstance(store_for("/mem/t1"), LocalLogStore)


def test_log_runs_entirely_on_a_memory_store():
    """write_commit / read_log / list_versions / table_state / checkpoint
    roll-up all flow through the store — no hidden POSIX dependency. 21
    commits cross CHECKPOINT_INTERVAL so the checkpoint path runs too."""
    store = InMemoryStore()
    register_store("/memlake", store)
    try:
        t = "/memlake/tbl"
        for v in range(21):
            lakelog.write_commit(
                t,
                Commit(
                    version=v,
                    operation="APPEND" if v else "CREATE",
                    timestamp_ms=1000 + v,
                    add=[{"path": f"data/f{v}.parquet", "rows": 1}],
                    remove=["data/f0.parquet"] if v == 5 else [],
                    properties={"p": str(v)},
                ),
            )
        with pytest.raises(FileExistsError):
            lakelog.write_commit(
                t, Commit(version=20, operation="APPEND", timestamp_ms=0)
            )
        commit_vs, ckpt_vs = lakelog.list_versions(t)
        assert commit_vs == list(range(21))
        assert ckpt_vs == [20]  # rolled up at the interval
        state = lakelog.table_state(t)
        assert state["version"] == 20
        assert state["properties"]["p"] == "20"
        assert "data/f0.parquet" not in state["active"]
        assert len(state["active"]) == 20
        # time travel reconstructs pre-checkpoint state from raw commits
        assert len(lakelog.table_state(t, 4)["active"]) == 5
        # every object lives in the store, nothing on local disk
        assert all(k.startswith("/memlake/tbl/_lake_log/") for k in store.objects)
        assert not os.path.exists("/memlake")
    finally:
        register_store("/memlake", None)


# --------------------------------------------- OCC/rebase through faults


def _rival_commit(table, version, properties=None, schema_json=None):
    """Publish a racing commit directly via the table's store (what a
    concurrent writer's winning put looks like to this process)."""
    lakelog.write_commit(
        table.path,
        Commit(
            version=version,
            operation="RIVAL",
            timestamp_ms=lakelog.now_ms(),
            properties=properties or {"rival": "1"},
            schema_json=schema_json,
        ),
    )


def test_append_rebases_over_injected_race(spark, tmp_path, fault_store):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), spark.range(3).toDF("id").schema
    )
    t.append(spark.range(3).toDF("id"))
    v = t.version()

    # rival wins version v+1 in the put window -> our append must rebase
    fault_store.on_put = lambda path: (_rival_commit(t, v + 1), True)[1]
    t.append(spark.range(10, 13).toDF("id"))

    assert t.version() == v + 2
    assert lakelog.read_commit(t.path, v + 1).operation == "RIVAL"
    got = sorted(r["id"] for r in t.to_df().collect())
    assert got == [0, 1, 2, 10, 11, 12]  # no rows lost, none doubled
    assert t.properties().get("rival") == "1"  # rival's commit survives


def test_append_collision_with_schema_change_surfaces(spark, tmp_path, fault_store):
    """A rival that EVOLVES THE SCHEMA invalidates the staged rows — the
    collision must surface (no silent rebase) and the orphaned stage must
    be discarded."""
    from pyspark.sql.types import LongType, StructField, StructType

    t = LakeTable.create(
        spark, str(tmp_path / "t"), StructType([StructField("id", LongType())])
    )
    t.append(spark.range(3).toDF("id"))
    v = t.version()
    evolved = StructType(
        [StructField("id", LongType()), StructField("extra", LongType())]
    ).json()
    fault_store.on_put = lambda path: (
        _rival_commit(t, v + 1, schema_json=evolved),
        True,
    )[1]
    files_before = set(t.files())
    with pytest.raises(FileExistsError):
        t.append(spark.range(5, 8).toDF("id"))
    assert t.version() == v + 1  # only the rival landed
    assert set(t.files()) == files_before
    got = sorted(r["id"] for r in t.to_df().collect())
    assert got == [0, 1, 2]


def test_append_replayed_txn_rebase_is_noop(spark, tmp_path, fault_store):
    """If the racing winner carries OUR txn id at >= our version, the
    'race' was a replay of this very transaction — the rebase loop must
    return without publishing duplicate rows."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), spark.range(1).toDF("id").schema
    )
    t.append(spark.range(3).toDF("id"), txn_app_id="app", txn_version=1)
    v = t.version()
    fault_store.on_put = lambda path: (
        _rival_commit(t, v + 1, properties={"txn.app": "2"}),
        True,
    )[1]
    t.append(spark.range(10, 13).toDF("id"), txn_app_id="app", txn_version=2)
    assert t.version() == v + 1  # nothing published beyond the rival
    got = sorted(r["id"] for r in t.to_df().collect())
    assert got == [0, 1, 2]


def test_checkpoint_race_is_benign(tmp_path, fault_store):
    """Two writers rolling up the same checkpoint version: the loser's
    put-if-absent hits FileExistsError and is swallowed (content is
    deterministic for a version, so first-wins is correct)."""
    t = str(tmp_path / "t")
    for v in range(lakelog.CHECKPOINT_INTERVAL):
        lakelog.write_commit(
            t, Commit(version=v, operation="APPEND", timestamp_ms=v)
        )

    ckpt_path = {}

    def steal_checkpoint(path):
        # basename, not path: pytest's tmp_path embeds this test's name,
        # which itself contains the substring "checkpoint"
        if "checkpoint" not in os.path.basename(path):
            return False  # stay armed until the roll-up's own put
        ckpt_path["p"] = path
        fault_store.inner.put_if_absent(path, json.dumps({"version": -99}))
        return True

    fault_store.on_put = steal_checkpoint
    # the interval-th commit triggers the roll-up; hook fires on its
    # checkpoint put (commit puts already happened for earlier versions)
    lakelog.write_commit(
        t,
        Commit(
            version=lakelog.CHECKPOINT_INTERVAL,
            operation="APPEND",
            timestamp_ms=99,
        ),
    )
    _, ckpts = lakelog.list_versions(t)
    assert ckpts == [lakelog.CHECKPOINT_INTERVAL]
    assert "checkpoint" in os.path.basename(ckpt_path["p"])
