"""Schema-evolution interleaving fuzzer: random RENAME / ADD / DROP
COLUMN mixed with appends and updates, checked against a Python model —
including the per-version schema contract: time travel to version v must
project v's OWN column set (column mapping keeps physical files valid
across renames/drops, so the logical schema is what changes).

Fixed scenarios cover each ALTER in isolation; this covers the
interactions: rename-then-drop, add-then-rename-the-new-column, appends
whose files were written under three different logical schemas all
reconstructing correctly at every version.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable

_BASE = StructType(
    [
        StructField("id", LongType()),
        StructField("grp", StringType()),
        StructField("v0", LongType()),
    ]
)


def _snap(t: LakeTable, cols, version=None) -> frozenset:
    df = t.to_df(version=version)
    assert df.columns == cols, (df.columns, cols)
    return frozenset(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("mode", ["plain", "rtdv"])
@pytest.mark.parametrize("seed", range(4))
def test_random_schema_evolution_interleavings(spark, tmp_path, seed, mode):
    """``mode="rtdv"`` runs the same interleavings with row tracking AND
    deletion vectors live, plus DV deletes in the op mix — RENAME/ADD/
    DROP under rt+dv together is the interaction the fixed tests don't
    reach. The rt model: a surviving logical row's _row_id NEVER changes
    across any op (rename, drop, add, update rewrite, DV delete of its
    neighbors), and current ids are always distinct."""
    rng = random.Random(9900 + seed)
    props = (
        {
            "enableRowTracking": "true",
            "enableDeletionVectors": "true",
        }
        if mode == "rtdv"
        else None
    )
    t = LakeTable.create(
        spark, str(tmp_path / f"schema_{seed}_{mode}"), _BASE, properties=props
    )

    rid_by_id: dict = {}

    def check_row_ids(op):
        if mode != "rtdv":
            return
        cur = {
            r["id"]: r["_row_id"]
            for r in t.to_df(with_row_ids=True).collect()
        }
        assert len(set(cur.values())) == len(cur), (seed, op, "dup row ids")
        for k, rid in cur.items():
            if k in rid_by_id:
                assert rid == rid_by_id[k], (seed, op, k, rid, rid_by_id[k])
        rid_by_id.clear()
        rid_by_id.update(cur)
    cols = ["id", "grp", "v0"]  # current logical schema, in order
    rows: list[dict] = []  # model: one dict per row, keys == cols
    next_id = 0
    next_col = 1
    next_name = 0
    # version -> (column list, frozenset of row tuples in that order)
    history = {t.version(): (list(cols), frozenset())}

    def spark_schema():
        return StructType(
            [
                StructField(
                    c, StringType() if c.startswith("grp") else LongType()
                )
                for c in cols
            ]
        )

    def do_append():
        nonlocal next_id
        k = rng.randint(2, 4)
        new = []
        for _ in range(k):
            d = {}
            for c in cols:
                if c == "id":
                    d[c] = next_id
                    next_id += 1
                elif c.startswith("grp"):
                    d[c] = rng.choice("abc")
                else:
                    d[c] = rng.randint(0, 99)
            new.append(d)
        t.append(
            spark.createDataFrame(
                [tuple(d[c] for c in cols) for d in new], spark_schema()
            )
        )
        rows.extend(new)

    do_append()
    history[t.version()] = (
        list(cols),
        frozenset(tuple(d[c] for c in cols) for d in rows),
    )

    check_row_ids("init")
    for _ in range(7):
        numeric = [c for c in cols if c not in ("id",) and not c.startswith("grp")]
        op = rng.choice(
            ["append", "rename", "add", "drop", "update", "delete"]
        )
        if op == "append":
            do_append()
        elif op == "delete":
            k = rng.choice([2, 3, 5])
            t.delete(f"id % {k} = 0")
            rows[:] = [d for d in rows if d["id"] % k != 0]
        elif op == "rename":
            src = rng.choice([c for c in cols if c != "id"])
            dst = f"r{next_name}_{src}" if not src.startswith("grp") else f"grp_r{next_name}"
            next_name += 1
            t.rename_column(src, dst)
            cols[cols.index(src)] = dst
            for d in rows:
                d[dst] = d.pop(src)
        elif op == "add":
            name = f"v{next_col}"
            next_col += 1
            t.add_columns([(name, LongType())])
            cols.append(name)
            for d in rows:
                d[name] = None  # existing rows read NULL for new columns
        elif op == "drop":
            droppable = [c for c in cols if c != "id" and len(cols) > 2]
            if not droppable:
                continue
            victim = rng.choice(droppable)
            t.drop_column(victim)
            cols.remove(victim)
            for d in rows:
                d.pop(victim, None)
        elif op == "update":
            if not numeric:
                continue
            target = rng.choice(numeric)
            t.update({target: f"{target} + 1000"}, condition="id % 2 = 0")
            for d in rows:
                if d["id"] % 2 == 0 and d[target] is not None:
                    d[target] += 1000
        history[t.version()] = (
            list(cols),
            frozenset(tuple(d[c] for c in cols) for d in rows),
        )
        assert _snap(t, cols) == history[t.version()][1], (seed, op)
        check_row_ids(op)

    # per-version schema + data: every version reconstructs under its
    # own column set, across files written under earlier schemas
    for v, (vcols, expected) in history.items():
        assert _snap(t, vcols, version=v) == expected, (seed, "version", v)


@pytest.mark.parametrize("seed", range(3))
def test_random_evolution_with_identity_and_generated(spark, tmp_path, seed):
    """Identity + generated columns under evolution interleavings. The
    table carries ``rid`` (IDENTITY 1,1: engine-assigned, auto-listed in
    statsColumns) and ``gv`` (GENERATED ALWAYS AS id*10, backed by an
    implicit CHECK). Appends omit both; the engine assigns/computes.
    Invariants fuzzed per step:

    - the visible (non-rid) projection matches the model at HEAD and at
      every historical version (gv modeled as id*10 — updates never touch
      id, so the generation expression holds for the row's lifetime);
    - rid values stay unique across arbitrary append/evolution orders;
    - rename/drop of the protected columns (rid: statsColumns; gv:
      generated; id: referenced by gv's CHECK) refuse cleanly and leave
      both schema and data byte-identical.
    """
    rng = random.Random(6600 + seed)
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("grp", StringType()),
            StructField("v0", LongType()),
            StructField("rid", LongType()),
            StructField("gv", LongType()),
        ]
    )
    t = LakeTable.create(
        spark,
        str(tmp_path / f"idgen_{seed}"),
        schema,
        properties={"identity.rid": "1,1", "generated.gv": "id * 10"},
    )
    cols = ["id", "grp", "v0", "rid", "gv"]  # logical order
    visible = lambda: [c for c in cols if c != "rid"]
    rows: list[dict] = []  # model keyed by visible cols
    next_id = 0
    next_col = 1
    next_name = 0
    history = {t.version(): (visible(), frozenset())}

    def append_schema():
        supplied = [c for c in cols if c not in ("rid", "gv")]
        return supplied, StructType(
            [
                StructField(
                    c, StringType() if c.startswith("grp") else LongType()
                )
                for c in supplied
            ]
        )

    def do_append():
        nonlocal next_id
        supplied, sschema = append_schema()
        new = []
        for _ in range(rng.randint(2, 4)):
            d = {}
            for c in supplied:
                if c == "id":
                    d[c] = next_id
                    next_id += 1
                elif c.startswith("grp"):
                    d[c] = rng.choice("abc")
                else:
                    d[c] = rng.randint(0, 99)
            d["gv"] = d["id"] * 10  # model the generation expression
            new.append(d)
        t.append(
            spark.createDataFrame(
                [tuple(d[c] for c in supplied) for d in new], sschema
            )
        )
        rows.extend(new)

    def snap(vcols, version=None):
        df = t.to_df(version=version)
        # that version's logical schema = its visible columns + rid
        assert set(df.columns) == set(vcols) | {"rid"}, (df.columns, vcols)
        return frozenset(
            tuple(r[c] for c in vcols) for r in df.collect()
        )

    do_append()
    history[t.version()] = (
        visible(),
        frozenset(tuple(d[c] for c in visible()) for d in rows),
    )

    for _ in range(7):
        op = rng.choice(["append", "rename", "add", "drop", "update",
                         "illegal"])
        if op == "append":
            do_append()
        elif op == "rename":
            candidates = [
                c for c in cols if c not in ("id", "rid", "gv")
            ]
            src = rng.choice(candidates)
            dst = (
                f"grp_r{next_name}" if src.startswith("grp")
                else f"r{next_name}_{src}"
            )
            next_name += 1
            t.rename_column(src, dst)
            cols[cols.index(src)] = dst
            for d in rows:
                d[dst] = d.pop(src)
        elif op == "add":
            name = f"v{next_col}"
            next_col += 1
            t.add_columns([(name, LongType())])
            cols.append(name)
            for d in rows:
                d[name] = None
        elif op == "drop":
            droppable = [
                c for c in cols
                if c not in ("id", "rid", "gv") and len(cols) > 4
            ]
            if not droppable:
                continue
            victim = rng.choice(droppable)
            t.drop_column(victim)
            cols.remove(victim)
            for d in rows:
                d.pop(victim, None)
        elif op == "update":
            numeric = [
                c for c in cols
                if c not in ("id", "rid", "gv") and not c.startswith("grp")
            ]
            if not numeric:
                continue
            target = rng.choice(numeric)
            t.update({target: f"{target} + 1000"}, condition="id % 2 = 0")
            for d in rows:
                if d["id"] % 2 == 0 and d[target] is not None:
                    d[target] += 1000
        elif op == "illegal":
            # protected-column mutations refuse cleanly, nothing changes
            before_schema = t.schema().json()
            before_rows = snap(visible())
            action = rng.choice(
                [
                    lambda: t.rename_column("rid", "x_rid"),
                    lambda: t.drop_column("gv"),
                    lambda: t.rename_column("id", "x_id"),
                    lambda: t.drop_column("rid"),
                ]
            )
            with pytest.raises(ValueError):
                action()
            assert t.schema().json() == before_schema, (seed, "illegal")
            assert snap(visible()) == before_rows, (seed, "illegal")
            continue  # no commit: skip the history update
        history[t.version()] = (
            visible(),
            frozenset(tuple(d[c] for c in visible()) for d in rows),
        )
        assert snap(visible()) == history[t.version()][1], (seed, op)
        # identity uniqueness at HEAD after every committed op
        rids = [r["rid"] for r in t.to_df().select("rid").collect()]
        assert len(rids) == len(set(rids)) == len(rows), (seed, op, "rid")

    for v, (vcols, expected) in history.items():
        assert snap(vcols, version=v) == expected, (seed, "version", v)
