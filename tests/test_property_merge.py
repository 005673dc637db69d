"""Differential MERGE fuzzing: random multi-clause merges vs a Python model.

DuckDB has no MERGE INTO, so the reference semantics here are a ~30-line
Python model of Delta's rules: per matched target row the FIRST
update/delete clause (in declaration order) whose condition evaluates
TRUE applies (NULL/False falls through; no clause -> row kept); per
unmatched source row the first insert clause that fires inserts; per
unmatched target row the first by-source clause that fires
updates/deletes. Conditions and assignments are drawn from pools that
carry a Python evaluator alongside the SQL text, with NULL-able columns
so three-valued logic is exercised.

This pins the centerpiece operator combinatorially — clause ordering,
conditional fall-through, by-source interaction, assignment expressions
over both sides — beyond what the fixed-scenario keys check.
"""

from __future__ import annotations

import random

import pytest

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.table import MergeClause
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("grp", StringType()),
        StructField("x", LongType()),
    ]
)


def _tv(b):
    """SQL three-valued -> Python bool: NULL is not TRUE."""
    return b is True


# (sql, py(source_row, target_row)) — rows are dicts with id/grp/x.
_MATCH_CONDS = [
    (None, lambda s, t: True),
    ("source.x > 50", lambda s, t: _tv(s["x"] is not None and s["x"] > 50)),
    ("target.x <= 30", lambda s, t: _tv(t["x"] is not None and t["x"] <= 30)),
    ("source.grp = 'a'", lambda s, t: _tv(s["grp"] == "a" if s["grp"] is not None else None)),
    ("source.x > target.x", lambda s, t: _tv(
        s["x"] > t["x"] if s["x"] is not None and t["x"] is not None else None)),
    ("target.grp <> source.grp", lambda s, t: _tv(
        t["grp"] != s["grp"] if t["grp"] is not None and s["grp"] is not None else None)),
]

_INS_CONDS = [
    (None, lambda s: True),
    ("source.x IS NOT NULL", lambda s: s["x"] is not None),
    ("source.grp = 'b'", lambda s: s["grp"] == "b"),
    ("source.id % 2 = 0", lambda s: s["id"] % 2 == 0),
]

_BS_CONDS = [
    (None, lambda t: True),
    ("target.x < 25", lambda t: _tv(t["x"] is not None and t["x"] < 25)),
    ("target.grp = 'c'", lambda t: _tv(t["grp"] == "c" if t["grp"] is not None else None)),
]

# update assignments: (dict-or-star, py(source_row, target_row) -> new row)
_UPD_ASSIGNS = [
    ("*", lambda s, t: dict(s)),
    (
        {"x": "source.x + 1", "grp": "target.grp"},
        lambda s, t: {"id": t["id"], "grp": t["grp"],
                      "x": None if s["x"] is None else s["x"] + 1},
    ),
    (
        {"grp": "'merged'"},
        lambda s, t: {"id": t["id"], "grp": "merged", "x": t["x"]},
    ),
    (
        {"x": "coalesce(target.x, 0) + coalesce(source.x, 0)"},
        lambda s, t: {"id": t["id"], "grp": t["grp"],
                      "x": (t["x"] or 0) + (s["x"] or 0)},
    ),
]

_BS_ASSIGNS = [
    (
        {"grp": "'stale'"},
        lambda t: {"id": t["id"], "grp": "stale", "x": t["x"]},
    ),
    (
        {"x": "coalesce(target.x, 0) - 100"},
        lambda t: {"id": t["id"], "grp": t["grp"], "x": (t["x"] or 0) - 100},
    ),
]


def _rand_rows(rng, ids):
    return [
        (i, rng.choice(["a", "b", "c", None]), rng.choice([None, rng.randint(0, 99)]))
        for i in ids
    ]


def _model(target_rows, source_rows, matched, inserts, by_source):
    """Python reference of the merge result."""
    src_by_id = {r["id"]: r for r in source_rows}
    out = []
    for t in target_rows:
        s = src_by_id.get(t["id"])
        if s is not None:
            fired = None
            for kind, (_, py), assign in matched:
                if py(s, t):
                    fired = (kind, assign)
                    break
            if fired is None:
                out.append(dict(t))
            elif fired[0] == "delete":
                pass
            else:
                out.append(fired[1][1](s, t))
        else:
            fired = None
            for kind, (_, py), assign in by_source:
                if py(t):
                    fired = (kind, assign)
                    break
            if fired is None:
                out.append(dict(t))
            elif fired[0] == "delete_by_source":
                pass
            else:
                out.append(fired[1][1](t))
    matched_ids = {t["id"] for t in target_rows}
    for s in source_rows:
        if s["id"] in matched_ids:
            continue
        for (_, py), assign in inserts:
            if py(s):
                out.append(dict(s) if assign == "*" else assign)
                break
    return sorted(
        (str(r["id"]), str(r["grp"]), str(r["x"])) for r in out
    )


@pytest.mark.parametrize("seed", range(8))
def test_random_multi_clause_merge(spark, tmp_path, seed):
    rng = random.Random(9000 + seed)
    target_rows = _rand_rows(rng, range(20))
    source_ids = sorted(rng.sample(range(30), rng.randint(5, 18)))
    source_rows = _rand_rows(rng, source_ids)

    t = LakeTable.create(spark, str(tmp_path / f"m{seed}"), SCHEMA)
    t.append(spark.createDataFrame(target_rows[:10], SCHEMA).coalesce(1))
    t.append(spark.createDataFrame(target_rows[10:], SCHEMA).coalesce(1))
    src_df = spark.createDataFrame(source_rows, SCHEMA)

    # random clause list: 1-3 matched (update/delete with conditions,
    # final one unconditional half the time), 0-1 insert, 0-1 by-source
    matched = []
    for i in range(rng.randint(1, 3)):
        kind = rng.choice(["update", "delete"])
        cond = rng.choice(_MATCH_CONDS if i < 2 else _MATCH_CONDS[:1])
        assign = rng.choice(_UPD_ASSIGNS) if kind == "update" else None
        matched.append((kind, cond, assign))
    inserts = []
    if rng.random() < 0.8:
        inserts.append((rng.choice(_INS_CONDS), "*"))
    by_source = []
    if rng.random() < 0.5:
        kind = rng.choice(["update_by_source", "delete_by_source"])
        cond = rng.choice(_BS_CONDS)
        assign = rng.choice(_BS_ASSIGNS) if kind == "update_by_source" else None
        by_source.append((kind, cond, assign))

    clauses = []
    for kind, (sql, _), assign in matched:
        clauses.append(
            MergeClause(kind, sql, assign[0] if assign else None)
        )
    for (sql, _), _a in inserts:
        clauses.append(MergeClause("insert", sql, "*"))
    for kind, (sql, _), assign in by_source:
        clauses.append(
            MergeClause(kind, sql, assign[0] if assign else None)
        )

    t.merge(src_df, "source.id = target.id", clauses)

    got = sorted(
        (str(r["id"]), str(r["grp"]), str(r["x"]))
        for r in t.to_df().collect()
    )
    # model: dict rows
    tr = [dict(zip(("id", "grp", "x"), r)) for r in target_rows]
    sr = [dict(zip(("id", "grp", "x"), r)) for r in source_rows]
    want = _model(
        tr, sr,
        [(k, c, a) for k, c, a in matched],
        [(c, a) for c, a in inserts],
        [(k, c, a) for k, c, a in by_source],
    )
    assert got == want, (
        seed,
        [(k, c[0], a[0] if a else None) for k, c, a in matched],
        [c[0] for c, _ in inserts],
        [(k, c[0]) for k, c, _ in by_source],
        got[:6], want[:6],
    )
