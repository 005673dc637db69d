"""Differential DML fuzzing: random UPDATE / DELETE statement sequences
applied to a LakeTable through the SQL front door AND to a DuckDB table
holding identical rows — the two engines' final states must match
exactly (strict stringified compare).

This pins the DML semantics no hand-written oracle covers combinatorially:
NULL-coalesced conditions (a NULL-evaluating predicate keeps the row on
BOTH engines — SQL UPDATE/DELETE semantics), assignment expressions over
the pre-update row, file-pruned rewrites vs whole-table statements, and
deletion-vector vs rewrite execution producing the same logical table.
Statements are drawn from per-column pools with NULL-able columns, so
three-valued logic is exercised, not avoided.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.sql import execute_statement
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("grp", StringType()),
        StructField("x", LongType()),
        StructField("note", StringType()),
    ]
)

_CONDITIONS = [
    "x > 50",                      # NULL x -> row kept (both engines)
    "x <= 20",
    "grp = 'a'",
    "grp <> 'b'",                  # NULL grp -> kept
    "id % 3 = 0",
    "x IS NULL",
    "grp = 'a' AND x > 10",
    "grp = 'b' OR x < 5",
    "note IS NOT NULL AND x > 30",
]

_ASSIGNMENTS = [
    {"x": "x * 2"},
    {"x": "x + 7"},
    {"grp": "'z'"},
    {"x": "id * 10", "grp": "upper(grp)"},
    # concat_ws, not concat: Spark's concat NULL-propagates while
    # DuckDB's skips NULL args — concat_ws skips NULLs on BOTH engines
    {"note": "concat_ws('-', grp, CAST(id AS STRING))"},
    {"x": "coalesce(x, 0) + 1"},
]

# DuckDB spellings for the one Spark-specific token above
_DUCK_REWRITES = {"CAST(id AS STRING)": "CAST(id AS VARCHAR)"}


def _seed_rows(rng: random.Random, n: int):
    rows = []
    for i in range(n):
        grp = rng.choice(["a", "b", "c", None])
        x = rng.choice([None, rng.randint(0, 99)])
        note = rng.choice([None, f"n{i % 5}"])
        rows.append((i, grp, x, note))
    return rows


def _duck_sql(stmt: str) -> str:
    for k, v in _DUCK_REWRITES.items():
        stmt = stmt.replace(k, v)
    return stmt


def _states(t: LakeTable, con: duckdb.DuckDBPyConnection):
    lake = sorted(
        tuple(str(v) for v in (r["id"], r["grp"], r["x"], r["note"]))
        for r in t.to_df().collect()
    )
    duck = sorted(
        tuple(str(v) for v in row)
        for row in con.execute("SELECT id, grp, x, note FROM t").fetchall()
    )
    return lake, duck


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("dv", [False, True])
def test_random_update_delete_sequences(spark, tmp_path, seed, dv):
    rng = random.Random(8000 + seed)
    rows = _seed_rows(rng, 40)

    props = {"enableDeletionVectors": "true"} if dv else None
    t = LakeTable.create(
        spark, str(tmp_path / f"t_{seed}_{dv}"), SCHEMA, properties=props
    )
    # several files so statements exercise file pruning, not one rewrite
    t.append(spark.createDataFrame(rows[:15], SCHEMA).coalesce(1))
    t.append(spark.createDataFrame(rows[15:30], SCHEMA).coalesce(1))
    t.append(spark.createDataFrame(rows[30:], SCHEMA).coalesce(1))

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, grp VARCHAR, x BIGINT, note VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)

    resolve = lambda name: t  # noqa: E731
    for _step in range(rng.randint(3, 6)):
        if rng.random() < 0.5:
            cond = rng.choice(_CONDITIONS)
            stmt = f"DELETE FROM t WHERE {cond}"
        else:
            assigns = rng.choice(_ASSIGNMENTS)
            set_sql = ", ".join(f"{c} = {e}" for c, e in assigns.items())
            cond = rng.choice(_CONDITIONS + [None])
            stmt = f"UPDATE t SET {set_sql}" + (
                f" WHERE {cond}" if cond else ""
            )
        execute_statement(spark, stmt, resolve)
        con.execute(_duck_sql(stmt))
        lake, duck = _states(t, con)
        assert lake == duck, (seed, dv, stmt, lake[:5], duck[:5])
    con.close()
