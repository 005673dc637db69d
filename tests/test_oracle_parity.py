"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry at sf0.001 and compares against
``oracle_sql()`` the way the driver does at sf0.01: row count, column
names, and order-insensitive value comparison (columns sorted by name,
rows sorted by their stringified tuple).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                # mirror a value-hash: exact-ish float comparison
                v = float(f"{v:.10g}")
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def values_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


# Keys whose EMPTY result is the point (a 0 = 0 row-count match anywhere
# else is a vacuous pass — q8's region filter once silently matched
# nothing on both engines, proving exactly nothing).
EMPTY_OK = {"ddl_create_table"}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, ddb):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    if name not in EMPTY_OK:
        assert len(drows) > 0, f"{name}: vacuous — both sides empty"

    _, s_norm = normalize(scols, srows)
    _, d_norm = normalize(dcols, drows)
    mismatches = [
        (i, sr, dr)
        for i, (sr, dr) in enumerate(zip(s_norm, d_norm))
        if not all(values_equal(a, b) for a, b in zip(sr, dr))
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
