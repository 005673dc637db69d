"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry at sf0.001 and compares against
``oracle_sql()`` the way the driver does at sf0.01: row count, column
names, and an order-insensitive hash of STRINGIFIED tuples (columns
sorted by name, rows sorted).

The stringified compare is the load-bearing part: the driver hashes
``str(value)``, so ``2.0`` (DuckDB DOUBLE) and ``2`` (Spark BIGINT) are
DIFFERENT even though Python's ``2.0 == 2`` is True.  The round-7
``fn_regexp_extract`` red row slipped through precisely because the old
gate compared Python values; this gate compares what the driver hashes.

A type-class check (Spark dtype vs DuckDB ``DESCRIBE``) runs first so
typing drift is caught even for columns whose current sf0.001 values
happen to stringify identically (e.g. an all-integer-valued DOUBLE).
"""

from __future__ import annotations

import re

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


def repr_class(dtype: str) -> str:
    """Collapse a Spark dtype / DuckDB DESCRIBE type into the class that
    determines its ``str(value)`` rendering — two columns are hash-safe
    iff their classes match (ints of any width all print the same;
    DOUBLE vs BIGINT do not)."""
    t = dtype.strip().lower()
    if t.endswith("[]"):  # DuckDB array spelling
        return f"arr<{repr_class(t[:-2])}>"
    m = re.fullmatch(r"array<(.+)>", t)
    if m:
        return f"arr<{repr_class(m.group(1))}>"
    m = re.fullmatch(r"(?:decimal|numeric)\((\d+),\s*(\d+)\)", t)
    if m:
        scale = int(m.group(2))
        # Decimal('2') prints like int 2; Decimal('2.00') does not.
        return "int" if scale == 0 else f"dec({scale})"
    if t in ("hugeint", "uhugeint"):
        # NOT the int class: locally fetchall() renders HUGEINT as a Python
        # int, but driver-side fetch paths differ (DuckDB 1.0 fetchdf()
        # converts HUGEINT to float64 — "310.0" vs "310"), so an un-CAST
        # DuckDB sum(BIGINT) oracle hash-flips on the driver while passing
        # here. Giving HUGEINT its own class forces every oracle to CAST —
        # the win_range_interval/win_range_rolling_ms r8-r10 red rows.
        return "hugeint"
    if t in ("tinyint", "smallint", "int", "integer", "bigint",
             "utinyint", "usmallint", "uinteger", "ubigint", "long", "short",
             "byte"):
        return "int"
    if t in ("float", "real"):
        return "float32"
    if t == "double":
        return "float64"
    if t in ("string", "varchar", "text", "char"):
        return "str"
    if t in ("boolean", "bool"):
        return "bool"
    if t == "date":
        return "date"
    if t in ("timestamp", "timestamp_ntz", "datetime"):
        return "ts"
    if "time zone" in t or t == "timestamptz":
        return "tstz"
    if t in ("binary", "blob", "bytea"):
        return "bytes"
    return t  # map/struct/other: compare raw


def stringify(cols, rows):
    """The driver's hash input: columns sorted by name, every value
    rendered with str(), rows sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(str(row[i]) for i in order) for row in rows)
    return [cols[i] for i in order], out


# Keys whose EMPTY result is the point (a 0 = 0 row-count match anywhere
# else is a vacuous pass — q8's region filter once silently matched
# nothing on both engines, proving exactly nothing).
EMPTY_OK = {"ddl_create_table"}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, ddb):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    stypes = dict(sdf.dtypes)
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"

    # Type-class parity: value-independent, so it fires even when the
    # sf0.001 sample happens to stringify identically on both sides.
    desc = ddb.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    dtypes = {row[0]: row[1] for row in desc}
    class_mismatch = {
        c: (stypes[c], dtypes[c])
        for c in scols
        if repr_class(stypes[c]) != repr_class(dtypes[c])
    }
    assert not class_mismatch, (
        f"{name}: hash-unsafe column types (spark vs oracle): {class_mismatch}"
    )

    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    if name not in EMPTY_OK:
        assert len(drows) > 0, f"{name}: vacuous — both sides empty"

    _, s_norm = stringify(scols, srows)
    _, d_norm = stringify(dcols, drows)
    mismatches = [
        (i, sr, dr) for i, (sr, dr) in enumerate(zip(s_norm, d_norm)) if sr != dr
    ]
    assert not mismatches, f"{name}: first stringified mismatches {mismatches[:3]}"


# Every oracle output column must stringify IDENTICALLY on every DuckDB
# fetch path (fetchall, fetchdf, arrow): the r8-r10 driver-red pair was an
# un-CAST sum() returning HUGEINT, which fetchall renders as int ("310")
# but fetchdf as float64 ("310.0") — invisible locally, red on the driver.
# The same divergence exists for raw DECIMAL, UUID, INTERVAL, and
# TIMESTAMPTZ outputs, so the registry bans them outright: timestamps are
# emitted as epoch-ms BIGINTs by convention (_core docstring) and money
# goes DECIMAL(18,2)-exact internally but CASTs to DOUBLE on both sides.
# Extending this set requires proving the new type's rendering is
# fetch-path-invariant first.
SAFE_ORACLE_OUTPUT_TYPES = {"bigint", "integer", "varchar", "boolean", "double"}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_fetch_path_safe(name, ddb):
    desc = ddb.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    bad = {
        col: typ
        for col, typ, *_ in desc
        if typ.lower().split("(")[0] not in SAFE_ORACLE_OUTPUT_TYPES
    }
    assert not bad, (
        f"{name}: oracle output types outside the fetch-path-safe "
        f"whitelist {sorted(SAFE_ORACLE_OUTPUT_TYPES)}: {bad} — CAST them "
        "(the HUGEINT/DECIMAL driver-rendering hazard)"
    )


def test_hugeint_is_its_own_class(ddb):
    """An injected un-CAST DuckDB ``sum(BIGINT)`` (→ HUGEINT) must FAIL the
    type-class gate against Spark's BIGINT sum — the r8-r10 driver-red
    hazard class this gate was blind to when hugeint collapsed into int."""
    desc = ddb.execute(
        "DESCRIBE SELECT sum(CAST(1 AS BIGINT)) AS s"
    ).fetchall()
    assert desc[0][1].lower() == "hugeint"  # the hazard exists in this build
    assert repr_class(desc[0][1]) == "hugeint"
    assert repr_class("bigint") == "int"
    assert repr_class(desc[0][1]) != repr_class("bigint")
    # and the CAST fix restores parity
    desc2 = ddb.execute(
        "DESCRIBE SELECT CAST(sum(CAST(1 AS BIGINT)) AS BIGINT) AS s"
    ).fetchall()
    assert repr_class(desc2[0][1]) == "int"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
