"""Timestamp-unit proofing for the oracle registry.

Round 8's only driver red (`win_range_interval`, rows+schema match / hash
mismatch, non-reproducible under local DuckDB 1.0.0) was diagnosed as a
timestamp-precision sensitivity: an oracle engine that reads the parquet
timestamp column at a different unit (e.g. a DuckDB build surfacing
TIMESTAMP_NS) can frame a `RANGE ... INTERVAL` window or order peers
differently than Spark's microsecond-truncated cast.  The round-9 fix
frames over BIGINT epoch-ms on BOTH sides; this module makes the whole
hazard class permanent:

1. **Data pin** — every timestamp column in the testdata tables is
   microsecond-unit parquet.  All registry oracles that ORDER BY a raw
   `ts` carry an integer tiebreaker (`event_id`), so with exact-µs data
   any read unit ≥ µs produces the same order and the same interval
   differences.  If the driver ever regenerates data at ns precision,
   this test goes red before a sweep does.

2. **No INTERVAL RANGE frames** — a `RANGE BETWEEN INTERVAL ...` frame
   is the one construct whose boundary arithmetic happens in the
   engine's native unit; the registry bans it (integerize to epoch-ms
   and frame `RANGE BETWEEN <ms> PRECEDING` instead).

3. **Forced-ns replay** — every oracle that touches a timestamp column
   re-runs against views whose timestamp columns are CAST to
   TIMESTAMP_NS, and must produce byte-identical driver-normalized
   output vs the default-unit views.  This is the closest local replica
   of "the driver's DuckDB reads parquet timestamps at ns".
"""

from __future__ import annotations

import re

import duckdb
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
# discovered by scanning parquet schemas; pinned so a data regen that adds
# a timestamp column somewhere forces this file to be revisited
TS_COLS = {
    "events": ["ts"],
    "lineitem": ["l_shipdate"],
    "orders": ["o_orderdate"],
}

ORACLES = entrymod.oracle_sql()


def test_testdata_timestamps_are_microsecond_unit(sf_dir):
    """Pin the parquet physical unit: µs everywhere, no ns columns."""
    seen = {}
    for t in TABLES:
        sch = pq.ParquetFile(f"{sf_dir}/{t}.parquet").schema_arrow
        cols = [f.name for f in sch if str(f.type).startswith("timestamp")]
        for f in sch:
            st = str(f.type)
            if st.startswith("timestamp"):
                assert st == "timestamp[us]", (t, f.name, st)
        if cols:
            seen[t] = cols
    assert seen == TS_COLS


def test_no_interval_range_frames_in_registry():
    """RANGE frames must be integerized (epoch-ms), never INTERVAL —
    interval frame arithmetic runs in the oracle engine's native
    timestamp unit and is the one construct µs-exact data can't proof.
    Checks BOTH the oracle SQL and the Spark-side SQL text (module
    source), since the hash needs both engines framing identically."""
    import incremental_etl_on_lakehouse_spark as pkg
    import inspect
    import os

    pat = re.compile(r"RANGE\s+BETWEEN\s+INTERVAL", re.I)
    for key, sql in ORACLES.items():
        assert not pat.search(sql), f"oracle {key} uses an INTERVAL RANGE frame"
    root = os.path.dirname(inspect.getfile(pkg))
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if fn.endswith(".py"):
                src = open(os.path.join(dirpath, fn)).read()
                assert not pat.search(src), f"{fn} uses an INTERVAL RANGE frame"


def _norm(res):
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        tuple(str(r[i]) for i in order) for r in res.fetchall()
    )
    return [cols[i] for i in order], rows


def _connect(sf_dir: str, ns: bool) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        if ns and t in TS_COLS:
            casts = ", ".join(
                f"CAST({c} AS TIMESTAMP_NS) AS {c}" for c in TS_COLS[t]
            )
            con.execute(
                f"CREATE VIEW {t} AS SELECT * REPLACE ({casts})"
                f" FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        else:
            con.execute(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    return con


def _ts_sensitive_keys():
    """Every oracle whose SQL references a table with a timestamp column
    AND mentions one of its timestamp column names."""
    names = {c for cols in TS_COLS.values() for c in cols}
    pat = re.compile(r"\b(" + "|".join(names) + r")\b", re.I)
    return sorted(k for k, sql in ORACLES.items() if pat.search(sql))


KEYS = _ts_sensitive_keys()


def test_ts_sensitive_keys_discovered():
    # sanity: the scan finds the known hazard sites
    for expected in ("win_range_interval", "win_row_number_dedup"):
        assert expected in KEYS


@pytest.fixture(scope="module")
def cons(sf_dir):
    us = _connect(sf_dir, ns=False)
    ns = _connect(sf_dir, ns=True)
    yield us, ns
    us.close()
    ns.close()


@pytest.mark.parametrize("key", KEYS)
def test_oracle_is_timestamp_unit_proof(cons, key):
    """The oracle must return identical driver-normalized output whether
    the engine reads timestamps at µs or ns precision."""
    us, ns = cons
    c_us, r_us = _norm(us.execute(ORACLES[key]))
    c_ns, r_ns = _norm(ns.execute(ORACLES[key]))
    assert c_us == c_ns, key
    assert r_us == r_ns, (
        key,
        [x for x in r_us if x not in set(r_ns)][:3],
        [x for x in r_ns if x not in set(r_us)][:3],
    )


# ---------------------------------------------------------------------------
# 4. Rounding-mode replay (round-10 task 2): pin the µs->ms ROUNDING hazard
# class alongside the unit class.  An oracle build whose ms conversion
# ROUNDS instead of FLOORS would flip every ts_ms cell whose timestamp
# carries a >=500 µs sub-ms remainder (431/885 rows on the
# win_range_interval slice at sf0.01).  Construction: view set A truncates
# every timestamp to exact milliseconds; view set B is A shifted by exactly
# +500 µs (the round-half-up boundary).  Relative order, ms-frame
# membership, and every whole-ms quantity are identical between A and B for
# a FLOORING oracle — byte-identical driver-normalized output.  A rounding
# conversion moves every B cell up 1 ms and the test reds.  Oracles must
# therefore integerize with explicit floor division (epoch_ns(ts)//1000000)
# or a conversion proven to floor.
# ---------------------------------------------------------------------------


def _connect_ms_shift(sf_dir: str, shift_us: int) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        if t in TS_COLS:
            casts = ", ".join(
                f"CAST(date_trunc('milliseconds', {c}) AS TIMESTAMP)"
                f" + INTERVAL {shift_us} MICROSECOND AS {c}"
                for c in TS_COLS[t]
            )
            con.execute(
                f"CREATE VIEW {t} AS SELECT * REPLACE ({casts})"
                f" FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        else:
            con.execute(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    return con


@pytest.fixture(scope="module")
def cons_rounding(sf_dir):
    a = _connect_ms_shift(sf_dir, 0)
    b = _connect_ms_shift(sf_dir, 500)
    yield a, b
    a.close()
    b.close()


@pytest.mark.parametrize("key", KEYS)
def test_oracle_is_rounding_mode_proof(cons_rounding, key):
    """The oracle's output must not move when every timestamp sits exactly
    on the half-millisecond boundary — i.e. its ms conversions floor."""
    a, b = cons_rounding
    c_a, r_a = _norm(a.execute(ORACLES[key]))
    c_b, r_b = _norm(b.execute(ORACLES[key]))
    assert c_a == c_b, key
    assert r_a == r_b, (
        key,
        [x for x in r_a if x not in set(r_b)][:3],
        [x for x in r_b if x not in set(r_a)][:3],
    )
