"""Driver-replica sweep: first 50 ordered_keys() with a BARE SparkSession
vs the DuckDB oracles at sf0.01 — row count, schema (column names), and
order-insensitive STRINGIFIED-tuple compare (exactly what the driver
hashes: str(value) per cell, columns sorted by name, rows sorted; shared
definition in tools/_sweep_common.py).

Run before each round's rotation lands:

    python tools/driver_sweep_sim.py [sf_dir]

No float normalization on purpose — the round-7 fn_regexp_extract red
row passed the old `.10g`-normalized sim ('2.0' vs '2' compared equal as
Python floats) and failed the driver. The strict compare is the truth.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
from _sweep_common import make_duckdb, make_spark, norm  # noqa: E402

spark = make_spark()
import __spark_entry__ as e  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = make_duckdb(sf)
Q, O = e.queries(), e.oracle_sql()

n_pass = n_fail = 0
for k in list(Q)[:50]:
    t0 = time.time()
    try:
        df = Q[k](spark, sf)
        sc, sr = norm(df.columns, [tuple(r) for r in df.collect()])
        if k not in O:
            print(f"{k}: ROWS-ONLY {len(sr)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        res = con.execute(O[k])
        oc = [d[0] for d in res.description]
        oc, orr = norm(oc, res.fetchall())
        ok = sc == oc and len(sr) == len(orr) and sr == orr
        print(f"{k}: {'PASS' if ok else 'FAIL'} {len(sr)}/{len(orr)} "
              f"({time.time()-t0:.1f}s)")
        n_pass += ok
        n_fail += not ok
        if not ok and sc == oc:
            for a, b in zip(sr, orr):
                if a != b:
                    print("  s:", a, "\n  o:", b)
                    break
        elif not ok:
            print("  cols:", sc, "vs", oc)
    except Exception as ex:  # noqa: BLE001
        print(f"{k}: ERR {type(ex).__name__}: {ex}")
        n_fail += 1
print(f"== {n_pass} pass, {n_fail} fail")
spark.stop()
