"""Targeted driver-replica check: run NAMED keys (instead of the first-50
sweep of driver_sweep_sim.py) with a bare SparkSession vs the DuckDB
oracles — same strict stringified-tuple compare the driver hashes
(shared: tools/_sweep_common.py).

    python tools/key_check.py key1 key2 ... [--sf /root/testdata/sf0.01]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
from _sweep_common import make_duckdb, make_spark, norm  # noqa: E402

args = sys.argv[1:]
sf = "/root/testdata/sf0.01"
if "--sf" in args:
    i = args.index("--sf")
    sf = args[i + 1]
    args = args[:i] + args[i + 2:]

spark = make_spark()
import __spark_entry__ as e  # noqa: E402

con = make_duckdb(sf)
Q, O = e.queries(), e.oracle_sql()

n_fail = 0
for k in args:
    t0 = time.time()
    try:
        df = Q[k](spark, sf)
        sc, sr = norm(df.columns, [tuple(r) for r in df.collect()])
        if k not in O:
            print(f"{k}: ROWS-ONLY {len(sr)} rows ({time.time()-t0:.1f}s)")
            continue
        res = con.execute(O[k])
        oc = [d[0] for d in res.description]
        oc, orr = norm(oc, res.fetchall())
        ok = sc == oc and len(sr) == len(orr) and sr == orr
        if ok:
            print(f"{k}: PASS {len(sr)} rows ({time.time()-t0:.1f}s)")
        else:
            n_fail += 1
            print(f"{k}: FAIL cols {sc == oc} rows {len(sr)}/{len(orr)}")
            if sc != oc:
                print("  spark cols:", sc, "\n  duck cols:", oc)
            # diff as multisets: a single extra/missing row early in one
            # side would misalign a positional zip and print spurious pairs
            only_s, only_o = set(sr) - set(orr), set(orr) - set(sr)
            for s in sorted(only_s)[:3]:
                print("  spark-only:", s)
            for o in sorted(only_o)[:3]:
                print("  duck-only :", o)
    except Exception as ex:
        n_fail += 1
        print(f"{k}: ERROR {type(ex).__name__}: {str(ex)[:300]}")
print(f"{'FAIL' if n_fail else 'OK'} ({len(args) - n_fail}/{len(args)})")
sys.exit(1 if n_fail else 0)
