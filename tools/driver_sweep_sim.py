"""Driver-replica sweep: first 50 ordered_keys() with a BARE SparkSession
vs the DuckDB oracles at sf0.01 — row count, schema (column names), and
order-insensitive STRINGIFIED-tuple compare (exactly what the driver
hashes: str(value) per cell, columns sorted by name, rows sorted).

Run before each round's rotation lands:

    python tools/driver_sweep_sim.py [sf_dir]

No float normalization on purpose — the round-7 fn_regexp_extract red
row passed the old `.10g`-normalized sim ('2.0' vs '2' compared equal as
Python floats) and failed the driver. The strict compare is the truth.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
    )
Q, O = e.queries(), e.oracle_sql()


def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(str(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


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
