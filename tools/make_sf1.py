"""Build the synthetic sf1 fixture: a 10x replication of the driver's
sf0.1 with primary/foreign keys shifted in lockstep per copy — orderkeys,
custkeys, partkeys, suppkeys, event/user ids, doc/vec ids — so join
fan-outs and key cardinality scale WITH the data instead of manufacturing
10-member duplicate clusters. region/nation dims stay fixed (dims grow
slower than facts, like TPC-H). Used for the SCALE.md weak-scaling rows.

    python tools/make_sf1.py [out_dir] [src_dir] [copies]
    # defaults: /tmp/sf1  /root/testdata/sf0.1  10
    # sf10:  python tools/make_sf1.py /tmp/sf10 /tmp/sf1 10

DuckDB-only (no Spark): ~seconds. Offsets are max(key)+1 per key domain,
applied as i * offset for copy i in 0..copies-1. Copy 0 is byte-identical
data (same rows), so the output strictly contains the source's content.
"""
import os
import sys

import duckdb

SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
if OUT.startswith("-"):
    # a flag-like argument is a mistake, not an output directory (a
    # `--help` invocation once wrote 34 MB of parquet into ./--help/)
    sys.exit(f"usage: python tools/make_sf1.py [out_dir]  (got {OUT!r})")
os.makedirs(OUT, exist_ok=True)

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events"
          " documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
    )

off = {
    k: con.sql(f"SELECT max({c}) + 1 FROM {t}").fetchall()[0][0]
    for k, (t, c) in {
        "order": ("orders", "o_orderkey"),
        "cust": ("customer", "c_custkey"),
        "part": ("part", "p_partkey"),
        "supp": ("supplier", "s_suppkey"),
        "event": ("events", "event_id"),
        "user": ("events", "user_id"),
        "doc": ("documents", "doc_id"),
        "vec": ("embeddings", "vec_id"),
    }.items()
}

# (table, select-template with {i} as the copy index) — key columns get
# their domain offset; everything else passes through.
TEMPLATES = {
    "region": None,   # fixed dims: copied once
    "nation": None,
    "customer": f"SELECT c_custkey + {{i}} * {off['cust']} AS c_custkey,"
                " c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
    "supplier": f"SELECT s_suppkey + {{i}} * {off['supp']} AS s_suppkey,"
                " s_name, s_nationkey, s_acctbal FROM supplier",
    "part": f"SELECT p_partkey + {{i}} * {off['part']} AS p_partkey,"
            " p_name, p_brand, p_type, p_size, p_retailprice FROM part",
    "orders": f"SELECT o_orderkey + {{i}} * {off['order']} AS o_orderkey,"
              f" o_custkey + {{i}} * {off['cust']} AS o_custkey,"
              " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
              " FROM orders",
    "lineitem": f"SELECT l_orderkey + {{i}} * {off['order']} AS l_orderkey,"
                f" l_partkey + {{i}} * {off['part']} AS l_partkey,"
                f" l_suppkey + {{i}} * {off['supp']} AS l_suppkey,"
                " l_linenumber, l_quantity, l_extendedprice, l_discount,"
                " l_tax, l_returnflag, l_linestatus, l_shipdate"
                " FROM lineitem",
    "events": f"SELECT event_id + {{i}} * {off['event']} AS event_id, ts,"
              f" user_id + {{i}} * {off['user']} AS user_id,"
              " event_type, value, props FROM events",
    "documents": f"SELECT doc_id + {{i}} * {off['doc']} AS doc_id, text,"
                 " lang, source, n_chars FROM documents",
    "embeddings": f"SELECT vec_id + {{i}} * {off['vec']} AS vec_id,"
                  " embedding, label FROM embeddings",
}

for t, tpl in TEMPLATES.items():
    dst = f"{OUT}/{t}.parquet"
    if tpl is None:
        con.execute(f"COPY (SELECT * FROM {t}) TO '{dst}' (FORMAT PARQUET)")
    else:
        union = " UNION ALL ".join(tpl.format(i=i) for i in range(COPIES))
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}')").fetchall()[0][0]
    print(t, n)
print("sf1 at", OUT)
