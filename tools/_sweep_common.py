"""Shared bootstrap + STRICT compare for the driver-replica tools
(driver_sweep_sim.py, key_check.py).

The compare here is the repo's load-bearing truth: stringified tuples
(str(value) per cell), columns sorted by name, rows sorted — exactly what
the driver hashes. NO float normalization on purpose: the round-7
fn_regexp_extract red row passed a '.10g'-normalized compare ('2.0' vs
'2' equal as Python floats) and failed the driver. Keep ONE copy of this
definition so a future typing-edge fix can't leave one tool validating
with weaker semantics than the other.
"""
import sys

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def make_spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def make_duckdb(sf: str):
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def norm(cols, rows):
    """Driver-strict normalization: columns sorted by name, each row a
    tuple of str(cell) in that column order, rows sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(str(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out
