"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events documents
embeddings — one parquet file per table under ``<sf_dir>/<name>.parquet``.

``events.ts`` is stored as parquet TIMESTAMP(NANOS), which OSS Spark cannot read
natively; with ``spark.sql.legacy.parquet.nanosAsLong=true`` it surfaces as epoch
nanoseconds BIGINT and we convert it to a microsecond TIMESTAMP here (the data
carries at most microsecond precision, so the conversion is lossless and matches
what DuckDB sees).

At 100 TB these would be multi-file partitioned datasets; loading stays identical
(``spark.read.parquet`` over a directory), and all downstream operators are
written against the DataFrame schema, not the file layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one synthetic table; normalizes ``events.ts`` to TIMESTAMP."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # epoch-nanos BIGINT (legacy nanosAsLong) -> microsecond TIMESTAMP.
        # Integer `div`, not `/`: float division loses precision above 2^53.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every synthetic table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
