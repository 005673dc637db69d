"""Query registry: every SURVEY.md §2 operator key as a (Spark, oracle-SQL) pair.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame; each
oracle is ANSI SQL DuckDB runs over the same parquet tables. The driver
compares row counts, schemas, and order-insensitive value hashes, so:

- every computed column is aliased identically on both sides;
- timestamps are emitted as epoch milliseconds (``unix_millis`` vs
  ``epoch_ns(ts) // 1000000``, explicit floor) — engine-native timestamp rendering never hits the hash;
- aggregates over money-like doubles go through DECIMAL(18,2) (the synthetic
  data is exactly 2-decimal) so sums are order-independent and exact, then
  cast to DOUBLE on both sides;
- CDC keys run a deterministic two-batch scenario derived from ``events``
  (batch 1 = ts < 2024-01-16, batch 2 = rest; operation := DELETE for
  'error' events, UPDATE otherwise) against throwaway lake tables, with the
  post-state expressed as plain latest-row-per-key SQL for the oracle
  (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from collections.abc import Callable

import pandas as pd  # module-level so string type hints in pandas_udfs resolve

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from incremental_etl_on_lakehouse_spark.lake import LakeStreamReader, LakeTable
from incremental_etl_on_lakehouse_spark.lake.table import MergeClause
from incremental_etl_on_lakehouse_spark.operators import spread
from incremental_etl_on_lakehouse_spark.operators import dedup as D
from incremental_etl_on_lakehouse_spark.operators import multimodal as MM
from incremental_etl_on_lakehouse_spark.operators import similarity as SIM
from incremental_etl_on_lakehouse_spark.operators import text as T
from incremental_etl_on_lakehouse_spark.operators.cdc import (
    cdf_signed_deltas,
    dedup_latest,
    merge_agg_delta,
    merge_cdc_batch,
)
from incremental_etl_on_lakehouse_spark.sources.json_source import (
    read_json_auto_batch,
    read_json_batch,
    read_json_stream,
)
from incremental_etl_on_lakehouse_spark.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _tmpdir() -> str:
    return tempfile.mkdtemp(prefix="lakequery-", dir="/tmp")


def MS(col) -> F.Column:
    """timestamp -> epoch ms. Casts to TIMESTAMP first so TIMESTAMP_NTZ
    columns (parquet timestamps without tz, e.g. orders.o_orderdate) are
    accepted; the session tz is pinned UTC so NTZ->LTZ is the identity."""
    col = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(col.cast("timestamp"))

DEC = "decimal(12,2)"   # money columns
DEC4 = "decimal(4,2)"   # ratio columns (discount/tax)

# ---------------------------------------------------------------------------
# CDC scenario shared by the merge/CDF/time-travel/streaming keys.
# ---------------------------------------------------------------------------

TS_SPLIT = "2024-01-16 00:00:00"

SILVER_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts_ms", LongType()),
        StructField("event_type", StringType()),
        StructField("value_cents", LongType()),
        StructField("data_hash", StringType()),
        StructField("cdc_operation", StringType()),
    ]
)
GOLD_SCHEMA = StructType(
    [StructField("event_type", StringType()), StructField("sum_cents", LongType())]
)


_CDC_BATCH_PLANS: dict[tuple[int, str], tuple[DataFrame, DataFrame]] = {}


def _cdc_batches(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    # Memoize the BATCH PLANS (not results): the two DataFrames are
    # immutable logical plans over the same parquet, so rebuilding the
    # projection (md5/epoch exprs — a few hundred py4j round-trips) per
    # scenario is pure planning latency. State caches (_CDC_*_CACHE) clear
    # independently; a cached plan re-executes against the files each run.
    cached = _CDC_BATCH_PLANS.get((id(spark), sf_dir))
    if cached is not None:
        return cached
    ev = load_table(spark, "events", sf_dir)
    cdc = ev.select(
        "user_id",
        MS("ts").alias("ts_ms"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("user_id").cast("string"),
                F.col("event_type"),
                MS("ts").cast("string"),
            )
        ).alias("data_hash"),
        F.when(F.col("event_type") == "error", "DELETE")
        .otherwise("UPDATE")
        .alias("cdc_operation"),
        "ts",
        "event_id",
    )
    b1 = cdc.where(F.col("ts") < TS_SPLIT)
    b2 = cdc.where(F.col("ts") >= TS_SPLIT)
    _CDC_BATCH_PLANS[(id(spark), sf_dir)] = (b1, b2)
    return b1, b2


_CDC_SILVER_CACHE: dict[tuple[int, str], LakeTable] = {}
_CDC_GOLD_CACHE: dict[tuple[int, str], LakeTable] = {}


def _run_cdc_silver(spark: SparkSession, sf_dir: str) -> LakeTable:
    """Create a throwaway Silver lake table and merge both CDC batches.

    Memoized per (session, sf_dir): five query keys (snk_merge,
    merge_cdc_upsert, src_cdf_batch/stream, src_time_travel) read the SAME
    deterministic post-merge state, so one build serves them all — the
    driver's correctness sweep does 1 build instead of 5. The keys only
    read the cached table; nothing mutates it after the build.
    """
    cache_key = (id(spark), sf_dir)
    cached = _CDC_SILVER_CACHE.get(cache_key)
    if cached is not None and os.path.isdir(cached.path):
        return cached
    path = os.path.join(_tmpdir(), "silver")
    silver = LakeTable.create(
        spark,
        path,
        SILVER_SCHEMA,
        properties={"enableChangeDataFeed": "true", "statsColumns": "user_id"},
    )
    for batch in _cdc_batches(spark, sf_dir):
        merge_cdc_batch(
            silver,
            batch.select(
                "user_id", "ts_ms", "event_type", "value_cents", "data_hash",
                "cdc_operation", "ts", "event_id",
            ),
            key_cols=["user_id"],
            order_cols=["ts"],
            tiebreak_cols=["event_id"],
            order_guard_col="ts_ms",
        )
    _CDC_SILVER_CACHE[cache_key] = silver
    return silver


# Oracle CTE fragments reused across CDC keys.
_SQL_CDC = f"""
WITH cdc AS (
  SELECT user_id, (epoch_ns(ts) // 1000000) AS ts_ms, event_type,
         CAST(round(value * 100) AS BIGINT) AS value_cents,
         CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPDATE' END AS cdc_operation,
         ts, event_id
  FROM events
),
b1 AS (SELECT * FROM cdc WHERE ts < TIMESTAMP '{TS_SPLIT}'),
b2 AS (SELECT * FROM cdc WHERE ts >= TIMESTAMP '{TS_SPLIT}'),
s1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM b1) WHERE rn = 1 AND cdc_operation <> 'DELETE'
),
l2 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM b2) WHERE rn = 1
),
final AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM cdc) WHERE rn = 1 AND cdc_operation <> 'DELETE'
)
"""



# Names (including underscored helpers) the section modules pull in via
# ``from ._core import *`` — everything module-level defined or imported
# above.
__all__ = [_n for _n in dict(globals()) if not _n.startswith("__")]
