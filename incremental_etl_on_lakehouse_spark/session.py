"""SparkSession factory with scale-appropriate defaults.

The reference runs on a managed Databricks runtime and never configures Spark
itself (`notebooks/demo-notebook.py` relies on the ambient session). We run on
OSS Spark, so the session factory is where the 100 TB-minded defaults live:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting, dynamic
  broadcast conversion) — the single biggest lever for plans that must survive
  a 100x scale-up without hand-tuning.
- Arrow on for the few Pandas-UDF code paths (vectorized Python, never row-at-a-time).
- Session timezone pinned to UTC so timestamp semantics are reproducible across
  the engine, the DuckDB oracle, and any cluster deployment.
- ``parquet nanosAsLong`` so nanosecond-precision parquet timestamps (which
  vanilla Spark refuses to read) surface as epoch-nanos BIGINT; the table
  loaders convert to TIMESTAMP explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)


def get_spark(
    app_name: str = "incremental-etl-on-lakehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults.

    On a real cluster, pass ``master=None`` with an externally configured
    master URL; locally this defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-plan INSIDE cached subtrees: the merge path persists
        # its source frame, and without this the cached plan's shuffles
        # keep their full static partition count (a 200-task reducer for
        # a 4-row delta agg) — measurable fixed cost per micro-batch merge
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        # PySpark's DataFrame-debugging wrapper (call-site capture for
        # enriched error messages) pays FOUR extra py4j round trips per
        # DataFrame API call — getActiveSession, a conf.get, and the
        # PySparkCurrentOrigin set/clear — plus a Python stack walk.
        # Profiled at ~25% of all py4j traffic on the merge-heavy scenario
        # keys (3.5k of 14.2k round trips for one view_incremental_join
        # build). Purely diagnostic metadata; the conf exists exactly to
        # turn it off in production (guide §5: the driver should do almost
        # no work per call).
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_LOCAL_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
