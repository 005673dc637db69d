"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented SURVEY.md §2 operator
key from :mod:`incremental_etl_on_lakehouse_spark.queries` together with the
DuckDB oracle SQL the driver compares against at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from incremental_etl_on_lakehouse_spark.queries import (
    ORACLES,
    QUERIES,
    ordered_keys,
)


def _configure(spark: SparkSession) -> None:
    """Session settings the queries rely on, applied to whatever session the
    driver hands us (all are runtime-settable):

    - UTC timezone: the epoch-ms conversions in the oracles assume it;
    - ``nanosAsLong``: ``events.parquet`` stores TIMESTAMP(NANOS), which OSS
      Spark refuses to read natively — the loader converts the resulting
      epoch-nanos BIGINT back to a microsecond timestamp;
    - AQE on, matching the engine's own session factory.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # let AQE re-plan inside cached subtrees (the merge path persists its
    # source; on a default-config session the cached plan's shuffles
    # otherwise keep the full static partition count — 200-task reducers
    # under 4-row aggregates in the driver's bare-session sweeps)
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )
    _ship_package(spark)


_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Ship the engine package to Python workers via ``addPyFile``.

    The Arrow-UDF paths (``mapInPandas`` multimodal decode, pandas_udf
    escape hatch) deserialize closures that import this package on the
    WORKER side. When the driver process was launched from a directory
    where the package doesn't resolve (no PYTHONPATH, different cwd),
    workers would raise ModuleNotFoundError even though the driver
    imported fine via ``sys.path``. Shipping a zip once per SparkContext
    makes the driver contract launch-directory-independent.

    The archive goes to a fresh per-call temp dir: a fixed path would let
    two concurrent driver processes on one machine clobber each other's
    zip while executors are still fetching it (addPyFile copies the file
    into the app's own dir, so the original can be rebuilt freely by
    LATER calls — only a mid-fetch overwrite races).  Shipped state is
    keyed on ``applicationId``, which is unique per context, unlike
    ``id(sc)`` which the allocator can reuse after GC.
    """
    import os
    import shutil
    import tempfile

    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED:
        return
    repo = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(
        tempfile.mkdtemp(prefix="etl_lakehouse_pkg_"),
        "incremental_etl_on_lakehouse_spark_pkg",
    )
    zpath = shutil.make_archive(
        out, "zip", root_dir=repo, base_dir="incremental_etl_on_lakehouse_spark"
    )
    sc.addPyFile(zpath)
    _SHIPPED.add(sc.applicationId)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def with_conf(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return run

    # Ordered: SURVEY §2 contract keys (all oracle-checked) first, then the
    # remaining oracle-checked keys, then rows-only/approximate keys — so a
    # budget-capped correctness sweep verifies the contract surface first.
    return {name: with_conf(QUERIES[name]) for name in ordered_keys()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted for the LSH/approximate
    operators whose hash-seeded candidates aren't SQL-expressible — the
    driver records a weaker rows-only check for those)."""
    return {k: ORACLES[k] for k in ordered_keys() if k in ORACLES}
