"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented SURVEY.md §2 operator
key from :mod:`incremental_etl_on_lakehouse_spark.queries` together with the
DuckDB oracle SQL the driver compares against at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from incremental_etl_on_lakehouse_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def with_utc(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # timestamp -> epoch-ms conversions assume a UTC session
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: with_utc(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted for the LSH/approximate
    operators whose hash-seeded candidates aren't SQL-expressible — the
    driver records a weaker rows-only check for those)."""
    return dict(ORACLES)
