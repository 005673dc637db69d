"""incremental_etl_on_lakehouse_spark — a PySpark-native incremental-ETL/lakehouse engine.

A from-scratch, Spark-first re-expression of the capabilities of the reference
repo ``avnish-jain/incremental-etl-on-lakehouse`` (a Databricks medallion-architecture
CDC pipeline demo): JSON CDC logs -> Bronze (streaming append) -> Silver (dedup +
MERGE upsert snapshot) -> Gold (incrementally maintained aggregate via a change feed),
generalized into reusable operators, plus large-scale training-data-pipeline
operators (dedup families, similarity search, multimodal columns, text analysis).

Everything is built on the public Apache Spark DataFrame/SQL/Structured-Streaming
APIs. Because this environment has no Delta Lake package, the versioned-table
capabilities the reference gets from Delta (ACID append/MERGE, change data feed,
time travel) are provided by a small parquet + JSON-commit-log table format in
:mod:`incremental_etl_on_lakehouse_spark.lake` with the same user-visible semantics.
"""

from incremental_etl_on_lakehouse_spark.session import get_spark
from incremental_etl_on_lakehouse_spark.tables import load_table, register_views

__all__ = ["get_spark", "load_table", "register_views"]

__version__ = "0.1.0"
