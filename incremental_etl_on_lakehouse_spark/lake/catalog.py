"""A filesystem-backed table catalog: database.table -> lake-table path.

The reference addresses tables through a 3-level Unity Catalog namespace and
creates/drops databases with SQL DDL (``notebooks/demo-notebook.py:80-82,
104-110``). OSS Spark has a single ``spark_catalog``; this module provides
the database/table layer over the lake format: a root directory, one
subdirectory per database, one lake table per table directory — plus temp-view
registration so ``spark.sql`` can query catalog tables by name.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from incremental_etl_on_lakehouse_spark.lake.table import LakeTable


class LakeCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        self._view_owners: dict[str, tuple[str, str]] = {}
        os.makedirs(self.root, exist_ok=True)

    # ------------------------------------------------------------ databases

    def _db_path(self, db: str) -> str:
        return os.path.join(self.root, db)

    def create_database(self, db: str, if_not_exists: bool = True) -> None:
        """``CREATE DATABASE IF NOT EXISTS`` (ref :105)."""
        path = self._db_path(db)
        if os.path.isdir(path) and not if_not_exists:
            raise ValueError(f"database exists: {db}")
        os.makedirs(path, exist_ok=True)

    def drop_database(self, db: str, cascade: bool = False) -> None:
        """``DROP DATABASE [CASCADE]`` (ref :106)."""
        path = self._db_path(db)
        if not os.path.isdir(path):
            return
        if os.listdir(path) and not cascade:
            raise ValueError(f"database not empty: {db} (use cascade=True)")
        shutil.rmtree(path)

    def databases(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root) if os.path.isdir(self._db_path(d))
        )

    # --------------------------------------------------------------- tables

    def _table_path(self, db: str, name: str) -> str:
        return os.path.join(self._db_path(db), name)

    def create_table(
        self,
        db: str,
        name: str,
        schema: StructType,
        properties: dict | None = None,
        partition_by: list[str] | None = None,
        if_not_exists: bool = False,
    ) -> LakeTable:
        """``CREATE TABLE (cols...) TBLPROPERTIES(...)`` (ref :211-227)."""
        self.create_database(db)
        return LakeTable.create(
            self.spark,
            self._table_path(db, name),
            schema,
            properties=properties,
            partition_by=partition_by,
            if_not_exists=if_not_exists,
        )

    def drop_table(self, db: str, name: str) -> None:
        """``DROP TABLE IF EXISTS`` (ref :211,349)."""
        LakeTable.drop(self._table_path(db, name))

    def table(self, db: str, name: str) -> LakeTable:
        path = self._table_path(db, name)
        if not LakeTable.exists(path):
            raise ValueError(f"no such table: {db}.{name}")
        return LakeTable(self.spark, path)

    def tables(self, db: str) -> list[str]:
        path = self._db_path(db)
        if not os.path.isdir(path):
            return []
        return sorted(
            t for t in os.listdir(path) if LakeTable.exists(os.path.join(path, t))
        )

    def register_views(self, db: str, version: int | None = None) -> None:
        """Expose every table of ``db`` as ``<db>_<table>`` temp views so
        ``spark.sql`` queries can address them (the OSS stand-in for the
        reference's ``${db.x}`` SQL parameterization, ref :85-89)."""
        # Ownership is derived from CURRENT catalog contents at register
        # time, not a grow-only instance dict: a dict would keep a dropped
        # table's claim forever (recreating a differently-owned table that
        # maps to the same view name would raise in that instance), while a
        # fresh catalog instance would bypass the check entirely.
        owners: dict[str, tuple[str, str]] = {}
        for d in self.databases():
            for t in self.tables(d):
                view = f"{d}_{t}"
                if view in owners and owners[view] != (d, t):
                    # '_' is ambiguous: db 'raw' + table 'events_2024' and
                    # db 'raw_events' + table '2024' both map to
                    # 'raw_events_2024' — replacing silently would point
                    # queries at the wrong table with no error
                    other = owners[view]
                    raise ValueError(
                        f"temp view name collision: {view!r} maps to both "
                        f"{other[0]}.{other[1]} and {d}.{t}"
                    )
                owners[view] = (d, t)
        self._view_owners = owners
        for name in self.tables(db):
            view = f"{db}_{name}"
            self.table(db, name).to_df(version).createOrReplaceTempView(view)
