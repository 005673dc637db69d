"""A minimal versioned lakehouse table format: parquet data + JSON commit log.

The reference gets ACID appends, MERGE upserts, change data feed, and time
travel from Databricks Delta (``notebooks/demo-notebook.py:171-173,244-280,
363-373,533-535``). This environment has no Delta package, so this module
provides the same user-visible semantics natively on Spark + parquet:

- ``_lake_log/<version>.json`` commit files record added/removed data files
  per version (the same idea as Delta's ``_delta_log``).
- Snapshot at version V = union of files added and not yet removed in commits
  <= V; read with one ``spark.read.parquet(*files)``.
- MERGE rewrites only the data files that actually contain matched keys
  (file-level pruning via the join), exactly the property that bounds merge
  cost at 100 TB.
- Change data feed: appends/deletes are synthesized from the commit's file
  lists at read time (no double-write, as in Delta); merges materialize only
  the changed rows under ``_cdf/``.

Single-writer semantics (atomic commit via O_EXCL create). A multi-writer
deployment would put a lightweight commit coordinator in front, as Delta does
with its log store; the on-disk format would not change.
"""

from incremental_etl_on_lakehouse_spark.lake.table import LakeTable
from incremental_etl_on_lakehouse_spark.lake.streaming import LakeStreamReader

__all__ = ["LakeTable", "LakeStreamReader"]
