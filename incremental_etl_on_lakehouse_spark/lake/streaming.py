"""Micro-batch streaming over LakeTable commits.

The reference wires three continuous dataflows with Spark Structured Streaming
over Delta sources plus ``foreachBatch`` sinks (``notebooks/demo-notebook.py:
158-173,282-287,428-435``). OSS Spark's streaming engine cannot source from our
lake format without a DataSourceV2 implementation, so this module provides the
same micro-batch contract directly: each *table commit* is one micro-batch,
delivered in order to a ``foreachBatch``-style callback, with offsets persisted
to a checkpoint file after each batch (at-least-once delivery — exactly the
guarantee Spark's micro-batch engine gives ``foreachBatch``; end-to-end
effectively-once comes from idempotent MERGE sinks, as in the reference,
``notebooks/demo-notebook.py:262-276``).

Modes:
- ``append``: batch = rows of files added by the commit (Delta streaming-source
  semantics; MERGE rewrites surface like ``ignoreChanges`` re-delivery, which
  the reference's hash-guarded sinks absorb).
- ``cdf``: batch = row-level changes of the commit (Delta ``readChangeFeed``
  streaming semantics, ``notebooks/demo-notebook.py:428-431``).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

from incremental_etl_on_lakehouse_spark.lake.table import LakeTable


class Checkpoint:
    """Tiny durable offset store: last fully processed commit version."""

    def __init__(self, path: str):
        self.path = path

    def read(self) -> int | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f)["last_version"]

    def write(self, version: int) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_version": version}, f)
        os.replace(tmp, self.path)


class LakeStreamReader:
    def __init__(
        self,
        table: LakeTable,
        checkpoint_path: str,
        mode: str = "append",
        starting_version: int = 0,
        max_versions_per_trigger: int = 1,
    ):
        assert mode in ("append", "cdf")
        self.table = table
        self.mode = mode
        self.checkpoint = Checkpoint(checkpoint_path)
        self.starting_version = starting_version
        self.max_versions_per_trigger = max_versions_per_trigger

    def _batch_for(self, version: int) -> DataFrame | None:
        commits = {c.version: c for c in self.table._commits()}
        c = commits.get(version)
        if c is None:
            return None
        if self.mode == "cdf":
            df = self.table.read_changes(version, version)
            return df if df.limit(1).count() else None
        if c.operation == "COMPACT" or not c.add:
            # compaction is physical-only: no new rows for append streams
            return None
        files = [self.table._abs(a["path"]) for a in c.add]
        return self.table._read_files(files)

    def process_available(
        self, fn: Callable[[DataFrame, int], None]
    ) -> int:
        """Run ``fn(batch_df, version)`` for every unprocessed commit, one
        micro-batch per commit (the reference's ``maxFilesPerTrigger=1``
        pacing, ``notebooks/demo-notebook.py:161``). Returns #batches run.
        Equivalent to ``trigger(availableNow=True)`` + ``foreachBatch(fn)``.
        """
        last = self.checkpoint.read()
        next_version = (last + 1) if last is not None else self.starting_version
        latest = self.table.version()
        n = 0
        while next_version <= latest:
            batch = self._batch_for(next_version)
            if batch is not None:
                fn(batch, next_version)
                n += 1
            self.checkpoint.write(next_version)
            next_version += 1
        return n
