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
        max_bytes_per_trigger: int | None = None,
    ):
        assert mode in ("append", "cdf")
        if max_bytes_per_trigger is not None and max_versions_per_trigger != 1:
            # mirror Spark's file source: the two pacing knobs are
            # mutually exclusive ("can't be both set at the same time")
            raise ValueError(
                "max_versions_per_trigger and max_bytes_per_trigger can't "
                "both be set"
            )
        self.table = table
        self.mode = mode
        self.checkpoint = Checkpoint(checkpoint_path)
        self.starting_version = starting_version
        self.max_versions_per_trigger = max_versions_per_trigger
        self.max_bytes_per_trigger = max_bytes_per_trigger

    def _commit_bytes(self, c) -> int:
        """On-disk bytes a commit contributes to a stream batch: its added
        data files plus its CDF sidecar (the row-level payload the ``cdf``
        mode actually reads). Metadata-scale (one stat per file via the
        local layout, same as the table's own size accounting); a file
        already vacuumed reads as 0 — the batch that would need it fails
        downstream anyway."""
        if c is None:
            return 0
        total = 0
        rels = [a["path"] for a in c.add]
        # the sidecar only counts when this reader will actually read it;
        # an append-mode batch reads added data files alone, so charging
        # the sidecar would systematically under-fill append batches
        if c.cdf_path and self.mode == "cdf":
            rels.append(c.cdf_path)
        for rel in rels:
            p = self.table._abs(rel)
            try:
                if os.path.isdir(p):  # Spark-written sidecars are dirs
                    for root, _dirs, files in os.walk(p):
                        for f in files:
                            total += os.path.getsize(os.path.join(root, f))
                else:
                    total += os.path.getsize(p)
            except OSError:
                pass
        return total

    def _batch_for(self, version: int) -> DataFrame | None:
        commits = {c.version: c for c in self.table._commits()}
        return self._batch_for_range(commits, version, version)

    def _batch_for_range(
        self, commits: dict, lo: int, hi: int
    ) -> DataFrame | None:
        if self.mode == "cdf":
            # commit-metadata emptiness probe first: at catch-up pacing the
            # old unconditional limit(1).count() cost one Spark job per
            # replayed commit; the log decides the common cases for free
            hc = self.table.changes_in_range(lo, hi)
            if hc is False:
                return None
            df = self.table.read_changes(lo, hi)
            if hc is None and not df.limit(1).count():
                return None  # undecidable from metadata: row-level probe
            return df
        parts: list[DataFrame] = []
        for v in range(lo, hi + 1):
            c = commits.get(v)
            if c is None or c.operation == "COMPACT" or not c.add:
                # compaction is physical-only: no new rows for append streams
                continue
            files, dvm = [], {}
            for a in c.add:
                files.append(self.table._abs(a["path"]))
                # a commit that re-adds a file can also point it at a
                # deletion vector (RESTORE's dv patch): read through it so
                # DV-deleted rows are never delivered to the stream
                sidecar = (c.dv or {}).get(a["path"])
                if sidecar:
                    dvm[a["path"]] = sidecar
            parts.append(self.table._read_files(files, dv_map=dvm or None))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def process_available(
        self, fn: Callable[[DataFrame, int], None]
    ) -> int:
        """Run ``fn(batch_df, version)`` for every unprocessed commit window.
        With the default ``max_versions_per_trigger=1`` that is one
        micro-batch per commit (the reference's ``maxFilesPerTrigger=1``
        pacing, ``notebooks/demo-notebook.py:161``); larger values coalesce
        up to N commits per batch (``maxFilesPerTrigger=N`` catch-up
        semantics), and ``max_bytes_per_trigger`` instead coalesces up to
        a byte budget (Autoloader's ``cloudFiles.maxBytesPerTrigger`` — a
        SOFT maximum with Spark's exact greedy semantics: whole commits
        while the running total stays within budget, at least one commit
        per batch, boundaries always on commit edges). ``fn`` receives the
        window's LAST version — the offset the checkpoint records. Returns
        #batches run. Equivalent to ``trigger(availableNow=True)`` +
        ``foreachBatch(fn)``, which honors both knobs across ALL catch-up
        batches.
        """
        last = self.checkpoint.read()
        next_version = (last + 1) if last is not None else self.starting_version
        latest = self.table.version()
        # one log read for the whole catch-up, not one per version
        commits = {c.version: c for c in self.table._commits()}
        step = max(1, int(self.max_versions_per_trigger))
        budget = self.max_bytes_per_trigger
        n = 0
        while next_version <= latest:
            if budget is not None:
                hi = next_version
                used = self._commit_bytes(commits.get(hi))
                while hi < latest:
                    b = self._commit_bytes(commits.get(hi + 1))
                    if used + b > budget:
                        break
                    used += b
                    hi += 1
            else:
                hi = min(next_version + step - 1, latest)
            batch = self._batch_for_range(commits, next_version, hi)
            if batch is not None:
                fn(batch, hi)
                n += 1
            self.checkpoint.write(hi)
            next_version = hi + 1
        return n
