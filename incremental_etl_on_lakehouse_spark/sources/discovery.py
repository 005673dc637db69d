"""Incremental landing-zone discovery: the Autoloader-contract ledger.

The reference ingests with Autoloader (``notebooks/demo-notebook.py:
158-167``), whose defining property at scale is that a trigger does
O(new files) work, not O(all files ever landed). Spark's built-in file
stream source re-lists the whole directory every micro-batch and keeps
an ever-growing seen-file map in its checkpoint — a driver stall once a
landing zone accumulates millions of files. :class:`LandingLedger`
replaces that with a persisted (watermark, boundary) pair:

- ``watermark_ns`` — the highest landing mtime fully ingested.
- ``boundary`` — the file names AT the watermark tick (mtime ties are
  the one ambiguity a scalar watermark can't resolve).
- ``pending`` — a write-ahead intent for the file currently being
  processed, making crash recovery deterministic: restart replays
  exactly the interrupted (file, batch_id); the sink's idempotent-txn
  guard turns a replay of an already-committed append into a no-op.
- ``extra_seen`` — migration shim: files already ingested by an older
  checkpoint mechanism (reconstructed from Bronze/quarantine file
  provenance), excluded from discovery without a watermark.

A discovery pass is one ``scandir`` + an O(new) diff; nothing rescans
ingested data and no state grows with history (boundary holds only the
ties of one mtime tick; batch ids are a counter).

Object-store mapping: on S3/GCS the listing itself also becomes O(new)
— keys are listed in lexicographic order, so a producer that names
files monotonically (timestamp prefixes — the near-universal landing
convention) lets the ledger issue ``LIST ... StartAfter=<last key>``;
``LastModified`` replaces mtime for the watermark. This mirrors
Autoloader's incremental listing mode (``cloudFiles.useIncrementalListing``).

Contract: landing files are IMMUTABLE once written (the same assumption
Spark's file source and Autoloader make). A file rewritten in place
after ingestion re-ingests if its mtime advances past the watermark.
"""

from __future__ import annotations

import json
import os


class LandingLedger:
    """Persisted discovery state for one landing zone. Single-writer (the
    pipeline's availableNow loop); writes are atomic tmp+rename."""

    def __init__(self, landing_path: str, location: str):
        self.landing_path = landing_path
        self.location = location
        if os.path.exists(location):
            with open(location) as f:
                self._state = json.load(f)
        else:
            self._state = {
                "watermark_ns": -1,
                "boundary": [],
                "extra_seen": [],
                "next_batch_id": 0,
                "pending": None,
            }

    # ------------------------------------------------------------ state

    def exists_on_disk(self) -> bool:
        return os.path.exists(self.location)

    def _persist(self) -> None:
        os.makedirs(os.path.dirname(self.location) or ".", exist_ok=True)
        tmp = self.location + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._state, f)
        os.replace(tmp, self.location)

    def bootstrap(self, seen_files: list[str], next_batch_id: int) -> None:
        """Adopt a landing zone with history ingested by another mechanism
        (e.g. a Spark streaming checkpoint): mark ``seen_files`` as
        already ingested without processing them. One-time O(existing)."""
        self._state["extra_seen"] = sorted(
            os.path.basename(p) for p in seen_files
        )
        self._state["next_batch_id"] = next_batch_id
        self._persist()

    # -------------------------------------------------------- discovery

    def list_new(self) -> list[tuple[str, int]]:
        """(absolute path, mtime_ns) of files not yet ingested, ordered by
        (mtime, name) — the processing order that keeps the watermark
        monotone. O(dir entries) to scan, O(new) everything else."""
        wm = self._state["watermark_ns"]
        boundary = set(self._state["boundary"])
        extra = set(self._state["extra_seen"])
        pend = self._state["pending"]
        # the in-flight intent owns its file: it is replayed via pending(),
        # never rediscovered (rediscovery would mint a NEW batch id and the
        # idempotent-txn guard could no longer absorb the replay)
        pending_file = pend["file"] if pend else None
        out = []
        try:
            entries = os.scandir(self.landing_path)
        except FileNotFoundError:
            return []
        with entries:
            for e in entries:
                if not e.is_file() or e.name.startswith((".", "_")):
                    continue
                mt = e.stat().st_mtime_ns
                if mt < wm:
                    continue
                if mt == wm and e.name in boundary:
                    continue
                if e.name in extra or e.path == pending_file:
                    continue
                out.append((e.path, mt))
        out.sort(key=lambda pm: (pm[1], os.path.basename(pm[0])))
        return out

    # ---------------------------------------------------- batch protocol

    def pending(self) -> dict | None:
        """The write-ahead intent of an interrupted batch, if any."""
        return self._state["pending"]

    def begin(self, path: str, mtime_ns: int) -> int:
        """Record the intent to ingest ``path`` as the next batch; returns
        the batch id. Crash after this point replays exactly this file."""
        bid = self._state["next_batch_id"]
        self._state["pending"] = {
            "batch_id": bid,
            "file": path,
            "mtime_ns": mtime_ns,
        }
        self._persist()
        return bid

    def complete(self) -> None:
        """Mark the pending batch ingested: advance the watermark, fold the
        file into the boundary tie-set (or reset it on a new tick), bump
        the batch counter, clear the intent."""
        pend = self._state["pending"]
        if pend is None:
            return
        name = os.path.basename(pend["file"])
        mt = pend["mtime_ns"]
        if mt > self._state["watermark_ns"]:
            self._state["watermark_ns"] = mt
            self._state["boundary"] = [name]
        elif mt == self._state["watermark_ns"]:
            self._state["boundary"].append(name)
        # else: stale-mtime replay of an old intent — watermark already past
        self._state["next_batch_id"] = pend["batch_id"] + 1
        self._state["pending"] = None
        self._persist()
