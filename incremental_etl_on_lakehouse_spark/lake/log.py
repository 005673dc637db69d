"""Commit log for the lake table format.

One JSON file per commit under ``<table>/_lake_log/``; the file name is the
zero-padded version. A commit lists data files added/removed (paths relative
to the table root), the schema, table properties, and operation metadata.

Commits are atomic: written to a temp file then linked into place with
``O_CREAT|O_EXCL`` semantics, so a concurrent second writer loses cleanly.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

LOG_DIR = "_lake_log"
CDF_DIR = "_cdf"
DATA_DIR = "data"


@dataclass
class Commit:
    version: int
    operation: str  # CREATE | APPEND | MERGE | OVERWRITE | DELETE
    timestamp_ms: int
    add: list[dict] = field(default_factory=list)  # {"path": rel, "rows": int}
    remove: list[str] = field(default_factory=list)
    schema_json: str | None = None
    properties: dict = field(default_factory=dict)
    metrics: dict = field(default_factory=dict)
    cdf_path: str | None = None  # relative dir of materialized change rows

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "operation": self.operation,
                "timestamp_ms": self.timestamp_ms,
                "add": self.add,
                "remove": self.remove,
                "schema_json": self.schema_json,
                "properties": self.properties,
                "metrics": self.metrics,
                "cdf_path": self.cdf_path,
            }
        )

    @staticmethod
    def from_json(s: str) -> "Commit":
        d = json.loads(s)
        return Commit(
            version=d["version"],
            operation=d["operation"],
            timestamp_ms=d["timestamp_ms"],
            add=d.get("add", []),
            remove=d.get("remove", []),
            schema_json=d.get("schema_json"),
            properties=d.get("properties", {}),
            metrics=d.get("metrics", {}),
            cdf_path=d.get("cdf_path"),
        )


def log_dir(table_path: str) -> str:
    return os.path.join(table_path, LOG_DIR)


def _commit_file(table_path: str, version: int) -> str:
    return os.path.join(log_dir(table_path), f"{version:020d}.json")


def read_log(table_path: str) -> list[Commit]:
    d = log_dir(table_path)
    if not os.path.isdir(d):
        return []
    commits = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                commits.append(Commit.from_json(f.read()))
    return commits


def latest_version(table_path: str) -> int:
    commits = read_log(table_path)
    return commits[-1].version if commits else -1


def write_commit(table_path: str, commit: Commit) -> None:
    """Atomically publish a commit; raises FileExistsError on version conflict."""
    os.makedirs(log_dir(table_path), exist_ok=True)
    target = _commit_file(table_path, commit.version)
    tmp = target + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(commit.to_json())
    try:
        # os.link fails with EEXIST if another writer won the version — the
        # single-table equivalent of Delta's optimistic concurrency control.
        os.link(tmp, target)
    finally:
        os.unlink(tmp)


def snapshot_files(commits: list[Commit], version: int | None = None) -> list[str]:
    """Active data files (relative paths) as of ``version`` (default: latest)."""
    active: dict[str, dict] = {}
    for c in commits:
        if version is not None and c.version > version:
            break
        for a in c.add:
            active[a["path"]] = a
        for r in c.remove:
            active.pop(r, None)
    return list(active.keys())


def now_ms() -> int:
    return int(time.time() * 1000)
