"""Pluggable storage for the commit log — the object-store seam.

The lake's correctness hinges on exactly one primitive: *put-if-absent*
of a commit file. Everything else the log does (list versions, read a
commit, roll up a checkpoint) is plain read/list. This module isolates
those primitives behind :class:`LogStore` so the table format stops
depending on POSIX semantics and a deployment can drop in an object-store
implementation without touching ``log.py`` or ``table.py``:

========================  ====================================================
primitive                 object-store mapping
========================  ====================================================
``put_if_absent``         S3: conditional PUT with ``If-None-Match: *``
                          (natively supported since 2024-08; before that,
                          Delta's S3SingleDriverLogStore serialized writers
                          via an external lock/DynamoDB table instead).
                          GCS: upload with ``ifGenerationMatch=0``.
                          Azure Blob/ADLS: PUT with ``If-None-Match: *``
                          (ETag precondition).  All three return a
                          412/PreconditionFailed that maps to
                          ``FileExistsError`` here.
``read_text``             GET object. Reads after a successful conditional
                          PUT are strongly consistent on S3/GCS/Azure.
``list_dir``              LIST with the log dir as key prefix. Strongly
                          consistent on S3 since 2020-12, GCS and ADLS
                          always; no directory objects needed, so
                          ``mkdirs`` is a no-op there.
``mkdirs``                POSIX-only concept; object stores have no
                          directories (prefixes appear when keys do).
========================  ====================================================

The local implementation keeps the original tmp-write + ``os.link``
exclusive-create protocol (hard links never overwrite, so two racing
writers of the same version lose deterministically with
``FileExistsError`` — single-table OCC).

Dispatch is by path prefix via :func:`register_store` /
:func:`store_for`; unregistered paths use the local POSIX store. Tests
register fault-injecting fakes to drive the OCC/rebase paths without
real races (``tests/test_logstore.py``).
"""

from __future__ import annotations

import os
import uuid


class LogStore:
    """Commit-log storage primitives. Implementations must make
    ``put_if_absent`` atomic: exactly one of N concurrent writers of the
    same path succeeds, all others raise ``FileExistsError``, and a
    reader never observes a partially-written object."""

    def put_if_absent(self, path: str, text: str) -> None:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        """Entry NAMES under ``path``; [] if the dir/prefix doesn't exist."""
        raise NotImplementedError

    def mkdirs(self, path: str) -> None:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """Remove one object (object stores: DELETE — idempotent there;
        here a missing file raises, callers pre-list). Used only by log
        retention cleanup; ordinary operation never deletes log files."""
        raise NotImplementedError


class LocalLogStore(LogStore):
    """POSIX implementation: tmp file + ``os.link`` for exclusive create.

    ``os.link`` (hard link) never overwrites — it fails with EEXIST if
    the target appeared between the existence check a caller never makes
    and the link itself, which is exactly the put-if-absent contract.
    A plain ``os.rename`` would NOT work: rename clobbers silently."""

    def put_if_absent(self, path: str, text: str) -> None:
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
        try:
            os.link(tmp, path)
        finally:
            os.unlink(tmp)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def list_dir(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return os.listdir(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def delete(self, path: str) -> None:
        os.remove(path)


_LOCAL = LocalLogStore()
# (prefix, store), longest-prefix match; consulted before the local default
_REGISTRY: list[tuple[str, LogStore]] = []


def register_store(prefix: str, store: LogStore | None) -> None:
    """Route log I/O for paths under ``prefix`` through ``store``
    (``None`` unregisters). Longest registered prefix wins."""
    global _REGISTRY
    _REGISTRY = [(p, s) for p, s in _REGISTRY if p != prefix]
    if store is not None:
        _REGISTRY.append((prefix, store))
        _REGISTRY.sort(key=lambda ps: len(ps[0]), reverse=True)


def store_for(path: str) -> LogStore:
    for prefix, store in _REGISTRY:
        if path.startswith(prefix):
            return store
    return _LOCAL
