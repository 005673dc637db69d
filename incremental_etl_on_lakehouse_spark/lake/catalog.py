"""A persistent table catalog: database.table -> lake-table path.

The reference addresses tables through a 3-level Unity Catalog namespace and
creates/drops databases with SQL DDL (``notebooks/demo-notebook.py:80-82,
104-110``); the metastore outlives any one Spark session, and tables may
live at EXTERNAL locations (the reference's S3 bucket,
``setup/incremental-etl-helper.py:6-19``). OSS Spark has a single
``spark_catalog``; this module provides that layer over the lake format:

- **Persistent metastore**: every catalog mutation (create/drop database,
  create/drop/register table) appends a numbered JSON entry under
  ``<root>/_metastore/`` through the same :mod:`logstore` seam the commit
  log uses — so the mapping survives sessions, ports to object stores
  unchanged, and two concurrent catalogs racing on one mutation resolve by
  optimistic concurrency (put-if-absent; the loser re-reads and retries).
  Current state is the fold of the entries, cached per latest version.
- **Managed vs external tables**: a managed table lives under
  ``<root>/<db>/<table>`` and DROP deletes its data; an external table
  (``location=`` / :meth:`register_table`) is only a name->path mapping and
  DROP removes the mapping, never the data — Delta/Hive external-table
  semantics.
- **Directory convention back-compat**: lake tables that exist as plain
  ``<root>/<db>/<table>`` directories without metastore entries (created by
  older catalogs) are still discovered and resolvable.
- **SQL resolution**: :meth:`resolver` adapts the catalog to the
  ``resolve`` callable of :mod:`lake.sql`'s front door, accepting
  ``db.table`` (optionally backtick-quoted) and bare names against a
  default database — the stand-in for the reference's ``${db.x}``
  parameterization (ref :85-89). :meth:`register_views` additionally
  exposes tables as temp views for direct ``spark.sql`` use.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import shutil

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from incremental_etl_on_lakehouse_spark.lake.logstore import store_for
from incremental_etl_on_lakehouse_spark.lake.table import LakeTable

META_DIR = "_metastore"

# Fold the entry log into a checkpoint every N mutations so a long-lived
# catalog (thousands of tables, years of DDL) reads O(N) entries past the
# latest checkpoint instead of replaying its whole history — the same
# design as the table commit log's checkpoints.
META_CHECKPOINT_EVERY = 32


class MetastoreConflictError(RuntimeError):
    """A catalog mutation kept colliding with concurrent writers."""


class LakeCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        self._meta_path = os.path.join(self.root, META_DIR)
        # ((incarnation token, latest version), latest, folded state);
        # invalidated by version probe or a metastore recreation
        self._meta_cache: tuple | None = None
        self._view_owners: dict[str, tuple[str, str]] = {}
        os.makedirs(self.root, exist_ok=True)

    # ------------------------------------------------------------ metastore

    def _meta_listing(self) -> tuple[list[int], list[int]]:
        """(entry versions, checkpoint versions), each ascending."""
        store = store_for(self._meta_path)
        entries: list[int] = []
        ckpts: list[int] = []
        for n in store.list_dir(self._meta_path):
            if n.endswith(".json") and n[:-5].isdigit():
                entries.append(int(n[:-5]))
            elif n.startswith("_checkpoint.") and n.endswith(".json"):
                v = n[len("_checkpoint."):-5]
                if v.isdigit():
                    ckpts.append(int(v))
        return sorted(entries), sorted(ckpts)

    def _meta_versions(self) -> list[int]:
        return self._meta_listing()[0]

    def _meta_token(self) -> str:
        """Identity of this metastore INCARNATION (an `_id` file minted at
        first commit). The state cache keys on (token, latest version):
        version count alone is ABA-unsafe once DROP CATALOG can delete and
        recreate a metastore — a peer instance whose cached version number
        matches the new incarnation's would silently serve the pre-drop
        mapping."""
        try:
            return store_for(self._meta_path).read_text(
                os.path.join(self._meta_path, "_id")
            )
        except (FileNotFoundError, OSError):
            return ""

    @staticmethod
    def _meta_apply(state: dict, e: dict) -> None:
        op = e["op"]
        if op == "create_db":
            state.setdefault(e["db"], {})
        elif op == "drop_db":
            state.pop(e["db"], None)
            # a db's views/matviews die with it, atomically in one fold step
            state.get("__views__", {}).pop(e["db"], None)
            state.get("__matviews__", {}).pop(e["db"], None)
        elif op == "put_table":
            state.setdefault(e["db"], {})[e["table"]] = {
                "path": e["path"],
                "external": bool(e.get("external", False)),
            }
            # re-adopting previously-orphaned external data clears its
            # ownership marker: the registration itself is the record now
            state.get("__extern_orphans__", {}).pop(e["path"], None)
        elif op == "drop_table":
            state.get(e["db"], {}).pop(e["table"], None)
        elif op == "put_extern_orphan":
            # persistent record that the lake-table directory at `path`
            # holds EXTERNALLY-owned data whose registration was dropped;
            # directory-convention deletion must refuse it (keys starting
            # "__" are reserved — never database names)
            state.setdefault("__extern_orphans__", {})[e["path"]] = True
        elif op == "put_view":
            # persistent named view: stored SELECT text, late-bound at
            # read time against the catalog's current tables (the
            # reference's temp-view idiom, demo-notebook.py:236, made
            # durable). Views live in their own reserved namespace so no
            # table code path ever mistakes one for a data entry.
            state.setdefault("__views__", {}).setdefault(e["db"], {})[
                e["view"]
            ] = e["sql"]
        elif op == "drop_view":
            state.get("__views__", {}).get(e["db"], {}).pop(e["view"], None)
        elif op == "put_matview":
            # materialized view: parsed spec + resolved source paths +
            # state root; reads are snapshot reads of the maintained
            # state (stale until REFRESH), unlike the late-bound views
            state.setdefault("__matviews__", {}).setdefault(e["db"], {})[
                e["view"]
            ] = {
                "sql": e["sql"],
                "spec": e["spec"],
                "paths": e["paths"],
                "root": e["root"],
                "publish": e.get("publish", False),
            }
        elif op == "drop_matview":
            state.get("__matviews__", {}).get(e["db"], {}).pop(
                e["view"], None
            )

    def _meta_state(self) -> tuple[int, dict]:
        """(latest version, state). State shape:
        ``{db: {table: {"path": str, "external": bool}}}`` — a present db
        with no tables is ``{}``. The fold starts from the newest
        checkpoint at-or-below the latest entry and replays only the
        entries after it; the cache is keyed on the latest version so a
        foreign commit (another catalog instance, another session)
        invalidates it on next read."""
        versions, ckpts = self._meta_listing()
        latest = versions[-1] if versions else -1
        token = self._meta_token()
        if (
            self._meta_cache is not None
            and self._meta_cache[0] == (token, latest)
        ):
            return self._meta_cache[1], self._meta_cache[2]
        store = store_for(self._meta_path)
        state: dict[str, dict] = {}
        start = 0
        usable = [c for c in ckpts if c <= latest]
        if usable:
            cp = usable[-1]
            state = json.loads(
                store.read_text(
                    os.path.join(self._meta_path, f"_checkpoint.{cp:07d}.json")
                )
            )
            start = cp + 1
        for v in versions:
            if v < start:
                continue
            self._meta_apply(
                state,
                json.loads(
                    store.read_text(
                        os.path.join(self._meta_path, f"{v:07d}.json")
                    )
                ),
            )
        self._meta_cache = ((token, latest), latest, state)
        return latest, state

    def _meta_commit(
        self, action: dict, retries: int = 8, precondition=None
    ) -> bool:
        """Append one entry at latest+1 via put-if-absent. A collision
        means another writer advanced the log first: re-read fresh state,
        re-check ``precondition`` against it, and take the next slot only
        if it still holds — without the re-check, two sessions racing
        create_table on the same name with different paths would both
        append put_table and the last writer would silently overwrite the
        mapping. Returns True if the entry was appended, False if the
        precondition turned false first (the caller decides whether that
        is success-idempotent or a conflict). Bounded retries — catalog
        mutations are rare, so sustained contention signals a bug, not
        load."""
        store = store_for(self._meta_path)
        store.mkdirs(self._meta_path)
        if not self._meta_token():
            import uuid as _uuid

            with contextlib.suppress(FileExistsError):
                store.put_if_absent(
                    os.path.join(self._meta_path, "_id"), _uuid.uuid4().hex
                )
        for _ in range(retries):
            if precondition is not None:
                self._meta_cache = None
                _, fresh = self._meta_state()
                if not precondition(fresh):
                    return False
            v = (self._meta_versions() or [-1])[-1] + 1
            try:
                store.put_if_absent(
                    os.path.join(self._meta_path, f"{v:07d}.json"),
                    json.dumps(action, sort_keys=True),
                )
                self._meta_cache = None
                if v > 0 and v % META_CHECKPOINT_EVERY == 0:
                    # checkpoint = derived data: losing the race to write
                    # it costs nothing (the winner's content is identical
                    # — same version, same deterministic fold). Skip if a
                    # concurrent writer already advanced past v: the fold
                    # below must capture the state at EXACTLY v.
                    cur, state = self._meta_state()
                    if cur == v:
                        # checkpoint-time compaction: markers whose data
                        # directory is gone are inert (no DROP path can
                        # ever match them) but cost a LakeTable.exists
                        # stat in every later DROP safety scan — prune
                        # them here so drop-heavy workloads don't grow
                        # __extern_orphans__ without bound. Pruning only
                        # inside the checkpoint keeps the log itself an
                        # append-only record; a racing checkpoint writer
                        # that kept a just-deleted path is still correct
                        # (the marker stays inert).
                        orphans = state.get("__extern_orphans__")
                        if orphans:
                            live = {
                                p: True
                                for p in orphans
                                if LakeTable.exists(p)
                            }
                            state = {
                                k: (live if k == "__extern_orphans__" else s)
                                for k, s in state.items()
                            }
                            if not live:
                                state.pop("__extern_orphans__", None)
                        try:
                            store.put_if_absent(
                                os.path.join(
                                    self._meta_path,
                                    f"_checkpoint.{v:07d}.json",
                                ),
                                json.dumps(state, sort_keys=True),
                            )
                        except FileExistsError:
                            pass
                        # the in-memory cache may hold the unpruned fold;
                        # drop it so the next read re-folds from the
                        # compacted checkpoint
                        self._meta_cache = None
                return True
            except FileExistsError:
                self._meta_cache = None
        raise MetastoreConflictError(
            f"metastore commit kept colliding after {retries} attempts: "
            f"{action}"
        )

    # ------------------------------------------------------------ databases

    def _db_path(self, db: str) -> str:
        return os.path.join(self.root, db)

    def create_database(self, db: str, if_not_exists: bool = True) -> None:
        """``CREATE DATABASE IF NOT EXISTS`` (ref :105)."""
        if db == META_DIR:
            raise ValueError(f"reserved name: {db}")
        _, state = self._meta_state()
        exists = db in state or os.path.isdir(self._db_path(db))
        if exists and not if_not_exists:
            raise ValueError(f"database exists: {db}")
        os.makedirs(self._db_path(db), exist_ok=True)
        if db not in state:
            # a concurrent create of the same db flips the precondition
            # false — idempotent success either way
            self._meta_commit(
                {"op": "create_db", "db": db},
                precondition=lambda st: db not in st,
            )

    def _external_data_paths(
        self, state: dict, include_orphans: bool = True
    ) -> set[str]:
        """Absolute paths of every externally-owned table data directory
        this catalog can see: external registrations in EVERY database
        (an external table may be registered in a different db than the
        directory its data lives in), the extern-orphan markers, and —
        when wired by a :class:`Lakehouse` — sibling catalogs'
        registrations (``_extern_peers``). Every DROP path consults this
        set so external bytes are never deleted regardless of which name
        reaches them."""
        paths = {
            os.path.abspath(e["path"])
            for dbname, entries in state.items()
            if not dbname.startswith("__")
            for e in entries.values()
            if e["external"]
        }
        if include_orphans:
            paths |= {
                p
                for p in state.get("__extern_orphans__", {})
                if LakeTable.exists(p)
            }
        peers = getattr(self, "_extern_peers", None)
        if peers is not None:
            paths |= set(peers())
        return paths

    def drop_database(self, db: str, cascade: bool = False) -> None:
        """``DROP DATABASE [CASCADE]`` (ref :106). Cascade drops managed
        table data; external tables lose only their registration."""
        if (self.tables(db) or self.views(db) or self.matviews(db)) and not cascade:
            raise ValueError(f"database not empty: {db} (use cascade=True)")
        _, state0 = self._meta_state()
        path = self._db_path(db)
        # 'DROP never deletes external data' survives cascade: an external
        # table registered at a path that happens to live INSIDE the db
        # directory must not lose its bytes to the directory rmtree below.
        # The scan covers EVERY database's registrations (an external table
        # may be registered in a different db than the directory it lives
        # in), the orphan markers, and — when this catalog belongs to a
        # Lakehouse — sibling catalogs' registrations too, mirroring the
        # drop_catalog blockers scan.
        extern_paths = self._external_data_paths(state0)
        external_inside = any(
            not os.path.relpath(p, os.path.abspath(path)).startswith("..")
            for p in extern_paths
        )
        # Cascade must be order-independent: tables(db) lists an external
        # table registered inside the db dir under BOTH its registered name
        # and its directory basename. Dropping the registered name first
        # writes the extern-orphan marker, and a later drop of the basename
        # would hit the orphan guard and abort the cascade mid-way. Compute
        # the skip set from state0 BEFORE the loop: directory-convention
        # names whose path is externally owned are aliases, not tables.
        registered0 = set(state0.get(db, {}))
        for t in self.tables(db):
            if (
                t not in registered0
                and os.path.abspath(self._table_path(db, t)) in extern_paths
            ):
                continue  # basename alias of externally-owned data
            self.drop_table(db, t)
        if os.path.isdir(path):
            if external_inside:
                # remove only the managed-table subdirs (already deleted by
                # drop_table); leave the directory shell and external data
                with contextlib.suppress(OSError):
                    os.rmdir(path)  # succeeds only if nothing remains
            else:
                shutil.rmtree(path)
        _, state = self._meta_state()
        if db in state:
            self._meta_commit(
                {"op": "drop_db", "db": db},
                precondition=lambda st: db in st,
            )

    def databases(self) -> list[str]:
        _, state = self._meta_state()
        dirs = {
            d
            for d in os.listdir(self.root)
            if d != META_DIR and os.path.isdir(self._db_path(d))
        }
        # "__"-prefixed state keys are reserved records (extern orphans),
        # never databases
        return sorted(
            dirs | {k for k in state if not k.startswith("__")}
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
        location: str | None = None,
    ) -> LakeTable:
        """``CREATE TABLE (cols...) TBLPROPERTIES(...)`` (ref :211-227).

        ``location`` makes the table EXTERNAL: data lives at that path and
        DROP only unregisters it. Without it the table is managed under
        ``<root>/<db>/<name>`` and DROP deletes the data."""
        self.create_database(db)
        _, state = self._meta_state()
        if self._is_view(db, name) or self._is_matview(db, name):
            raise ValueError(
                f"{db}.{name} is a view; a table cannot shadow it"
            )
        if name in state.get(db, {}):
            if if_not_exists:
                return self.table(db, name)
            raise ValueError(f"table exists: {db}.{name}")
        path = os.path.abspath(location) if location else self._table_path(db, name)
        t = LakeTable.create(
            self.spark,
            path,
            schema,
            properties=properties,
            partition_by=partition_by,
            if_not_exists=if_not_exists,
        )
        committed = self._meta_commit(
            {
                "op": "put_table",
                "db": db,
                "table": name,
                "path": path,
                "external": location is not None,
            },
            precondition=lambda st: name not in st.get(db, {}),
        )
        if not committed:
            # a concurrent writer registered the name first; never
            # overwrite their mapping silently
            _, fresh = self._meta_state()
            entry = fresh.get(db, {}).get(name)
            if entry is not None and entry["path"] == path:
                return t  # same mapping — idempotent
            if if_not_exists:
                return self.table(db, name)
            raise ValueError(
                f"table exists: {db}.{name} (created concurrently)"
            )
        return t

    def register_table(self, db: str, name: str, path: str) -> LakeTable:
        """Adopt an EXISTING lake table at ``path`` as ``db.name``
        (``CREATE TABLE ... LOCATION`` over existing data). External:
        dropping the name never deletes the data."""
        path = os.path.abspath(path)
        if not LakeTable.exists(path):
            raise ValueError(f"no lake table at {path}")
        self.create_database(db)
        if self._is_view(db, name) or self._is_matview(db, name):
            raise ValueError(
                f"{db}.{name} is a view; a table cannot shadow it"
            )
        _, state = self._meta_state()
        entry = state.get(db, {}).get(name)
        if entry is not None and entry["path"] != path:
            raise ValueError(
                f"table exists: {db}.{name} -> {entry['path']}"
            )
        if entry is None:
            committed = self._meta_commit(
                {
                    "op": "put_table",
                    "db": db,
                    "table": name,
                    "path": path,
                    "external": True,
                },
                precondition=lambda st: st.get(db, {}).get(name) is None,
            )
            if not committed:
                _, fresh = self._meta_state()
                now = fresh.get(db, {}).get(name)
                if now is not None and now["path"] != path:
                    raise ValueError(
                        f"table exists: {db}.{name} -> {now['path']}"
                    )
                # same path registered concurrently — idempotent
        return LakeTable(self.spark, path)

    def drop_table(self, db: str, name: str) -> None:
        """``DROP TABLE IF EXISTS`` (ref :211,349): managed data is
        deleted; an external registration is only removed. Unregistering
        an external table whose DATA lives inside the managed tree leaves
        a persistent ownership marker, so the surviving directory can
        never be mistaken for a pre-metastore managed table and deleted."""
        _, state = self._meta_state()
        entry = state.get(db, {}).get(name)
        if entry is None and self._is_view(db, name):
            raise ValueError(f"{db}.{name} is a view — use DROP VIEW")
        if entry is None and self._is_matview(db, name):
            raise ValueError(
                f"{db}.{name} is a materialized view — use DROP "
                "MATERIALIZED VIEW"
            )
        if entry is not None:
            if not entry["external"]:
                LakeTable.drop(entry["path"])
            elif LakeTable.exists(entry["path"]):
                # marker written UNCONDITIONALLY on location (round 11; it
                # was once gated to paths inside this catalog's root):
                # external data living under a SIBLING catalog's tree needs
                # the marker too — the Lakehouse peer scan reads other
                # catalogs' orphan sets, so the marker is what keeps the
                # containing catalog's directory-convention DROP from
                # deleting the bytes after unregistration. A marker for a
                # path outside every root is inert (no drop path ever
                # matches it) — harmless.
                self._meta_commit(
                    {
                        "op": "put_extern_orphan",
                        "path": os.path.abspath(entry["path"]),
                    }
                )
            self._meta_commit(
                {"op": "drop_table", "db": db, "table": name},
                precondition=lambda st: name in st.get(db, {}),
            )
            return
        # directory-convention table (pre-metastore): managed by location —
        # unless that directory is actually an EXTERNAL registration under
        # another name, or orphaned externally-owned data; DROP never
        # deletes external data
        p = os.path.abspath(self._table_path(db, name))
        # any external registration — this db, another db, or a sibling
        # catalog — claims the bytes; the directory name is just an alias
        if p in self._external_data_paths(state, include_orphans=False):
            return
        if p in state.get("__extern_orphans__", {}):
            raise ValueError(
                f"{p} holds externally-owned data orphaned by a previous "
                "unregistration; re-register it (register_table) or remove "
                "the files manually — DROP never deletes external data"
            )
        LakeTable.drop(p)

    def table(self, db: str, name: str) -> LakeTable:
        _, state = self._meta_state()
        entry = state.get(db, {}).get(name)
        path = entry["path"] if entry is not None else self._table_path(db, name)
        if not LakeTable.exists(path):
            raise ValueError(f"no such table: {db}.{name}")
        return LakeTable(self.spark, path)

    def tables(self, db: str) -> list[str]:
        _, state = self._meta_state()
        names = set(state.get(db, {}))
        path = self._db_path(db)
        if os.path.isdir(path):
            names |= {
                t
                for t in os.listdir(path)
                if LakeTable.exists(os.path.join(path, t))
            }
        return sorted(names)

    def is_external(self, db: str, name: str) -> bool:
        _, state = self._meta_state()
        entry = state.get(db, {}).get(name)
        return bool(entry and entry["external"])

    # ------------------------------------------------------------ SQL glue

    def _split_name(self, name: str, default_db: str | None) -> tuple[str, str]:
        parts = [p.strip("`") for p in name.split(".")]
        if len(parts) == 2:
            return parts[0], parts[1]
        if len(parts) == 1 and default_db is not None:
            return default_db, parts[0]
        raise ValueError(
            f"cannot resolve {name!r}: use db.table or set default_db"
        )

    def sql(self, statement: str, default_db: str | None = None):
        """Run one SQL statement with THIS catalog as the namespace — the
        reference's notebook surface (``CREATE DATABASE IF NOT EXISTS``,
        SQL DDL against ``db.table`` names, ``notebooks/demo-notebook.py:
        104-110,211-227``):

        - ``CREATE/DROP DATABASE``, ``SHOW DATABASES``, ``SHOW TABLES [IN
          db]``, ``DROP TABLE`` mutate/read the metastore directly;
        - ``CREATE TABLE db.t (...) [LOCATION '...']`` creates managed (no
          LOCATION) or external (LOCATION) and registers the mapping;
        - everything else (MERGE/UPDATE/DELETE/INSERT/ALTER/OPTIMIZE/...)
          routes through :func:`lake.sql.execute_statement` with
          :meth:`resolver` supplying name->table resolution.
        """
        from incremental_etl_on_lakehouse_spark.lake.sql import (
            execute_create_table,
            execute_statement,
            parse_create_table,
            parse_utility,
            strip_comments,
        )

        s = strip_comments(statement).strip().rstrip(";").strip()
        m = re.match(
            r"CREATE\s+(?:DATABASE|SCHEMA)\s+(IF\s+NOT\s+EXISTS\s+)?"
            r"`?([\w]+)`?\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            return self.create_database(
                m.group(2), if_not_exists=bool(m.group(1))
            )
        m = re.match(
            r"DROP\s+(?:DATABASE|SCHEMA)\s+(IF\s+EXISTS\s+)?`?([\w]+)`?"
            r"(\s+CASCADE)?\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            if m.group(1) and m.group(2) not in self.databases():
                return None
            return self.drop_database(m.group(2), cascade=bool(m.group(3)))
        if re.match(r"SHOW\s+(?:DATABASES|SCHEMAS)\s*$", s, re.IGNORECASE):
            return self.databases()
        m = re.match(
            r"SHOW\s+TABLES(?:\s+IN\s+`?([\w]+)`?)?\s*$", s, re.IGNORECASE
        )
        if m:
            db = m.group(1) or default_db
            if db is None:
                raise ValueError("SHOW TABLES needs IN <db> or default_db")
            return self.tables(db)
        m = re.match(
            r"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([`\w.]+)\s*$", s, re.IGNORECASE
        )
        if m:
            db, name = self._split_name(m.group(2), default_db)
            if (
                m.group(1)
                and name not in self.tables(db)
                and not self._is_view(db, name)
            ):
                return None
            return self.drop_table(db, name)
        m = re.match(
            r"CREATE\s+(OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW\s+([`\w.]+)"
            r"(\s+PUBLISH)?\s+AS\s+(.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            db, name = self._split_name(m.group(2), default_db)
            return self.create_materialized_view(
                db,
                name,
                m.group(4).strip(),
                or_replace=bool(m.group(1)),
                publish=bool(m.group(3)),
            )
        m = re.match(
            r"REFRESH\s+MATERIALIZED\s+VIEW\s+([`\w.]+)(\s+CASCADE)?\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            db, name = self._split_name(m.group(1), default_db)
            return self.refresh_materialized_view(
                db, name, cascade=bool(m.group(2))
            )
        m = re.match(
            r"DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([`\w.]+)\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            db, name = self._split_name(m.group(2), default_db)
            return self.drop_materialized_view(
                db, name, if_exists=bool(m.group(1))
            )
        m = re.match(
            r"SHOW\s+MATERIALIZED\s+VIEWS(?:\s+IN\s+`?([\w]+)`?)?\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            db = m.group(1) or default_db
            if db is None:
                raise ValueError(
                    "SHOW MATERIALIZED VIEWS needs IN <db> or default_db"
                )
            return self.matviews(db)
        m = re.match(
            r"CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([`\w.]+)\s+AS\s+(.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            db, name = self._split_name(m.group(2), default_db)
            return self.create_view(
                db, name, m.group(3).strip(), or_replace=bool(m.group(1))
            )
        m = re.match(
            r"DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([`\w.]+)\s*$", s, re.IGNORECASE
        )
        if m:
            db, name = self._split_name(m.group(2), default_db)
            return self.drop_view(db, name, if_exists=bool(m.group(1)))
        m = re.match(
            r"SHOW\s+VIEWS(?:\s+IN\s+`?([\w]+)`?)?\s*$", s, re.IGNORECASE
        )
        if m:
            db = m.group(1) or default_db
            if db is None:
                raise ValueError("SHOW VIEWS needs IN <db> or default_db")
            return self.views(db)
        if re.match(r"(SELECT|WITH)\b", s, re.IGNORECASE):
            # catalog-resolved SELECT: FROM/JOIN references binding to
            # catalog tables AND persistent views both work
            return self.query(s, default_db=default_db)
        if re.match(
            r"CREATE\s+(OR\s+REPLACE\s+)?TABLE\b", s, re.IGNORECASE
        ):
            try:
                p = parse_create_table(statement)
            except ValueError:
                p = None  # e.g. CREATE TABLE ... CLONE: not this grammar
            if p is not None:
                db, name = self._split_name(p["table"], default_db)
                self.create_database(db)
                _, state = self._meta_state()
                entry = state.get(db, {}).get(name)
                if entry is not None and not (
                    p["if_not_exists"] or p["or_replace"]
                ):
                    raise ValueError(f"table exists: {db}.{name}")
                loc = (
                    os.path.abspath(p["location"]) if p["location"] else None
                )
                if entry is not None and loc and entry["path"] != loc:
                    raise ValueError(
                        f"{db}.{name} is registered at {entry['path']}, "
                        f"not {loc}"
                    )
                path = (
                    entry["path"]
                    if entry is not None
                    else (loc or self._table_path(db, name))
                )
                if (
                    loc
                    and entry is None
                    and not p["or_replace"]
                    and LakeTable.exists(loc)
                ):
                    # CREATE ... LOCATION over an existing lake table
                    # ADOPTS it (Delta's external-table rule): the data
                    # defines the table; the statement only names it
                    t = LakeTable(self.spark, loc)
                else:
                    t = execute_create_table(
                        self.spark, statement, dest_path=path
                    )
                if entry is None:
                    committed = self._meta_commit(
                        {
                            "op": "put_table",
                            "db": db,
                            "table": name,
                            "path": os.path.abspath(path),
                            "external": loc is not None,
                        },
                        precondition=lambda st: name not in st.get(db, {}),
                    )
                    if not committed:
                        # concurrent writer took the name; same conflict
                        # contract as create_table()
                        _, fresh = self._meta_state()
                        now = fresh.get(db, {}).get(name)
                        if now is not None and now["path"] != os.path.abspath(
                            path
                        ) and not (p["if_not_exists"] or p["or_replace"]):
                            raise ValueError(
                                f"table exists: {db}.{name} "
                                "(created concurrently)"
                            )
                return t
            # CREATE TABLE ... CLONE / ... LIKE: utility grammar whose
            # destination is a CATALOG-MANAGED table — derive its path
            # from the name and register it like any CREATE (previously
            # these raised for lack of a dest_path; Databricks resolves
            # the clone/like target through the catalog the same way)
            try:
                ukind, _usrc, up = parse_utility(statement)
            except ValueError:
                ukind = None
            if ukind in ("clone", "create_like"):
                db, name = self._split_name(up["dest"], default_db)
                self.create_database(db)
                _, state = self._meta_state()
                entry = state.get(db, {}).get(name)
                if entry is not None:
                    if up.get("if_not_exists"):
                        return self.table(db, name)
                    raise ValueError(f"table exists: {db}.{name}")
                path = self._table_path(db, name)
                t = execute_statement(
                    self.spark,
                    statement,
                    self.resolver(default_db),
                    dest_path=path,
                )
                committed = self._meta_commit(
                    {
                        "op": "put_table",
                        "db": db,
                        "table": name,
                        "path": os.path.abspath(path),
                        "external": False,
                    },
                    precondition=lambda st: name not in st.get(db, {}),
                )
                if not committed:
                    _, fresh = self._meta_state()
                    now = fresh.get(db, {}).get(name)
                    if now is not None and now["path"] != os.path.abspath(
                        path
                    ):
                        raise ValueError(
                            f"table exists: {db}.{name} (created concurrently)"
                        )
                return t
        if re.match(r"INSERT\b", s, re.IGNORECASE):
            # the INSERT's SELECT part may read catalog tables/views/
            # matviews: bind those references the same way SELECT does
            # (the target name after INTO/OVERWRITE is untouched — the
            # resolver handles it)
            return execute_statement(
                self.spark,
                self._rewrite_refs(statement, default_db),
                self.resolver(default_db),
            )
        return execute_statement(
            self.spark, statement, self.resolver(default_db)
        )

    def resolver(self, default_db: str | None = None):
        """A ``resolve`` callable for :func:`lake.sql.execute_statement`:
        ``db.table`` (components optionally backtick-quoted) resolves
        through the metastore; a bare name resolves in ``default_db`` —
        the session's ``USE <db>`` stand-in."""

        def resolve(name: str) -> LakeTable:
            return self.table(*self._split_name(name, default_db))

        return resolve

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

    # ------------------------------------------------------------ views
    #
    # Persistent named views: the metastore stores the SELECT text under
    # the reserved "__views__" namespace; reads are LATE-BOUND — the text
    # is re-resolved against the catalog's current tables on every read
    # (standard view semantics: a view over a replaced table sees the new
    # data; a view over a dropped table errors at read time).

    def views(self, db: str) -> list[str]:
        _, state = self._meta_state()
        return sorted(state.get("__views__", {}).get(db, {}))

    def view_sql(self, db: str, name: str) -> str:
        _, state = self._meta_state()
        sql = state.get("__views__", {}).get(db, {}).get(name)
        if sql is None:
            raise ValueError(f"no such view: {db}.{name}")
        return sql

    def _is_view(self, db: str, name: str) -> bool:
        _, state = self._meta_state()
        return name in state.get("__views__", {}).get(db, {})

    def create_view(
        self, db: str, name: str, select_sql: str, or_replace: bool = False
    ) -> None:
        """``CREATE [OR REPLACE] VIEW db.name AS <select>``. The name
        shares the db's namespace with tables: a view may not shadow a
        table (and vice versa) — a name that silently meant different
        things to SELECT and MERGE would be a correctness trap."""
        if db not in self.databases():
            raise ValueError(f"no such database: {db}")
        if name in self.tables(db):
            raise ValueError(
                f"{db}.{name} is a table; a view cannot shadow it"
            )
        if self._is_matview(db, name):
            raise ValueError(
                f"{db}.{name} is a materialized view; a view cannot "
                "shadow it"
            )
        if self._is_view(db, name) and not or_replace:
            raise ValueError(
                f"view exists: {db}.{name} (use CREATE OR REPLACE VIEW)"
            )
        # eager validation: resolve + analyze the plan now (no execution)
        # so a typo'd table name fails at CREATE, like Delta/HMS views
        self._resolved_select(select_sql, default_db=db)
        self._meta_commit(
            {"op": "put_view", "db": db, "view": name, "sql": select_sql}
        )

    def drop_view(self, db: str, name: str, if_exists: bool = False) -> None:
        if not self._is_view(db, name):
            if if_exists:
                return
            if name in self.tables(db):
                raise ValueError(
                    f"{db}.{name} is a table — use DROP TABLE"
                )
            raise ValueError(f"no such view: {db}.{name}")
        self._meta_commit(
            {"op": "drop_view", "db": db, "view": name},
            precondition=lambda st: name
            in st.get("__views__", {}).get(db, {}),
        )

    def read_view(self, db: str, name: str):
        """The view as a DataFrame — its stored SELECT late-bound against
        the catalog's CURRENT tables (bare names resolve in the view's
        own db)."""
        return self._resolved_select(
            self.view_sql(db, name), default_db=db, stack=((db, name),)
        )

    def query(self, select_sql: str, default_db: str | None = None):
        """Catalog-resolved SELECT: every ``FROM``/``JOIN`` reference
        naming a catalog table or view is bound to the live table (or the
        view's resolved plan) and the query runs through ``spark.sql``.
        Names the catalog doesn't know stay untouched (session temp
        views keep working)."""
        return self._resolved_select(select_sql, default_db=default_db)

    # ------------------------------------------------------ materialized

    def matviews(self, db: str) -> list[str]:
        _, state = self._meta_state()
        return sorted(state.get("__matviews__", {}).get(db, {}))

    def _matview_entry(self, db: str, name: str) -> dict:
        _, state = self._meta_state()
        e = state.get("__matviews__", {}).get(db, {}).get(name)
        if e is None:
            raise ValueError(f"no such materialized view: {db}.{name}")
        return e

    def _is_matview(self, db: str, name: str) -> bool:
        _, state = self._meta_state()
        return name in state.get("__matviews__", {}).get(db, {})

    def _matview(self, db: str, name: str):
        """Rehydrate the maintenance object (IncrementalAggView or
        IncrementalJoinView) from its persisted state + checkpoints."""
        from incremental_etl_on_lakehouse_spark.lake.matview import (
            build_maintainer,
        )

        e = self._matview_entry(db, name)
        return build_maintainer(
            self.spark,
            e["spec"],
            e["paths"],
            e["root"],
            publish=e.get("publish", False),
        )

    def _published_path(self, db: str, name: str) -> str:
        """The CDF lake table a PUBLISHed MV materializes its logical
        output into — the binding surface for stacked MVs."""
        e = self._matview_entry(db, name)
        if not e.get("publish"):
            raise ValueError(
                f"{db}.{name} is a materialized view without PUBLISH — "
                "only published MVs can feed another materialized view "
                "(recreate it with CREATE MATERIALIZED VIEW ... PUBLISH "
                "AS ...)"
            )
        return os.path.join(e["root"], "published")

    def create_materialized_view(
        self,
        db: str,
        name: str,
        select_sql: str,
        or_replace: bool = False,
        publish: bool = False,
    ) -> None:
        """``CREATE [OR REPLACE] MATERIALIZED VIEW db.name [PUBLISH] AS
        <select>``: parse the restricted aggregate shape
        (lake/matview.py), resolve the source table(s) through the
        catalog (CDF required — the MV is maintained from change feeds),
        build the state under the db's hidden ``.__mv__`` directory, and
        run the INITIAL refresh so the view is populated at creation.

        ``publish`` (join MVs) additionally materializes the logical
        output into a CDF-enabled lake table, O(changed groups) per
        refresh — and a FROM reference naming a PUBLISHED MV binds to
        that table, so MVs stack into multi-hop DAGs."""
        from incremental_etl_on_lakehouse_spark.lake.matview import (
            build_maintainer,
            parse_matview_select,
        )

        if db not in self.databases():
            raise ValueError(f"no such database: {db}")
        if name in self.tables(db) or self._is_view(db, name):
            raise ValueError(
                f"{db}.{name} exists as a table or view; a materialized "
                "view cannot shadow it"
            )
        if self._is_matview(db, name) and not or_replace:
            raise ValueError(
                f"materialized view exists: {db}.{name} "
                "(use CREATE OR REPLACE)"
            )
        spec = parse_matview_select(select_sql)
        paths = []
        for t in spec["tables"]:
            tdb, tname = self._split_name(t, default_db=db)
            if self._is_matview(tdb, tname):
                if tdb == db and tname == name:
                    raise ValueError(
                        f"materialized view {db}.{name} cannot reference "
                        "itself"
                    )
                paths.append(self._published_path(tdb, tname))
            else:
                paths.append(self.table(tdb, tname).path)
        root = os.path.join(self.root, db, ".__mv__", name)
        if self._is_matview(db, name):  # OR REPLACE: old state dies
            self.drop_materialized_view(db, name)
        mv = build_maintainer(self.spark, spec, paths, root, publish=publish)
        mv.refresh()
        self._meta_commit(
            {
                "op": "put_matview",
                "db": db,
                "view": name,
                "sql": select_sql,
                "spec": spec,
                "paths": paths,
                "root": root,
                "publish": publish,
            }
        )

    def refresh_materialized_view(
        self, db: str, name: str, cascade: bool = False
    ) -> int:
        """Fold all unprocessed source change-feed commits into the MV
        state; O(changed rows), never a base rescan.

        ``cascade`` walks the stacked-MV DAG upstream first: any source
        that is another MV's published table gets refreshed before this
        one, recursively — one statement brings a whole Gold -> Platinum
        chain current in dependency order."""
        if cascade:
            e = self._matview_entry(db, name)
            _, state = self._meta_state()
            pub_to_mv = {
                os.path.join(ve["root"], "published"): (d, v)
                for d, vs in state.get("__matviews__", {}).items()
                for v, ve in vs.items()
                if ve.get("publish")
            }
            for p in e["paths"]:
                up = pub_to_mv.get(p)
                if up is not None and up != (db, name):
                    self.refresh_materialized_view(*up, cascade=True)
        return self._matview(db, name).refresh()

    def read_matview(self, db: str, name: str):
        """Snapshot read of the maintained state — NO implicit refresh
        (standard MV staleness semantics). HAVING (a predicate over the
        view's output aliases / group cols) filters the assembled frame
        at read time."""
        e = self._matview_entry(db, name)
        df = self._matview(db, name).to_df()
        having = e["spec"].get("having")
        return df.where(having) if having else df

    def drop_materialized_view(
        self, db: str, name: str, if_exists: bool = False
    ) -> None:
        if not self._is_matview(db, name):
            if if_exists:
                return
            raise ValueError(f"no such materialized view: {db}.{name}")
        e = self._matview_entry(db, name)
        # a PUBLISHED MV may feed other MVs; dropping it would orphan
        # their source binding (the published path dies with the root)
        pub = os.path.join(e["root"], "published")
        _, state = self._meta_state()
        dependents = [
            f"{d}.{v}"
            for d, vs in state.get("__matviews__", {}).items()
            for v, ve in vs.items()
            if pub in ve.get("paths", []) and (d, v) != (db, name)
        ]
        if dependents:
            raise ValueError(
                f"cannot drop {db}.{name}: materialized view(s) "
                f"{sorted(dependents)} consume its published output — "
                "drop them first"
            )
        self._meta_commit(
            {"op": "drop_matview", "db": db, "view": name},
            precondition=lambda st: name
            in st.get("__matviews__", {}).get(db, {}),
        )
        shutil.rmtree(e["root"], ignore_errors=True)  # state dies with it

    def _resolved_select(
        self,
        select_sql: str,
        default_db: str | None,
        stack: tuple = (),
    ):
        """Rewrite catalog references in a SELECT to uniquely-named temp
        views backed by the live tables, then ``spark.sql`` it."""
        return self.spark.sql(
            self._rewrite_refs(select_sql, default_db, stack)
        )

    def _rewrite_refs(
        self,
        select_sql: str,
        default_db: str | None,
        stack: tuple = (),
    ) -> str:
        """Rewrite every ``FROM``/``JOIN`` reference naming a catalog
        table, view, or materialized view into a uniquely-named temp view
        bound to the live object; return the rewritten text. ``stack``
        carries the in-resolution view chain for cycle detection (a view
        may reference other views; A→B→A must error, not recurse). Also
        used by the INSERT front door so ``INSERT INTO t SELECT ... FROM
        db.v`` reads catalog objects."""
        from incremental_etl_on_lakehouse_spark.lake.sql import strip_comments

        sql = strip_comments(select_sql)
        # positions inside single-quoted literals / backticked identifiers
        # are off-limits for rewriting ('FROM x' inside a string is data)
        masked = bytearray(len(sql))
        i, n = 0, len(sql)
        while i < n:
            ch = sql[i]
            if ch in ("'", '"', "`"):
                j = i + 1
                while j < n:
                    if sql[j] == ch:
                        if ch in ("'", '"') and j + 1 < n and sql[j + 1] == ch:
                            j += 2  # doubled-char escape stays inside
                            continue
                        break
                    j += 1
                for k in range(i, min(j + 1, n)):
                    masked[k] = 1
                i = j + 1
            else:
                i += 1

        # CTE names defined in THIS statement shadow catalog objects
        # (standard SQL scoping): collect them so `WITH t AS (...) ...
        # FROM t` reads the CTE even when a table db.t exists
        cte_names = {
            m.group(1).lower()
            for m in re.finditer(
                r"(?:\bWITH\s+|,\s*)(\w+)\s+AS\s*\(", sql, re.IGNORECASE
            )
            if not masked[m.start()]
        }
        out: list[str] = []
        last = 0
        pat = re.compile(
            r"\b(FROM|JOIN)(\s+)((?:`?\w+`?)(?:\.`?\w+`?)?)", re.IGNORECASE
        )
        for m in pat.finditer(sql):
            if masked[m.start()]:
                continue
            ref = m.group(3)
            if "." not in ref and ref.strip("`").lower() in cte_names:
                continue  # CTE reference, not a catalog object
            try:
                db, name = self._split_name(ref, default_db)
            except ValueError:
                continue  # unqualified name with no default db: leave it
            replacement = None
            if self._is_view(db, name):
                if (db, name) in stack:
                    chain = " -> ".join(f"{d}.{v}" for d, v in stack)
                    raise ValueError(
                        f"view cycle: {chain} -> {db}.{name}"
                    )
                tmp = f"__cat_view_{db}__{name}"
                self._resolved_select(
                    self.view_sql(db, name),
                    default_db=db,
                    stack=stack + ((db, name),),
                ).createOrReplaceTempView(tmp)
                replacement = tmp
            elif self._is_matview(db, name):
                tmp = f"__cat_mv_{db}__{name}"
                self.read_matview(db, name).createOrReplaceTempView(tmp)
                replacement = tmp
            else:
                entry_path = None
                _, state = self._meta_state()
                entry = state.get(db, {}).get(name)
                if entry is not None:
                    entry_path = entry["path"]
                elif db in self.databases() and LakeTable.exists(
                    self._table_path(db, name)
                ):
                    entry_path = self._table_path(db, name)
                if entry_path is not None:
                    tmp = f"__cat_tbl_{db}__{name}"
                    LakeTable(self.spark, entry_path).to_df().createOrReplaceTempView(tmp)
                    replacement = tmp
            if replacement is not None:
                out.append(sql[last:m.start(3)])
                out.append(replacement)
                last = m.end(3)
        out.append(sql[last:])
        return "".join(out)


class Lakehouse:
    """Three-level ``catalog.database.table`` namespace — the reference's
    Unity Catalog shape (``CREATE CATALOG IF NOT EXISTS``, tables addressed
    as ``{catalog}.{database}.{table}``, ``notebooks/demo-notebook.py:
    80-110``). A catalog is a metastore-root prefix: ``<root>/<catalog>/``
    is a fully independent :class:`LakeCatalog` (its own ``_metastore``
    entry log, databases, managed/external tables), so every two-level
    guarantee — OCC mutations, external-data protection, checkpointed
    folds — applies per catalog unchanged.

    Catalog existence is the directory itself (created empty alongside its
    metastore root): ``CREATE CATALOG`` is an idempotent mkdir, matching
    IF NOT EXISTS semantics under concurrency; ``DROP CATALOG CASCADE``
    cascades through :meth:`LakeCatalog.drop_database` so external table
    data survives even when it lives inside the catalog tree.

    Name resolution (``resolver`` / :meth:`table` / :meth:`sql`): three
    parts address exactly; two parts resolve in the current catalog; one
    part needs the current database too — ``USE CATALOG x`` / ``USE x.y``
    set the session defaults, like the reference notebook's widget-bound
    catalog/database."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        default_catalog: str = "main",
        default_db: str | None = None,
    ):
        self.spark = spark
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self.default_catalog = default_catalog
        self.current_catalog = default_catalog
        self.current_db = default_db
        self._cats: dict[str, LakeCatalog] = {}

    # ------------------------------------------------------------ catalogs

    def _cat_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def create_catalog(self, name: str, if_not_exists: bool = True) -> None:
        if not re.fullmatch(r"\w+", name):
            raise ValueError(f"invalid catalog name: {name!r}")
        if os.path.isdir(self._cat_path(name)) and not if_not_exists:
            raise ValueError(f"catalog exists: {name}")
        os.makedirs(self._cat_path(name), exist_ok=True)

    def drop_catalog(self, name: str, cascade: bool = False) -> None:
        path = self._cat_path(name)
        if not os.path.isdir(path):
            raise ValueError(f"no such catalog: {name}")
        cat = self.catalog(name)
        dbs = cat.databases()
        if dbs and not cascade:
            raise ValueError(f"catalog not empty: {name} (use cascade=True)")
        # Refuse rather than orphan: external-table DATA inside the
        # catalog tree can neither be deleted by DROP (external data is
        # never deleted) nor left behind (the metastore — the only record
        # of its external ownership — goes with the catalog, and a later
        # directory-convention DROP TABLE on the rediscovered dir would
        # delete externally-owned bytes). The caller relocates or keeps
        # those tables in a live catalog first.
        _, state = cat._meta_state()
        blockers = [
            f"{db}.{t}"
            for db, tbls in state.items()
            if not db.startswith("__")
            for t, e in tbls.items()
            if e["external"]
            and not os.path.relpath(
                os.path.abspath(e["path"]), path
            ).startswith("..")
            and LakeTable.exists(e["path"])
        ]
        blockers += [
            p
            for p in state.get("__extern_orphans__", {})
            if not os.path.relpath(p, path).startswith("..")
            and LakeTable.exists(p)
        ]
        if blockers:
            raise ValueError(
                f"cannot drop catalog {name}: externally-owned table data "
                f"lives inside its directory ({sorted(set(blockers))}); "
                "relocate or re-home those tables first (DROP never "
                "deletes external data)"
            )
        for db in dbs:
            cat.drop_database(db, cascade=True)
        meta = os.path.join(path, META_DIR)
        if os.path.isdir(meta):
            shutil.rmtree(meta)
        self._cats.pop(name, None)
        # leftover external-table data keeps the directory shell alive —
        # the same 'DROP never deletes external data' compromise as
        # drop_database
        with contextlib.suppress(OSError):
            for dirpath, dirs, files in os.walk(path, topdown=False):
                if not dirs and not files:
                    os.rmdir(dirpath)

    def catalogs(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(self._cat_path(d)) and not d.startswith("_")
        )

    def catalog(self, name: str) -> LakeCatalog:
        """The per-catalog two-level metastore (lazy, cached)."""
        if not os.path.isdir(self._cat_path(name)):
            raise ValueError(f"no such catalog: {name}")
        if name not in self._cats:
            cat = LakeCatalog(self.spark, self._cat_path(name))
            # DROP DATABASE in this catalog must also protect external
            # data registered by SIBLING catalogs whose location lies
            # inside the dropped db's directory — mirror the drop_catalog
            # blockers scan via the catalog's _extern_peers hook
            cat._extern_peers = lambda n=name: self._peer_external_paths(n)
            self._cats[name] = cat
        return self._cats[name]

    def _peer_external_paths(self, exclude: str) -> set[str]:
        """External-registration + live-orphan paths across every catalog
        EXCEPT ``exclude`` — O(catalogs) metadata reads, only on DROP."""
        paths: set[str] = set()
        for c in self.catalogs():
            if c == exclude:
                continue
            _, st = self.catalog(c)._meta_state()
            for dbname, entries in st.items():
                if dbname.startswith("__"):
                    continue
                for e in entries.values():
                    if e["external"]:
                        paths.add(os.path.abspath(e["path"]))
            paths |= {
                p
                for p in st.get("__extern_orphans__", {})
                if LakeTable.exists(p)
            }
        return paths

    def use_catalog(self, name: str) -> None:
        if not os.path.isdir(self._cat_path(name)):
            raise ValueError(f"no such catalog: {name}")
        self.current_catalog = name
        self.current_db = None

    def use_database(self, db: str, catalog: str | None = None) -> None:
        cat = catalog or self.current_catalog
        if db not in self.catalog(cat).databases():
            raise ValueError(f"no such database: {cat}.{db}")
        self.current_catalog = cat
        self.current_db = db

    # ----------------------------------------------------------- resolution

    def _split(self, name: str) -> tuple[str, str, str]:
        parts = [p.strip("`") for p in name.split(".")]
        if len(parts) == 3:
            return parts[0], parts[1], parts[2]
        if len(parts) == 2:
            return self.current_catalog, parts[0], parts[1]
        if len(parts) == 1 and self.current_db is not None:
            return self.current_catalog, self.current_db, parts[0]
        raise ValueError(
            f"cannot resolve {name!r}: use catalog.db.table or set the "
            "current catalog/database (USE)"
        )

    def table(self, name: str) -> LakeTable:
        cat, db, t = self._split(name)
        return self.catalog(cat).table(db, t)

    def resolver(self):
        """3-level ``resolve`` callable for :mod:`lake.sql`'s front door."""

        def resolve(name: str) -> LakeTable:
            return self.table(name)

        return resolve

    # ------------------------------------------------------------------ SQL

    def _split_db(self, name: str) -> tuple[str, str]:
        """(catalog, db) from a 1- or 2-part database name."""
        parts = [p.strip("`") for p in name.split(".")]
        if len(parts) == 2:
            return parts[0], parts[1]
        if len(parts) == 1:
            return self.current_catalog, parts[0]
        raise ValueError(f"cannot resolve database {name!r}")

    def sql(self, statement: str):
        """One SQL statement against the three-level namespace: catalog
        DDL (CREATE/DROP CATALOG, SHOW CATALOGS, USE) handled here;
        database-level DDL with optionally catalog-qualified names routed
        to the owning :class:`LakeCatalog`; table statements delegated
        with the catalog prefix stripped so the two-level front door (and
        everything behind it — MERGE/ALTER/OPTIMIZE/...) is reused
        verbatim."""
        from incremental_etl_on_lakehouse_spark.lake.sql import strip_comments

        s = strip_comments(statement).strip().rstrip(";").strip()
        m = re.match(
            r"CREATE\s+CATALOG\s+(IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            return self.create_catalog(
                m.group(2), if_not_exists=bool(m.group(1))
            )
        m = re.match(
            r"DROP\s+CATALOG\s+(IF\s+EXISTS\s+)?`?(\w+)`?(\s+CASCADE)?\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            if m.group(1) and m.group(2) not in self.catalogs():
                return None
            return self.drop_catalog(m.group(2), cascade=bool(m.group(3)))
        if re.match(r"SHOW\s+CATALOGS\s*$", s, re.IGNORECASE):
            return self.catalogs()
        m = re.match(r"USE\s+CATALOG\s+`?(\w+)`?\s*$", s, re.IGNORECASE)
        if m:
            return self.use_catalog(m.group(1))
        m = re.match(r"USE\s+([`\w.]+)\s*$", s, re.IGNORECASE)
        if m:
            cat, db = self._split_db(m.group(1))
            return self.use_database(db, catalog=cat)
        # database-level DDL: the name may be catalog-qualified
        # (the reference's CREATE DATABASE IF NOT EXISTS ${cat}.${db})
        m = re.match(
            r"(CREATE|DROP)\s+(?:DATABASE|SCHEMA)\s+"
            r"(IF\s+(?:NOT\s+)?EXISTS\s+)?([`\w.]+?)(\s+CASCADE)?\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            cat, db = self._split_db(m.group(3))
            if m.group(1).upper() == "CREATE":
                # the catalog must already exist — Unity Catalog's CREATE
                # SCHEMA errors on a missing catalog, and silently minting
                # one would turn a typo into a new namespace (the DROP
                # branch below refuses the same side effect). The one
                # exception is the session's DEFAULT catalog: like UC's
                # built-in `main`, it materializes on first use so an
                # unqualified CREATE DATABASE works out of the box.
                if not os.path.isdir(self._cat_path(cat)):
                    if cat != self.default_catalog:
                        raise ValueError(f"no such catalog: {cat}")
                    self.create_catalog(cat)
                return self.catalog(cat).create_database(
                    db, if_not_exists=bool(m.group(2))
                )
            # DROP: a missing catalog must never be created as a side
            # effect — a typo'd cleanup statement is a no-op (IF EXISTS)
            # or an error, not a namespace mutation
            if not os.path.isdir(self._cat_path(cat)):
                if m.group(2):
                    return None
                raise ValueError(f"no such catalog: {cat}")
            target = self.catalog(cat)
            if m.group(2) and db not in target.databases():
                return None
            return target.drop_database(db, cascade=bool(m.group(4)))
        m = re.match(
            r"SHOW\s+(?:DATABASES|SCHEMAS)(?:\s+IN\s+`?(\w+)`?)?\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            return self.catalog(m.group(1) or self.current_catalog).databases()
        m = re.match(
            r"SHOW\s+(TABLES|VIEWS|MATERIALIZED\s+VIEWS)"
            r"(?:\s+IN\s+([`\w.]+))?\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            kind = re.sub(r"\s+", " ", m.group(1).upper())
            if m.group(2):
                cat, db = self._split_db(m.group(2))
            elif self.current_db is not None:
                cat, db = self.current_catalog, self.current_db
            else:
                raise ValueError(f"SHOW {kind} needs IN <db> or USE first")
            target = self.catalog(cat)
            if kind == "TABLES":
                return target.tables(db)
            if kind == "VIEWS":
                return target.views(db)
            return target.matviews(db)
        # table-level statement: strip catalog qualifiers down to db.table
        # and reuse the two-level front door of the owning catalog
        cat, stripped = self._strip_catalog_qualifiers(statement)
        return self.catalog(cat).sql(stripped, default_db=self.current_db)

    def _strip_catalog_qualifiers(self, statement: str) -> tuple[str, str]:
        """Rewrite every 3-part ``cat.db.table`` reference in ``statement``
        to ``db.table`` and return (owning catalog, rewritten statement).
        All 3-part names in one statement must agree on the catalog (a
        cross-catalog join would need per-name resolution; the SQL front
        door's resolver callback only sees names, so same-catalog is the
        supported surface — matching the reference, whose statements stay
        within one catalog)."""
        cats: set[str] = set()

        def repl(m: re.Match) -> str:
            cats.add(m.group(1).strip("`"))
            return f"{m.group(2)}.{m.group(3)}"

        # a 3-part dotted name: three \w+ (each optionally backticked)
        # joined by dots, not preceded/followed by more dots
        pat = re.compile(
            r"(?<![\w.`])(`?\w+`?)\.(`?\w+`?)\.(`?\w+`?)(?![\w.`(])"
        )
        # never rewrite inside single-quoted SQL string literals: a value
        # like 'www.example.com' pattern-matches a 3-part name and would
        # either corrupt the stored data or raise a spurious
        # multiple-catalogs error. Split on literals ('' escapes stay
        # inside one token) and rewrite only the code segments.
        parts = re.split(r"('(?:[^']|'')*')", statement)
        rewritten = "".join(
            p if p.startswith("'") else pat.sub(repl, p) for p in parts
        )
        if len(cats) > 1:
            raise ValueError(
                f"statement references multiple catalogs {sorted(cats)}; "
                "one catalog per statement is supported"
            )
        cat = cats.pop() if cats else self.current_catalog
        if not os.path.isdir(self._cat_path(cat)):
            raise ValueError(f"no such catalog: {cat}")
        return cat, rewritten
