"""Maintenance-op interleaving fuzzer: random APPEND / DELETE / UPDATE /
OPTIMIZE / RESTORE sequences against one lake table, checked against a
pure-Python row model — INCLUDING time travel back to every version the
sequence ever produced.

This stresses the interactions the fixed-scenario lake tests can't
enumerate: does a RESTORE mid-sequence leave later DELETEs operating on
the restored rows; does OPTIMIZE (a purely physical rewrite) really
change nothing logically at any point; does every historical version
remain exactly reconstructible after an arbitrary op mix (the contract
VACUUM-less retention promises).

Deterministic seeds, bounded op count: 6 sequences x 8 ops at tiny row
counts — lake-op latency, not data, dominates the runtime.
"""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.table import MergeClause

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("grp", StringType()),
        StructField("val", LongType()),
    ]
)

# (SQL condition, python predicate over (id, grp, val)) — shared pool so
# the engine and the model always evaluate the same thing
_CONDS = [
    ("val % 3 = 0", lambda i, g, v: v % 3 == 0),
    ("grp = 'a'", lambda i, g, v: g == "a"),
    ("id % 2 = 1", lambda i, g, v: i % 2 == 1),
    ("val > 250", lambda i, g, v: v > 250),
]

# (SQL assignments, python row transform)
_ASSIGNS = [
    ({"val": "val + 100"}, lambda i, g, v: (i, g, v + 100)),
    ({"val": "val * 2"}, lambda i, g, v: (i, g, v * 2)),
    ({"grp": "'z'"}, lambda i, g, v: (i, "z", v)),
    (
        {"val": "val + id", "grp": "upper(grp)"},
        lambda i, g, v: (i, g.upper(), v + i),
    ),
]


def _table_rows(t: LakeTable, version=None) -> frozenset:
    return frozenset(
        (r.id, r.grp, r.val) for r in t.to_df(version=version).collect()
    )


@pytest.mark.parametrize(
    "mode", ["rewrite", "dv", "autocompact", "frozenclock"]
)
@pytest.mark.parametrize("seed", range(6))
def test_random_maintenance_interleavings(
    spark, tmp_path, seed, mode, monkeypatch
):
    """Runs in BOTH delete modes: file-rewrite and deletion vectors —
    RESTORE's DV reconciliation (every surviving file must end with
    exactly its target-version deletion vector) only gets exercised by
    the dv parametrization, and only under interleavings like
    delete -> restore -> delete on the same file. The third mode runs
    the rewrite flavor with AUTO COMPACTION live, so background
    OPTIMIZE commits interleave every write — pure-physical invariance
    under the full op mix. The fourth mode FREEZES the wall clock for
    the whole sequence so write_commit's monotonic clamp stamps every
    commit ahead of now_ms() — the clamp-ahead hazard from the r10
    vacuum flake: the tail-phase 0-retention vacuum must still see the
    final delete's tombstones."""
    dv = mode == "dv"
    if mode == "frozenclock":
        from incremental_etl_on_lakehouse_spark.lake import log as lakelog

        t0 = lakelog.now_ms()
        monkeypatch.setattr(lakelog, "now_ms", lambda: t0)
    rng = random.Random(8800 + seed)
    props = {"enableChangeDataFeed": "true"}
    if dv:
        props["enableDeletionVectors"] = "true"
    if mode == "autocompact":
        props.update(
            {
                "autoCompact": "true",
                "autoCompact.minNumFiles": "4",
                "optimizedWrite.targetFileRows": "50",
            }
        )
    t = LakeTable.create(
        spark,
        str(tmp_path / f"maint_{seed}_{mode}"),
        SCHEMA,
        properties=props,
    )
    model: set = set()  # {(id, grp, val)}
    next_id = 0
    # version -> expected frozenset, recorded after EVERY committed op
    history = {t.version(): frozenset(model)}

    def do_append():
        nonlocal next_id
        k = rng.randint(2, 5)
        rows = [
            (next_id + j, rng.choice("abc"), rng.randint(0, 400))
            for j in range(k)
        ]
        next_id += k
        t.append(spark.createDataFrame(rows, SCHEMA))
        model.update(rows)

    def do_merge():
        """Upsert batch: half fresh ids, half ids drawn from the model
        (when any exist) — WHEN MATCHED UPDATE *, WHEN NOT MATCHED
        INSERT *. Exercises merge x restore interactions (a merge onto
        rows that a restore just resurrected)."""
        nonlocal next_id
        batch = []
        existing = sorted(r[0] for r in model)
        for _ in range(rng.randint(1, 3)):
            if existing and rng.random() < 0.5:
                batch.append(
                    (rng.choice(existing), rng.choice("abc"),
                     rng.randint(500, 999))
                )
            else:
                batch.append(
                    (next_id, rng.choice("abc"), rng.randint(500, 999))
                )
                next_id += 1
        # one source row per id (merge contract)
        batch = list({b[0]: b for b in batch}.values())
        t.merge(
            spark.createDataFrame(batch, SCHEMA),
            "source.id = target.id",
            [MergeClause("update", None, "*"),
             MergeClause("insert", None, "*")],
        )
        by_id = {b[0]: b for b in batch}
        model.difference_update({r for r in model if r[0] in by_id})
        model.update(by_id.values())

    landing = tmp_path / f"landing_{seed}_{mode}"
    landing.mkdir()

    def do_copy_into():
        """COPY INTO from a landing dir: usually lands one fresh NDJSON
        file first; sometimes re-runs with nothing new, asserting the
        exactly-once file tracking holds mid-interleaving — including
        after RESTORE (restored-away rows must NOT resurrect via a
        re-copy: the ingested-file history survives the restore)."""
        nonlocal next_id
        if rng.random() < 0.3 and any(landing.iterdir()):
            res = t.copy_into(str(landing), file_format="json")
            assert res["num_files"] == 0, (seed, "copy_into re-run")
            return
        k = rng.randint(1, 3)
        rows = [
            (next_id + j, rng.choice("abc"), rng.randint(0, 400))
            for j in range(k)
        ]
        next_id += k
        (landing / f"land_{next_id}.json").write_text(
            "\n".join(
                json.dumps({"id": i, "grp": g, "val": v}) for i, g, v in rows
            )
        )
        t.copy_into(str(landing), file_format="json")
        model.update(rows)

    ops = ["append", "delete", "update", "compact", "restore", "merge",
           "copy_into"]
    do_append()  # never fuzz an empty-forever table
    history[t.version()] = frozenset(model)

    for _ in range(8):
        op = rng.choice(ops)
        if op == "append":
            do_append()
        elif op == "copy_into":
            do_copy_into()
        elif op == "delete":
            sql, pred = rng.choice(_CONDS)
            t.delete(sql)
            model.difference_update({r for r in model if pred(*r)})
        elif op == "update":
            csql, cpred = rng.choice(_CONDS)
            asql, afn = rng.choice(_ASSIGNS)
            t.update(asql, condition=csql)
            hit = {r for r in model if cpred(*r)}
            model.difference_update(hit)
            model.update(afn(*r) for r in hit)
        elif op == "compact":
            t.compact(target_file_rows=50)
            # purely physical: the model must NOT change
        elif op == "merge":
            do_merge()
        elif op == "restore":
            target = rng.choice(sorted(history))
            t.restore(target)
            model = set(history[target])
        history[t.version()] = frozenset(model)
        assert _table_rows(t) == frozenset(model), (seed, op)

    # every version the sequence ever produced must still reconstruct
    # exactly (time travel after arbitrary maintenance interleavings)
    for v, expected in history.items():
        assert _table_rows(t, version=v) == expected, (seed, "version", v)

    # CDF replay: folding the change feed commit-by-commit (removes =
    # delete + update_preimage, adds = insert + update_postimage; per
    # commit as set algebra so intra-commit ordering is irrelevant) must
    # land on the final state — across RESTORE's synthesized whole-file
    # deletes/re-inserts and OPTIMIZE's CDF invisibility. Ids are unique
    # and updates preserve them, so set (not multiset) semantics hold.
    by_commit: dict = {}
    for r in t.read_changes(0).collect():
        row = (r.id, r.grp, r.val)
        rm, ad = by_commit.setdefault(r._commit_version, (set(), set()))
        if r._change_type in ("delete", "update_preimage"):
            rm.add(row)
        elif r._change_type in ("insert", "update_postimage"):
            ad.add(row)
        else:  # pragma: no cover - unknown change type is a contract break
            raise AssertionError(r._change_type)
    replay: set = set()
    for v in sorted(by_commit):
        rm, ad = by_commit[v]
        replay = (replay - rm) | ad
    assert replay == frozenset(model), (seed, "cdf-replay")

    if mode == "frozenclock" and model:
        # clamp-ahead regression (r10 flake): every commit above is
        # stamped ahead of the frozen wall clock, yet a 0-retention
        # dry-run vacuum right after a full delete must list the
        # tombstoned files (rewrite mode: a full delete removes every
        # data file from the snapshot)
        files_before = set(t.files())
        t.delete("val >= 0")
        model.clear()
        history[t.version()] = frozenset(model)
        if files_before:
            assert t.vacuum(retention_ms=0, dry_run=True, force=True), (
                seed,
                "clamp-ahead vacuum blind to the delete's tombstones",
            )

    # VACUUM tail phase — the no-silent-corruption contract: after a
    # zero-retention vacuum, (a) the live snapshot is untouched, and
    # (b) restoring to the oldest version either raises cleanly
    # (its files were reclaimed) or reproduces EXACTLY that version's
    # rows (its files were all still referenced) — never a partial
    # resurrection.
    t.vacuum(retention_ms=0, force=True)
    assert _table_rows(t) == frozenset(model), (seed, "post-vacuum")
    oldest = min(history)
    try:
        t.restore(oldest)
    except Exception:
        pass  # clean refusal is contract-conforming
    else:
        assert _table_rows(t) == history[oldest], (seed, "restore-after-vacuum")
        model = set(history[oldest])
        history[t.version()] = frozenset(model)

    # LOG-RETENTION tail phase: cleaning the whole old commit prefix
    # (retention 0 keeps only the head) must leave the live snapshot
    # byte-identical, the boundary version reconstructible, reads below
    # the boundary cleanly refused, and the table fully writable.
    import pytest as _pytest

    deleted = t.cleanup_log(retention_ms=0)
    head = t.version()
    assert _table_rows(t) == frozenset(model), (seed, "post-clean")
    assert _table_rows(t, version=head - 1) is not None  # boundary ckpt
    if deleted:
        with _pytest.raises(ValueError):
            t.to_df(version=min(deleted)).collect()
    do_append()
    assert _table_rows(t) == frozenset(model), (seed, "post-clean-append")


@pytest.mark.parametrize("start", ["create", "convert"])
@pytest.mark.parametrize("seed", range(4))
def test_random_partitioned_maintenance(spark, tmp_path, seed, start):
    """The same interleaving discipline on a HIVE-PARTITIONED table,
    with partition-scoped ops in the mix: replaceWhere one partition,
    OPTIMIZE WHERE one partition, and DYNAMIC partition overwrite
    (replace exactly the partitions present in the incoming frame).
    Pins that partition-pruned rewrites under arbitrary op orders never
    leak into sibling partitions and that every historical version still
    reconstructs.

    ``start="convert"`` begins from CONVERT TO LAKE: a plain hive-layout
    parquet directory adopted in place (zero rewrite), then the full op
    mix runs against the adopted files — the migration-path guarantee
    that converted tables are not second-class for any later op."""
    rng = random.Random(7700 + seed)
    model: set = set()
    next_id = 0
    if start == "create":
        t = LakeTable.create(
            spark,
            str(tmp_path / f"pmaint_{seed}"),
            SCHEMA,
            partition_by=["grp"],
        )
    else:
        # pre-existing hive-partitioned parquet dir, adopted in place
        pre = [
            (j, "abc"[j % 3], rng.randint(0, 400)) for j in range(6)
        ]
        next_id = 6
        path = str(tmp_path / f"pmaint_{seed}")
        spark.createDataFrame(pre, SCHEMA).write.partitionBy("grp").parquet(
            path
        )
        t = LakeTable.convert_from_parquet(
            spark, path, partition_types={"grp": "string"}
        )
        model.update(pre)
    history = {t.version(): frozenset(model)}

    def do_append():
        nonlocal next_id
        k = rng.randint(2, 5)
        rows = [
            (next_id + j, rng.choice("abc"), rng.randint(0, 400))
            for j in range(k)
        ]
        next_id += k
        t.append(spark.createDataFrame(rows, SCHEMA))
        model.update(rows)

    do_append()
    history[t.version()] = frozenset(model)

    for _ in range(7):
        op = rng.choice(
            ["append", "delete", "replace_partition", "optimize_where",
             "restore", "dpo"]
        )
        if op == "append":
            do_append()
        elif op == "dpo":
            # dynamic partition overwrite: the lake spelling is a
            # replaceWhere over exactly the partitions present in the
            # frame — O(changed partitions), sibling partitions untouched
            k = rng.randint(1, 3)
            fresh = [
                (20_000 + next_id + j, rng.choice("ab"), rng.randint(0, 400))
                for j in range(k)
            ]
            next_id += k
            present = sorted({r[1] for r in fresh})
            cond = "grp IN (" + ", ".join(f"'{g}'" for g in present) + ")"
            t.overwrite_where(spark.createDataFrame(fresh, SCHEMA), cond)
            model.difference_update({r for r in model if r[1] in present})
            model.update(fresh)
        elif op == "delete":
            sql, pred = rng.choice(_CONDS)
            t.delete(sql)
            model.difference_update({r for r in model if pred(*r)})
        elif op == "replace_partition":
            grp = rng.choice("abc")
            k = rng.randint(1, 3)
            fresh = [
                (10_000 + next_id + j, grp, rng.randint(0, 400))
                for j in range(k)
            ]
            next_id += k  # keep ids unique
            t.overwrite_where(
                spark.createDataFrame(fresh, SCHEMA), f"grp = '{grp}'"
            )
            model.difference_update({r for r in model if r[1] == grp})
            model.update(fresh)
        elif op == "optimize_where":
            t.compact(target_file_rows=50, where=f"grp = '{rng.choice('abc')}'")
        elif op == "restore":
            target = rng.choice(sorted(history))
            t.restore(target)
            model = set(history[target])
        history[t.version()] = frozenset(model)
        assert _table_rows(t) == frozenset(model), (seed, op)

    for v, expected in history.items():
        assert _table_rows(t, version=v) == expected, (seed, "version", v)
