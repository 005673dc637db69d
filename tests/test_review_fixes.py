"""Regression tests for the round-4 self-review findings: identity
generation on every insert-producing write path, append-rebase metadata
conflicts, txn-replay stage cleanup, DV-only RESTORE change feed, CLONE
error routing, and creation-time-only generated columns."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake import log as lakelog
from incremental_etl_on_lakehouse_spark.lake.table import MergeClause

ID_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("rid", LongType()),
    ]
)


def make_identity_table(spark, tmp_path, name="idt"):
    return LakeTable.create(
        spark,
        str(tmp_path / name),
        ID_SCHEMA,
        properties={"identity.rid": "100,5"},
    )


def rids(t):
    return [r["rid"] for r in t.to_df().collect()]


def test_overwrite_generates_identity(spark, tmp_path):
    """overwrite() must generate identity values (not silently NULL) and
    must never recycle replaced rows' ids (monotone high-water mark)."""
    t = make_identity_table(spark, tmp_path)
    t.append(spark.createDataFrame([("a",), ("b",)], "name string"))
    hwm1 = int(t.properties()["identityHighWater.rid"])
    t.overwrite(spark.createDataFrame([("c",)], "name string"))
    vals = rids(t)
    assert vals and all(v is not None for v in vals), vals
    assert all(v > hwm1 for v in vals), (vals, hwm1)
    assert int(t.properties()["identityHighWater.rid"]) >= hwm1
    # GENERATED ALWAYS: supplying the column explicitly is rejected
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.overwrite(spark.createDataFrame([("x", 1)], ID_SCHEMA))


def test_replace_where_generates_identity(spark, tmp_path):
    t = make_identity_table(spark, tmp_path)
    t.append(spark.createDataFrame([("keep",), ("swap",)], "name string"))
    before = {r["name"]: r["rid"] for r in t.to_df().collect()}
    t.overwrite_where(
        spark.createDataFrame([("swap",)], "name string"), "name = 'swap'"
    )
    after = {r["name"]: r["rid"] for r in t.to_df().collect()}
    assert after["keep"] == before["keep"]  # untouched row keeps its id
    assert after["swap"] is not None and after["swap"] != before["swap"]
    assert len(set(after.values())) == 2


def test_merge_insert_generates_identity(spark, tmp_path):
    t = make_identity_table(spark, tmp_path)
    t.append(spark.createDataFrame([("a",)], "name string"))
    src = spark.createDataFrame([("a",), ("new",)], "name string")
    t.merge(
        src,
        "source.name = target.name",
        [MergeClause("insert", None, {"name": "source.name"})],
    )
    got = {r["name"]: r["rid"] for r in t.to_df().collect()}
    assert set(got) == {"a", "new"}
    assert got["new"] is not None and got["new"] != got["a"]
    assert len(set(got.values())) == 2
    assert int(t.properties()["identityHighWater.rid"]) == max(got.values())


def test_merge_may_not_assign_identity(spark, tmp_path):
    t = make_identity_table(spark, tmp_path)
    t.append(spark.createDataFrame([("a",)], "name string"))
    # explicit assignment
    with pytest.raises(ValueError, match="MERGE may not assign"):
        t.merge(
            spark.createDataFrame([("b",)], "name string"),
            "source.name = target.name",
            [MergeClause("insert", None, {"name": "source.name", "rid": "7"})],
        )
    # INSERT * with the source carrying the column
    with pytest.raises(ValueError, match="MERGE may not assign"):
        t.merge(
            spark.createDataFrame([("b", 7)], ID_SCHEMA),
            "source.name = target.name",
            [MergeClause("insert", None, "*")],
        )


def test_insert_overwrite_sql_generates_identity(spark, tmp_path):
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_statement

    t = make_identity_table(spark, tmp_path)
    t.append(spark.createDataFrame([("a",)], "name string"))
    execute_statement(
        spark, "INSERT OVERWRITE t VALUES ('x'), ('y')", {"t": t}
    )
    vals = rids(t)
    assert len(vals) == 2 and all(v is not None for v in vals), vals
    assert len(set(vals)) == 2


def test_rebase_aborts_on_concurrent_constraint(spark, tmp_path):
    """A commit-race loser whose staged rows were never validated against
    a constraint the winner added must surface the collision, not rebase."""
    schema = StructType(
        [StructField("k", LongType()), StructField("v", LongType())]
    )
    t = LakeTable.create(spark, str(tmp_path / "consrace"), schema)
    t.append(spark.createDataFrame([(1, 1)], schema))
    fired = {}
    orig_stage = LakeTable._stage_write

    def stage_with_constraint(self, df, **kw):
        out = orig_stage(self, df, **kw)
        if not fired:
            fired["v"] = None
            # interloper commits ADD CONSTRAINT after the loser staged
            fired["v"] = LakeTable(self.spark, self.path).add_constraint(
                "small", "v < 5"
            )
        return out

    LakeTable._stage_write = stage_with_constraint
    try:
        with pytest.raises(FileExistsError):
            t.append(spark.createDataFrame([(2, 99)], schema))
    finally:
        LakeTable._stage_write = orig_stage
    assert fired["v"] is not None
    # the violating rows never landed
    assert [r["v"] for r in t.to_df().collect()] == [1]


def test_txn_replay_race_cleans_staged_files(spark, tmp_path):
    """Two replays of the same (app, version) race: the loser detects the
    winner was its own transaction, no-ops, and removes its orphaned
    staged files instead of leaking them forever."""
    schema = StructType([StructField("k", LongType())])
    t = LakeTable.create(spark, str(tmp_path / "txnrace"), schema)
    fired = {}
    orig_stage = LakeTable._stage_write

    def stage_with_replay(self, df, **kw):
        out = orig_stage(self, df, **kw)
        if not fired:
            fired["v"] = None
            fired["v"] = LakeTable(self.spark, self.path).append(
                self.spark.createDataFrame([(1,)], schema),
                txn_app_id="app",
                txn_version=7,
            )
        return out

    LakeTable._stage_write = stage_with_replay
    try:
        v = t.append(
            spark.createDataFrame([(1,)], schema),
            txn_app_id="app",
            txn_version=7,
        )
    finally:
        LakeTable._stage_write = orig_stage
    assert v == fired["v"] == 1  # no-op returned the winner's version
    assert t.to_df().count() == 1  # no double append
    # no orphaned stage dirs: every data dir is referenced by a commit
    active_dirs = {
        os.path.dirname(a["path"])
        for c in lakelog.read_log(t.path)
        for a in c.add
    }
    on_disk = {
        os.path.join("data", d)
        for d in os.listdir(os.path.join(t.path, "data"))
    }
    assert on_disk == active_dirs, (on_disk, active_dirs)


def test_restore_dv_only_patch_reaches_change_feed(spark, tmp_path):
    """RESTORE whose only effect is re-pointing a surviving file's
    deletion vector must emit row-level inserts for the resurrected rows
    (previously silently absent from the feed)."""
    schema = StructType([StructField("k", LongType())])
    t = LakeTable.create(
        spark,
        str(tmp_path / "dvrestore"),
        schema,
        properties={
            "enableChangeDataFeed": "true",
            "enableDeletionVectors": "true",
        },
    )
    t.append(spark.createDataFrame([(i,) for i in range(10)], schema))  # v1
    t.delete("k >= 7")  # v2: DV masks 3 rows of the surviving file
    v3 = t.restore(1)  # v3: only a dv patch — file survives both snapshots
    assert t.to_df().count() == 10
    changes = t.read_changes(starting_version=v3).collect()
    got = sorted(
        (r["_change_type"], r["k"]) for r in changes
    )
    assert got == [("insert", 7), ("insert", 8), ("insert", 9)], got
    # and restoring forward again (re-masking) emits deletes
    v4 = t.restore(2)
    changes4 = t.read_changes(starting_version=v4).collect()
    got4 = sorted((r["_change_type"], r["k"]) for r in changes4)
    assert got4 == [("delete", 7), ("delete", 8), ("delete", 9)], got4


def test_clone_conflict_error_propagates(spark, tmp_path):
    """CREATE TABLE ... CLONE onto an existing table must report the real
    conflict, not a CREATE TABLE parse error."""
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_statement

    schema = StructType([StructField("k", LongType())])
    src = LakeTable.create(spark, str(tmp_path / "src"), schema)
    dest = str(tmp_path / "dest")
    LakeTable.create(spark, dest, schema)  # occupy the destination
    with pytest.raises(ValueError, match="already exists"):
        execute_statement(
            spark,
            "CREATE TABLE c SHALLOW CLONE src",
            {"src": src},
            dest_path=dest,
        )
    # and a missing dest_path reports the CLONE contract, not parse noise
    with pytest.raises(ValueError, match="dest_path"):
        execute_statement(
            spark, "CREATE TABLE c SHALLOW CLONE src", {"src": src}
        )


def test_generated_property_fixed_at_creation(spark, tmp_path):
    schema = StructType(
        [StructField("a", LongType()), StructField("b", LongType())]
    )
    t = LakeTable.create(spark, str(tmp_path / "gen"), schema)
    with pytest.raises(ValueError, match="fixed at table creation"):
        t.set_properties({"generated.b": "a % 10"})
    with pytest.raises(ValueError, match="fixed at table creation"):
        t.unset_properties(["generated.b"])


SCHEMA_KV = StructType(
    [
        StructField("dt", StringType()),
        StructField("k", LongType()),
    ]
)


def test_partitioned_dv_delete_does_not_leak_across_partitions(spark, tmp_path):
    """One job writes the same part-file basename into every partition dir;
    a DV delete in one partition must not mask same-position rows in the
    siblings (row identity keys on the data/-suffix path, not basename)."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "pdv"),
        SCHEMA_KV,
        partition_by=["dt"],
        properties={"enableDeletionVectors": "true"},
    )
    rows = [("a", i) for i in range(4)] + [("b", i) for i in range(4)]
    # single writer task -> identical basenames under dt=a/ and dt=b/
    t.append(spark.createDataFrame(rows, SCHEMA_KV).coalesce(1))
    t.delete("dt = 'a' AND k < 2")
    got = sorted((r["dt"], r["k"]) for r in t.to_df().collect())
    assert got == sorted(
        [("a", 2), ("a", 3)] + [("b", i) for i in range(4)]
    ), got


def test_clone_preserves_deletion_vectors(spark, tmp_path):
    """Shallow AND deep clones must carry the source's deletion vectors —
    a clone that resurrects DV-deleted rows diverges from the snapshot."""
    schema = StructType([StructField("k", LongType())])
    t = LakeTable.create(
        spark,
        str(tmp_path / "src"),
        schema,
        properties={"enableDeletionVectors": "true"},
    )
    t.append(spark.createDataFrame([(i,) for i in range(6)], schema))
    t.delete("k >= 4")
    for shallow in (True, False):
        c = t.clone(str(tmp_path / f"clone_{shallow}"), shallow=shallow)
        got = sorted(r["k"] for r in c.to_df().collect())
        assert got == [0, 1, 2, 3], (shallow, got)


def test_deep_clone_preserves_partition_columns(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "psrc"), SCHEMA_KV, partition_by=["dt"]
    )
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA_KV))
    c = t.clone(str(tmp_path / "pdeep"), shallow=False)
    got = sorted((r["dt"], r["k"]) for r in c.to_df().collect())
    assert got == [("a", 1), ("b", 2)], got


def test_change_feed_survives_schema_evolution(spark, tmp_path):
    """A feed range spanning ADD COLUMNS must read: pre-evolution
    materialized CDF rows project onto the head schema with NULL for the
    new column."""
    schema = StructType(
        [StructField("k", LongType()), StructField("v", LongType())]
    )
    t = LakeTable.create(
        spark,
        str(tmp_path / "evo"),
        schema,
        properties={"enableChangeDataFeed": "true"},
    )
    t.append(spark.createDataFrame([(1, 10)], schema))        # v1
    t.update({"v": "20"}, "k = 1")                             # v2: CDF parquet
    t.add_columns([("x", LongType())])                         # v3
    t.append(                                                  # v4
        spark.createDataFrame([(2, 30, 7)], "k long, v long, x long")
    )
    changes = t.read_changes(starting_version=1).collect()
    kinds = sorted((r["_change_type"], r["k"], r["x"]) for r in changes)
    assert ("update_postimage", 1, None) in kinds
    assert ("insert", 2, 7) in kinds


def test_clone_base_snapshot_in_change_feed(spark, tmp_path):
    schema = StructType([StructField("k", LongType())])
    t = LakeTable.create(spark, str(tmp_path / "cfsrc"), schema)
    t.append(spark.createDataFrame([(1,), (2,)], schema))
    c = t.clone(str(tmp_path / "cfclone"))
    changes = c.read_changes(starting_version=0).collect()
    assert sorted((r["_change_type"], r["k"]) for r in changes) == [
        ("insert", 1),
        ("insert", 2),
    ]


def test_update_may_not_assign_identity(spark, tmp_path):
    t = make_identity_table(spark, tmp_path, "updid")
    t.append(spark.createDataFrame([("a",)], "name string"))
    with pytest.raises(ValueError, match="UPDATE may not assign"):
        t.update({"rid": "999"}, "name = 'a'")


def test_copy_into_identity_table_generates_ids(spark, tmp_path):
    import json as _json

    t = make_identity_table(spark, tmp_path, "cpid")
    land = tmp_path / "land"
    land.mkdir()
    with open(land / "f1.json", "w") as f:
        f.write(_json.dumps({"name": "a"}) + "\n" + _json.dumps({"name": "b"}))
    res = t.copy_into(str(land), "json")
    assert res["num_rows"] == 2
    vals = rids(t)
    assert len(vals) == 2 and all(v is not None for v in vals), vals
    # idempotent re-run ingests nothing new
    assert t.copy_into(str(land), "json")["num_rows"] == 0


def test_vacuum_sweeps_orphaned_stage_dirs(spark, tmp_path):
    """A staged-but-never-committed data/<uuid> dir (crashed writer) must
    be reclaimed by VACUUM once past retention — it appears in no commit,
    so the remove-list pass alone can never find it."""
    import os
    import time

    schema = StructType([StructField("k", LongType())])
    t = LakeTable.create(spark, str(tmp_path / "orph"), schema)
    t.append(spark.createDataFrame([(1,)], schema))
    # simulate a crash: stage files without publishing a commit
    orphan = os.path.join(t.path, "data", "deadbeefcafe")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as f:
        f.write(b"junk")
    fresh = os.path.join(t.path, "data", "freshstage")
    os.makedirs(fresh)
    old = time.time() - 8 * 24 * 3600
    os.utime(orphan, (old, old))
    swept = t.vacuum()
    assert any("deadbeefcafe" in v for v in swept), swept
    assert not os.path.exists(orphan)
    assert os.path.exists(fresh)  # fresh stage (in-flight writer) kept
    assert t.to_df().count() == 1  # committed data untouched


def test_gold_additive_merge_replay_is_noop(spark, tmp_path):
    """Replaying an applied CDF window through the txn-guarded additive
    merge must not re-apply its deltas (crash between merge commit and
    reader offset write)."""
    from incremental_etl_on_lakehouse_spark.operators.cdc import merge_agg_delta

    gold = LakeTable.create(
        spark,
        str(tmp_path / "gold"),
        StructType(
            [StructField("g", StringType()), StructField("total", LongType())]
        ),
    )
    deltas = spark.createDataFrame([("a", 5)], "g string, delta_value long")
    merge_agg_delta(
        gold, deltas, ["g"], "total", txn_app_id="gold", txn_version=1
    )
    # replay of the same window: no-op
    m = merge_agg_delta(
        gold, deltas, ["g"], "total", txn_app_id="gold", txn_version=1
    )
    assert m.get("replayed_txn") is True
    assert [r["total"] for r in gold.to_df().collect()] == [5]
    # the NEXT window applies normally
    merge_agg_delta(
        gold, deltas, ["g"], "total", txn_app_id="gold", txn_version=2
    )
    assert [r["total"] for r in gold.to_df().collect()] == [10]


def test_pipeline_cross_batch_stale_update_rejected(spark, tmp_path):
    """A late-arriving file carrying an OLDER cdc_timestamp for an already
    merged key must not regress Silver (order guard)."""
    import json as _json

    from incremental_etl_on_lakehouse_spark.pipeline import MedallionPipeline

    landing = tmp_path / "landing"
    landing.mkdir()
    p = MedallionPipeline(spark, str(tmp_path / "lake"), str(landing))

    def drop(name, ts, visitors):
        (landing / name).write_text(
            _json.dumps(
                [
                    {
                        "id": 1,
                        "country": "X",
                        "district": "d",
                        "visit_timestamp": "2024-01-01 00:00:00",
                        "num_visitors": visitors,
                        "cdc_operation": "UPDATE",
                        "cdc_timestamp": ts,
                    }
                ],
                indent=1,
            )
        )

    drop("f1.json", "2024-01-02 00:00:00.000", 100)  # newer arrives first
    p.run_available()
    drop("f2.json", "2024-01-01 12:00:00.000", 7)  # late, older event
    p.run_available()
    rows = p.silver.to_df().collect()
    assert len(rows) == 1 and rows[0]["num_visitors"] == 100, rows


def test_read_schema_columns_handles_decimals():
    from incremental_etl_on_lakehouse_spark import plans

    class FakeDF:  # duck-typed: only formatted_plan(df) is exercised
        pass

    plan = (
        "(1) Scan parquet\n"
        "ReadSchema: struct<l_quantity:decimal(12,2),l_tax:decimal(12,2),"
        "meta:struct<a:int,b:int>>\n"
    )
    orig = plans.formatted_plan
    plans.formatted_plan = lambda df: plan
    try:
        cols = plans.read_schema_columns(FakeDF())
    finally:
        plans.formatted_plan = orig
    assert cols == ["l_quantity", "l_tax", "meta"], cols


# ---------------------------------------------------------------------------
# round-5 advisor findings
# ---------------------------------------------------------------------------


def test_vacuum_orphan_sweep_has_safety_floor(spark, tmp_path):
    """vacuum(retention_ms≈0) must NOT delete a fresh unreferenced stage
    dir (a concurrent writer's staged-but-uncommitted files) — the
    mtime-based sweeps keep an ORPHAN_SAFETY_MS floor regardless of
    retention, lifted only by force=True."""
    schema = StructType([StructField("k", LongType())])
    t = LakeTable.create(spark, str(tmp_path / "floor"), schema)
    t.append(spark.createDataFrame([(1,)], schema))
    inflight = os.path.join(t.path, "data", "inflightstage")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "wb") as f:
        f.write(b"staged")
    swept = t.vacuum(retention_ms=-1)
    assert os.path.exists(inflight), swept
    # force lifts the floor (quiesced-table escape hatch)
    swept = t.vacuum(retention_ms=-1, force=True)
    assert not os.path.exists(inflight)
    assert any("inflightstage" in v for v in swept)


def test_copy_into_csv_rejects_shifted_header(spark, tmp_path):
    """A landing CSV whose header doesn't match the table columns must be
    rejected by name, not silently applied positionally (which shifts
    every value sideways); one carrying a GENERATED ALWAYS identity column
    must name that column."""
    t = make_identity_table(spark, tmp_path, "csvcopy")
    land = tmp_path / "land"
    land.mkdir()
    # good file: logical columns only, any header order
    (land / "a.csv").write_text("name\nx\ny\n")
    res = t.copy_into(str(land), pattern="a.csv", file_format="csv")
    assert res["num_rows"] == 2
    assert sorted(rids(t)) == [100, 105]
    # file explicitly supplying the identity column
    (land / "b.csv").write_text("name,rid\nz,999\n")
    with pytest.raises(ValueError, match="rid"):
        t.copy_into(str(land), pattern="b.csv", file_format="csv")
    # file with a wrong/unknown column
    (land / "c.csv").write_text("nome\nw\n")
    with pytest.raises(ValueError, match="does not match"):
        t.copy_into(str(land), pattern="c.csv", file_format="csv")
    # table state unchanged by the rejected files
    assert sorted(rids(t)) == [100, 105]


def test_copy_into_csv_header_order_independent(spark, tmp_path):
    """CSV columns in a different order than the table schema must land by
    NAME (header-driven schema), not by position."""
    schema = StructType(
        [StructField("a", LongType()), StructField("b", StringType())]
    )
    t = LakeTable.create(spark, str(tmp_path / "csvord"), schema)
    land = tmp_path / "land2"
    land.mkdir()
    (land / "r.csv").write_text("b,a\nhello,7\n")
    t.copy_into(str(land), pattern="r.csv", file_format="csv")
    row = t.to_df().collect()[0]
    assert (row["a"], row["b"]) == (7, "hello")


def test_catalog_view_claim_released_on_drop(spark, tmp_path):
    """Dropping a table must release its view-name claim: recreating a
    differently-owned table mapping to the same view name registers fine,
    while a LIVE ambiguity still raises."""
    from incremental_etl_on_lakehouse_spark.lake.catalog import LakeCatalog

    schema = StructType([StructField("id", LongType())])
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    t = cat.create_table("raw", "events_2024", schema)
    t.append(spark.createDataFrame([(1,)], schema))
    cat.register_views("raw")
    cat.drop_table("raw", "events_2024")
    # same view name, different owner — must NOT raise after the drop
    t2 = cat.create_table("raw_events", "2024", schema)
    t2.append(spark.createDataFrame([(2,)], schema))
    cat.register_views("raw_events")
    assert spark.sql("SELECT id FROM raw_events_2024").collect()[0]["id"] == 2
    # live ambiguity: both owners exist concurrently
    t3 = cat.create_table("raw", "events_2024", schema)
    t3.append(spark.createDataFrame([(3,)], schema))
    with pytest.raises(ValueError, match="collision"):
        cat.register_views("raw")
    # a FRESH instance sees the same live ambiguity (ownership is derived
    # from catalog contents, not per-instance memory)
    with pytest.raises(ValueError, match="collision"):
        LakeCatalog(spark, str(tmp_path / "cat")).register_views("raw")


# ---------------------------------------------------------------------------
# round-7 fixes for the round-5 review findings
# ---------------------------------------------------------------------------


def test_merge_insert_condition_may_not_reference_target(spark, tmp_path):
    """A WHEN NOT MATCHED condition referencing target columns is rejected
    at merge entry for EVERY merge — previously the same statement raised
    AnalysisException only when the target happened to be empty (the
    join-free fast path has no target columns) and NULL-evaluated the
    reference otherwise: state-dependent behavior. Delta's rule: NOT
    MATCHED conditions may reference the source only."""
    schema = StructType(
        [StructField("id", LongType()), StructField("v", StringType())]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema)
    src = spark.createDataFrame([(1, "a")], schema)
    for cond in (
        "target.v <> 'x'",
        "TARGET.v IS NULL",
        "`target`.`v` IS NULL",
    ):
        with pytest.raises(ValueError, match="source columns"):
            t.merge(
                src,
                "source.id = target.id",
                [MergeClause("insert", cond, "*")],
            )
    # empty AND non-empty targets behave identically (the bug was the
    # empty-target path raising while the non-empty path NULL-evaluated)
    t.append(spark.createDataFrame([(9, "z")], schema))
    with pytest.raises(ValueError, match="source columns"):
        t.merge(
            src, "source.id = target.id",
            [MergeClause("insert", "target.v IS NULL", "*")],
        )
    # a source-only condition mentioning 'target.' inside a STRING LITERAL
    # is fine — the scanner ignores quoted spans
    res = t.merge(
        src, "source.id = target.id",
        [MergeClause("insert", "source.v <> 'target.v'", "*")],
    )
    assert res["num_inserted_rows"] == 1


def test_merge_broadcast_gate_counts_pruned_subset(spark, tmp_path):
    """The merge broadcast gate must count rows of the files actually read
    (the stats-pruned subset when pruning fired), not the whole table —
    and a file with no recorded count must disable the hint, not be
    undercounted as 0. Functional guard: a stats-pruned merge on a table
    whose TOTAL rows exceed any single file's count still merges
    correctly (the gate is a plan hint, never a semantics change)."""
    schema = StructType(
        [StructField("id", LongType()), StructField("v", StringType())]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema, properties={"statsColumns": "id"}
    )
    # three files with disjoint id ranges
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame([(lo + i, f"v{lo+i}") for i in range(5)], schema)
        )
    src = spark.createDataFrame([(101, "NEW"), (300, "INS")], schema)
    res = t.merge(
        src,
        "source.id = target.id",
        [MergeClause("update", None, "*"), MergeClause("insert", None, "*")],
        stats_prune={"id": "id"},
    )
    assert res["num_updated_rows"] == 1
    assert res["num_inserted_rows"] == 1
    rows = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert rows[101] == "NEW" and rows[300] == "INS" and len(rows) == 16


def test_split_statements_double_quote_and_backtick(spark):
    """';' and '--' inside double-quoted strings or backtick identifiers
    are content, not separators/comments (previously only single quotes
    were scanned, so a script with "a;b" split mid-statement)."""
    from incremental_etl_on_lakehouse_spark.lake.sql import (
        split_statements,
        strip_comments,
    )

    stmts = split_statements(
        'SELECT "a;b" AS x; SELECT `weird;col` FROM t; '
        "SELECT 'lit;eral'"
    )
    assert len(stmts) == 3, stmts
    assert stmts[0] == 'SELECT "a;b" AS x'
    assert stmts[1] == "SELECT `weird;col` FROM t"
    # doubled-char escapes stay inside the span
    assert split_statements("SELECT \"he said \"\";\"\"\"; SELECT 1") == [
        'SELECT "he said "";"""',
        "SELECT 1",
    ]
    assert split_statements("SELECT `a``;b`; SELECT 2") == [
        "SELECT `a``;b`",
        "SELECT 2",
    ]
    # '--' inside any quoted span is not a comment
    assert strip_comments('SELECT "x--y", `a--b`, \'c--d\' -- real comment') == (
        'SELECT "x--y", `a--b`, \'c--d\' '
    )


def test_split_top_level_quoted_separators(spark):
    """A separator inside double-quoted strings or backtick identifiers is
    content: `SET v = "a,b"` is ONE assignment (same quote-scanning family
    as split_statements)."""
    from incremental_etl_on_lakehouse_spark.lake.sql import split_top_level

    assert split_top_level('v = "a,b", w = 2') == ['v = "a,b"', "w = 2"]
    assert split_top_level("`odd,col` = 1, w = 2") == ["`odd,col` = 1", "w = 2"]
    assert split_top_level("v = 'a,b', w = f(x, y)") == [
        "v = 'a,b'",
        "w = f(x, y)",
    ]
    # parens inside quoted spans don't change depth
    assert split_top_level('v = "a(b", w = 2') == ['v = "a(b"', "w = 2"]


def test_merge_insert_condition_validation_edges(spark, tmp_path):
    """Second-review refinements of the NOT MATCHED validation: (a) a
    'target.' inside a DOUBLE-quoted string literal is content (Spark's
    default mode reads double quotes as strings); (b) source.target.x is a
    struct field of SOURCE, not a target reference; (c) an UNQUALIFIED
    reference to a column only the target has is rejected at entry — it
    previously NULL-evaluated on a non-empty target but raised
    AnalysisException on the join-free empty-target plan."""
    from incremental_etl_on_lakehouse_spark.lake.table import (
        _refs_target,
        _unqualified_target_only_refs,
    )

    # (a)/(b): regex unit checks
    assert not _refs_target('source.v <> "target.v"')
    assert not _refs_target("source.target.x = 1")
    assert _refs_target("target.v IS NULL")
    assert _refs_target("`target`.v IS NULL")
    # (c): unqualified scanner
    assert _unqualified_target_only_refs("extra IS NULL", {"extra"}) == [
        "extra"
    ]
    assert _unqualified_target_only_refs("EXTRA IS NULL", {"extra"}) == [
        "EXTRA"
    ]  # case-insensitive, like Spark resolution
    assert _unqualified_target_only_refs("`extra` > 1", {"extra"}) == ["extra"]
    assert _unqualified_target_only_refs("source.extra = 1", {"extra"}) == []
    assert _unqualified_target_only_refs("extra(x) = 1", {"extra"}) == []
    assert _unqualified_target_only_refs("a.extra = 1", {"extra"}) == []
    assert _unqualified_target_only_refs("v = 'extra'", {"extra"}) == []

    # end-to-end: unqualified target-only column rejected on empty AND
    # non-empty targets alike
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("v", StringType()),
            StructField("extra", StringType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema)
    src = spark.createDataFrame(
        [(1, "a")],
        StructType([StructField("id", LongType()), StructField("v", StringType())]),
    )
    for populate in (False, True):
        if populate:
            t.append(spark.createDataFrame([(9, "z", "e")], schema))
        with pytest.raises(ValueError, match="target-only"):
            t.merge(
                src, "source.id = target.id",
                [MergeClause("insert", "extra IS NULL",
                             {"id": "source.id", "v": "source.v"})],
            )
    # a double-quoted literal mentioning target. is fine end-to-end
    res = t.merge(
        src, "source.id = target.id",
        [MergeClause("insert", 'source.v <> "target.v"',
                     {"id": "source.id", "v": "source.v"})],
    )
    assert res["num_inserted_rows"] == 1


def test_merge_insert_condition_keywords_and_case(spark, tmp_path):
    """Round-8 refinements of the NOT MATCHED lexical validation:
    (a) unquoted SQL keywords and interval units are NOT column
    references — ``source.ts > current_timestamp() - INTERVAL 1 DAY``
    must pass even when the target has a column literally named ``day``
    (backtick-quoted ```day``` stays strict); (b) a source column
    differing only in CASE from a target column still covers it under
    Spark's default case-insensitive resolution, so it must not be
    treated as target-only."""
    from incremental_etl_on_lakehouse_spark.lake.table import (
        _unqualified_target_only_refs,
    )

    # (a) keywords / interval units skipped when unquoted ...
    assert _unqualified_target_only_refs(
        "source.ts > current_timestamp() - INTERVAL 1 DAY", {"day", "interval"}
    ) == []
    assert _unqualified_target_only_refs(
        "source.v IS NOT NULL AND source.n BETWEEN 1 AND 2",
        {"is", "not", "null", "and", "between"},
    ) == []
    assert _unqualified_target_only_refs(
        "CASE WHEN source.v = 'x' THEN true ELSE false END", {"end", "when"}
    ) == []
    # ... but backtick-quoted collisions stay strict
    assert _unqualified_target_only_refs("`day` > 1", {"day"}) == ["day"]

    # (a) end-to-end: target has a column named 'day'; the interval
    # condition is legal and must not raise
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("v", StringType()),
            StructField("day", StringType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t_kw"), schema)
    src_schema = StructType(
        [StructField("id", LongType()), StructField("v", StringType())]
    )
    src = spark.createDataFrame([(1, "recent")], src_schema)
    res = t.merge(
        src,
        "source.id = target.id",
        [MergeClause(
            "insert",
            "source.v <> '' AND current_timestamp() - INTERVAL 1 DAY "
            "< current_timestamp()",
            {"id": "source.id", "v": "source.v"},
        )],
    )
    assert res["num_inserted_rows"] == 1

    # (b) case-only difference: target 'Extra' vs source 'EXTRA' — the
    # column is covered by the source, so referencing it is legal
    schema_b = StructType(
        [
            StructField("id", LongType()),
            StructField("v", StringType()),
            StructField("Extra", StringType()),
        ]
    )
    t2 = LakeTable.create(spark, str(tmp_path / "t_case"), schema_b)
    src2 = spark.createDataFrame(
        [(1, "a", "e")],
        StructType(
            [
                StructField("id", LongType()),
                StructField("v", StringType()),
                StructField("EXTRA", StringType()),
            ]
        ),
    )
    res2 = t2.merge(
        src2,
        "source.id = target.id",
        [MergeClause("insert", "EXTRA IS NOT NULL", "*")],
    )
    assert res2["num_inserted_rows"] == 1


def test_split_statements_backslash_escapes(spark):
    """Spark's default string literals honor backslash escapes: a ';' after
    an escaped quote is still inside the literal."""
    from incremental_etl_on_lakehouse_spark.lake.sql import (
        split_statements,
        strip_comments,
    )

    stmts = split_statements("SELECT 'it\\'s a test; really'; SELECT 2")
    assert stmts == ["SELECT 'it\\'s a test; really'", "SELECT 2"], stmts
    stmts = split_statements('SELECT "she said \\"hi;\\""; SELECT 3')
    assert stmts == ['SELECT "she said \\"hi;\\""', "SELECT 3"], stmts
    # a literal ending in an ESCAPED backslash closes normally
    assert split_statements("SELECT 'a\\\\'; SELECT 4") == [
        "SELECT 'a\\\\'",
        "SELECT 4",
    ]
    assert strip_comments("SELECT 'x\\'--y'") == "SELECT 'x\\'--y'"


def test_operator_param_validation(spark):
    """Out-of-domain parameters fail loudly: alpha outside [0,1] (above 1
    silently overflows micro-unit weights on large strata), n_buckets < 1."""
    from incremental_etl_on_lakehouse_spark.operators.sampling import (
        temperature_mix_sample,
    )
    from incremental_etl_on_lakehouse_spark.operators.text import (
        quality_buckets_by_threshold,
    )

    df = spark.createDataFrame([(1, "a")], "id long, g string")
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix_sample(df, "id", "g", target_rows=1, alpha=2.0)
    scored = spark.createDataFrame([(1, 1.0)], "doc_id long, cross_entropy double")
    with pytest.raises(ValueError, match="n_buckets"):
        quality_buckets_by_threshold(scored, n_buckets=0)
