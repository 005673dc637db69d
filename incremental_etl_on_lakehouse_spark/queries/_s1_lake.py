"""SURVEY §2.1 scans / sources / sinks + lake DDL & table-utility keys.

Split from the original single-module ``queries.py`` (round-5 refactor);
shares the registry, helpers, and imports of ``._core`` — registration
order (and therefore ``ordered_keys()``) is fixed by the import order in
``__init__``.
"""

from __future__ import annotations

from incremental_etl_on_lakehouse_spark.queries._core import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# §2.1 scans / sources / sinks
# ---------------------------------------------------------------------------


@query(
    "src_json_batch",
    "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,"
    " CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation",
)
def src_json_batch(spark, sf_dir):
    """Batch read of a multiline JSON file (ref notebooks/demo-notebook.py:146);
    round-trips `nation` through JSON to exercise reader + inference."""
    out = os.path.join(_tmpdir(), "nation_json")
    load_table(spark, "nation", sf_dir).coalesce(1).write.mode("overwrite").json(out)
    df = read_json_batch(spark, out, multiline=False)
    return df.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )


@query(
    "src_json_stream",
    "SELECT event_id, user_id, event_type, (epoch_ns(ts) // 1000000) AS ts_ms FROM events",
)
def src_json_stream(spark, sf_dir):
    """Streaming JSON file ingest, 1 file per micro-batch
    (ref notebooks/demo-notebook.py:158-167), availableNow semantics."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        F.when(F.col("ts") < TS_SPLIT, 0).otherwise(1).alias("half"),
    )
    land = os.path.join(_tmpdir(), "landing")
    for half in (0, 1):
        ev.where(F.col("half") == half).drop("half").coalesce(1).write.mode(
            "overwrite"
        ).json(os.path.join(land, f"f{half}"))
    # flatten: streaming file source wants one dir of files
    flat = os.path.join(_tmpdir(), "flat")
    os.makedirs(flat, exist_ok=True)
    for half in (0, 1):
        d = os.path.join(land, f"f{half}")
        for name in os.listdir(d):
            if name.endswith(".json"):
                shutil.copy(os.path.join(d, name), os.path.join(flat, f"{half}.json"))
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("ts_str", StringType()),
        ]
    )
    stream = read_json_stream(spark, flat, schema, multiline=False)
    sink_name = f"jsonsink_{uuid.uuid4().hex}"
    (
        stream.writeStream.format("memory")
        .queryName(sink_name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(sink_name).select(
        "event_id",
        "user_id",
        "event_type",
        MS(F.to_timestamp("ts_str", "yyyy-MM-dd HH:mm:ss.SSSSSS")).alias("ts_ms"),
    )


@query(
    "snk_delta_append",
    "SELECT event_id, user_id, (epoch_ns(ts) // 1000000) AS ts_ms, event_type, value FROM events",
)
def snk_delta_append(spark, sf_dir):
    """Append sink into a versioned lake table (ref :171-173), two commits."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", MS("ts").alias("ts_ms"), "event_type", "value", "ts"
    )
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts_ms", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    t = LakeTable.create(spark, os.path.join(_tmpdir(), "appends"), schema)
    t.append(ev.where(F.col("ts") < TS_SPLIT).drop("ts"))
    t.append(ev.where(F.col("ts") >= TS_SPLIT).drop("ts"))
    return t.to_df()


@query(
    "src_delta_stream",
    f"SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n_rows FROM events"
    f" WHERE ts < TIMESTAMP '{TS_SPLIT}'"
    f" UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM events"
    f" WHERE ts >= TIMESTAMP '{TS_SPLIT}'",
)
def src_delta_stream(spark, sf_dir):
    """Streaming source over lake-table appends: one micro-batch per commit
    (ref :282-283)."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "ts")
    schema = StructType([StructField("event_id", LongType())])
    root = _tmpdir()
    t = LakeTable.create(spark, os.path.join(root, "t"), schema)
    t.append(ev.where(F.col("ts") < TS_SPLIT).select("event_id"))
    t.append(ev.where(F.col("ts") >= TS_SPLIT).select("event_id"))
    reader = LakeStreamReader(t, os.path.join(root, "ck.json"), mode="append")
    seen: list[tuple[int, int]] = []
    reader.process_available(lambda df, v: seen.append((v, df.count())))
    return spark.createDataFrame(
        [(v, n) for v, n in seen], "version int, n_rows long"
    )


_SQL_CDF_CHANGES = (
    _SQL_CDC
    + """
SELECT user_id, 'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version, value_cents FROM s1
UNION ALL
SELECT s1.user_id, 'update_preimage', CAST(2 AS BIGINT), s1.value_cents
  FROM s1 JOIN l2 ON s1.user_id = l2.user_id WHERE l2.cdc_operation = 'UPDATE'
UNION ALL
SELECT l2.user_id, 'update_postimage', CAST(2 AS BIGINT), l2.value_cents
  FROM s1 JOIN l2 ON s1.user_id = l2.user_id WHERE l2.cdc_operation = 'UPDATE'
UNION ALL
SELECT s1.user_id, 'delete', CAST(2 AS BIGINT), s1.value_cents
  FROM s1 JOIN l2 ON s1.user_id = l2.user_id WHERE l2.cdc_operation = 'DELETE'
UNION ALL
SELECT l2.user_id, 'insert', CAST(2 AS BIGINT), l2.value_cents
  FROM l2 LEFT JOIN s1 ON s1.user_id = l2.user_id
  WHERE s1.user_id IS NULL AND l2.cdc_operation <> 'DELETE'
"""
)


@query("src_cdf_batch", _SQL_CDF_CHANGES)
def src_cdf_batch(spark, sf_dir):
    """Batch change-feed query with _change_type/_commit_version metadata
    (ref table_changes(), :363-373)."""
    silver = _run_cdc_silver(spark, sf_dir)
    return silver.read_changes(starting_version=1).select(
        "user_id", "_change_type", "_commit_version", "value_cents"
    )


@query("src_cdf_stream", _SQL_CDF_CHANGES)
def src_cdf_stream(spark, sf_dir):
    """Streaming change-feed source (ref :428-431): micro-batch per commit
    via the lake stream reader in cdf mode."""
    silver = _run_cdc_silver(spark, sf_dir)
    reader = LakeStreamReader(
        silver,
        os.path.join(_tmpdir(), "ck.json"),
        mode="cdf",
        starting_version=1,
    )
    batches: list[DataFrame] = []
    reader.process_available(
        lambda df, v: batches.append(
            df.select("user_id", "_change_type", "_commit_version", "value_cents")
        )
    )
    out = batches[0]
    for b in batches[1:]:
        out = out.unionByName(b)
    return out


@query(
    "src_time_travel",
    _SQL_CDC + "SELECT user_id, ts_ms, event_type, value_cents FROM s1",
)
def src_time_travel(spark, sf_dir):
    """VERSION AS OF read (ref :533-535): snapshot after the first merge."""
    silver = _run_cdc_silver(spark, sf_dir)
    return silver.to_df(version=1).select(
        "user_id", "ts_ms", "event_type", "value_cents"
    )


@query(
    "util_vacuum",
    "SELECT CAST(count(*) AS BIGINT) AS live_rows,"
    " CAST(true AS BOOLEAN) AS vacuumed_files_gone FROM nation",
)
def util_vacuum(spark, sf_dir):
    """VACUUM: physically delete merge-rewritten files past retention while
    the live snapshot stays fully readable. Builds a throwaway table from
    ``nation``, rewrites it with a merge, vacuums at retention 0, and
    returns (live row count, all-vacuumed-files-gone) — both assertable by
    the oracle because vacuum must never change the logical table."""
    nat = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").cast("long").alias("id"),
        F.col("n_name").alias("name"),
    )
    t = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "vac"),
        StructType(
            [StructField("id", LongType()), StructField("name", StringType())]
        ),
    )
    t.append(nat)
    t.merge(
        nat.select("id", F.initcap(F.col("name")).alias("name")),
        "source.id = target.id",
        [MergeClause("update", "source.name <> target.name", "*")],
    )
    deleted = t.vacuum(retention_ms=-1)
    gone = bool(deleted) and all(
        not os.path.isfile(t._abs(r)) for r in deleted
    )
    return t.to_df().groupBy().agg(
        F.count("*").alias("live_rows"),
        F.lit(gone).alias("vacuumed_files_gone"),
    )


@query(
    "util_vacuum_lite",
    "SELECT CAST(count(*) AS BIGINT) AS live_rows,"
    " CAST(true AS BOOLEAN) AS tombstones_gone,"
    " CAST(true AS BOOLEAN) AS orphan_untouched,"
    " CAST(true AS BOOLEAN) AS full_reclaims_orphan FROM nation",
)
def util_vacuum_lite(spark, sf_dir):
    """VACUUM LITE (Delta 3.3): log-driven reclaim with NO directory
    listing. Builds a throwaway table from ``nation``, rewrites it with a
    merge, plants a crashed-writer orphan stage dir (referenced by no
    commit), then asserts the lite pass deletes exactly the commit log's
    tombstoned files while the orphan survives — and a follow-up FULL
    vacuum (the listing flavor) reclaims the orphan. At 100 TB the lite
    pass is the routine cadence: O(log) metadata instead of a recursive
    LIST over millions of files; the full pass runs occasionally for
    crash residue the log cannot see."""
    import time as _time

    nat = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").cast("long").alias("id"),
        F.col("n_name").alias("name"),
    )
    t = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "vaclite"),
        StructType(
            [StructField("id", LongType()), StructField("name", StringType())]
        ),
    )
    t.append(nat)
    t.merge(
        nat.select("id", F.initcap(F.col("name")).alias("name")),
        "source.id = target.id",
        [MergeClause("update", "source.name <> target.name", "*")],
    )
    orphan = os.path.join(t.path, "data", "orphaned_stage_dir")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as fh:
        fh.write("x")
    old = _time.time() - 3600
    os.utime(orphan, (old, old))
    lite = t.vacuum(retention_ms=-1, lite=True)
    tombstones_gone = bool(lite) and all(
        not os.path.isfile(t._abs(r)) for r in lite
    )
    orphan_untouched = os.path.isdir(orphan) and not any(
        "orphaned_stage_dir" in r for r in lite
    )
    full = t.vacuum(retention_ms=-1, force=True)
    full_reclaims = any(
        "orphaned_stage_dir" in r for r in full
    ) and not os.path.isdir(orphan)
    return t.to_df().groupBy().agg(
        F.count("*").alias("live_rows"),
        F.lit(tombstones_gone).alias("tombstones_gone"),
        F.lit(orphan_untouched).alias("orphan_untouched"),
        F.lit(full_reclaims).alias("full_reclaims_orphan"),
    )


@query(
    "ddl_create_view",
    "SELECT CAST(n_regionkey AS BIGINT) AS region,"
    " CAST(count(*) AS BIGINT) AS n_nations,"
    " CAST(true AS BOOLEAN) AS listed,"
    " CAST(true AS BOOLEAN) AS persisted,"
    " CAST(true AS BOOLEAN) AS late_bound,"
    " CAST(true AS BOOLEAN) AS replaced,"
    " CAST(true AS BOOLEAN) AS shadow_blocked,"
    " CAST(true AS BOOLEAN) AS dropped"
    " FROM nation GROUP BY n_regionkey",
)
def ddl_create_view(spark, sf_dir):
    """Persistent views through the catalog (the reference's temp-view
    idiom, demo-notebook.py:236, made durable): CREATE VIEW stores the
    SELECT text in the metastore, SHOW VIEWS lists it, a FRESH catalog
    instance (new-session stand-in) resolves and queries it through the
    SELECT front door, reads are LATE-BOUND (new rows appear without
    re-creating the view), CREATE OR REPLACE swaps the definition, a
    table cannot shadow a view, and DROP VIEW unregisters it. The data
    rows come through the persisted view itself, so the oracle checks
    the resolved plan, not just bookkeeping booleans."""
    from incremental_etl_on_lakehouse_spark.lake.catalog import LakeCatalog

    nat = load_table(spark, "nation", sf_dir).select(
        F.col("n_regionkey").cast("long").alias("region"),
        F.col("n_name").alias("name"),
    )
    root = os.path.join(_tmpdir(), "cat")
    cat = LakeCatalog(spark, root)
    cat.create_database("db1")
    t = cat.create_table(
        "db1",
        "nations",
        StructType(
            [
                StructField("region", LongType()),
                StructField("name", StringType()),
            ]
        ),
    )
    # late binding: create the view over the EMPTY table, append after
    cat.sql(
        "CREATE VIEW db1.per_region AS"
        " SELECT region, count(*) AS n_nations"
        " FROM db1.nations GROUP BY region"
    )
    late_bound_empty = cat.read_view("db1", "per_region").count() == 0
    t.append(nat)
    listed = cat.sql("SHOW VIEWS IN db1") == ["per_region"]
    fresh = LakeCatalog(spark, root)  # new-session stand-in
    persisted = fresh.views("db1") == ["per_region"]
    out = fresh.sql("SELECT region, n_nations FROM db1.per_region")
    # OR REPLACE swaps the definition (columns change)
    cat.sql("CREATE VIEW db1.scratch AS SELECT region FROM db1.nations")
    cat.sql(
        "CREATE OR REPLACE VIEW db1.scratch AS"
        " SELECT name FROM db1.nations"
    )
    replaced = fresh.read_view("db1", "scratch").columns == ["name"]
    try:
        cat.create_table(
            "db1", "per_region",
            StructType([StructField("x", LongType())]),
        )
        shadow_blocked = False
    except ValueError:
        shadow_blocked = True
    cat.sql("DROP VIEW db1.scratch")
    dropped = fresh.views("db1") == ["per_region"]
    return out.select(
        "region",
        "n_nations",
        F.lit(listed).alias("listed"),
        F.lit(persisted).alias("persisted"),
        F.lit(late_bound_empty).alias("late_bound"),
        F.lit(replaced).alias("replaced"),
        F.lit(shadow_blocked).alias("shadow_blocked"),
        F.lit(dropped).alias("dropped"),
    )


@query(
    "ddl_create_matview",
    # full batch aggregate over ALL orders-derived rows = the MV's
    # post-refresh state; median uses the engine's lower-percentile
    # integer-rank definition (cum * 2 >= n), every output CAST BIGINT
    "WITH f AS (SELECT o_orderkey % 5 AS grp,"
    "  CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),"
    " hist AS (SELECT grp, v, count(*) AS cnt FROM f GROUP BY grp, v),"
    " cums AS (SELECT grp, v,"
    "   sum(cnt) OVER (PARTITION BY grp ORDER BY v) AS cum,"
    "   sum(cnt) OVER (PARTITION BY grp) AS n FROM hist),"
    " med AS (SELECT grp,"
    "   CAST(min(CASE WHEN cum * 2 >= n THEN v END) AS BIGINT) AS med"
    "   FROM cums GROUP BY grp)"
    " SELECT CAST(f.grp AS BIGINT) AS grp,"
    " CAST(sum(v) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_rows,"
    " round(CAST(sum(v) AS DOUBLE) / count(*), 4) AS avg_v,"
    " CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi,"
    " CAST(min(med.med) AS BIGINT) AS med,"
    " CAST(true AS BOOLEAN) AS stale_before_refresh,"
    " CAST(true AS BOOLEAN) AS join_mv_matches"
    " FROM f JOIN med ON f.grp = med.grp GROUP BY f.grp",
)
def ddl_create_matview(spark, sf_dir):
    """SQL-defined MATERIALIZED VIEWs (lake/matview.py): CREATE
    MATERIALIZED VIEW parses the aggregate query and binds it to the
    incremental maintainers — IncrementalAggView for the single-table
    full algebra (here SUM/COUNT/AVG/MIN/MAX/MEDIAN), IncrementalJoinView
    for two-table equi-joins. Reads are SNAPSHOT reads (the batch-2
    append is invisible until REFRESH — attested), REFRESH folds only the
    change feed (O(changed rows), never a base rescan), and a join MV
    over fact⋈dim must equal the batch join aggregate (attested). The
    oracle recomputes the full batch aggregate over everything appended."""
    from incremental_etl_on_lakehouse_spark.lake.catalog import LakeCatalog

    src = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").cast("long").alias("k"),
        (F.col("o_orderkey") % 5).cast("long").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    root = os.path.join(_tmpdir(), "cat")
    cat = LakeCatalog(spark, root)
    cat.create_database("db1")
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("grp", LongType()),
            StructField("v", LongType()),
        ]
    )
    fact = cat.create_table(
        "db1", "fact", schema,
        properties={"enableChangeDataFeed": "true", "statsColumns": "k"},
    )
    fact.append(src.where(F.col("k") % 2 == 0))
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.mv AS"
        " SELECT grp, sum(v) AS total, count(*) AS n_rows, avg(v) AS avg_v,"
        " min(v) AS lo, max(v) AS hi, median(v) AS med"
        " FROM db1.fact GROUP BY grp"
    )
    half = {r["grp"]: r["total"] for r in cat.read_matview("db1", "mv").collect()}
    fact.append(src.where(F.col("k") % 2 == 1))
    stale = {
        r["grp"]: r["total"] for r in cat.read_matview("db1", "mv").collect()
    } == half
    cat.sql("REFRESH MATERIALIZED VIEW db1.mv")
    # join MV: fact ⋈ dim, maintained from both feeds, equals batch agg
    dim = cat.create_table(
        "db1", "dim",
        StructType(
            [StructField("k", LongType()), StructField("seg", LongType())]
        ),
        properties={"enableChangeDataFeed": "true", "statsColumns": "k"},
    )
    dim.append(src.select("k", (F.col("k") % 3).alias("seg")))
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.jmv AS"
        " SELECT seg, sum(v) AS total, count(*) AS n"
        " FROM db1.fact JOIN db1.dim USING (k) GROUP BY seg"
    )
    got = {
        tuple(r)
        for r in cat.sql("SELECT seg, total, n FROM db1.jmv").collect()
    }
    want = {
        tuple(r)
        for r in src.groupBy((F.col("k") % 3).alias("seg"))
        .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    join_ok = got == want
    return cat.sql(
        "SELECT grp, total, n_rows, avg_v, lo, hi, med FROM db1.mv"
    ).select(
        "grp",
        "total",
        "n_rows",
        F.round(F.col("avg_v"), 4).alias("avg_v"),
        "lo",
        "hi",
        "med",
        F.lit(stale).alias("stale_before_refresh"),
        F.lit(join_ok).alias("join_mv_matches"),
    )


@query(
    "ddl_create_like",
    "SELECT CAST(count(*) AS BIGINT) AS src_rows,"
    " CAST(0 AS BIGINT) AS like_rows,"
    " CAST(true AS BOOLEAN) AS schema_copied,"
    " CAST(true AS BOOLEAN) AS partitioning_copied,"
    " CAST(true AS BOOLEAN) AS properties_copied FROM nation",
)
def ddl_create_like(spark, sf_dir):
    """CREATE TABLE ... LIKE (Delta parity): a new EMPTY table carrying
    the source's schema, partitioning, and table properties — the
    definition-copy sibling of CLONE. Runs through the SQL front door
    (``CREATE TABLE dst LIKE src``) and asserts zero data copied, schema
    equality, and partition/property inheritance; the copy is O(metadata)
    at any table size (one commit, no data movement)."""
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_statement

    nat = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").cast("long").alias("id"),
        F.col("n_regionkey").cast("long").alias("region"),
        F.col("n_name").alias("name"),
    )
    root = _tmpdir()
    src = LakeTable.create(
        spark,
        os.path.join(root, "src"),
        StructType(
            [
                StructField("id", LongType()),
                StructField("region", LongType()),
                StructField("name", StringType()),
            ]
        ),
        properties={"enableChangeDataFeed": "true"},
        partition_by=["region"],
    )
    src.append(nat)
    dst = execute_statement(
        spark,
        "CREATE TABLE dst LIKE src",
        lambda name: src,
        dest_path=os.path.join(root, "dst"),
    )
    return src.to_df().groupBy().agg(
        F.count("*").alias("src_rows"),
        F.lit(dst.to_df().count()).cast("long").alias("like_rows"),
        F.lit(dst.schema() == src.schema()).alias("schema_copied"),
        F.lit(dst.partition_columns() == ["region"]).alias(
            "partitioning_copied"
        ),
        F.lit(
            dst.properties().get("enableChangeDataFeed") == "true"
        ).alias("properties_copied"),
    )


@query(
    "util_optimize_zorder",
    "SELECT CAST(c_custkey AS BIGINT) AS custkey,"
    " CAST(c_nationkey AS BIGINT) AS nationkey, c_acctbal AS acctbal"
    " FROM customer",
)
def util_optimize_zorder(spark, sf_dir):
    """OPTIMIZE ZORDER BY: rewrite a multiply-appended table clustered on
    the interleaved-bit z-value of (nationkey, acctbal) so file min/max
    stats prune on BOTH dimensions. The oracle checks the rewrite is purely
    physical (content identical to the source); the in-key assertions check
    the clustering actually prunes — each dimension independently skips
    files after OPTIMIZE where the interleaved appends could skip none."""
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").cast("long").alias("custkey"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    t = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "zopt"),
        cust.schema,
        properties={"statsColumns": "nationkey,acctbal"},
    )
    # four interleaved appends: every file spans ~all nations and balances
    for part in range(4):
        t.append(cust.where(F.col("custkey") % 4 == part).coalesce(1))
    pre_n = len(t.files())
    # pre-OPTIMIZE: interleaved appends -> NO range prunes on either dim
    nat_q = [(0, 5), (6, 11), (12, 17), (18, 24)]
    bal_q = [(-1000.0, 1750.0), (1750.0, 4500.0), (4500.0, 7250.0), (7250.0, 10000.0)]
    assert all(
        len(t.files_matching({"nationkey": r})) == pre_n for r in nat_q
    )
    t.compact(target_file_rows=max(1, cust.count() // 8), zorder_by=["nationkey", "acctbal"])
    n = len(t.files())
    assert n >= 4, f"expected a multi-file rewrite, got {n}"
    # post-OPTIMIZE: every clustered dimension prunes. Probing quartile
    # ranges of each domain (instead of one fixed range) keeps the check
    # scale-independent: z-range file boundaries land at arbitrary
    # z-values, so any single range can straddle a boundary, but the
    # quartile AGGREGATE must beat no-pruning and the best quartile must
    # skip files, at every sf.
    for col, ranges in (("nationkey", nat_q), ("acctbal", bal_q)):
        counts = [len(t.files_matching({col: r})) for r in ranges]
        assert min(counts) < n, (col, counts)
        assert sum(counts) < len(ranges) * n, (col, counts)
    return t.to_df()


@query(
    "util_restore",
    "SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS name FROM nation",
)
def util_restore(spark, sf_dir):
    """RESTORE TO VERSION AS OF: metadata-only rollback of a bad overwrite.
    Loads nation, overwrites it with a corrupted variant, restores v1, and
    returns the live content — which the oracle checks equals the original
    (proving the rollback) while history keeps the bad version auditable."""
    nat = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").cast("long").alias("id"),
        F.col("n_name").alias("name"),
    )
    t = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "restore"),
        StructType(
            [StructField("id", LongType()), StructField("name", StringType())]
        ),
    )
    t.append(nat)
    t.overwrite(nat.select("id", F.upper(F.col("name")).alias("name")).limit(5))
    v_bad = t.version()
    t.restore(1)
    assert t.version() == v_bad + 1
    assert {h["version"]: h["operation"] for h in t.history()}[v_bad + 1] == "RESTORE"
    assert t.to_df(version=v_bad).count() == 5  # bad snapshot still auditable
    return t.to_df()


@query(
    "src_time_travel_ts",
    _SQL_CDC + "SELECT user_id, ts_ms, event_type, value_cents FROM s1",
)
def src_time_travel_ts(spark, sf_dir):
    """TIMESTAMP AS OF read (Delta's companion to VERSION AS OF, ref
    :533-535): resolve the first-merge commit's wall-clock timestamp to its
    version from log metadata alone, then read that snapshot — must equal
    the VERSION AS OF 1 result."""
    silver = _run_cdc_silver(spark, sf_dir)
    ts_v1 = next(h["timestamp_ms"] for h in silver.history() if h["version"] == 1)
    return silver.to_df(timestamp_ms=ts_v1).select(
        "user_id", "ts_ms", "event_type", "value_cents"
    )


@query(
    "snk_merge",
    _SQL_CDC + "SELECT user_id, ts_ms, event_type, value_cents FROM final",
)
def snk_merge(spark, sf_dir):
    """MERGE as the sink of a pipeline stage (ref :244-280): final snapshot
    after both CDC batches."""
    silver = _run_cdc_silver(spark, sf_dir)
    return silver.to_df().select("user_id", "ts_ms", "event_type", "value_cents")


# Ported SQL-statement shape: follows the reference's MERGE text
# (demo-notebook.py:244-280, Databricks License — see NOTICE at the repo
# root), including two inline comment lines; the key's contract is that
# the reference's SQL-text MERGE interface runs verbatim on this engine.
_MERGE_SQL_TEXT = """
    MERGE INTO silver_table target
    USING
    (
          SELECT user_id, ts_ms, event_type, value_cents, data_hash, cdc_operation
          FROM
          (
                  -- Remove duplicates within a batch (e.g. quick succession UPDATES)
                  SELECT    *
                          , ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) as rnk
                  FROM {view}
                  QUALIFY rnk = 1
          )
      ) source
      on source.user_id = target.user_id
      WHEN MATCHED
          AND source.cdc_operation = 'DELETE'
          AND source.ts_ms > target.ts_ms
          THEN DELETE
      -- Only processes UPDATEs when there is a data change / removes inter-batch duplicates
      WHEN MATCHED
          AND source.cdc_operation = 'UPDATE'
          AND source.data_hash <> target.data_hash
          AND source.ts_ms > target.ts_ms
          THEN UPDATE SET *
      WHEN NOT MATCHED
          AND source.cdc_operation <> 'DELETE'
          THEN INSERT *
"""


@query(
    "snk_merge_sql",
    _SQL_CDC + "SELECT user_id, ts_ms, event_type, value_cents FROM final",
)
def snk_merge_sql(spark, sf_dir):
    """The reference's SQL-text MERGE interface (ref :244-280): the same CDC
    pipeline as ``snk_merge`` driven entirely through ``MERGE INTO`` text —
    subquery source with QUALIFY dedup, comments, DELETE / hash-guarded
    UPDATE SET * / guarded INSERT * — parsed and executed by
    ``lake.sql.execute_merge``. Oracle identical to snk_merge: the SQL
    front-end must be semantics-preserving."""
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_merge

    b1, b2 = _cdc_batches(spark, sf_dir)
    silver = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "silver_sql"),
        SILVER_SCHEMA,
        properties={"statsColumns": "user_id"},
    )
    for i, batch in enumerate((b1, b2)):
        view = f"snk_merge_sql_batch_{i}"
        batch.createOrReplaceTempView(view)
        execute_merge(
            spark,
            _MERGE_SQL_TEXT.format(view=view),
            resolve={"silver_table": silver},
            stats_prune={"user_id": "user_id"},
        )
    return silver.to_df().select("user_id", "ts_ms", "event_type", "value_cents")


@query(
    "snk_update_delete_sql",
    "SELECT CAST(c_custkey AS BIGINT) AS id, c_mktsegment AS seg,"
    " CAST(CASE WHEN c_mktsegment = 'BUILDING'"
    "  THEN CAST(c_acctbal AS DECIMAL(12,2)) * 2 ELSE CAST(c_acctbal AS DECIMAL(12,2)) END"
    "  AS DOUBLE) AS bal"
    " FROM customer WHERE NOT (c_acctbal < 0)",
)
def snk_update_delete_sql(spark, sf_dir):
    """SQL-text UPDATE and DELETE against a lake table (Delta's everyday
    DML surface beyond MERGE): UPDATE doubles BUILDING balances, DELETE
    drops negative ones — both as statement text through
    ``lake.sql.execute_update/execute_delete`` (alias-qualified, with
    comments), each rewriting only stat/file-touched files. The oracle
    replays the post-state in plain SQL. Note the DELETE keeps NULL-
    evaluating rows per SQL semantics (condition coalesced to FALSE)."""
    from incremental_etl_on_lakehouse_spark.lake.sql import (
        execute_delete,
        execute_update,
    )

    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast(DEC).alias("bal"),
    )
    t = LakeTable.create(
        spark, os.path.join(_tmpdir(), "dml"), cust.schema,
        properties={"statsColumns": "id"},
    )
    t.append(cust)
    execute_update(
        spark,
        "UPDATE dml AS t SET t.bal = t.bal * 2  -- double the segment\n"
        " WHERE t.seg = 'BUILDING'",
        resolve={"dml": t},
    )
    execute_delete(
        spark,
        "DELETE FROM dml t WHERE t.bal < 0",
        resolve={"dml": t},
    )
    return t.to_df().select("id", "seg", F.col("bal").cast("double").alias("bal"))


@query(
    "util_history",
    "SELECT * FROM (VALUES"
    " (CAST(0 AS BIGINT), 'CREATE',    CAST(NULL AS BIGINT)),"
    " (CAST(1 AS BIGINT), 'APPEND',    CAST(25 AS BIGINT)),"
    " (CAST(2 AS BIGINT), 'APPEND',    CAST(25 AS BIGINT)),"
    " (CAST(3 AS BIGINT), 'UPDATE',    CAST(NULL AS BIGINT)),"
    " (CAST(4 AS BIGINT), 'DELETE',    CAST(NULL AS BIGINT)),"
    " (CAST(5 AS BIGINT), 'COMPACT',   CAST(NULL AS BIGINT))"
    ") t(version, operation, num_inserted_rows)",
)
def util_history(spark, sf_dir):
    """DESCRIBE HISTORY (the reference's table-audit surface, Delta
    `history()`): a deterministic command sequence — create, two appends,
    UPDATE, DELETE, OPTIMIZE — whose audit log (version, operation,
    insert metric) is exact and literally enumerable by the oracle.
    History is driver-side commit metadata; no data scan."""
    nat = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").cast("long").alias("id"),
        F.col("n_name").alias("name"),
    )
    t = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "hist"),
        StructType(
            [StructField("id", LongType()), StructField("name", StringType())]
        ),
    )
    t.append(nat)
    t.append(nat.select((F.col("id") + 100).alias("id"), "name"))
    t.update({"name": "upper(name)"}, "id < 3")
    t.delete("id >= 120")
    t.compact(target_file_rows=10)
    rows = [
        (h["version"], h["operation"], h["metrics"].get("num_inserted_rows"))
        for h in t.history()
    ]
    return spark.createDataFrame(
        rows, "version long, operation string, num_inserted_rows long"
    )


@query(
    "ddl_partitioned_table",
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n,"
    " CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents"
    " FROM events WHERE event_type = 'purchase' GROUP BY event_type",
)
def ddl_partitioned_table(spark, sf_dir):
    """Partitioned table DDL + partition-pruned read (the 100 TB layout the
    reference's unpartitioned demo tables skip — SURVEY §4 'partition
    Silver by date'): events land hive-partitioned by event_type, and the
    single-partition aggregate's scan must carry a PartitionFilter — whole
    directories skipped at planning time, asserted in-key on the executed
    plan."""
    from incremental_etl_on_lakehouse_spark import plans

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "part_events"),
        ev.schema,
        partition_by=["event_type"],
    )
    t.append(ev)
    one = t.to_df().where(F.col("event_type") == "purchase")
    assert "PartitionFilters" in plans.formatted_plan(one)
    return one.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("cents").alias("sum_cents")
    )


@query(
    "ddl_create_table",
    "SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS VARCHAR) AS country,"
    " CAST(NULL AS BIGINT) AS sum_visitors WHERE 1 = 0",
)
def ddl_create_table(spark, sf_dir):
    """CREATE TABLE with fixed schema + CDF property (ref :211-227)."""
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("country", StringType()),
            StructField("sum_visitors", LongType()),
        ]
    )
    t = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "ddl"),
        schema,
        properties={"enableChangeDataFeed": "true"},
    )
    assert t.cdf_enabled()
    return t.to_df()


@query(
    "ddl_catalog_metastore",
    "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,"
    " CASE WHEN n_regionkey = 0 THEN upper(n_name) ELSE n_name END AS n_name,"
    " CAST(n_regionkey AS BIGINT) AS n_regionkey,"
    " true AS survives_new_instance, true AS external_registered,"
    " true AS external_drop_kept_data"
    " FROM nation ORDER BY n_nationkey",
)
def ddl_catalog_metastore(spark, sf_dir):
    """Persistent metastore (lake/catalog.py): the db.table -> path mapping
    is a put-if-absent entry log under <root>/_metastore (same LogStore
    seam as table commits), so it survives catalog instances/sessions —
    the OSS stand-in for Unity Catalog's persistent 3-level namespace
    (ref notebooks/demo-notebook.py:80-110) with external locations (the
    reference's S3 tables, setup/incremental-etl-helper.py:6-19).

    Attested: a FRESH catalog instance resolves both the managed table and
    an external registration a directory listing could never recover
    (survives_new_instance, external_registered); dropping the external
    name leaves its data intact (external_drop_kept_data). The returned
    rows went through the fresh instance's resolver-routed SQL UPDATE, so
    the oracle also pins that the resolver addressed the right table."""
    from incremental_etl_on_lakehouse_spark.lake.catalog import LakeCatalog
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_statement

    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
        ]
    )
    nat = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").cast("long"),
        "n_name",
        F.col("n_regionkey").cast("long"),
    )
    root = os.path.join(_tmpdir(), "cat")
    cat1 = LakeCatalog(spark, root)
    cat1.create_table("sales", "nations", schema).append(nat)
    ext_path = os.path.join(_tmpdir(), "landed_ext")
    LakeTable.create(spark, ext_path, schema).append(nat.limit(1))
    cat1.register_table("sales", "landed", ext_path)

    cat2 = LakeCatalog(spark, root)  # fresh instance = new-session stand-in
    survives_new_instance = cat2.tables("sales") == ["landed", "nations"]
    external_registered = cat2.is_external("sales", "landed") and not (
        cat2.is_external("sales", "nations")
    )
    execute_statement(
        spark,
        "UPDATE sales.nations SET n_name = upper(n_name) WHERE n_regionkey = 0",
        cat2.resolver(),
    )
    cat2.drop_table("sales", "landed")
    external_drop_kept_data = LakeTable.exists(ext_path) and (
        "landed" not in cat2.tables("sales")
    )
    return (
        cat2.table("sales", "nations")
        .to_df()
        .select(
            "n_nationkey",
            "n_name",
            "n_regionkey",
            F.lit(bool(survives_new_instance)).alias("survives_new_instance"),
            F.lit(bool(external_registered)).alias("external_registered"),
            F.lit(bool(external_drop_kept_data)).alias(
                "external_drop_kept_data"
            ),
        )
        .orderBy("n_nationkey")
    )


@query(
    "ddl_catalog_3level",
    "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,"
    " CASE WHEN n_regionkey = 0 THEN upper(n_name) ELSE n_name END AS n_name,"
    " CAST(n_regionkey AS BIGINT) AS n_regionkey,"
    " true AS catalogs_listed, true AS cross_catalog_isolated,"
    " true AS survives_new_instance, true AS drop_cascade_removed"
    " FROM nation ORDER BY n_nationkey",
)
def ddl_catalog_3level(spark, sf_dir):
    """Three-level catalog.database.table namespace (lake/catalog.py:
    Lakehouse) — the reference's Unity Catalog shape: ``CREATE CATALOG IF
    NOT EXISTS``, databases created under catalog-qualified names, tables
    addressed as ``{catalog}.{database}.{table}`` (ref
    notebooks/demo-notebook.py:80-110). A catalog is a metastore-root
    prefix: each one is an independent persistent LakeCatalog.

    Attested: SHOW CATALOGS lists both created catalogs
    (catalogs_listed); an identically-named table in a second catalog
    holds different data and neither write leaked across
    (cross_catalog_isolated); a FRESH Lakehouse instance resolves the
    3-part name (survives_new_instance); DROP CATALOG CASCADE removes the
    second catalog (drop_cascade_removed). The returned rows went through
    a USE CATALOG + 2-part SQL UPDATE on the fresh instance, so the
    oracle also pins default-catalog resolution."""
    from incremental_etl_on_lakehouse_spark.lake.catalog import Lakehouse

    nat = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").cast("long"),
        "n_name",
        F.col("n_regionkey").cast("long"),
    )
    root = os.path.join(_tmpdir(), "lh")
    lh = Lakehouse(spark, root)
    lh.sql("CREATE CATALOG IF NOT EXISTS dev")
    lh.sql("CREATE CATALOG IF NOT EXISTS prod")
    lh.sql("CREATE DATABASE IF NOT EXISTS dev.sales")
    lh.sql("CREATE DATABASE IF NOT EXISTS prod.sales")
    lh.sql(
        "CREATE TABLE dev.sales.nations"
        " (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)"
    )
    lh.sql(
        "CREATE TABLE prod.sales.nations"
        " (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)"
    )
    lh.table("dev.sales.nations").append(nat)
    lh.table("prod.sales.nations").append(
        nat.limit(1).select(
            F.lit(999).cast("long").alias("n_nationkey"),
            F.lit("prod-only").alias("n_name"),
            F.lit(0).cast("long").alias("n_regionkey"),
        )
    )
    catalogs_listed = lh.sql("SHOW CATALOGS") == ["dev", "prod"]

    lh2 = Lakehouse(spark, root)  # fresh instance = new-session stand-in
    survives_new_instance = (
        lh2.table("dev.sales.nations").to_df().count() == nat.count()
    )
    lh2.sql("USE CATALOG dev")
    lh2.sql(
        "UPDATE sales.nations SET n_name = upper(n_name)"
        " WHERE n_regionkey = 0"
    )
    prod_rows = [
        tuple(r) for r in lh2.table("prod.sales.nations").to_df().collect()
    ]
    cross_catalog_isolated = prod_rows == [(999, "prod-only", 0)]
    lh2.sql("DROP CATALOG prod CASCADE")
    drop_cascade_removed = lh2.catalogs() == ["dev"]
    return (
        lh2.table("dev.sales.nations")
        .to_df()
        .select(
            "n_nationkey",
            "n_name",
            "n_regionkey",
            F.lit(bool(catalogs_listed)).alias("catalogs_listed"),
            F.lit(bool(cross_catalog_isolated)).alias(
                "cross_catalog_isolated"
            ),
            F.lit(bool(survives_new_instance)).alias("survives_new_instance"),
            F.lit(bool(drop_cascade_removed)).alias("drop_cascade_removed"),
        )
        .orderBy("n_nationkey")
    )


@query(
    "util_row_tracking",
    "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,"
    " CASE WHEN n_regionkey = 0 THEN upper(n_name) ELSE n_name END AS n_name,"
    " CAST(n_regionkey AS BIGINT) AS n_regionkey,"
    " CAST(n_nationkey AS BIGINT) AS row_id,"
    " true AS ids_survive_optimize, true AS ids_survive_update,"
    " true AS insert_minted_fresh FROM nation"
    " UNION ALL SELECT 999, 'wakanda', 4, -1, true, true, true"
    " ORDER BY n_nationkey",
)
def util_row_tracking(spark, sf_dir):
    """Row tracking (Delta's enableRowTracking; lake/table.py:
    row_tracking_enabled): stable per-row ids that survive physical
    rewrites. Base ids are assigned in the commit-log state fold (each add
    entry gets a fresh [base, base+rows) range off a monotone high-water
    mark; an unrewritten row's id = base + file position), and OPTIMIZE/
    UPDATE/MERGE rewrites MATERIALIZE ids into a physical __row_id column
    of the rewritten files — reads coalesce the two forms, so ids are
    exactly reproducible: the oracle pins row_id == n_nationkey (one
    coalesce(1) append of the sorted nation table), which only holds if
    compaction and update both preserved every id.

    Attested: ids unchanged across OPTIMIZE (ids_survive_optimize) and
    across an UPDATE rewrite (ids_survive_update); a MERGE insert mints a
    fresh id distinct from every existing one (insert_minted_fresh). The
    planted row's literal id is a function of rewrite history (every
    staged file advances the high-water mark), so it is normalized to -1
    in the hash — its freshness is what the boolean pins."""
    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
        ]
    )
    nat = (
        load_table(spark, "nation", sf_dir)
        .select(
            F.col("n_nationkey").cast("long"),
            "n_name",
            F.col("n_regionkey").cast("long"),
        )
        .orderBy("n_nationkey")
    )
    t = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "rowtrack"),
        schema,
        properties={"enableRowTracking": "true"},
    )
    t.append(nat.coalesce(1))  # one sorted file: row_id == n_nationkey
    ids0 = {
        r.n_nationkey: r._row_id
        for r in t.to_df(with_row_ids=True).collect()
    }
    t.compact(target_file_rows=7)  # forces a multi-file physical rewrite
    ids1 = {
        r.n_nationkey: r._row_id
        for r in t.to_df(with_row_ids=True).collect()
    }
    ids_survive_optimize = ids1 == ids0
    t.update({"n_name": "upper(n_name)"}, "n_regionkey = 0")
    ids2 = {
        r.n_nationkey: r._row_id
        for r in t.to_df(with_row_ids=True).collect()
    }
    ids_survive_update = ids2 == ids0
    # range(1)-based literal source (not createDataFrame): the RDD-backed
    # form slices 1 row across defaultParallelism partitions and reports
    # the unknown-size sentinel, which blocks the merge's micro-probe gate
    t.merge(
        spark.range(1).select(
            F.lit(999).cast("long").alias("n_nationkey"),
            F.lit("wakanda").alias("n_name"),
            F.lit(4).cast("long").alias("n_regionkey"),
        ),
        "source.n_nationkey = target.n_nationkey",
        [MergeClause("insert", None, "*")],
    )
    ids3 = {
        r.n_nationkey: r._row_id
        for r in t.to_df(with_row_ids=True).collect()
    }
    insert_minted_fresh = ids3[999] not in set(ids0.values()) and len(
        set(ids3.values())
    ) == len(ids3)
    return (
        t.to_df(with_row_ids=True)
        .select(
            "n_nationkey",
            "n_name",
            "n_regionkey",
            F.when(F.col("n_nationkey") == 999, F.lit(-1))
            .otherwise(F.col("_row_id"))
            .alias("row_id"),
            F.lit(bool(ids_survive_optimize)).alias("ids_survive_optimize"),
            F.lit(bool(ids_survive_update)).alias("ids_survive_update"),
            F.lit(bool(insert_minted_fresh)).alias("insert_minted_fresh"),
        )
        .orderBy("n_nationkey")
    )


@query(
    "ddl_constraints",
    "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,"
    " CAST(n_regionkey AS BIGINT) AS n_regionkey,"
    " 2 AS n_rejected, true AS log_ok FROM nation"
    " UNION ALL SELECT 99, 'zephyr', 4, 2, true"
    " ORDER BY n_nationkey",
)
def ddl_constraints(spark, sf_dir):
    """CHECK / NOT NULL constraints (Delta's ALTER TABLE ADD CONSTRAINT /
    column invariants, lake/table.py: add_constraint): two constraints are
    added, a valid batch lands, two violating batches are rejected at the
    staged-file gate WITHOUT advancing the version, one constraint is
    dropped (property tombstone) and a previously-blocked row then lands.
    The oracle pins the exact surviving rows plus the rejection count and
    the commit-version bookkeeping, so enforcement, atomicity of the
    rejected writes, and the drop are all hash-attested."""
    from incremental_etl_on_lakehouse_spark.lake.table import (
        ConstraintViolationError,
    )

    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
        ]
    )
    t = LakeTable.create(spark, os.path.join(_tmpdir(), "cons"), schema)
    t.add_constraint("region_range", "n_regionkey BETWEEN 0 AND 4")
    t.add_not_null("n_name")
    nat = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").cast("long"),
        "n_name",
        F.col("n_regionkey").cast("long"),
    )
    t.append(nat)
    v_after_good = t.version()
    rejected = 0
    for bad in [(98, "outlaw", 7), (99, None, 4)]:
        try:
            t.append(spark.createDataFrame([bad], schema))
        except ConstraintViolationError:
            rejected += 1
    atomic = t.version() == v_after_good
    t.drop_constraint("region_range")
    t.append(spark.createDataFrame([(99, "zephyr", 4)], schema))
    ops = [h["operation"] for h in t.history()]
    log_ok = (
        atomic
        and ops.count("APPEND") == 2
        and "ADD CONSTRAINT" in ops
        and "DROP CONSTRAINT" in ops
        and "region_range" not in t.constraints()
        and "nn_n_name" in t.constraints()
    )
    return t.to_df().select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        F.lit(rejected).alias("n_rejected"),
        F.lit(bool(log_ok)).alias("log_ok"),
    ).orderBy("n_nationkey")


@query(
    "ddl_clone_shallow",
    "SELECT * FROM (SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey,"
    " r_name, 'source' AS side, true AS zero_copy FROM region"
    " UNION ALL SELECT CAST(r_regionkey AS BIGINT), r_name, 'clone', true"
    " FROM region"
    " UNION ALL SELECT 9, 'new-in-clone', 'clone', true)"
    " ORDER BY side, r_regionkey",
)
def ddl_clone_shallow(spark, sf_dir):
    """SHALLOW CLONE (Delta's CREATE TABLE ... SHALLOW CLONE,
    lake/table.py: clone): the clone's v0 commit references the source
    snapshot's files by path — zero bytes copied (attested by the
    zero_copy column: every clone v0 file resolves inside the source dir)
    — then evolves independently (an appended row shows up only on the
    clone side). Source rows re-read AFTER the clone append prove
    isolation in both directions."""
    src_path = os.path.join(_tmpdir(), "clsrc")
    schema = StructType(
        [StructField("r_regionkey", LongType()), StructField("r_name", StringType())]
    )
    t = LakeTable.create(spark, src_path, schema)
    t.append(
        load_table(spark, "region", sf_dir).select(
            F.col("r_regionkey").cast("long"), "r_name"
        )
    )
    clone = t.clone(os.path.join(_tmpdir(), "clone"), shallow=True)
    zero_copy = bool(clone.files()) and all(
        os.path.realpath(f).startswith(os.path.realpath(t.path))
        for f in clone.files()
    )
    clone.append(spark.createDataFrame([(9, "new-in-clone")], schema))
    src_df = t.to_df().select(
        "r_regionkey", "r_name", F.lit("source").alias("side")
    )
    clone_df = clone.to_df().select(
        "r_regionkey", "r_name", F.lit("clone").alias("side")
    )
    return (
        src_df.unionByName(clone_df)
        .withColumn("zero_copy", F.lit(bool(zero_copy)))
        .orderBy("side", "r_regionkey")
    )


@query(
    "ddl_rename_column",
    "SELECT CAST(n_nationkey AS BIGINT) AS nation_key, n_name,"
    " CAST(n_regionkey AS BIGINT) AS region_key, true AS zero_rewrite"
    " FROM nation"
    " UNION ALL SELECT 99, 'zephyr', 0, true ORDER BY nation_key",
)
def ddl_rename_column(spark, sf_dir):
    """ALTER TABLE RENAME COLUMN via column mapping (lake/table.py:
    rename_column): two renames are metadata-only commits — the data-file
    set is provably unchanged (zero_rewrite) and the files keep their
    physical column names — then an append lands under the NEW logical
    names into the SAME physical columns, so old and new files union
    transparently. The oracle pins the full post-rename row set under the
    renamed columns."""
    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
        ]
    )
    t = LakeTable.create(spark, os.path.join(_tmpdir(), "ren"), schema)
    t.append(
        load_table(spark, "nation", sf_dir).select(
            F.col("n_nationkey").cast("long"),
            "n_name",
            F.col("n_regionkey").cast("long"),
        )
    )
    files_before = sorted(t.files())
    t.rename_column("n_nationkey", "nation_key")
    t.rename_column("n_regionkey", "region_key")
    zero_rewrite = sorted(t.files()) == files_before
    t.append(
        spark.createDataFrame(
            [(99, "zephyr", 0)],
            "nation_key long, n_name string, region_key long",
        )
    )
    return t.to_df().select(
        "nation_key",
        "n_name",
        "region_key",
        F.lit(bool(zero_rewrite)).alias("zero_rewrite"),
    ).orderBy("nation_key")


@query(
    "snk_replace_where",
    "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,"
    " CAST(n_regionkey AS BIGINT) AS n_regionkey, 1 AS commits"
    " FROM nation WHERE n_regionkey <> 1"
    " UNION ALL SELECT 90, 'atlantis', 1, 1"
    " UNION ALL SELECT 91, 'lemuria', 1, 1"
    " ORDER BY n_nationkey",
)
def snk_replace_where(spark, sf_dir):
    """Selective overwrite (Delta's ``replaceWhere``, lake/table.py:
    overwrite_where): atomically swap exactly the n_regionkey=1 slice of
    nation for two new rows in ONE commit (`commits` attests the single
    version bump), leaving every other file's rows untouched; rows outside
    the predicate are rejected up front. The oracle pins the exact
    post-replace row set."""
    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
        ]
    )
    t = LakeTable.create(spark, os.path.join(_tmpdir(), "rw"), schema)
    t.append(
        load_table(spark, "nation", sf_dir).select(
            F.col("n_nationkey").cast("long"),
            "n_name",
            F.col("n_regionkey").cast("long"),
        )
    )
    v0 = t.version()
    v1 = t.overwrite_where(
        spark.createDataFrame([(90, "atlantis", 1), (91, "lemuria", 1)], schema),
        "n_regionkey = 1",
    )
    return t.to_df().select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        F.lit(int(v1 - v0)).alias("commits"),
    ).orderBy("n_nationkey")


@query(
    "ddl_identity_columns",
    "SELECT CAST(count(*) AS BIGINT) AS n_rows, true AS unique_ok,"
    " true AS min_ok, true AS step_ok, true AS advancing_ok"
    " FROM nation",
)
def ddl_identity_columns(spark, sf_dir):
    """Identity columns (Delta's GENERATED ALWAYS AS IDENTITY,
    lake/table.py: create + append): two appends of the nation halves get
    auto-assigned ids (start 1000, step 3) with NO global ordering shuffle
    — uniqueness and advancement come from per-row unique ids plus the
    footer-stats high-water mark, gaps allowed exactly as Delta specifies.
    The attestation booleans verify uniqueness, the start bound, step
    divisibility, and that batch 2's ids all exceed batch 1's high-water
    mark; explicit id writes are rejected (GENERATED ALWAYS)."""
    schema = StructType(
        [
            StructField("row_id", LongType()),
            StructField("n_name", StringType()),
        ]
    )
    t = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "ident"),
        schema,
        properties={"identity.row_id": "1000,3"},
    )
    nat = load_table(spark, "nation", sf_dir).select(
        "n_name", F.col("n_nationkey").cast("long").alias("nk")
    )
    t.append(nat.where(F.col("nk") % 2 == 0).select("n_name"))
    hwm1 = int(t.properties()["identityHighWater.row_id"])
    t.append(nat.where(F.col("nk") % 2 == 1).select("n_name"))
    rows = t.to_df().select("row_id").collect()
    ids = [r["row_id"] for r in rows]
    batch2 = [
        r["row_id"]
        for r in t.read_changes(
            starting_version=t.version(), ending_version=t.version()
        ).collect()
    ]
    unique_ok = len(ids) == len(set(ids))
    min_ok = all(v >= 1000 for v in ids)
    step_ok = all((v - 1000) % 3 == 0 for v in ids)
    advancing_ok = bool(batch2) and min(batch2) > hwm1
    return spark.createDataFrame(
        [
            (
                len(ids),
                bool(unique_ok),
                bool(min_ok),
                bool(step_ok),
                bool(advancing_ok),
            )
        ],
        "n_rows long, unique_ok boolean, min_ok boolean, step_ok boolean,"
        " advancing_ok boolean",
    )


@query(
    "ddl_generated_columns",
    "SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,"
    " CAST(o_custkey AS BIGINT) AS o_custkey,"
    " CAST(o_custkey % 100 AS BIGINT) AS cust_bucket, 1 AS n_rejected"
    " FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey",
)
def ddl_generated_columns(spark, sf_dir):
    """Generated columns (Delta's GENERATED ALWAYS AS, lake/table.py:
    create + _align): cust_bucket is declared generated as
    o_custkey % 100. The first append OMITS the column (auto-computed by
    _align), a second append providing a WRONG value is rejected by the
    implicit null-safe-equality CHECK at the staged-file gate (n_rejected
    attests the atomic rejection), and the oracle pins the exact computed
    values for every row."""
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("cust_bucket", LongType()),
        ]
    )
    t = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "gencol"),
        schema,
        properties={"generated.cust_bucket": "o_custkey % 100"},
    )
    base = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_orderkey") <= 100)
        .select(
            F.col("o_orderkey").cast("long"),
            F.col("o_custkey").cast("long"),
        )
    )
    t.append(base)  # cust_bucket absent -> computed
    rejected = 0
    from incremental_etl_on_lakehouse_spark.lake.table import (
        ConstraintViolationError,
    )

    try:
        t.append(spark.createDataFrame([(999999, 1, 55)], schema))
    except ConstraintViolationError:
        rejected += 1
    return t.to_df().select(
        "o_orderkey",
        "o_custkey",
        "cust_bucket",
        F.lit(rejected).alias("n_rejected"),
    ).orderBy("o_orderkey")


@query(
    "util_bloom_skipping",
    "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,"
    " CAST(c_nationkey AS BIGINT) AS c_nationkey, true AS probe_pruned"
    " FROM customer WHERE c_name <> concat('Customer#', lpad(CAST(7 AS VARCHAR), 9, '0'))"
    " ORDER BY c_custkey",
)
def util_bloom_skipping(spark, sf_dir):
    """Bloom-filter file index (Delta's bloom filter index, lake/table.py:
    _stage_write build + files_matching probe): customer is appended as
    four separate files with a bloom index on c_name (high-cardinality,
    unclustered — min/max stats barely prune names), then a point DELETE
    on one name probes the blooms. probe_pruned attests the probe kept
    strictly fewer files than the table holds (bloom false positives can
    retain an extra file but never all), and the oracle pins the exact
    surviving rows — a lost file would drop rows, a false skip would keep
    the deleted one."""
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", LongType()),
        ]
    )
    t = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "bloom"),
        schema,
        properties={"bloomFilterColumns": "c_name", "bloomFilterBits": "65536"},
    )
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").cast("long"),
        "c_name",
        F.col("c_nationkey").cast("long"),
    )
    for bucket in range(4):
        t.append(cust.where(F.col("c_custkey") % 4 == bucket).coalesce(1))
    target_name = "Customer#%09d" % 7
    probed = t._touched_candidates(f"c_name = '{target_name}'")
    probe_pruned = 0 < len(probed) < len(t.files())
    t.delete(f"c_name = '{target_name}'")
    return t.to_df().select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.lit(bool(probe_pruned)).alias("probe_pruned"),
    ).orderBy("c_custkey")


@query(
    "util_deletion_vectors",
    "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,"
    " CASE WHEN n_regionkey = 0 THEN upper(n_name) ELSE n_name END AS n_name,"
    " CAST(n_regionkey AS BIGINT) AS n_regionkey,"
    " true AS delete_rewrote_nothing, true AS update_staged_only_updates"
    " FROM nation WHERE n_regionkey <> 2 ORDER BY n_nationkey",
)
def util_deletion_vectors(spark, sf_dir):
    """Deletion vectors (Delta's enableDeletionVectors, lake/table.py:
    _read_files DV anti-join + delete/update DV branches): DELETE marks
    rows in a sidecar — the active data-file set is PROVABLY unchanged
    (delete_rewrote_nothing compares the file lists) — and UPDATE stages
    only the updated rows while DV-masking their old versions
    (update_staged_only_updates verifies every pre-update file is still
    active). The oracle pins the exact post-delete+update row set, so the
    read-side anti-join, cumulative marking, and update staging are all
    hash-attested."""
    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
        ]
    )
    t = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "dv"),
        schema,
        properties={"enableDeletionVectors": "true"},
    )
    t.append(
        load_table(spark, "nation", sf_dir).select(
            F.col("n_nationkey").cast("long"),
            "n_name",
            F.col("n_regionkey").cast("long"),
        )
    )
    files_before = set(t.files())
    t.delete("n_regionkey = 2")
    delete_rewrote_nothing = set(t.files()) == files_before
    t.update({"n_name": "upper(n_name)"}, "n_regionkey = 0")
    update_staged_only_updates = files_before <= set(t.files())
    return t.to_df().select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        F.lit(bool(delete_rewrote_nothing)).alias("delete_rewrote_nothing"),
        F.lit(bool(update_staged_only_updates)).alias("update_staged_only_updates"),
    ).orderBy("n_nationkey")


@query(
    "util_optimized_writes",
    "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,"
    " CASE WHEN n_regionkey = 0 THEN upper(n_name) ELSE n_name END AS n_name,"
    " CAST(n_regionkey AS BIGINT) AS n_regionkey,"
    " true AS rewrite_sized_from_log, true AS respects_target_file_rows"
    " FROM nation ORDER BY n_nationkey",
)
def util_optimized_writes(spark, sf_dir):
    """Optimized writes (Delta's optimizeWrite, lake/table.py: _stage_write
    expected_rows branch): rewrite paths repartition to
    ceil(log-recorded rows / optimizedWrite.targetFileRows) before staging,
    so a MERGE touching one 25-row file lands ONE file, not one shard per
    shuffle partition (rewrite_sized_from_log), and shrinking
    targetFileRows to 10 makes the same rewrite land ceil(25/10) = 3 files
    (respects_target_file_rows) — the sizing really is driven by the log's
    row counts, not an AQE accident. The oracle pins the merged row set, so
    the attested rewrites are also value-exact."""
    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
        ]
    )
    nat = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").cast("long"),
        "n_name",
        F.col("n_regionkey").cast("long"),
    )
    upd = nat.where(F.col("n_regionkey") == 0).withColumn(
        "n_name", F.upper("n_name")
    )

    t = LakeTable.create(spark, os.path.join(_tmpdir(), "ow"), schema)
    t.append(nat.coalesce(1))
    t.merge(
        upd,
        "target.n_nationkey = source.n_nationkey",
        [MergeClause("update", None, "*")],
    )
    rewrite_sized_from_log = len(t.files()) == 1

    t2 = LakeTable.create(
        spark,
        os.path.join(_tmpdir(), "ow10"),
        schema,
        properties={"optimizedWrite.targetFileRows": "10"},
    )
    t2.append(nat.coalesce(1))
    t2.merge(
        upd,
        "target.n_nationkey = source.n_nationkey",
        [MergeClause("update", None, "*")],
    )
    respects_target_file_rows = len(t2.files()) == 3

    return t.to_df().select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        F.lit(bool(rewrite_sized_from_log)).alias("rewrite_sized_from_log"),
        F.lit(bool(respects_target_file_rows)).alias(
            "respects_target_file_rows"
        ),
    ).orderBy("n_nationkey")


@query(
    "ddl_drop",
    "SELECT true AS existed_before, false AS exists_after",
)
def ddl_drop(spark, sf_dir):
    """DROP TABLE IF EXISTS semantics (ref :106,110,211,349)."""
    path = os.path.join(_tmpdir(), "dropme")
    LakeTable.create(spark, path, StructType([StructField("id", LongType())]))
    before = LakeTable.exists(path)
    LakeTable.drop(path)
    after = LakeTable.exists(path)
    LakeTable.drop(path)  # idempotent IF EXISTS
    return spark.createDataFrame(
        [(before, after)], "existed_before boolean, exists_after boolean"
    )


@query(
    "util_file_put_rm",
    "SELECT 2 AS n_files_after_put, 0 AS n_files_after_rm",
)
def util_file_put_rm(spark, sf_dir):
    """Land/delete raw files (ref setup/incremental-etl-helper.py:6-19),
    local-FS flavor."""
    d = _tmpdir()
    for name in ("a.json", "b.json"):
        with open(os.path.join(d, name), "w") as f:
            json.dump([{"id": 1}], f)
    n_put = len(os.listdir(d))
    for name in list(os.listdir(d)):
        os.unlink(os.path.join(d, name))
    n_rm = len(os.listdir(d))
    return spark.createDataFrame(
        [(n_put, n_rm)], "n_files_after_put int, n_files_after_rm int"
    )


@query("util_fs_ls", "SELECT 'a.json' AS file_name UNION ALL SELECT 'b.json'")
def util_fs_ls(spark, sf_dir):
    """List landed files (ref dbutils.fs.ls, :141)."""
    d = _tmpdir()
    for name in ("b.json", "a.json"):
        open(os.path.join(d, name), "w").write("[]")
    return spark.createDataFrame(
        [(n,) for n in sorted(os.listdir(d))], "file_name string"
    )




@query(
    "src_json_auto",
    "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,"
    " CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation",
)
def src_json_auto(spark, sf_dir):
    """Format-auto landing read (sources/json_source.py auto readers): the
    same directory holds a pretty-printed JSON ARRAY file (the reference's
    landing format, notebooks/demo-notebook.py:146) and an NDJSON file
    (what log shippers emit). A single multiLine setting cannot read both
    -- multiLine=true silently truncates NDJSON to its first record -- so
    the reader dispatches format per file; every nation row lands."""
    rows = sorted(
        (
            (int(r["n_nationkey"]), r["n_name"], int(r["n_regionkey"]))
            for r in load_table(spark, "nation", sf_dir)
            .select("n_nationkey", "n_name", "n_regionkey")
            .collect()  # nation is the fixed 25-row TPC-H dimension
        )
    )
    rec = lambda r: {"n_nationkey": r[0], "n_name": r[1], "n_regionkey": r[2]}
    out = os.path.join(_tmpdir(), "mixed_landing")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "arr.json"), "w") as f:
        json.dump([rec(r) for r in rows[::2]], f, indent=1)
    with open(os.path.join(out, "nd.json"), "w") as f:
        f.write("\n".join(json.dumps(rec(r)) for r in rows[1::2]))
    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
        ]
    )
    return read_json_auto_batch(spark, out, schema).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "merge_by_source",
    # full-sync mirror replayed in plain SQL: target was customers <=200
    # (active), the source batch is customers 101-300; matched rows take
    # the upper-cased source name, unmatched source rows insert, and
    # target rows absent from the source soft-delete (active=false)
    "SELECT CAST(c_custkey AS BIGINT) AS custkey,"
    " CASE WHEN c_custkey > 100 AND c_custkey <= 200 THEN upper(c_name)"
    "      ELSE c_name END AS name,"
    " CASE WHEN c_custkey <= 100 THEN false ELSE true END AS active"
    " FROM customer WHERE c_custkey <= 300 ORDER BY custkey",
)
def merge_by_source(spark, sf_dir):
    """WHEN NOT MATCHED BY SOURCE (Delta's full-sync MERGE family): one
    statement mirrors the target to the batch — matched UPDATE, unmatched
    INSERT, and target-sided soft delete for rows the source no longer
    carries. Planning adds ONE target-sided anti join (batch-scale source
    broadcast); stats pruning is disabled because pruned files are
    by-source candidates by definition (see lake/table.py merge)."""
    path = os.path.join(_tmpdir(), "mirror")
    schema = StructType(
        [
            StructField("custkey", LongType()),
            StructField("name", StringType()),
            StructField("active", BooleanType()),
        ]
    )
    t = LakeTable.create(spark, path, schema)
    cust = load_table(spark, "customer", sf_dir)
    t.append(
        cust.where(F.col("c_custkey") <= 200).select(
            F.col("c_custkey").cast("long").alias("custkey"),
            F.col("c_name").alias("name"),
            F.lit(True).alias("active"),
        )
    )
    batch = cust.where(
        (F.col("c_custkey") > 100) & (F.col("c_custkey") <= 300)
    ).select(
        F.col("c_custkey").cast("long").alias("custkey"),
        F.col("c_name").alias("name"),
    )
    t.merge(
        batch,
        "source.custkey = target.custkey",
        [
            MergeClause("update", None, {"name": "upper(source.name)"}),
            MergeClause(
                "insert",
                None,
                {"custkey": "source.custkey", "name": "source.name", "active": "true"},
            ),
            MergeClause("update_by_source", None, {"active": "false"}),
        ],
    )
    return t.to_df().orderBy("custkey")


@query(
    "util_optimize_where",
    "SELECT * FROM (VALUES"
    " ('d0', CAST(1 AS BIGINT), true, CAST(9 AS BIGINT)),"
    " ('d1', CAST(3 AS BIGINT), true, CAST(9 AS BIGINT)))"
    " t(day, n_files, other_untouched, n_rows) ORDER BY day",
)
def util_optimize_where(spark, sf_dir):
    """OPTIMIZE ... WHERE <partition predicate>: compaction scoped to
    matching hive partitions — the scheduled per-partition maintenance
    shape at 100 TB (never rewrite the whole table). Attests: the matched
    partition compacts to one file, the other partition's files are
    byte-identical (same paths), and no rows are lost."""
    from incremental_etl_on_lakehouse_spark.lake.sql import execute_statement

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("day", StringType()),
            StructField("v", LongType()),
        ]
    )
    t = LakeTable.create(
        spark, os.path.join(_tmpdir(), "optw"), schema, partition_by=["day"]
    )
    for batch in range(3):
        rows = [(batch * 10 + i, f"d{i % 2}", i) for i in range(6)]
        t.append(spark.createDataFrame(rows, schema).coalesce(1))
    d1_before = sorted(f for f in t.files() if "day=d1" in f)
    execute_statement(spark, "OPTIMIZE optw WHERE day = 'd0'", {"optw": t})
    files = t.files()
    d0 = [f for f in files if "day=d0" in f]
    d1 = sorted(f for f in files if "day=d1" in f)
    per_day = {
        r["day"]: r["n"]
        for r in t.to_df().groupBy("day").agg(F.count("*").alias("n")).collect()
    }
    return spark.createDataFrame(
        [
            ("d0", len(d0), d1 == d1_before, per_day["d0"]),
            ("d1", len(d1), d1 == d1_before, per_day["d1"]),
        ],
        "day string, n_files bigint, other_untouched boolean, n_rows bigint",
    ).orderBy("day")


@query(
    "util_convert_to_lake",
    # the converted table must read back exactly the original parquet
    # rows, plus the in-key attestations: files untouched, skipping live
    "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,"
    " true AS files_untouched, true AS skipping_live, true AS writable"
    " FROM nation ORDER BY n_nationkey",
)
def util_convert_to_lake(spark, sf_dir):
    """CONVERT TO LAKE (Delta's CONVERT TO DELTA): adopt a plain parquet
    directory in place — zero rewrite, O(files) footer reads for schema/
    rows/min-max stats, one commit. Attests: data files byte-identical
    after conversion, stats-driven file skipping live on the converted
    footers, and the table immediately writable (an append lands)."""
    src = os.path.join(_tmpdir(), "plain_nation")
    load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "n_name"
    ).repartition(3, "n_nationkey").write.parquet(src)
    listing = lambda: sorted(
        (n, os.path.getsize(os.path.join(src, n)))
        for n in os.listdir(src)
        if n.endswith(".parquet")
    )
    before = listing()
    t = LakeTable.convert_from_parquet(spark, src, stats_columns=["n_nationkey"])
    files_untouched = listing() == before
    skipping_live = len(t.files_matching({"n_nationkey": (0, 0)})) < len(t.files())
    v0_rows = t.to_df().count()
    t.append(
        spark.createDataFrame([(999, "ATLANTIS")], "n_nationkey bigint, n_name string")
    )
    writable = t.to_df().count() == v0_rows + 1
    return (
        t.to_df(version=0)
        .select(
            "n_nationkey",
            "n_name",
            F.lit(files_untouched).alias("files_untouched"),
            F.lit(skipping_live).alias("skipping_live"),
            F.lit(writable).alias("writable"),
        )
        .orderBy("n_nationkey")
    )
