"""SURVEY §2.2-§2.10 relational keys + headline analytics (bench workload).

Split from the original single-module ``queries.py`` (round-5 refactor);
shares the registry, helpers, and imports of ``._core`` — registration
order (and therefore ``ordered_keys()``) is fixed by the import order in
``__init__``.
"""

from __future__ import annotations

from incremental_etl_on_lakehouse_spark.queries._core import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# §2.2 projections / filters / derived columns
# ---------------------------------------------------------------------------


@query(
    "proj_select_list",
    "SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_returnflag FROM lineitem",
)
def proj_select_list(spark, sf_dir):
    return load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@query("proj_select_star", "SELECT * FROM region")
def proj_select_star(spark, sf_dir):
    return load_table(spark, "region", sf_dir).select("*")


@query(
    "filter_eq",
    "SELECT event_id, user_id, value FROM events WHERE event_type = 'click'",
)
def filter_eq(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "value"
    )


@query(
    "filter_neq",
    "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag <> 'N'",
)
def filter_neq(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    return li.where(F.col("l_returnflag") != "N").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


@query(
    "filter_conj",
    "SELECT o_orderkey, o_totalprice FROM orders"
    " WHERE o_orderstatus = 'O' AND o_totalprice > 100000",
)
def filter_conj(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    return o.where(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000)
    ).select("o_orderkey", "o_totalprice")


@query(
    "derive_withcolumn",
    "SELECT event_id, md5(concat_ws('|', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR),"
    " event_type)) AS data_hash FROM events",
)
def derive_withcolumn(spark, sf_dir):
    """Computed ingest columns (ref :168-170): content hash via md5(concat)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.md5(
            F.concat_ws(
                "|",
                F.col("event_id").cast("string"),
                F.col("user_id").cast("string"),
                F.col("event_type"),
            )
        ).alias("data_hash"),
    )


@query(
    "proj_alias",
    "SELECT l_orderkey, l_linenumber,"
    " CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)"
    " AS net_price FROM lineitem",
)
def proj_alias(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    net = (
        F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC4))
    ).cast("double")
    return li.select("l_orderkey", "l_linenumber", net.alias("net_price"))


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@query(
    "join_right_outer",
    "SELECT r.r_name, n.n_name FROM nation n RIGHT JOIN region r"
    " ON n.n_regionkey = r.r_regionkey",
)
def join_right_outer(spark, sf_dir):
    """Right outer equi-join (ref validation query :527-538); region is tiny
    -> broadcast."""
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    return n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey, "right_outer"
    ).select("r_name", "n_name")


@query(
    "join_merge_key",
    "SELECT o.o_orderkey, c.c_name, o.o_totalprice FROM orders o"
    " JOIN customer c ON o.o_custkey = c.c_custkey",
)
def join_merge_key(spark, sf_dir):
    """Equi-join on the merge key shape (ref :269,418)."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# §2.4 MERGE / §2.5 aggregation keys
# ---------------------------------------------------------------------------


@query(
    "merge_cdc_upsert",
    _SQL_CDC + "SELECT user_id, ts_ms, event_type, value_cents FROM final",
)
def merge_cdc_upsert(spark, sf_dir):
    """3-way conditional CDC MERGE over two batches (ref :244-280)."""
    silver = _run_cdc_silver(spark, sf_dir)
    return silver.to_df().select("user_id", "ts_ms", "event_type", "value_cents")


@query(
    "merge_agg_upsert",
    "SELECT event_type, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
    " AS sum_cents FROM events WHERE event_type <> 'error' GROUP BY event_type",
)
def merge_agg_upsert(spark, sf_dir):
    """Additive aggregate MERGE (ref :393-425): two grouped delta batches
    merged into a running total."""
    gold = LakeTable.create(spark, os.path.join(_tmpdir(), "gold"), GOLD_SCHEMA)
    b1, b2 = _cdc_batches(spark, sf_dir)
    for b in (b1, b2):
        deltas = (
            b.where(F.col("cdc_operation") != "DELETE")
            .groupBy("event_type")
            .agg(F.sum("value_cents").alias("delta_value"))
        )
        merge_agg_delta(
            gold, deltas, group_cols=["event_type"], agg_col="sum_cents"
        )
    return gold.to_df()


@query(
    "agg_sum_groupby",
    "SELECT n.n_name, CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *"
    " (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue"
    " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    " JOIN customer c ON o.o_custkey = c.c_custkey"
    " JOIN nation n ON c.c_nationkey = n.n_nationkey"
    " GROUP BY n.n_name",
)
def agg_sum_groupby(spark, sf_dir):
    """Grouped sum (ref :397,416) at TPC-H Q5 shape: revenue per nation.

    Join order: fact table joins dim chain; nation/customer are small ->
    broadcast; the only real shuffle is the final group-by on n_name.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    net = (
        F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC4))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(net).cast("double").alias("revenue"))
    )


@query(
    "agg_incremental_cdf",
    _SQL_CDC
    + "SELECT event_type, CAST(sum(value_cents) AS BIGINT) AS sum_cents"
    " FROM final GROUP BY event_type",
)
def agg_incremental_cdf(spark, sf_dir):
    """Incremental aggregate maintenance from the change feed
    (ref :384-425): gold is only ever updated from signed deltas, yet equals
    the full aggregate of the final silver state.

    Memoized per (session, sf_dir) like _run_cdc_silver: stream_foreachbatch
    reads the same converged gold state, so the pipeline runs once."""
    cache_key = (id(spark), sf_dir)
    cached = _CDC_GOLD_CACHE.get(cache_key)
    if cached is not None and os.path.isdir(cached.path):
        return cached.to_df().where(F.col("sum_cents") != 0)
    # consume the SHARED memoized silver: its change feed replays
    # per-version through the reader regardless of when it was built, so
    # the incremental maintenance below behaves exactly as if it ran
    # between the merges — without rebuilding silver per aggregate key
    silver = _run_cdc_silver(spark, sf_dir)
    root = _tmpdir()
    gold = LakeTable.create(spark, os.path.join(root, "gold"), GOLD_SCHEMA)
    # availableNow catch-up coalescing (Delta's maxFilesPerTrigger=N):
    # signed deltas are additive across commits, so folding the whole
    # backlog into ONE maintenance merge is algebraically identical to
    # per-commit merges while paying a single merge's fixed cost. Live
    # tailing still processes commit-by-commit as batches arrive
    # (stream_trigger_paced demonstrates per-commit pacing).
    reader = LakeStreamReader(
        silver, os.path.join(root, "gold_ck.json"), mode="cdf",
        starting_version=1, max_versions_per_trigger=64,
    )

    def update_gold(changes: DataFrame, _v: int) -> None:
        deltas = cdf_signed_deltas(
            changes, group_cols=["event_type"], value_col="value_cents"
        )
        merge_agg_delta(gold, deltas, group_cols=["event_type"], agg_col="sum_cents")

    reader.process_available(update_gold)
    _CDC_GOLD_CACHE[cache_key] = gold
    return gold.to_df().where(F.col("sum_cents") != 0)


MINMAX_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("min_cents", LongType()),
        StructField("max_cents", LongType()),
    ]
)
DSTATE_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket", LongType()),
        StructField("cnt", LongType()),
    ]
)
_CDC_MINMAX_CACHE: dict[tuple[int, str], tuple[LakeTable, LakeTable]] = {}


@query(
    "agg_incremental_minmax",
    _SQL_CDC
    + "SELECT event_type, CAST(min(value_cents) AS BIGINT) AS min_cents,"
    " CAST(max(value_cents) AS BIGINT) AS max_cents,"
    " CAST(count(DISTINCT value_cents % 101) AS BIGINT) AS n_buckets"
    " FROM final GROUP BY event_type",
)
def agg_incremental_minmax(spark, sf_dir):
    """Incremental aggregate maintenance BEYOND subtractable sums
    (SURVEY.md §7 hard-part d; reference rationale demo-notebook.py:384-413
    covers only SUM): MIN/MAX via monotone-tighten on inserts plus
    recompute-touched-groups-on-delete (operators/cdc.py
    incremental_minmax_update — a removal strictly inside the current
    (min, max) interval provably never scans the base table), and exact
    COUNT(DISTINCT) via a per-(group, value) multiset-count state table
    (cdf_multiset_deltas + merge_distinct_state) whose row count per group
    IS the distinct count. Both are driven purely from the change feed —
    the Gold pattern generalized — and the final state equals the full
    aggregate of the converged silver snapshot, which is what the oracle
    replays. Deletes in batch 2 remove rows whose values sit at group
    extremes (tests/test_cdc_pipeline.py pins a crafted case), so the
    recompute path is exercised, not just reachable."""
    from incremental_etl_on_lakehouse_spark.operators.cdc import (
        cdf_multiset_deltas,
        distinct_counts,
        incremental_minmax_update,
        merge_distinct_state,
    )

    cache_key = (id(spark), sf_dir)
    cached = _CDC_MINMAX_CACHE.get(cache_key)
    if cached is not None and os.path.isdir(cached[0].path):
        mm, dstate = cached
    else:
        silver = _run_cdc_silver(spark, sf_dir)  # shared build, CDF replay
        root = _tmpdir()
        mm = LakeTable.create(spark, os.path.join(root, "gold_mm"), MINMAX_SCHEMA)
        dstate = LakeTable.create(spark, os.path.join(root, "dstate"), DSTATE_SCHEMA)
        reader = LakeStreamReader(
            silver, os.path.join(root, "mm_ck.json"), mode="cdf", starting_version=1
        )

        def update(changes: DataFrame, v: int) -> None:
            incremental_minmax_update(
                mm,
                silver.to_df(version=v),
                changes,
                group_cols=["event_type"],
                value_col="value_cents",
                min_col="min_cents",
                max_col="max_cents",
            )
            deltas = cdf_multiset_deltas(
                changes.withColumn("bucket", F.col("value_cents") % 101),
                group_cols=["event_type"],
                value_col="bucket",
            )
            merge_distinct_state(
                dstate, deltas, group_cols=["event_type"], value_col="bucket"
            )

        reader.process_available(update)
        _CDC_MINMAX_CACHE[cache_key] = (mm, dstate)
    return mm.to_df().join(
        distinct_counts(dstate, ["event_type"], out_col="n_buckets"),
        "event_type",
    )


TOPK_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("value_cents", LongType()),
        StructField("cnt", LongType()),
    ]
)
_CDC_TOPK_CACHE: dict[tuple[int, str], LakeTable] = {}


@query(
    "agg_incremental_topk",
    _SQL_CDC
    + "SELECT event_type, value_cents, cnt FROM ("
    " SELECT event_type, value_cents, CAST(count(*) AS BIGINT) AS cnt,"
    "  row_number() OVER (PARTITION BY event_type"
    "   ORDER BY value_cents DESC) AS rnk"
    " FROM final GROUP BY event_type, value_cents) t WHERE rnk <= 3",
)
def agg_incremental_topk(spark, sf_dir):
    """Incremental TOP-K maintenance from the change feed — the
    leaderboard aggregate, completing the non-subtractable family next
    to MIN/MAX and COUNT(DISTINCT) (SURVEY.md §7 hard-part d): per
    event_type the 3 largest distinct value_cents with multiplicities,
    driven purely from CDF batches. Deletes in batch 2 remove rows
    holding group-maximal values, so the promote-on-delete recompute
    path (state can't answer what rises from below the threshold) is
    exercised, not just reachable; insert-only batches never touch the
    base table (operators/cdc.py incremental_topk_update documents the
    three-way split). Final state equals the batch top-3 of the
    converged silver snapshot — the oracle replays that directly."""
    from incremental_etl_on_lakehouse_spark.operators.cdc import (
        incremental_topk_update,
    )

    cache_key = (id(spark), sf_dir)
    cached = _CDC_TOPK_CACHE.get(cache_key)
    if cached is not None and os.path.isdir(cached.path):
        return cached.to_df()
    silver = _run_cdc_silver(spark, sf_dir)
    root = _tmpdir()
    gold = LakeTable.create(
        spark, os.path.join(root, "gold_topk"), TOPK_SCHEMA
    )
    # catch-up coalescing is VALID for top-k maintenance (unlike an
    # aggregate needing per-version snapshots): the multiset deltas fold
    # additively across the span, and the recompute path reads the base
    # AS OF the span end — both consistent with end-of-span state
    reader = LakeStreamReader(
        silver,
        os.path.join(root, "topk_ck.json"),
        mode="cdf",
        starting_version=1,
        max_versions_per_trigger=64,
    )

    def update(changes: DataFrame, v: int) -> None:
        incremental_topk_update(
            gold,
            silver.to_df(version=v),
            changes,
            group_cols=["event_type"],
            value_col="value_cents",
            k=3,
        )

    reader.process_available(update)
    _CDC_TOPK_CACHE[cache_key] = gold
    return gold.to_df()


MEDSTATE_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("value_cents", LongType()),
        StructField("cnt", LongType()),
    ]
)
_CDC_MEDIAN_CACHE: dict[tuple[int, str], LakeTable] = {}


@query(
    "agg_incremental_median",
    # lower-percentile definition, pure integer rank arithmetic on both
    # engines: the q-th percentile is the smallest v whose cumulative
    # multiplicity reaches ceil(q * n) — cum * den >= n * num for integer
    # cum. Window sums are HUGEINT intermediates in DuckDB but appear only
    # in the comparison; every OUTPUT column is CAST BIGINT (the round-11
    # hazard-class rule).
    _SQL_CDC
    + "SELECT event_type,"
    " CAST(min(CASE WHEN cum * 2 >= n THEN v END) AS BIGINT)"
    "  AS median_cents,"
    " CAST(min(CASE WHEN cum * 10 >= n * 9 THEN v END) AS BIGINT)"
    "  AS p90_cents"
    " FROM ("
    "  SELECT event_type, v,"
    "   sum(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum,"
    "   sum(cnt) OVER (PARTITION BY event_type) AS n"
    "  FROM ("
    "   SELECT event_type, value_cents AS v, count(*) AS cnt"
    "   FROM final GROUP BY event_type, value_cents))"
    " GROUP BY event_type",
)
def agg_incremental_median(spark, sf_dir):
    """Incremental EXACT MEDIAN / percentiles from the change feed — the
    quantile member of the non-subtractable family (SURVEY.md §7
    hard-part d, next to MIN/MAX, COUNT(DISTINCT), TOP-K): the
    per-(group, value) multiset state maintained for exact
    COUNT(DISTINCT) is a compressed sorted histogram, so exact
    median/p90 read off one window pass over O(state) rows at ANY point
    — no quantile sketch error, no source rescan. Deletes in batch 2
    (error events) decrement state rows to zero, so the removal path is
    exercised. Final state equals the converged silver's multiset; the
    oracle replays the identical lower-percentile integer-rank
    definition over it."""
    from incremental_etl_on_lakehouse_spark.operators.cdc import (
        percentiles_from_state,
    )

    state = _cdc_multiset_state(spark, sf_dir)
    # both quantiles in ONE window pass over the state (no join): the
    # cumulative counts are shared, each quantile is a conditional min
    return percentiles_from_state(
        state,
        ["event_type"],
        "value_cents",
        {"median_cents": (1, 2), "p90_cents": (9, 10)},
    )


def _cdc_multiset_state(spark, sf_dir) -> LakeTable:
    """The per-(event_type, value_cents) multiset state maintained from
    the CDC scenario's change feed — shared by the quantile and mode keys
    (one build serves both in a driver sweep)."""
    from incremental_etl_on_lakehouse_spark.operators.cdc import (
        cdf_multiset_deltas,
        merge_distinct_state,
    )

    cache_key = (id(spark), sf_dir)
    cached = _CDC_MEDIAN_CACHE.get(cache_key)
    if cached is not None and os.path.isdir(cached.path):
        return cached
    silver = _run_cdc_silver(spark, sf_dir)
    root = _tmpdir()
    state = LakeTable.create(
        spark, os.path.join(root, "medstate"), MEDSTATE_SCHEMA
    )
    reader = LakeStreamReader(
        silver,
        os.path.join(root, "med_ck.json"),
        mode="cdf",
        starting_version=1,
        # multiset deltas fold additively across a span — catch-up
        # coalescing valid (same argument as incremental top-k)
        max_versions_per_trigger=64,
    )

    def update(changes: DataFrame, v: int) -> None:
        deltas = cdf_multiset_deltas(
            changes, group_cols=["event_type"], value_col="value_cents"
        )
        merge_distinct_state(
            state, deltas, group_cols=["event_type"],
            value_col="value_cents",
        )

    reader.process_available(update)
    _CDC_MEDIAN_CACHE[cache_key] = state
    return state


@query(
    "agg_incremental_mode",
    # deterministic mode: max multiplicity, smallest value on ties — the
    # tie-break is what makes a mode oracle-checkable (plain mode() is
    # tie-arbitrary in both engines)
    _SQL_CDC
    + "SELECT event_type, CAST(v AS BIGINT) AS mode_cents,"
    " CAST(cnt AS BIGINT) AS mode_count FROM ("
    " SELECT event_type, v, cnt, row_number() OVER ("
    "  PARTITION BY event_type ORDER BY cnt DESC, v ASC) AS rnk FROM ("
    "  SELECT event_type, value_cents AS v, count(*) AS cnt"
    "  FROM final GROUP BY event_type, value_cents)) WHERE rnk = 1",
)
def agg_incremental_mode(spark, sf_dir):
    """Incremental exact MODE (most frequent value) from the change feed
    — the third aggregate family the COUNT(DISTINCT) multiset state
    answers for free (with quantiles): the mode is the state row with
    maximal multiplicity, ties broken by smallest value so the result is
    deterministic and replay-stable. Shares the maintained state with
    agg_incremental_median (one build serves both); the read is a single
    map-side-combined max_by over O(live distinct values) — no window,
    no join, no source rescan (operators/cdc.py mode_from_state)."""
    from incremental_etl_on_lakehouse_spark.operators.cdc import (
        mode_from_state,
    )

    state = _cdc_multiset_state(spark, sf_dir)
    mode = mode_from_state(
        state, ["event_type"], "value_cents", out_col="mode_cents"
    )
    # attach the winning multiplicity (oracle-checkable evidence the
    # argmax picked by count, not by value): one semi-join-free lookup
    # via the same state
    return (
        state.to_df()
        .groupBy("event_type")
        .agg(F.max("cnt").alias("mode_count"))
        .join(mode, "event_type")
    )


_CDC_VIEW_CACHE: dict[tuple[int, str], object] = {}


@query(
    "agg_incremental_view",
    _SQL_CDC
    + "SELECT event_type,"
    " CAST(sum(value_cents) AS BIGINT) AS total_cents,"
    " CAST(count(*) AS BIGINT) AS n_rows,"
    " round(CAST(sum(value_cents) AS DOUBLE) / count(*), 6) AS avg_cents,"
    " CAST(min(value_cents) AS BIGINT) AS min_cents,"
    " CAST(max(value_cents) AS BIGINT) AS max_cents,"
    " CAST(count(DISTINCT value_cents % 101) AS BIGINT) AS n_buckets"
    " FROM final GROUP BY event_type",
)
def agg_incremental_view(spark, sf_dir):
    """The materialized-view facade end-to-end: ONE IncrementalAggView over
    the CDC silver maintains SUM + COUNT + AVG + MIN + MAX +
    COUNT(DISTINCT) purely from the change feed (operators/cdc.py
    IncrementalAggView — the Gold pattern generalized across the aggregate
    algebra), and its assembled state hash-matches the full batch
    aggregate of the converged snapshot."""
    from incremental_etl_on_lakehouse_spark.operators.cdc import (
        IncrementalAggView,
    )

    cache_key = (id(spark), sf_dir)
    cached = _CDC_VIEW_CACHE.get(cache_key)
    if cached is not None and os.path.isdir(cached.add_table.path):
        view = cached
    else:
        root = _tmpdir()
        schema = StructType(
            SILVER_SCHEMA.fields + [StructField("bucket", LongType())]
        )
        silver = LakeTable.create(
            spark,
            os.path.join(root, "silver"),
            schema,
            properties={"enableChangeDataFeed": "true", "statsColumns": "user_id"},
        )
        view = IncrementalAggView(
            silver,
            os.path.join(root, "view"),
            group_cols=["event_type"],
            aggs={
                "total_cents": ("sum", "value_cents"),
                "n_rows": ("count", "*"),
                "avg_cents": ("avg", "value_cents"),
                "min_cents": ("min", "value_cents"),
                "max_cents": ("max", "value_cents"),
                "n_buckets": ("count_distinct", "bucket"),
            },
        )
        for batch in _cdc_batches(spark, sf_dir):
            merge_cdc_batch(
                silver,
                batch.select(
                    "user_id", "ts_ms", "event_type", "value_cents", "data_hash",
                    "cdc_operation", "ts", "event_id",
                ).withColumn("bucket", F.col("value_cents") % 101),
                key_cols=["user_id"],
                order_cols=["ts"],
                tiebreak_cols=["event_id"],
                order_guard_col="ts_ms",
            )
            view.refresh()
        _CDC_VIEW_CACHE[cache_key] = view
    return view.to_df().select(
        "event_type", "total_cents", "n_rows",
        F.round(F.col("avg_cents"), 6).alias("avg_cents"),
        "min_cents", "max_cents", "n_buckets",
    )


_JOIN_VIEW_CACHE: dict[tuple[int, str], object] = {}


@query(
    "view_incremental_join",
    _SQL_CDC
    + """
, dim AS (
  SELECT user_id,
         CASE WHEN user_id IN (SELECT user_id FROM b2 WHERE user_id % 3 = 0)
              THEN user_id % 4 + 10 ELSE user_id % 4 END AS segment
  FROM (SELECT DISTINCT user_id FROM cdc)
)
SELECT d.segment,
       CAST(sum(f.value_cents) AS BIGINT) AS total_cents,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(CAST(sum(f.value_cents) AS DOUBLE) / count(*), 6) AS avg_cents
FROM final f JOIN dim d USING (user_id)
GROUP BY d.segment""",
)
def view_incremental_join(spark, sf_dir):
    """Incrementally-maintained JOIN view (operators/join_view.py): a Gold
    defined as ``fact-silver ⋈ dim-silver`` + GROUP BY aggregate,
    maintained from BOTH change feeds via delta-join algebra
    (Δ(A⋈B) = ΔA⋈B@old ∪ A@new⋈ΔB, the snapshot side file-pruned by the
    batch's join-key stats) — the multi-table generalization of the
    reference's Silver-CDF → Gold topology (demo-notebook.py:428-435).

    The scenario interleaves the feeds so every maintenance path runs:
    fact batch 1 (ΔA against an empty dim), dim batch 1 (A@new ⋈ ΔB over
    the populated fact), fact batch 2 (ΔA ⋈ B@old), dim batch 2 (segment
    REASSIGNMENTS — update_preimage/postimage signs move users between
    groups). The converged view hash-matches the batch join+aggregate of
    the two final states."""
    from incremental_etl_on_lakehouse_spark.lake.table import MergeClause
    from incremental_etl_on_lakehouse_spark.operators.join_view import (
        IncrementalJoinView,
    )

    cache_key = (id(spark), sf_dir)
    view = _JOIN_VIEW_CACHE.get(cache_key)
    if view is None or not os.path.isdir(view.add_table.path):
        root = _tmpdir()
        silver = LakeTable.create(
            spark,
            os.path.join(root, "fact_silver"),
            SILVER_SCHEMA,
            properties={
                "enableChangeDataFeed": "true",
                "statsColumns": "user_id",
            },
        )
        dim_schema = StructType(
            [
                StructField("user_id", LongType()),
                StructField("segment", LongType()),
            ]
        )
        dim = LakeTable.create(
            spark,
            os.path.join(root, "dim_silver"),
            dim_schema,
            properties={
                "enableChangeDataFeed": "true",
                "statsColumns": "user_id",
            },
        )
        view = IncrementalJoinView(
            silver,
            dim,
            os.path.join(root, "view"),
            join_keys=["user_id"],
            group_cols=["segment"],
            aggs={
                "total_cents": ("sum", "value_cents"),
                "n_rows": ("count", "*"),
                "avg_cents": ("avg", "value_cents"),
            },
        )
        upsert = [
            MergeClause("update", None, "*"),
            MergeClause("insert", None, "*"),
        ]
        b1, b2 = _cdc_batches(spark, sf_dir)
        for i, batch in enumerate((b1, b2)):
            merge_cdc_batch(
                silver,
                batch.select(
                    "user_id", "ts_ms", "event_type", "value_cents",
                    "data_hash", "cdc_operation", "ts", "event_id",
                ),
                key_cols=["user_id"],
                order_cols=["ts"],
                tiebreak_cols=["event_id"],
                order_guard_col="ts_ms",
            )
            view.refresh()  # fact side: ΔA ⋈ B@old (empty dim on i=0)
            # batch 2 reassigns only every third user to a NEW segment —
            # the view sees moved groups (preimage/postimage sign pairs),
            # kept groups (identical-value updates whose deltas cancel),
            # and b2-only inserts, all in one maintenance merge
            seg = F.col("user_id") % 4
            if i:
                seg = F.when(
                    F.col("user_id") % 3 == 0, F.col("user_id") % 4 + 10
                ).otherwise(seg)
            dim.merge(
                batch.select("user_id").distinct().withColumn(
                    "segment", seg.cast("long")
                ),
                "source.user_id = target.user_id",
                upsert,
                stats_prune={"user_id": "user_id"},
            )
            view.refresh()  # dim side: A@new ⋈ ΔB, stats-pruned fact read
        _JOIN_VIEW_CACHE[cache_key] = view
    return view.to_df().select(
        "segment",
        "total_cents",
        "n_rows",
        F.round(F.col("avg_cents"), 6).alias("avg_cents"),
    )


AVG_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("sum_cents", LongType()),
        StructField("n_rows", LongType()),
    ]
)
_CDC_AVG_CACHE: dict[tuple[int, str], LakeTable] = {}

VAR_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("sum_cents", LongType()),
        StructField("sum2_cents", LongType()),
        StructField("n_rows", LongType()),
    ]
)
_CDC_VAR_CACHE: dict[tuple[int, str], LakeTable] = {}


@query(
    "agg_incremental_var",
    _SQL_CDC
    + "SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,"
    " round((CAST(sum(value_cents * value_cents) AS DOUBLE)"
    "  - CAST(sum(value_cents) AS DOUBLE) * CAST(sum(value_cents) AS DOUBLE)"
    "   / count(*)) / (count(*) - 1), 6) AS var_cents"
    " FROM final GROUP BY event_type HAVING count(*) > 1",
)
def agg_incremental_var(spark, sf_dir):
    """Incrementally-maintained VARIANCE: var_samp is not additive, but
    its three components (COUNT, SUM, SUM of squares) all are — the gold
    table carries (n, sum, sum2), each maintained from the change feed by
    the same signed-delta algebra as agg_incremental_cdf in ONE merge
    (operators/cdc.py merge_agg_deltas), and
    var = (sum2 - sum^2/n) / (n-1) derives at read. Components are
    INTEGER-exact, so the floating-point derivation happens once, in a
    fixed operation order mirrored by the oracle — no summation-order
    nondeterminism can flip the hash (the textbook one-pass formula's
    cancellation hazard does not bite: the values are integer cents and
    the double mantissa carries the full magnitudes here; at scales where
    it would, maintain shifted moments the same way)."""
    from incremental_etl_on_lakehouse_spark.operators.cdc import merge_agg_deltas

    cache_key = (id(spark), sf_dir)
    cached = _CDC_VAR_CACHE.get(cache_key)
    if cached is not None and os.path.isdir(cached.path):
        gold = cached
    else:
        silver = _run_cdc_silver(spark, sf_dir)  # shared build, CDF replay
        root = _tmpdir()
        gold = LakeTable.create(spark, os.path.join(root, "gold_var"), VAR_SCHEMA)
        reader = LakeStreamReader(
            silver, os.path.join(root, "var_ck.json"), mode="cdf", starting_version=1
        )

        def update(changes: DataFrame, _v: int) -> None:
            sign = F.when(
                F.col("_change_type").isin("update_preimage", "delete"), F.lit(-1)
            ).when(
                F.col("_change_type").isin("update_postimage", "insert"), F.lit(1)
            )
            deltas = (
                changes.withColumn("__s", sign)
                .where(F.col("__s").isNotNull())
                .groupBy("event_type")
                .agg(
                    F.sum(F.col("__s") * F.col("value_cents")).alias("d_sum"),
                    F.sum(
                        F.col("__s") * F.col("value_cents") * F.col("value_cents")
                    ).alias("d_sum2"),
                    F.sum("__s").alias("d_cnt"),
                )
                .where(
                    (F.col("d_sum") != 0)
                    | (F.col("d_sum2") != 0)
                    | (F.col("d_cnt") != 0)
                )
            )
            merge_agg_deltas(
                gold,
                deltas,
                group_cols=["event_type"],
                agg_cols={
                    "sum_cents": "d_sum",
                    "sum2_cents": "d_sum2",
                    "n_rows": "d_cnt",
                },
            )

        reader.process_available(update)
        _CDC_VAR_CACHE[cache_key] = gold
    n = F.col("n_rows").cast("double")
    s = F.col("sum_cents").cast("double")
    s2 = F.col("sum2_cents").cast("double")
    return gold.to_df().where(F.col("n_rows") > 1).select(
        "event_type",
        "n_rows",
        F.round((s2 - s * s / n) / (n - F.lit(1.0)), 6).alias("var_cents"),
    )


@query(
    "agg_incremental_avg",
    _SQL_CDC
    + "SELECT event_type,"
    " round(CAST(sum(value_cents) AS DOUBLE) / count(*), 6) AS avg_cents,"
    " CAST(count(*) AS BIGINT) AS n_rows"
    " FROM final GROUP BY event_type",
)
def agg_incremental_avg(spark, sf_dir):
    """Incrementally-maintained AVG: not itself additive, but both its
    components are — the gold table carries (SUM, COUNT), each maintained
    by the same signed-delta algebra as agg_incremental_cdf in ONE merge
    (operators/cdc.py merge_agg_deltas), and avg = sum/count derives at
    read time. Integer-exact components mean the division is
    order-independent, so the oracle (plain AVG over the converged state)
    hash-matches."""
    from incremental_etl_on_lakehouse_spark.operators.cdc import merge_agg_deltas

    cache_key = (id(spark), sf_dir)
    cached = _CDC_AVG_CACHE.get(cache_key)
    if cached is not None and os.path.isdir(cached.path):
        gold = cached
    else:
        silver = _run_cdc_silver(spark, sf_dir)  # shared build, CDF replay
        root = _tmpdir()
        gold = LakeTable.create(spark, os.path.join(root, "gold_avg"), AVG_SCHEMA)
        reader = LakeStreamReader(
            silver, os.path.join(root, "avg_ck.json"), mode="cdf", starting_version=1
        )

        def update(changes: DataFrame, _v: int) -> None:
            sign = F.when(
                F.col("_change_type").isin("update_preimage", "delete"), F.lit(-1)
            ).when(
                F.col("_change_type").isin("update_postimage", "insert"), F.lit(1)
            )
            deltas = (
                changes.withColumn("__s", sign)
                .where(F.col("__s").isNotNull())
                .groupBy("event_type")
                .agg(
                    F.sum(F.col("__s") * F.col("value_cents")).alias("d_sum"),
                    F.sum("__s").alias("d_cnt"),
                )
                .where((F.col("d_sum") != 0) | (F.col("d_cnt") != 0))
            )
            merge_agg_deltas(
                gold,
                deltas,
                group_cols=["event_type"],
                agg_cols={"sum_cents": "d_sum", "n_rows": "d_cnt"},
            )

        reader.process_available(update)
        _CDC_AVG_CACHE[cache_key] = gold
    return gold.to_df().where(F.col("n_rows") > 0).select(
        "event_type",
        F.round(F.col("sum_cents").cast("double") / F.col("n_rows"), 6).alias(
            "avg_cents"
        ),
        "n_rows",
    )


# ---------------------------------------------------------------------------
# §2.6 window / §2.7 sorts
# ---------------------------------------------------------------------------


@query(
    "win_row_number_dedup",
    "SELECT user_id, event_id, event_type, (epoch_ns(ts) // 1000000) AS ts_ms FROM ("
    " SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn"
    " FROM events) WHERE rn = 1",
)
def win_row_number_dedup(spark, sf_dir):
    """Latest record per key via ranking window (ref :262-266, QUALIFY rnk=1)."""
    ev = load_table(spark, "events", sf_dir)
    latest = dedup_latest(ev, ["user_id"], ["ts"], tiebreak_cols=["event_id"])
    return latest.select("user_id", "event_id", "event_type", MS("ts").alias("ts_ms"))


@query(
    "sort_multi_key",
    "SELECT event_id, value, (epoch_ns(ts) // 1000000) AS ts_ms FROM events"
    " ORDER BY value DESC, ts DESC, event_id ASC",
)
def sort_multi_key(spark, sf_dir):
    """Multi-key mixed-direction sort (ref :372)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.orderBy(F.desc("value"), F.desc("ts"), F.asc("event_id")).select(
        "event_id", "value", MS("ts").alias("ts_ms")
    )


@query("sort_single", "SELECT n_name, n_nationkey FROM nation ORDER BY n_name")
def sort_single(spark, sf_dir):
    return load_table(spark, "nation", sf_dir).orderBy("n_name").select(
        "n_name", "n_nationkey"
    )


# ---------------------------------------------------------------------------
# §2.9 scalar functions
# ---------------------------------------------------------------------------


@query(
    "fn_md5_concat",
    "SELECT doc_id, md5(text) AS text_md5 FROM documents",
)
def fn_md5_concat(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", F.md5("text").alias("text_md5"))


@query("fn_input_file_name", "SELECT 'lineitem.parquet' AS file_name")
def fn_input_file_name(spark, sf_dir):
    """Provenance column (ref :169): distinct basename of the scanned file."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.select(
            F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("file_name")
        )
        .distinct()
    )


@query("fn_current_timestamp", "SELECT true AS ts_sane")
def fn_current_timestamp(spark, sf_dir):
    """Audit column (ref :170): deterministic sanity predicate on the clock."""
    return spark.range(1).select(
        (F.current_timestamp() > F.lit("2024-01-01").cast("timestamp")).alias("ts_sane")
    )


@query(
    "fn_to_utc_timestamp",
    "SELECT event_id, (epoch_ns(timezone('Europe/Paris', ts)) // 1000000) AS utc_ms FROM events",
)
def fn_to_utc_timestamp(spark, sf_dir):
    """Timezone normalization (ref :253): interpret wall time as Paris."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id", MS(F.to_utc_timestamp("ts", "Europe/Paris")).alias("utc_ms")
    )


@query(
    "fn_nvl",
    "SELECT n.n_nationkey, coalesce(s.s_acctbal, 0) AS acctbal FROM nation n"
    " LEFT JOIN supplier s ON n.n_nationkey = s.s_nationkey",
)
def fn_nvl(spark, sf_dir):
    """NULL defaulting after an outer join (ref nvl, :528-530)."""
    n = load_table(spark, "nation", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    return n.join(s, n.n_nationkey == s.s_nationkey, "left_outer").select(
        "n_nationkey", F.coalesce("s_acctbal", F.lit(0)).alias("acctbal")
    )


@query(
    "fn_case_when",
    "SELECT CASE WHEN o_totalprice > 200000 THEN 'high' WHEN o_totalprice > 100000"
    " THEN 'mid' ELSE 'low' END AS bucket, CAST(count(*) AS BIGINT) AS n"
    " FROM orders GROUP BY 1",
)
def fn_case_when(spark, sf_dir):
    """CASE WHEN (ref signed-delta CASE, :401-413)."""
    o = load_table(spark, "orders", sf_dir)
    bucket = (
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
    )
    return o.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


@query(
    "fn_arith",
    "SELECT l_orderkey, l_linenumber,"
    " CAST(-1 * CAST(l_quantity AS DECIMAL(8,2)) AS DOUBLE) AS neg_qty,"
    " CAST(CAST(l_extendedprice AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(4,2)) AS DOUBLE) AS price_plus_tax,"
    " CAST(CAST(l_extendedprice AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) AS price_minus_disc"
    " FROM lineitem",
)
def fn_arith(spark, sf_dir):
    """-1*x, a+b, a-b (ref :404,408,421,530)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.lit(-1) * F.col("l_quantity").cast("decimal(8,2)")).cast("double").alias("neg_qty"),
        (F.col("l_extendedprice").cast(DEC) + F.col("l_tax").cast(DEC4))
        .cast("double")
        .alias("price_plus_tax"),
        (F.col("l_extendedprice").cast(DEC) - F.col("l_discount").cast(DEC4))
        .cast("double")
        .alias("price_minus_disc"),
    )


@query(
    "fn_timestamp_parse",
    "SELECT o_orderkey, (epoch_ns(o_orderdate) // 1000000) AS parsed_ms FROM orders",
)
def fn_timestamp_parse(spark, sf_dir):
    """Parse yyyy-MM-dd HH:mm:ss[.SSS] strings (ref timestampFormat, :164):
    format to string then parse back; must round-trip exactly."""
    o = load_table(spark, "orders", sf_dir)
    s = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss.SSS")
    return o.select(
        "o_orderkey",
        MS(F.to_timestamp(s, "yyyy-MM-dd HH:mm:ss.SSS")).alias("parsed_ms"),
    )


# ---------------------------------------------------------------------------
# §2.10 streaming behaviors
# ---------------------------------------------------------------------------


@query("stream_trigger_paced", "SELECT 3 AS n_micro_batches")
def stream_trigger_paced(spark, sf_dir):
    """maxFilesPerTrigger=1 pacing (ref :161): 3 files -> 3 micro-batches."""
    d = _tmpdir()
    for i in range(3):
        with open(os.path.join(d, f"f{i}.json"), "w") as f:
            f.write(json.dumps({"id": i}))
    schema = StructType([StructField("id", LongType())])
    stream = read_json_stream(spark, d, schema, max_files_per_trigger=1, multiline=False)
    n_batches = {"n": 0}

    def count_batch(df, _bid):
        if not df.isEmpty():
            n_batches["n"] += 1

    (
        stream.writeStream.foreachBatch(count_batch)
        .option("checkpointLocation", os.path.join(_tmpdir(), "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.createDataFrame([(n_batches["n"],)], "n_micro_batches int")


@query(
    "stream_paced_bytes",
    "SELECT 2 AS n_micro_batches, 4 AS total_rows, 2 AS two_file_batches",
)
def stream_paced_bytes(spark, sf_dir):
    """maxBytesPerTrigger pacing (Autoloader's cloudFiles.maxBytesPerTrigger,
    the byte-budget sibling of the reference's maxFilesPerTrigger=1 knob,
    ref :161): 4 equal-size landing files under a 2-file byte budget ->
    exactly 2 micro-batches of exactly 2 whole files each, honored by
    trigger(availableNow) across ALL catch-up batches. Batch boundaries
    fall on whole files (the soft-maximum greedy semantics), so each batch
    carries exactly 2 rows here — equal file sizes make the assertion
    independent of the source's file ordering."""
    d = _tmpdir()
    for i in range(4):
        with open(os.path.join(d, f"f{i}.json"), "w") as f:
            f.write(json.dumps({"id": i}))  # single digit: equal sizes
    size = os.path.getsize(os.path.join(d, "f0.json"))
    schema = StructType([StructField("id", LongType())])
    stream = read_json_stream(
        spark, d, schema, multiline=False, max_bytes_per_trigger=2 * size
    )
    batches: list[int] = []

    def count_batch(df, _bid):
        n = df.count()
        if n:
            batches.append(n)

    (
        stream.writeStream.foreachBatch(count_batch)
        .option("checkpointLocation", os.path.join(_tmpdir(), "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.createDataFrame(
        [(len(batches), sum(batches), sum(1 for b in batches if b == 2))],
        "n_micro_batches int, total_rows int, two_file_batches int",
    )


@query("stream_checkpoint", "SELECT 3 AS first_run_batches, 0 AS second_run_batches")
def stream_checkpoint(spark, sf_dir):
    """Checkpointed exactly-once progress (ref :92-97,172): a second run over
    the same checkpoint reprocesses nothing."""
    d = _tmpdir()
    ck = os.path.join(_tmpdir(), "ck")
    for i in range(3):
        with open(os.path.join(d, f"f{i}.json"), "w") as f:
            f.write(json.dumps({"id": i}))
    schema = StructType([StructField("id", LongType())])
    counts = []
    for _run in range(2):
        n = {"n": 0}
        stream = read_json_stream(spark, d, schema, multiline=False)
        (
            stream.writeStream.foreachBatch(
                lambda df, _bid: n.__setitem__("n", n["n"] + (0 if df.isEmpty() else 1))
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        counts.append(n["n"])
    return spark.createDataFrame(
        [(counts[0], counts[1])], "first_run_batches int, second_run_batches int"
    )


@query(
    "stream_foreachbatch",
    _SQL_CDC
    + "SELECT event_type, CAST(sum(value_cents) AS BIGINT) AS sum_cents"
    " FROM final GROUP BY event_type",
)
def stream_foreachbatch(spark, sf_dir):
    """foreachBatch micro-batch sink pattern (ref :232-236,285,378-382,433):
    the full silver->gold incremental loop driven per commit."""
    return agg_incremental_cdf(spark, sf_dir)


@query(
    "stream_late_data",
    _SQL_CDC + "SELECT user_id, ts_ms, event_type, value_cents FROM final",
)
def stream_late_data(spark, sf_dir):
    """Late/out-of-order CDC handling. The reference relies on in-order
    delivery + hash-guarded idempotence (ref :262-276); the engine's
    tombstone merge goes further: batches delivered in ANY order (here batch
    2 before batch 1, then batch 1 re-delivered as a duplicate) converge to
    the same latest-timestamp-wins snapshot."""
    from incremental_etl_on_lakehouse_spark.operators.cdc import (
        live_view,
        merge_cdc_batch_tombstone,
    )

    schema = StructType(
        SILVER_SCHEMA.fields
        + [StructField("_deleted", BooleanType())]
    )
    silver = LakeTable.create(spark, os.path.join(_tmpdir(), "tomb"), schema)
    b1, b2 = _cdc_batches(spark, sf_dir)
    cols = [
        "user_id", "ts_ms", "event_type", "value_cents", "data_hash",
        "cdc_operation", "ts", "event_id",
    ]
    # out-of-order: newest batch first, then the older one, then a duplicate
    for batch in (b2, b1, b1):
        merge_cdc_batch_tombstone(
            silver,
            batch.select(*cols),
            key_cols=["user_id"],
            order_cols=["ts"],
            order_guard_col="ts_ms",
            tiebreak_cols=["event_id"],
        )
    # the duplicate re-delivery must have fired nothing
    last = silver.history()[-1]["metrics"]
    assert last["num_updated_rows"] == 0 and last["num_inserted_rows"] == 0, last
    return live_view(silver).select("user_id", "ts_ms", "event_type", "value_cents")

# ---------------------------------------------------------------------------
# Headline analytics queries (bench workload; TPC-H shapes)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    "SELECT l_returnflag, l_linestatus,"
    " CAST(sum(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty,"
    " CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,"
    " CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,"
    " CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
    " * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,"
    " CAST(sum(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) / count(*) AS avg_qty,"
    " CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,"
    " CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,"
    " CAST(count(*) AS BIGINT) AS count_order"
    " FROM lineitem GROUP BY l_returnflag, l_linestatus",
)
def q1_pricing_summary(spark, sf_dir):
    """Flagship: TPC-H Q1-shaped pricing summary over lineitem.

    One scan, map-side partial aggregation, single shuffle on the tiny
    (returnflag, linestatus) grouping key; decimal accumulators keep the
    sums order-independent for the oracle hash.
    """
    li = load_table(spark, "lineitem", sf_dir)
    qty = F.col("l_quantity").cast("decimal(8,2)")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC4)
    tax = F.col("l_tax").cast(DEC4)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_top_customers",
    "SELECT c.c_custkey, c.c_name,"
    " CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent,"
    " CAST(count(*) AS BIGINT) AS n_orders"
    " FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey"
    " GROUP BY c.c_custkey, c.c_name"
    " ORDER BY total_spent DESC, c.c_custkey LIMIT 10",
)
def q_top_customers(spark, sf_dir):
    """Top-k after join+agg: broadcast dim join, partial agg, global top-10
    (orderBy().limit() -> Spark TakeOrderedAndProject, no full sort)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_spent"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


@query(
    "q_events_enriched",
    "SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,"
    " CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,"
    " CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value"
    " FROM events e GROUP BY e.event_type",
)
def q_events_enriched(spark, sf_dir):
    """Grouped multi-aggregate incl. distinct-count over the stream table."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )


