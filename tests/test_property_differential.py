"""Differential relational fuzzing: random project/filter/aggregate/join
plans built simultaneously as a Spark DataFrame plan and as DuckDB SQL from
ONE plan description, compared with the DRIVER-STRICT stringified-tuple
rule (str(value) per cell, columns sorted by name, rows sorted).

This covers two things no single hand-written oracle can:

- the ENGINE, across a combinatorial space of filter/agg/join compositions
  rather than the fixed shapes the query registry pins;
- the ORACLE-WRITING DISCIPLINE itself — every generated aggregate goes
  through the same typing rules the registry uses (DECIMAL accumulators
  for money sums, explicit BIGINT counts, integer division via //), so a
  new typing pitfall in that discipline shows up here before it ships in
  a registered oracle and fails a driver sweep.

Deterministic seeds, bounded plan count: ~40 round-trips at sf0.001.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from incremental_etl_on_lakehouse_spark.tables import load_table

# ---------------------------------------------------------------- plan AST
# Predicates over lineitem columns, as (spark_builder, sql_text) pairs
# sharing one literal pool. Columns chosen so both engines compare
# identically (strings, exact decimals-as-double with equality-safe
# comparisons, dates via ISO literals).

_FILTER_FAMILIES = [
    # one family per column: sampling at most one member per family keeps
    # random conjunctions satisfiable (no `qty > 25 AND qty <= 10`), so
    # the vacuous-plan guard stays meaningful
    [
        (lambda: F.col("l_returnflag") == "N", "l_returnflag = 'N'"),
        (lambda: F.col("l_returnflag") != "A", "l_returnflag <> 'A'"),
    ],
    [(lambda: F.col("l_linestatus") == "F", "l_linestatus = 'F'")],
    [
        (lambda: F.col("l_quantity") > 25.0, "l_quantity > 25.0"),
        (lambda: F.col("l_quantity") <= 10.0, "l_quantity <= 10.0"),
    ],
    [(lambda: F.col("l_discount") >= 0.05, "l_discount >= 0.05")],
    [(lambda: F.col("l_tax") < 0.04, "l_tax < 0.04")],
    [
        (
            lambda: F.col("l_shipdate") >= "1995-06-01",
            "l_shipdate >= TIMESTAMP '1995-06-01'",
        ),
        (
            lambda: F.col("l_shipdate") < "1997-01-01",
            "l_shipdate < TIMESTAMP '1997-01-01'",
        ),
    ],
    [(lambda: F.col("l_orderkey") % 7 == 0, "l_orderkey % 7 = 0")],
    [(lambda: F.col("l_partkey") % 3 == 1, "l_partkey % 3 = 1")],
    [(lambda: F.col("l_suppkey") % 5 != 2, "l_suppkey % 5 <> 2")],
]


def _sample_filters(rng: random.Random, k: int) -> list:
    families = rng.sample(_FILTER_FAMILIES, k)
    return [rng.choice(fam) for fam in families]

# Aggregates following the registry's typing discipline: money through
# DECIMAL accumulators cast back to DOUBLE, counts as BIGINT, integer
# sums as BIGINT. Each entry: (alias, spark_column_builder, sql_expr).
_AGGS = [
    (
        "n_rows",
        lambda: F.count("*").alias("n_rows"),
        "count(*) AS n_rows",
    ),
    (
        "sum_qty",
        lambda: F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_qty"),
        "CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty",
    ),
    (
        "sum_price",
        lambda: F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_price"),
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
        " AS sum_price",
    ),
    (
        "n_orders",
        lambda: F.countDistinct("l_orderkey").alias("n_orders"),
        "count(DISTINCT l_orderkey) AS n_orders",
    ),
    (
        "min_ship",
        lambda: F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias(
            "min_ship"
        ),
        "strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship",
    ),
    (
        "max_flag",
        lambda: F.max("l_returnflag").alias("max_flag"),
        "max(l_returnflag) AS max_flag",
    ),
    (
        "sum_keymod",
        lambda: F.sum(F.col("l_orderkey") % 97).alias("sum_keymod"),
        "sum(l_orderkey % 97) AS sum_keymod",
    ),
]

_GROUPS = [
    (["l_returnflag"], "l_returnflag"),
    (["l_linestatus"], "l_linestatus"),
    (["l_returnflag", "l_linestatus"], "l_returnflag, l_linestatus"),
    (
        ["l_returnflag", "l_linenumber"],
        "l_returnflag, l_linenumber",
    ),
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def strict_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


def run_both(spark, sf_dir, ddb, sdf, sql):
    srows = strict_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = ddb.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = strict_rows(dcols, res.fetchall())
    assert sorted(sdf.columns) == sorted(dcols), (sdf.columns, dcols, sql)
    assert srows == drows, (
        sql,
        len(srows),
        len(drows),
        [p for p in zip(srows, drows) if p[0] != p[1]][:3],
    )
    return len(srows)


@pytest.mark.parametrize("seed", range(20))
def test_random_filter_aggregate(spark, sf_dir, ddb, seed):
    rng = random.Random(1000 + seed)
    li = load_table(spark, "lineitem", sf_dir)
    filters = _sample_filters(rng, rng.randint(1, 3))
    group_cols, group_sql = rng.choice(_GROUPS)
    aggs = rng.sample(_AGGS, rng.randint(1, 4))

    df = li
    for fb, _ in filters:
        df = df.where(fb())
    df = df.groupBy(*group_cols).agg(*[ab() for _, ab, _ in aggs])

    where_sql = " AND ".join(fs for _, fs in filters)
    agg_sql = ", ".join(asql for _, _, asql in aggs)
    sql = (
        f"SELECT {group_sql}, {agg_sql} FROM lineitem"
        f" WHERE {where_sql} GROUP BY {group_sql}"
    )
    n = run_both(spark, sf_dir, ddb, df, sql)
    # vacuous-pass guard: a plan whose filters eliminate everything
    # proves nothing; the pools are chosen so this cannot happen
    assert n > 0, f"vacuous plan: {sql}"


@pytest.mark.parametrize("seed", range(10))
def test_random_join_aggregate(spark, sf_dir, ddb, seed):
    rng = random.Random(2000 + seed)
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    filters = _sample_filters(rng, rng.randint(0, 2))
    aggs = rng.sample(_AGGS, rng.randint(1, 3))
    use_status = rng.random() < 0.5
    group_cols = (
        ["o_orderstatus", "l_returnflag"] if use_status else ["o_orderpriority"]
    )

    df = li.join(o, li.l_orderkey == o.o_orderkey)
    for fb, _ in filters:
        df = df.where(fb())
    df = df.groupBy(*group_cols).agg(*[ab() for _, ab, _ in aggs])

    where_sql = " AND ".join(fs for _, fs in filters) or "TRUE"
    agg_sql = ", ".join(asql for _, _, asql in aggs)
    group_sql = ", ".join(group_cols)
    sql = (
        f"SELECT {group_sql}, {agg_sql} FROM lineitem l"
        f" JOIN orders o ON l.l_orderkey = o.o_orderkey"
        f" WHERE {where_sql} GROUP BY {group_sql}"
    )
    n = run_both(spark, sf_dir, ddb, df, sql)
    assert n > 0, f"vacuous plan: {sql}"


@pytest.mark.parametrize("seed", range(10))
def test_random_project_sort_limit_free(spark, sf_dir, ddb, seed):
    """Projection + filter + full ordered output (no LIMIT — a limit
    without a total order is nondeterministic on both engines)."""
    rng = random.Random(3000 + seed)
    li = load_table(spark, "lineitem", sf_dir)
    filters = _sample_filters(rng, rng.randint(2, 4))

    df = li
    for fb, _ in filters:
        df = df.where(fb())
    df = df.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").alias("flag"),
        (F.col("l_orderkey") % 10).alias("bucket"),
    )
    where_sql = " AND ".join(fs for _, fs in filters)
    sql = (
        "SELECT l_orderkey, l_linenumber, l_returnflag AS flag,"
        " l_orderkey % 10 AS bucket FROM lineitem"
        f" WHERE {where_sql}"
    )
    run_both(spark, sf_dir, ddb, df, sql)


# Scalar expression pairs (spark_builder, sql_expr) sharing an alias —
# string ops, date parts, integer division — the spellings the registry's
# oracles rely on agreeing across engines.
_SCALARS = [
    (
        "up_flag",
        lambda: F.upper(F.col("l_returnflag")).alias("up_flag"),
        "upper(l_returnflag) AS up_flag",
    ),
    (
        "fs2",
        lambda: F.substring(
            F.concat(F.col("l_linestatus"), F.col("l_returnflag")), 1, 2
        ).alias("fs2"),
        "substr(l_linestatus || l_returnflag, 1, 2) AS fs2",
    ),
    (
        "ship_year",
        lambda: F.year("l_shipdate").cast("long").alias("ship_year"),
        "CAST(year(l_shipdate) AS BIGINT) AS ship_year",
    ),
    (
        "ship_month",
        lambda: F.month("l_shipdate").cast("long").alias("ship_month"),
        "CAST(month(l_shipdate) AS BIGINT) AS ship_month",
    ),
    (
        "key_div",
        lambda: F.expr("l_orderkey div 7").alias("key_div"),
        "l_orderkey // 7 AS key_div",
    ),
    (
        "key_abs",
        lambda: F.abs(F.col("l_orderkey") % 13 - 6).alias("key_abs"),
        "abs(l_orderkey % 13 - 6) AS key_abs",
    ),
    (
        "tag",
        lambda: F.concat_ws(
            "-", F.col("l_returnflag"), F.col("l_linestatus")
        ).alias("tag"),
        "concat_ws('-', l_returnflag, l_linestatus) AS tag",
    ),
    (
        "flag_len",
        lambda: F.length(F.concat(F.col("l_returnflag"), F.lit("x")))
        .cast("long")
        .alias("flag_len"),
        "CAST(length(l_returnflag || 'x') AS BIGINT) AS flag_len",
    ),
]


@pytest.mark.parametrize("seed", range(10))
def test_random_scalar_projection(spark, sf_dir, ddb, seed):
    """Scalar-function spellings (string ops, date parts, integer
    division) agree across engines on real rows under the strict
    stringified compare — the cross-engine contract every registered
    oracle's scalar expressions assume."""
    rng = random.Random(4000 + seed)
    li = load_table(spark, "lineitem", sf_dir)
    filters = _sample_filters(rng, rng.randint(1, 3))
    scalars = rng.sample(_SCALARS, rng.randint(2, 4))

    df = li
    for fb, _ in filters:
        df = df.where(fb())
    df = df.select(
        "l_orderkey", "l_linenumber", *[sb() for _, sb, _ in scalars]
    )
    where_sql = " AND ".join(fs for _, fs in filters)
    scalar_sql = ", ".join(ss for _, _, ss in scalars)
    sql = (
        f"SELECT l_orderkey, l_linenumber, {scalar_sql} FROM lineitem"
        f" WHERE {where_sql}"
    )
    n = run_both(spark, sf_dir, ddb, df, sql)
    assert n > 0, f"vacuous plan: {sql}"


# Window fns over ORDER BY (l_orderkey, l_linenumber) — NOT unique in
# the fixture; cross-engine determinism rests on peer-indistinguishability
# (see test_random_window_functions' docstring): every fn here must
# depend only on position/peers and PROJECTED columns of tied rows.
# Do NOT add e.g. lag(l_quantity) — a non-ORDER-BY payload column of a
# tied row — without first making the order key total.
_WINDOW_FNS = [
    (
        "rn",
        lambda w: F.row_number().over(w).cast("long").alias("rn"),
        "row_number() OVER w AS rn",
    ),
    (
        "rk",
        lambda w: F.rank().over(w).cast("long").alias("rk"),
        "rank() OVER w AS rk",
    ),
    (
        "prev_line",
        lambda w: F.lag("l_linenumber", 1, -1).over(w).cast("long")
        .alias("prev_line"),
        "CAST(coalesce(lag(l_linenumber, 1) OVER w, -1) AS BIGINT)"
        " AS prev_line",
    ),
    (
        "run_keymod",
        lambda w: F.sum(F.col("l_orderkey") % 97).over(w).alias("run_keymod"),
        "sum(l_orderkey % 97) OVER w AS run_keymod",
    ),
    (
        "tile4",
        lambda w: F.ntile(4).over(w).cast("long").alias("tile4"),
        "ntile(4) OVER w AS tile4",
    ),
]


@pytest.mark.parametrize("seed", range(8))
def test_random_window_functions(spark, sf_dir, ddb, seed):
    """Window functions agree across engines — the machinery the repo's
    dedup_latest / sessionization / bucketing paths are built on.

    (l_orderkey, l_linenumber) is NOT unique in the fixture, but the
    compare is still deterministic because the projected columns are
    confined to the ORDER BY / partition columns, so tied rows are fully
    indistinguishable: row_number AND ntile may split a peer group by
    arbitrary row position, but the values they assign permute only
    across identical projected rows, leaving the output multiset fixed
    (rank treats peers alike outright; the RANGE default frame includes
    ALL peers so running sums match too). Projecting any payload column
    alongside row_number/ntile would break this — keep _WINDOW_FNS and
    the select list inside that invariant."""
    from pyspark.sql.window import Window

    rng = random.Random(5000 + seed)
    li = load_table(spark, "lineitem", sf_dir)
    filters = _sample_filters(rng, rng.randint(1, 2))
    part_cols, part_sql = rng.choice(
        [
            (["l_returnflag"], "l_returnflag"),
            (["l_linestatus"], "l_linestatus"),
            (["l_returnflag", "l_linestatus"], "l_returnflag, l_linestatus"),
        ]
    )
    fns = rng.sample(_WINDOW_FNS, rng.randint(1, 3))

    w = Window.partitionBy(*part_cols).orderBy("l_orderkey", "l_linenumber")
    df = li
    for fb, _ in filters:
        df = df.where(fb())
    df = df.select(
        "l_orderkey", "l_linenumber", *part_cols, *[fb(w) for _, fb, _ in fns]
    )
    where_sql = " AND ".join(fs for _, fs in filters)
    fn_sql = ", ".join(fs for _, _, fs in fns)
    sql = (
        f"SELECT l_orderkey, l_linenumber, {part_sql}, {fn_sql}"
        f" FROM lineitem WHERE {where_sql}"
        f" WINDOW w AS (PARTITION BY {part_sql}"
        f" ORDER BY l_orderkey, l_linenumber)"
    )
    n = run_both(spark, sf_dir, ddb, df, sql)
    assert n > 0, f"vacuous plan: {sql}"


@pytest.mark.parametrize("seed", range(8))
def test_random_semi_anti_subqueries(spark, sf_dir, ddb, seed):
    """Semi/anti join shapes vs EXISTS / NOT EXISTS subqueries — the
    decorrelation contract the TPC-H shapes (q4, q16, q21, q22) and
    filter_subquery rely on. Columns are non-null so NOT IN has no
    three-valued-logic trap; the orders-side filter varies per seed."""
    rng = random.Random(6000 + seed)
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    ofilter, osql = rng.choice(
        [
            (F.col("o_orderstatus") == "F", "o_orderstatus = 'F'"),
            (F.col("o_orderpriority") == "1-URGENT",
             "o_orderpriority = '1-URGENT'"),
            (F.col("o_totalprice") > 150000.0, "o_totalprice > 150000.0"),
            (F.col("o_orderkey") % 3 == 0, "o_orderkey % 3 = 0"),
        ]
    )
    lfilters = _sample_filters(rng, rng.randint(1, 2))
    anti = rng.random() < 0.5

    sub = o.where(ofilter)
    df = li
    for fb, _ in lfilters:
        df = df.where(fb())
    df = df.join(
        sub, df.l_orderkey == sub.o_orderkey, "left_anti" if anti else "left_semi"
    ).groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )

    where_sql = " AND ".join(fs for _, fs in lfilters)
    word = "NOT EXISTS" if anti else "EXISTS"
    sql = (
        "SELECT l_returnflag, count(*) AS n_rows,"
        " count(DISTINCT l_orderkey) AS n_orders FROM lineitem l"
        f" WHERE {where_sql} AND {word} (SELECT 1 FROM orders o"
        f" WHERE o.o_orderkey = l.l_orderkey AND {osql})"
        " GROUP BY l_returnflag"
    )
    n = run_both(spark, sf_dir, ddb, df, sql)
    assert n > 0, f"vacuous plan: {sql}"


@pytest.mark.parametrize("seed", range(6))
def test_random_set_operations(spark, sf_dir, ddb, seed):
    """UNION / INTERSECT / EXCEPT between filtered projections agree —
    the distinct-set semantics setop_union/intersect/except pin on one
    fixed shape, here across random slice pairs."""
    rng = random.Random(7000 + seed)
    li = load_table(spark, "lineitem", sf_dir)
    (fa, sa), (fb, sb) = _sample_filters(rng, 2)
    op = rng.choice(["union", "intersect", "except"])

    proj = ["l_orderkey", "l_returnflag"]
    a = li.where(fa()).select(*proj)
    b = li.where(fb()).select(*proj)
    if op == "union":
        df = a.union(b).distinct()
    elif op == "intersect":
        df = a.intersect(b)
    else:
        df = a.subtract(b)  # EXCEPT DISTINCT, like the SQL below

    kw = {"union": "UNION", "intersect": "INTERSECT", "except": "EXCEPT"}[op]
    sql = (
        f"SELECT l_orderkey, l_returnflag FROM lineitem WHERE {sa}"
        f" {kw} SELECT l_orderkey, l_returnflag FROM lineitem WHERE {sb}"
    )
    run_both(spark, sf_dir, ddb, df, sql)


# Rollup/cube group pairs: both columns non-null in the fixture, so a
# NULL in the output unambiguously marks a super-aggregate row and the
# grouping_id bitmask is the cross-engine disambiguator.
_SUPER_GROUPS = [
    (["l_returnflag", "l_linestatus"], "l_returnflag, l_linestatus"),
    (["l_returnflag", "l_linenumber"], "l_returnflag, l_linenumber"),
    (["l_linestatus", "l_linenumber"], "l_linestatus, l_linenumber"),
]


@pytest.mark.parametrize("seed", range(8))
def test_random_rollup_cube(spark, sf_dir, ddb, seed):
    """ROLLUP/CUBE super-aggregates agree across engines, including the
    grouping_id bitmask (Spark ``grouping_id()`` == DuckDB
    ``grouping(a, b)``, least-significant bit = last column) — the
    contract agg_rollup / agg_cube / agg_grouping_sets pin on one shape
    each, here across random filter + aggregate compositions."""
    rng = random.Random(8000 + seed)
    li = load_table(spark, "lineitem", sf_dir)
    filters = _sample_filters(rng, rng.randint(0, 2))
    group_cols, group_sql = rng.choice(_SUPER_GROUPS)
    aggs = rng.sample(_AGGS, rng.randint(1, 3))
    cube = rng.random() < 0.5

    df = li
    for fb, _ in filters:
        df = df.where(fb())
    grouped = df.cube(*group_cols) if cube else df.rollup(*group_cols)
    df = grouped.agg(
        F.grouping_id().cast("long").alias("gid"),
        *[ab() for _, ab, _ in aggs],
    )

    where_sql = " AND ".join(fs for _, fs in filters) or "TRUE"
    agg_sql = ", ".join(asql for _, _, asql in aggs)
    kw = "CUBE" if cube else "ROLLUP"
    sql = (
        f"SELECT {group_sql}, CAST(grouping({group_sql}) AS BIGINT) AS gid,"
        f" {agg_sql} FROM lineitem WHERE {where_sql}"
        f" GROUP BY {kw} ({group_sql})"
    )
    n = run_both(spark, sf_dir, ddb, df, sql)
    assert n > 0, f"vacuous plan: {sql}"


@pytest.mark.parametrize("seed", range(8))
def test_random_outer_join_null_groups(spark, sf_dir, ddb, seed):
    """LEFT OUTER join against a filtered build side, then GROUP BY a
    build-side column — unmatched probe rows land in the NULL group, so
    this pins the three-valued grouping / count(col)-skips-NULL behavior
    the CDC gold catch-up and join_right_outer key rely on."""
    rng = random.Random(9000 + seed)
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    ofilter, osql = rng.choice(
        [
            (F.col("o_orderstatus") == "F", "o_orderstatus = 'F'"),
            (F.col("o_orderpriority") == "1-URGENT",
             "o_orderpriority = '1-URGENT'"),
            (F.col("o_totalprice") > 150000.0, "o_totalprice > 150000.0"),
            (F.col("o_orderkey") % 3 == 0, "o_orderkey % 3 = 0"),
        ]
    )
    lfilters = _sample_filters(rng, rng.randint(0, 2))
    group = rng.choice(["o_orderstatus", "o_orderpriority"])

    sub = o.where(ofilter).select("o_orderkey", "o_orderstatus",
                                  "o_orderpriority")
    df = li
    for fb, _ in lfilters:
        df = df.where(fb())
    df = df.join(sub, df.l_orderkey == sub.o_orderkey, "left").groupBy(
        group
    ).agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderkey").alias("n_matched"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )

    where_sql = " AND ".join(fs for _, fs in lfilters) or "TRUE"
    sql = (
        f"SELECT o.{group}, count(*) AS n_rows,"
        " count(o.o_orderkey) AS n_matched,"
        " count(DISTINCT l_orderkey) AS n_orders"
        " FROM lineitem l LEFT JOIN"
        f" (SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders"
        f" WHERE {osql}) o ON l.l_orderkey = o.o_orderkey"
        f" WHERE {where_sql} GROUP BY o.{group}"
    )
    n = run_both(spark, sf_dir, ddb, df, sql)
    # every build-side filter drops some orders, so the NULL group must
    # exist — if it doesn't, the join didn't actually leave unmatched rows
    # and the three-valued-logic coverage is vacuous
    assert n > 1, f"no NULL group produced: {sql}"


@pytest.mark.parametrize("seed", range(8))
def test_random_having(spark, sf_dir, ddb, seed):
    """GROUP BY + HAVING on an aggregate agrees across engines — the
    post-aggregation filter spelling (DataFrame ``.where`` after
    ``.agg``) every threshold-style registered oracle uses."""
    rng = random.Random(10000 + seed)
    li = load_table(spark, "lineitem", sf_dir)
    filters = _sample_filters(rng, rng.randint(0, 2))
    # coarse groups only (3–9 groups of hundreds of rows at sf0.001), so
    # the thresholds below can't empty the result for any filter draw
    group_cols, group_sql = rng.choice(_GROUPS[:3])
    # n_rows is added unconditionally below (the HAVING target), so the
    # sampled extras must come from the rest of the pool
    aggs = rng.sample(_AGGS[1:], rng.randint(1, 3))
    threshold = rng.choice([5, 25])

    df = li
    for fb, _ in filters:
        df = df.where(fb())
    df = (
        df.groupBy(*group_cols)
        .agg(F.count("*").alias("n_rows"), *[ab() for _, ab, _ in aggs])
        .where(F.col("n_rows") > threshold)
    )

    where_sql = " AND ".join(fs for _, fs in filters) or "TRUE"
    agg_sql = ", ".join(asql for _, _, asql in aggs)
    sql = (
        f"SELECT {group_sql}, count(*) AS n_rows, {agg_sql} FROM lineitem"
        f" WHERE {where_sql} GROUP BY {group_sql}"
        f" HAVING count(*) > {threshold}"
    )
    n = run_both(spark, sf_dir, ddb, df, sql)
    assert n > 0, f"vacuous plan: {sql}"


# Correlated LATERAL aggregates: inner-aggregate pool for the
# per-outer-row lookup. Each entry: (alias, inner agg SQL — identical
# text both engines). count(*) is NOT in the sampled pool — it is added
# unconditionally below, because DuckDB 1.0.0 drops zero-match outer
# rows from a lateral aggregate subquery that has no count(*) in its
# SELECT list (verified: VALUES(1),(2) lateral max() returns 1 row
# without count, the standard 2 with it), while Spark keeps them in
# both spellings (SQL-standard: an ungrouped aggregate yields exactly
# one row). The registered join_lateral key includes count(*) for the
# same reason — any future lateral oracle MUST too, or pin per-engine.
_LATERAL_AGGS = [
    ("max_qty", "max(CAST(l_quantity AS BIGINT)) AS max_qty"),
    ("sum_keymod", "sum(l_partkey % 53) AS sum_keymod"),
    ("min_line", "min(CAST(l_linenumber AS BIGINT)) AS min_line"),
]


@pytest.mark.parametrize("seed", range(8))
def test_random_lateral_correlated_agg(spark, sf_dir, ddb, seed):
    """Correlated LATERAL scalar-aggregate subqueries agree across
    engines, INCLUDING the COUNT edge case (outer rows with zero inner
    matches surface n = 0 / NULL aggregates, which naive outer-join
    decorrelations get wrong). One plan description renders to both
    engines' SQL — the dialect splits are DuckDB's mandatory ON TRUE
    and the mandatory count(*) documented on _LATERAL_AGGS."""
    rng = random.Random(11000 + seed)
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("fz_orders")
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView(
        "fz_lineitem"
    )
    aggs = [("n_lines", "CAST(count(*) AS BIGINT) AS n_lines")] + rng.sample(
        _LATERAL_AGGS, rng.randint(1, 2)
    )
    inner_extra = rng.choice(
        ["", " AND l.l_linenumber <= 5", " AND l.l_quantity > 10.0"]
    )
    outer_mod = rng.choice([7, 11, 18])
    agg_sql = ", ".join(a for _, a in aggs)

    def render(olat, llat, on_true):
        return (
            f"SELECT o.o_orderkey, o.o_orderstatus, {', '.join('t.' + n for n, _ in aggs)}"
            f" FROM {olat} o JOIN LATERAL ("
            f"  SELECT {agg_sql} FROM {llat} l"
            f"  WHERE l.l_orderkey = o.o_orderkey{inner_extra}"
            f" ) t{' ON TRUE' if on_true else ''}"
            f" WHERE o.o_orderkey % {outer_mod} = 0"
        )

    sdf = spark.sql(render("fz_orders", "fz_lineitem", False))
    sql = render("orders", "lineitem", True)
    n = run_both(spark, sf_dir, ddb, sdf, sql)
    assert n > 0, f"vacuous plan: {sql}"


# String-function pairs. Includes the regexp_replace global-flag trap:
# Spark replaces ALL matches by default, DuckDB only the first without
# the 'g' flag — the pool pins the correct pairing.
_STRING_FNS = [
    (
        "pri_up",
        lambda: F.upper(F.col("o_orderpriority")).alias("pri_up"),
        "upper(o_orderpriority) AS pri_up",
    ),
    (
        "pri_low",
        lambda: F.lower(F.col("o_orderpriority")).alias("pri_low"),
        "lower(o_orderpriority) AS pri_low",
    ),
    (
        "pri_pad",
        lambda: F.lpad(F.col("o_orderstatus"), 5, ".").alias("pri_pad"),
        "lpad(o_orderstatus, 5, '.') AS pri_pad",
    ),
    (
        "pri_repl",
        lambda: F.replace(
            F.col("o_orderpriority"), F.lit("-"), F.lit("_")
        ).alias("pri_repl"),
        "replace(o_orderpriority, '-', '_') AS pri_repl",
    ),
    (
        "pri_re",
        lambda: F.regexp_replace(
            F.col("o_orderpriority"), "[AEIOU]", "#"
        ).alias("pri_re"),
        "regexp_replace(o_orderpriority, '[AEIOU]', '#', 'g') AS pri_re",
    ),
    (
        "pri_rev",
        lambda: F.reverse(F.col("o_orderstatus")).alias("pri_rev"),
        "reverse(o_orderstatus) AS pri_rev",
    ),
    (
        "pri_pos",
        lambda: F.instr(F.col("o_orderpriority"), "GENT")
        .cast("long")
        .alias("pri_pos"),
        "CAST(strpos(o_orderpriority, 'GENT') AS BIGINT) AS pri_pos",
    ),
    (
        "pri_left",
        lambda: F.expr("left(o_orderpriority, 3)").alias("pri_left"),
        "left(o_orderpriority, 3) AS pri_left",
    ),
    (
        "pri_rep",
        lambda: F.repeat(F.col("o_orderstatus"), 3).alias("pri_rep"),
        "repeat(o_orderstatus, 3) AS pri_rep",
    ),
    (
        "pri_sub",
        lambda: F.substring(F.col("o_orderpriority"), 3, 4).alias("pri_sub"),
        "substr(o_orderpriority, 3, 4) AS pri_sub",
    ),
]


@pytest.mark.parametrize("seed", range(8))
def test_random_string_functions(spark, sf_dir, ddb, seed):
    """String-scalar spellings agree across engines under the strict
    compare — including regexp_replace's global-flag dialect split
    (Spark global by default, DuckDB needs 'g')."""
    rng = random.Random(12000 + seed)
    o = load_table(spark, "orders", sf_dir)
    fns = rng.sample(_STRING_FNS, rng.randint(3, 5))
    mod = rng.choice([7, 13, 29])

    df = o.where(F.col("o_orderkey") % mod == 0).select(
        "o_orderkey", *[fb() for _, fb, _ in fns]
    )
    fn_sql = ", ".join(fs for _, _, fs in fns)
    sql = (
        f"SELECT o_orderkey, {fn_sql} FROM orders"
        f" WHERE o_orderkey % {mod} = 0"
    )
    n = run_both(spark, sf_dir, ddb, df, sql)
    assert n > 0, f"vacuous plan: {sql}"


# Datetime pairs over l_shipdate. Everything renders to strings or
# BIGINTs before the compare (engine-native temporal rendering never
# hits the hash); dayofweek/weekofyear are deliberately absent (the
# engines disagree on week/weekday conventions).
_DATETIME_FNS = [
    (
        "ship_day",
        lambda: F.dayofmonth("l_shipdate").cast("long").alias("ship_day"),
        "CAST(day(l_shipdate) AS BIGINT) AS ship_day",
    ),
    (
        "ship_q",
        lambda: F.quarter("l_shipdate").cast("long").alias("ship_q"),
        "CAST(quarter(l_shipdate) AS BIGINT) AS ship_q",
    ),
    (
        "month_start",
        lambda: F.date_format(
            F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM-dd"
        ).alias("month_start"),
        "strftime(date_trunc('month', l_shipdate), '%Y-%m-%d')"
        " AS month_start",
    ),
    (
        "ship_plus7",
        lambda: F.date_format(
            F.date_add(F.to_date("l_shipdate"), 7), "yyyy-MM-dd"
        ).alias("ship_plus7"),
        "strftime(CAST(l_shipdate AS DATE) + 7, '%Y-%m-%d') AS ship_plus7",
    ),
    (
        "days_since",
        lambda: F.datediff(
            F.to_date("l_shipdate"), F.lit("1995-01-01").cast("date")
        )
        .cast("long")
        .alias("days_since"),
        "CAST(datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))"
        " AS BIGINT) AS days_since",
    ),
    (
        "month_end",
        lambda: F.date_format(
            F.last_day("l_shipdate"), "yyyy-MM-dd"
        ).alias("month_end"),
        "strftime(last_day(CAST(l_shipdate AS DATE)), '%Y-%m-%d')"
        " AS month_end",
    ),
]


@pytest.mark.parametrize("seed", range(8))
def test_random_datetime_functions(spark, sf_dir, ddb, seed):
    """Datetime spellings agree across engines: date parts, truncation,
    date arithmetic, datediff, last_day — all rendered to strings/
    BIGINTs (the registry's epoch-ms discipline for temporals)."""
    rng = random.Random(13000 + seed)
    li = load_table(spark, "lineitem", sf_dir)
    filters = _sample_filters(rng, rng.randint(1, 2))
    fns = rng.sample(_DATETIME_FNS, rng.randint(2, 4))

    df = li
    for fb, _ in filters:
        df = df.where(fb())
    df = df.select("l_orderkey", "l_linenumber", *[fb() for _, fb, _ in fns])
    where_sql = " AND ".join(fs for _, fs in filters)
    fn_sql = ", ".join(fs for _, _, fs in fns)
    sql = (
        f"SELECT l_orderkey, l_linenumber, {fn_sql} FROM lineitem"
        f" WHERE {where_sql}"
    )
    n = run_both(spark, sf_dir, ddb, df, sql)
    assert n > 0, f"vacuous plan: {sql}"


@pytest.mark.parametrize("seed", range(8))
def test_random_multi_distinct(spark, sf_dir, ddb, seed):
    """Several exact COUNT(DISTINCT) columns + plain aggregates in one
    grouped aggregate — the Expand-strategy path (one pass, row fan-out
    per distinct set) across random group/filter combinations. Pins
    that Expand's NULL bookkeeping and partial-aggregate merge agree
    with DuckDB's multi-distinct execution on real data."""
    rng = random.Random(14000 + seed)
    li = load_table(spark, "lineitem", sf_dir)
    filters = _sample_filters(rng, rng.randint(0, 2))
    group_cols, group_sql = rng.choice(_GROUPS[:3])
    dcols = rng.sample(
        ["l_suppkey", "l_partkey", "l_orderkey", "l_linenumber"],
        rng.randint(2, 3),
    )

    df = li
    for fb, _ in filters:
        df = df.where(fb())
    df = df.groupBy(*group_cols).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_orderkey") % 97).alias("sum_keymod"),
        *[F.countDistinct(c).alias(f"nd_{c}") for c in dcols],
    )

    where_sql = " AND ".join(fs for _, fs in filters) or "TRUE"
    nd_sql = ", ".join(
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{c}" for c in dcols
    )
    sql = (
        f"SELECT {group_sql}, count(*) AS n_rows,"
        f" sum(l_orderkey % 97) AS sum_keymod, {nd_sql} FROM lineitem"
        f" WHERE {where_sql} GROUP BY {group_sql}"
    )
    n = run_both(spark, sf_dir, ddb, df, sql)
    assert n > 0, f"vacuous plan: {sql}"
