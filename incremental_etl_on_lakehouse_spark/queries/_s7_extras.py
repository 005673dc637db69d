"""Round-8 engine/EXT additions (SURVEY §2.12/§2.13 widening).

Same registry discipline as the earlier section modules: each key is a
(Spark callable, DuckDB oracle SQL) pair with identical aliases on both
sides, exact types (BIGINT counts, no bare integer division), and a scale
note in the docstring answering the 100 TB question for the shape.
"""

from __future__ import annotations

from incremental_etl_on_lakehouse_spark.queries._core import *  # noqa: F401,F403

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)


@query(
    "ext_inverted_index",
    "WITH toks AS ("
    f" SELECT doc_id, unnest(list_distinct(regexp_split_to_array({_NORM_SQL},"
    " ' '))) AS token FROM documents),"
    " t2 AS (SELECT token, doc_id FROM toks WHERE token <> ''),"
    " ranked AS (SELECT token, doc_id,"
    "  row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn,"
    "  count(*) OVER (PARTITION BY token) AS df FROM t2)"
    " SELECT token, CAST(df AS BIGINT) AS doc_freq,"
    "  string_agg(CASE WHEN rn <= 20 THEN CAST(doc_id AS VARCHAR) END, ','"
    "   ORDER BY doc_id) AS postings_head"
    " FROM ranked WHERE df >= 50 GROUP BY token, df",
)
def ext_inverted_index(spark, sf_dir):
    """Inverted-index build for corpus retrieval: distinct token → document
    frequency + the head of the docid-sorted posting list (first 20 ids) —
    the structure BM25/decontamination lookups are served from.

    Scale: the exchange is one hash shuffle keyed on token (explode →
    groupBy), identical to the tf-idf/BM25 keys; posting lists at 100 TB
    stay as the exploded (token, doc_id) pair table — range-sharded by
    token — and only the bounded 20-id head is ever concatenated here, so
    no reducer materializes an unbounded string."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(T.normalize_text(F.col("text")), " ")))
        .alias("token"),
    ).where(F.col("token") != "")
    return (
        pairs.groupBy("token")
        .agg(
            F.count("*").alias("doc_freq"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings_head"),
        )
        .where(F.col("doc_freq") >= 50)
    )


@query(
    "ext_dataset_profile",
    "SELECT 'doc_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,"
    " CAST(count(*) - count(doc_id) AS BIGINT) AS n_null,"
    " CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,"
    " CAST(min(doc_id) AS VARCHAR) AS min_val,"
    " CAST(max(doc_id) AS VARCHAR) AS max_val FROM documents"
    " UNION ALL SELECT 'lang', CAST(count(*) AS BIGINT),"
    " CAST(count(*) - count(lang) AS BIGINT),"
    " CAST(count(DISTINCT lang) AS BIGINT),"
    " CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM documents"
    " UNION ALL SELECT 'source', CAST(count(*) AS BIGINT),"
    " CAST(count(*) - count(source) AS BIGINT),"
    " CAST(count(DISTINCT source) AS BIGINT),"
    " CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)"
    " FROM documents"
    " UNION ALL SELECT 'n_chars', CAST(count(*) AS BIGINT),"
    " CAST(count(*) - count(n_chars) AS BIGINT),"
    " CAST(count(DISTINCT n_chars) AS BIGINT),"
    " CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)"
    " FROM documents",
)
def ext_dataset_profile(spark, sf_dir):
    """Dataset profiling card (the data-quality 'describe' every training
    corpus publishes): per column — row count, null count, exact distinct
    count, min/max rendered as strings so one schema fits all types.

    Scale: one pass per profiled column over a column-pruned scan; each
    aggregate is map-side partial (count/min/max) plus one exact-distinct
    exchange. At 100 TB the exact distinct would switch to
    approx_count_distinct (the ext_approx_distinct key), which drops the
    per-column shuffle entirely — this key pins the exact contract."""
    docs = load_table(spark, "documents", sf_dir)

    def prof(col: str):
        return docs.agg(
            F.lit(col).alias("col_name"),
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_val"),
            F.max(col).cast("string").alias("max_val"),
        )

    out = prof("doc_id")
    for c in ("lang", "source", "n_chars"):
        out = out.unionAll(prof(c))
    return out


@query(
    "fn_bitwise",
    "SELECT l_orderkey,"
    " l_orderkey & 255 AS and255,"
    " l_orderkey | 4096 AS or4096,"
    " xor(l_orderkey, l_partkey) AS xor_pk,"
    " CAST(l_linenumber << 3 AS BIGINT) AS shl3,"
    " l_orderkey >> 2 AS shr2,"
    " CAST(bit_count(l_orderkey) AS BIGINT) AS bits"
    " FROM lineitem WHERE l_orderkey % 11 = 0",
)
def fn_bitwise(spark, sf_dir):
    """Bitwise scalar surface: AND/OR/XOR, shifts, popcount — the hash-
    bucketing and bitmap primitives the Bloom/LSH operators are built from.
    Narrow codegen projection, scan-bound, zero exchanges."""
    li = load_table(spark, "lineitem", sf_dir)
    k = F.col("l_orderkey")
    return li.where(k % 11 == 0).select(
        "l_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and255"),
        k.bitwiseOR(F.lit(4096)).alias("or4096"),
        k.bitwiseXOR(F.col("l_partkey")).alias("xor_pk"),
        F.shiftleft(F.col("l_linenumber"), 3).cast("long").alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.bit_count(k).cast("long").alias("bits"),
    )


@query(
    "win_nth_value",
    "SELECT l_orderkey, l_linenumber, l_returnflag,"
    " nth_value(l_quantity, 3) OVER w AS third_qty,"
    " nth_value(l_quantity, 1) OVER w AS first_qty"
    " FROM lineitem WHERE l_orderkey % 5 = 0"
    " WINDOW w AS (PARTITION BY l_returnflag"
    " ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,"
    " l_quantity, l_extendedprice)",
)
def win_nth_value(spark, sf_dir):
    """``nth_value`` over the engines' shared default frame (RANGE
    UNBOUNDED PRECEDING..CURRENT ROW): NULL until n rows are visible,
    then the n-th row in order — completes the ranking/value window
    family (rank/dense/lag/first_last/ntile/percent_rank/cume_dist
    keys). The ORDER BY carries six columns because the fixture's
    (orderkey, linenumber) is NOT unique, and nth_value over a
    non-total order is engine-nondeterministic (a RANGE frame with a
    unique key degenerates to ROWS, which is the deterministic
    contract). One window exchange on l_returnflag."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice",
    )
    return li.where(F.col("l_orderkey") % 5 == 0).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.nth_value("l_quantity", 3).over(w).alias("third_qty"),
        F.nth_value("l_quantity", 1).over(w).alias("first_qty"),
    )


@query(
    "setop_union_by_name",
    "SELECT l_orderkey AS rec_key, l_quantity AS qty, NULL AS price,"
    " 'line' AS src FROM lineitem WHERE l_orderkey % 13 = 0"
    " UNION ALL BY NAME"
    " SELECT o_orderkey AS rec_key, o_totalprice AS price, 'order' AS src"
    " FROM orders WHERE o_orderkey % 13 = 0",
)
def setop_union_by_name(spark, sf_dir):
    """Schema-evolving union (``unionByName`` with missing columns —
    DuckDB ``UNION ALL BY NAME``): position-independent column matching
    with NULL fill, the append shape every multi-source corpus ingest with
    drifting schemas needs. Narrow per-side projections, no shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    a = li.where(F.col("l_orderkey") % 13 == 0).select(
        F.col("l_orderkey").alias("rec_key"),
        F.col("l_quantity").alias("qty"),
        F.lit("line").alias("src"),
    )
    b = o.where(F.col("o_orderkey") % 13 == 0).select(
        F.col("o_orderkey").alias("rec_key"),
        F.col("o_totalprice").alias("price"),
        F.lit("order").alias("src"),
    )
    return a.unionByName(b, allowMissingColumns=True)


@query(
    "fn_url_parse",
    "WITH u AS (SELECT doc_id, 'https://' || source || '.example.com/' ||"
    " lang || '/p' || CAST(doc_id % 50 AS VARCHAR) || '?id=' ||"
    " CAST(doc_id % 20 AS VARCHAR) || '&ref=x' AS url FROM documents)"
    " SELECT doc_id,"
    " regexp_extract(url, '://([^/?#]+)', 1) AS host,"
    " regexp_extract(url, '://[^/?#]+([^?#]*)', 1) AS path,"
    " regexp_extract(url, '[?&]id=([^&#]*)', 1) AS qid"
    " FROM u",
)
def fn_url_parse(spark, sf_dir):
    """URL structural parsing (``parse_url`` HOST/PATH/QUERY-key) — the
    typed companion to ext_url_normalize's regexp canonicalization; URLs
    planted deterministically from doc_id (fixtures carry none). Narrow
    codegen projection, scan-bound."""
    d = load_table(spark, "documents", sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/p"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?id="),
        (F.col("doc_id") % 20).cast("string"),
        F.lit("&ref=x"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("qid"),
    )


@query(
    "agg_bool_and_or",
    "SELECT l_returnflag, l_linestatus,"
    " bool_and(l_quantity > 1.0) AS all_qty_gt1,"
    " bool_or(l_discount >= 0.09) AS any_disc_high,"
    " bool_and(l_extendedprice > 950.0) AS all_price_gt950"
    " FROM lineitem GROUP BY l_returnflag, l_linestatus",
)
def agg_bool_and_or(spark, sf_dir):
    """Boolean aggregates (``every``/``any`` — DuckDB bool_and/bool_or):
    the expectation-style 'all rows satisfy X' rollup pipeline_expectations
    evaluates per rule, here as first-class grouped aggregates. Map-side
    partial AND/OR, one tiny exchange."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.every(F.col("l_quantity") > 1.0).alias("all_qty_gt1"),
        F.some(F.col("l_discount") >= 0.09).alias("any_disc_high"),
        F.every(F.col("l_extendedprice") > 950.0).alias("all_price_gt950"),
    )


@query(
    "agg_count_distinct_multi",
    "SELECT l_returnflag,"
    " CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,"
    " CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,"
    " CAST(count(*) AS BIGINT) AS n_rows,"
    " CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty"
    " FROM lineitem GROUP BY l_returnflag",
)
def agg_count_distinct_multi(spark, sf_dir):
    """Multiple exact COUNT(DISTINCT) columns in ONE grouped aggregate —
    Catalyst plans this with the Expand operator (one input row fans out
    to one row per distinct-aggregate group), so a single pass serves
    both distinct sets plus the plain aggregates.

    Scale: the expand factor is #distinct-aggregates + 1 (here 3x) BEFORE
    the partial aggregate, but each expanded row carries only its own
    key column, and partial aggregation collapses per (group, key) before
    the one hash exchange — at 100 TB this stays one shuffle keyed on
    l_returnflag, never a per-distinct-column re-scan."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )


@query(
    "win_lead_offset",
    "SELECT l_orderkey, l_linenumber, l_returnflag,"
    " lead(CAST(l_quantity AS BIGINT), 2, CAST(-1 AS BIGINT)) OVER w"
    "  AS lead2_qty,"
    " lag(CAST(l_quantity AS BIGINT), 3, CAST(-1 AS BIGINT)) OVER w"
    "  AS lag3_qty"
    " FROM lineitem WHERE l_orderkey % 7 = 0"
    " WINDOW w AS (PARTITION BY l_returnflag"
    " ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,"
    " l_quantity, l_extendedprice)",
)
def win_lead_offset(spark, sf_dir):
    """Multi-step LEAD/LAG with an explicit default (no NULL at the
    partition edges). The ORDER BY carries SIX columns because the
    fixture's (orderkey, linenumber) is NOT unique — offset windows
    over a non-total order are engine-nondeterministic, so the order
    key must be a real candidate key (verified unique at every SF).
    One window exchange on l_returnflag; offset windows need no frame
    buffer beyond the offset distance."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice",
    )
    q = F.col("l_quantity").cast("long")
    return li.where(F.col("l_orderkey") % 7 == 0).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.lead(q, 2, -1).over(w).alias("lead2_qty"),
        F.lag(q, 3, -1).over(w).alias("lag3_qty"),
    )


@query(
    "join_lateral",
    "SELECT o.o_orderkey, o.o_orderstatus,"
    " t.n_lines, t.max_qty"
    " FROM orders o JOIN LATERAL ("
    "  SELECT CAST(count(*) AS BIGINT) AS n_lines,"
    "   max(CAST(l_quantity AS BIGINT)) AS max_qty"
    "  FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) t ON TRUE"
    " WHERE o.o_orderkey % 9 = 0",
)
def join_lateral(spark, sf_dir):
    """Correlated LATERAL subquery in FROM (SQL:1999; Spark 3.2+) — the
    per-row scalar-aggregate lookup ("this order's line count and max
    quantity") written the way SQL users write it. Exercises Catalyst's
    subquery decorrelation INCLUDING the COUNT edge case: an order with
    zero lineitems still yields one row with n_lines = 0, which naive
    outer-join rewrites get wrong. The count(*) in the SELECT list is
    LOAD-BEARING for the oracle: DuckDB 1.0.0 drops zero-match outer
    rows from a lateral aggregate subquery WITHOUT a count(*) (Spark
    keeps them in both spellings, per the standard) — see the
    differential-fuzzer note on _LATERAL_AGGS.

    Scale: decorrelates to aggregate-then-join on l_orderkey — one hash
    exchange per side, no per-row re-scan of lineitem."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("lat_orders")
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lat_lineitem")
    return spark.sql(
        "SELECT o.o_orderkey, o.o_orderstatus, t.n_lines, t.max_qty"
        " FROM lat_orders o JOIN LATERAL ("
        "  SELECT CAST(count(*) AS BIGINT) AS n_lines,"
        "   max(CAST(l_quantity AS BIGINT)) AS max_qty"
        "  FROM lat_lineitem l WHERE l.l_orderkey = o.o_orderkey) t"
        " WHERE o.o_orderkey % 9 = 0"
    )


@query(
    "setop_intersect_except_all",
    "WITH a AS (SELECT CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS"
    " flag FROM lineitem WHERE l_orderkey % 31 = 0),"
    " b AS (SELECT CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS flag"
    " FROM lineitem WHERE l_suppkey % 17 = 0)"
    " SELECT 'both' AS tag, qty, flag FROM"
    " (SELECT qty, flag FROM a INTERSECT ALL SELECT qty, flag FROM b)"
    " UNION ALL SELECT 'only_a' AS tag, qty, flag FROM"
    " (SELECT qty, flag FROM a EXCEPT ALL SELECT qty, flag FROM b)",
)
def setop_intersect_except_all(spark, sf_dir):
    """Bag semantics set operations — INTERSECT ALL / EXCEPT ALL keep
    duplicate multiplicity (min / difference of per-row counts), unlike
    the DISTINCT variants the setop_intersect/except keys pin.

    Scale: Spark plans each set op as a hash aggregate over the union
    tagged with per-side counts, then Generate/replicaterows restores
    multiplicity — one value-keyed exchange per set operation (two in
    this combined key), no join anywhere (verified in the executed
    plan; guard: test_intersect_except_all_no_join)."""
    li = load_table(spark, "lineitem", sf_dir)
    proj = lambda df: df.select(  # noqa: E731
        F.col("l_quantity").cast("long").alias("qty"),
        F.col("l_returnflag").alias("flag"),
    )
    a = proj(li.where(F.col("l_orderkey") % 31 == 0))
    b = proj(li.where(F.col("l_suppkey") % 17 == 0))
    both = a.intersectAll(b).select(F.lit("both").alias("tag"), "qty", "flag")
    only_a = a.exceptAll(b).select(F.lit("only_a").alias("tag"), "qty", "flag")
    return both.unionAll(only_a)


@query(
    "fn_try_arith",
    "SELECT l_orderkey, l_linenumber,"
    " l_extendedprice / nullif(CAST(l_quantity AS BIGINT) - 25, 0)"
    "  AS safe_ppu,"
    " CAST(l_orderkey AS DOUBLE) / (l_linenumber - 4) AS div_ln4,"
    " CASE WHEN l_orderkey % 2 = 0 THEN NULL ELSE l_orderkey + 1 END"
    "  AS add_guard,"
    " TRY_CAST(l_returnflag AS INTEGER) AS flag_int,"
    " TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS ln_roundtrip"
    " FROM lineitem WHERE l_orderkey % 23 = 0",
)
def fn_try_arith(spark, sf_dir):
    """ANSI-safe arithmetic surface: Spark 4 runs ANSI mode by default,
    where /0 and overflow RAISE — ``try_divide``/``try_add``/``try_cast``
    are the NULL-on-error spellings pipelines use for dirty data.
    ``add_guard`` overflows BIGINT max on even keys — adding key+1 so
    key 0 overflows too (oracle encodes the expected NULL);
    ``div_ln4`` divides by zero on linenumber 4; DuckDB's
    ``/`` is already NULL-on-zero so the oracle is plain division.
    Narrow codegen projection, scan-bound, zero exchanges."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.where(F.col("l_orderkey") % 23 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity").cast("long") - 25
        ).alias("safe_ppu"),
        F.try_divide(
            F.col("l_orderkey").cast("double"), F.col("l_linenumber") - 4
        ).alias("div_ln4"),
        F.try_add(
            F.when(F.col("l_orderkey") % 2 == 0, F.lit(9223372036854775807))
            .otherwise(F.lit(0))
            .cast("long"),
            F.col("l_orderkey") + 1,
        ).alias("add_guard"),
        F.try_to_number(F.col("l_returnflag"), F.lit("999")).cast("int").alias(
            "flag_int"
        ),
        F.col("l_linenumber")
        .cast("string")
        .try_cast("int")
        .alias("ln_roundtrip"),
    )


@query(
    "filter_in_between_like",
    "SELECT o_orderkey, o_orderstatus, o_orderpriority,"
    " CAST(round(o_totalprice * 100) AS BIGINT) AS cents"
    " FROM orders"
    " WHERE o_orderstatus IN ('F', 'P')"
    " AND o_totalprice BETWEEN 1000.0 AND 60000.0"
    " AND o_orderpriority LIKE '%URGENT%'"
    " AND regexp_matches(o_orderpriority, '^[12]-')",
)
def filter_in_between_like(spark, sf_dir):
    """The predicate surface beyond =/<>: IN-list, BETWEEN, LIKE
    wildcard, and regexp match, conjoined. IN/BETWEEN/LIKE push down to
    the parquet scan (PushedFilters); the regexp evaluates post-scan in
    the same codegen stage. Scan-bound, zero exchanges."""
    o = load_table(spark, "orders", sf_dir)
    return o.where(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(1000.0, 60000.0)
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_orderpriority").rlike("^[12]-")
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )


@query(
    "src_parquet_schema_merge",
    "SELECT l_orderkey AS rec_key, CAST(l_quantity AS BIGINT) AS qty,"
    " CAST(NULL AS BIGINT) AS cents"
    " FROM lineitem WHERE l_orderkey % 41 = 0"
    " UNION ALL"
    " SELECT o_orderkey, CAST(NULL AS BIGINT),"
    " CAST(round(o_totalprice * 100) AS BIGINT)"
    " FROM orders WHERE o_orderkey % 43 = 0",
)
def src_parquet_schema_merge(spark, sf_dir):
    """Schema-drift parquet read: two file batches with different
    columns (qty-only, then cents-only), read back as ONE frame with
    ``mergeSchema`` — the on-read flavor of schema evolution every
    long-lived ingest directory needs (the write-side flavor is
    merge_schema_evolution).

    Scale: schema merging reads FOOTERS only (a distributed metadata
    job), never data; per-file missing columns materialize as NULL
    vectors at scan time, so the read stays columnar and pushdown-able.
    """
    out = _tmpdir()
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li.where(F.col("l_orderkey") % 41 == 0).select(
        F.col("l_orderkey").alias("rec_key"),
        F.col("l_quantity").cast("long").alias("qty"),
    ).write.parquet(out + "/batch1")
    o.where(F.col("o_orderkey") % 43 == 0).select(
        F.col("o_orderkey").alias("rec_key"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).write.parquet(out + "/batch2")
    back = spark.read.option("mergeSchema", "true").parquet(
        out + "/batch1", out + "/batch2"
    )
    return back.select("rec_key", "qty", "cents")


@query(
    "fn_math_ops",
    "SELECT l_orderkey,"
    " sqrt(CAST(l_orderkey AS DOUBLE)) AS sq,"
    " power(CAST(l_linenumber AS DOUBLE), 3) AS cubed,"
    " abs(CAST(l_quantity AS BIGINT) - 25) AS ab,"
    " CAST(l_orderkey % 97 AS BIGINT) AS md,"
    " greatest(CAST(l_quantity AS BIGINT), CAST(l_linenumber AS BIGINT) * 5)"
    "  AS gr,"
    " least(CAST(l_quantity AS BIGINT), CAST(l_linenumber AS BIGINT) * 5)"
    "  AS ls,"
    " CAST(sign(CAST(l_quantity AS BIGINT) - 25) AS BIGINT) AS sg,"
    " CAST(floor(l_extendedprice) AS BIGINT) AS fl,"
    " CAST(ceil(l_extendedprice) AS BIGINT) AS ce"
    " FROM lineitem WHERE l_orderkey % 13 = 0",
)
def fn_math_ops(spark, sf_dir):
    """Math scalar surface: sqrt/power (bit-identical across engines —
    sqrt is correctly rounded by IEEE spec; pow of a small int to an
    int exponent is exact; exp/ln are deliberately ABSENT: Java Math
    and libm disagree by 1 ulp on both, e.g. exp(1.0)),
    abs/mod/greatest/least/
    sign on exact BIGINTs, floor/ceil pinned to BIGINT (Spark returns
    LONG for floor(double), DuckDB returns DOUBLE — the cast is the
    contract). Narrow codegen projection, scan-bound, zero exchanges."""
    li = load_table(spark, "lineitem", sf_dir)
    qty = F.col("l_quantity").cast("long")
    ln5 = F.col("l_linenumber").cast("long") * 5
    return li.where(F.col("l_orderkey") % 13 == 0).select(
        "l_orderkey",
        F.sqrt(F.col("l_orderkey").cast("double")).alias("sq"),
        F.pow(F.col("l_linenumber").cast("double"), 3).alias("cubed"),
        F.abs(qty - 25).alias("ab"),
        (F.col("l_orderkey") % 97).alias("md"),
        F.greatest(qty, ln5).alias("gr"),
        F.least(qty, ln5).alias("ls"),
        F.signum(qty - 25).cast("long").alias("sg"),
        F.floor(F.col("l_extendedprice")).cast("long").alias("fl"),
        F.ceil(F.col("l_extendedprice")).cast("long").alias("ce"),
    )


@query(
    "join_null_safe",
    "WITH a AS (SELECT doc_id, nullif(lang, 'en') AS k FROM documents"
    " WHERE doc_id % 5 = 0),"
    " b AS (SELECT nullif(lang, 'en') AS k, CAST(count(*) AS BIGINT) AS"
    " n_lang FROM documents GROUP BY nullif(lang, 'en'))"
    " SELECT a.doc_id, a.k, b.n_lang FROM a JOIN b"
    " ON a.k IS NOT DISTINCT FROM b.k",
)
def join_null_safe(spark, sf_dir):
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of dropping out — the join spelling
    for dimensions where NULL is a real category ('language unknown').

    Scale: Spark treats ``<=>`` as a first-class equi-join key, so this
    stays a hash/sort-merge join partitioned on the key — NOT the
    coalesce-to-sentinel rewrite (which corrupts real sentinel values)
    and NOT a nested-loop fallback. NULL keys all hash to one partition;
    if NULL were a heavy hitter, salt it like join_skew_salted."""
    d = load_table(spark, "documents", sf_dir)
    k = F.nullif(F.col("lang"), F.lit("en")).alias("k")
    a = d.where(F.col("doc_id") % 5 == 0).select("doc_id", k)
    b = d.select(k).groupBy("k").agg(F.count("*").alias("n_lang"))
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["doc_id"], a["k"].alias("k"), b["n_lang"]
    )


@query(
    "fn_hash_sha",
    "SELECT doc_id,"
    " md5(text) AS h_md5,"
    " sha256(text) AS h_sha256,"
    " substr(md5(concat_ws('|', lang, source)), 1, 8) AS h_bucket"
    " FROM documents WHERE doc_id % 7 = 0",
)
def fn_hash_sha(spark, sf_dir):
    """Cryptographic hash surface: md5 + sha256 content hashes (hex) —
    the content-addressing primitives for dedup manifests and dataset
    cards (the xxhash64 used in hot dedup paths is Spark-only, so the
    cross-engine keys pin the portable pair). Both sides spell the
    bucket input concat_ws (NULL-skipping on both engines) — `||`
    NULL-propagates in DuckDB and would diverge on a NULL lang/source.
    Narrow codegen projection, scan-bound, zero exchanges."""
    d = load_table(spark, "documents", sf_dir)
    return d.where(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.md5(F.col("text")).alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
        F.substring(
            F.md5(F.concat_ws("|", F.col("lang"), F.col("source"))), 1, 8
        ).alias("h_bucket"),
    )


@query(
    "explode_outer_tokens",
    "WITH base AS (SELECT doc_id,"
    " CASE WHEN doc_id % 3 = 0 THEN NULL"
    "  ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS toks"
    " FROM documents WHERE doc_id % 11 = 0)"
    " SELECT doc_id, unnest("
    "  CASE WHEN toks IS NULL OR len(toks) = 0"
    "   THEN [CAST(NULL AS VARCHAR)] ELSE toks END) AS token"
    " FROM base",
)
def explode_outer_tokens(spark, sf_dir):
    """``explode_outer``: rows with NULL/empty arrays survive as one row
    with a NULL element (plain explode silently DROPS them — losing
    every empty document from a tokenize-then-count pipeline). DuckDB
    has no outer unnest, so the oracle encodes the semantics with a
    CASE to a one-NULL list. NULL arrays planted on doc_id % 3.

    Scale: Generate (explode) is a narrow operator — no shuffle; the
    outer variant adds only the null-row branch."""
    d = load_table(spark, "documents", sf_dir)
    toks = F.when(
        F.col("doc_id") % 3 != 0,
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
    )
    return (
        d.where(F.col("doc_id") % 11 == 0)
        .select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode_outer("toks").alias("token"))
    )


@query(
    "sql_recursive_cte",
    "WITH RECURSIVE walk(doc_id, cur, depth) AS ("
    " SELECT doc_id, doc_id, CAST(0 AS BIGINT) FROM documents"
    "  WHERE doc_id % 13 = 0"
    " UNION ALL"
    " SELECT doc_id, cur // 10, depth + 1 FROM walk WHERE cur >= 10)"
    " SELECT doc_id, cur AS root, depth"
    " FROM walk WHERE cur < 10",
)
def sql_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (Spark 4.0+): walk a planted parent edge
    (parent(id) = id // 10 — a forest whose roots are the single-digit
    ids) from each document to its root, carrying the depth — the
    hierarchy/taxonomy/lineage traversal shape that previously required
    the driver-side iterative loop ext_dedup_clusters uses.

    Scale: the recursion is depth-bounded by the key width (≤ ~6 here);
    each iteration is a narrow projection + filter over the shrinking
    frontier, unioned — no joins, no growing state beyond the result.
    The identical SQL text runs on both engines (dialect split: Spark
    spells integer division `div`, DuckDB `//`)."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView(
        "rc_documents"
    )
    return spark.sql(
        "WITH RECURSIVE walk(doc_id, cur, depth) AS ("
        " SELECT doc_id, doc_id, CAST(0 AS BIGINT) FROM rc_documents"
        "  WHERE doc_id % 13 = 0"
        " UNION ALL"
        " SELECT doc_id, cur div 10, depth + 1 FROM walk WHERE cur >= 10)"
        " SELECT doc_id, cur AS root, depth"
        " FROM walk WHERE cur < 10"
    )


@query(
    "win_range_interval",
    # epoch_ns(ts) // 1000000, NOT the engine's ms accessor: explicit floor
    # division is immune to any oracle build's µs->ms rounding mode (431
    # of the 885 swept rows carry a >=500 µs sub-ms remainder — a
    # rounding oracle would flip every one of their ts_ms cells and every
    # frame sum downstream)
    "WITH base AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ts_ms,"
    " CAST(round(value * 100) AS BIGINT) AS cents"
    " FROM events WHERE user_id % 11 = 0)"
    " SELECT user_id, ts_ms,"
    # CAST to BIGINT: DuckDB's sum(BIGINT) returns HUGEINT — the registry's
    # only two HUGEINT-output oracles were exactly its only two driver-red
    # keys (r8-r10). Driver-side fetch paths render HUGEINT differently
    # (e.g. pandas float64 "310.0" vs Spark's "310"), flipping the value
    # hash while rows/schema stay green. Spark's sum(BIGINT) is BIGINT, so
    # the CAST restores type parity. The CASTing win_range_probe and
    # win_rows_sliding were driver-green throughout — same fix here.
    " CAST(sum(cents) OVER"
    "  (PARTITION BY user_id ORDER BY ts_ms"
    "   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)"
    "  AS BIGINT) AS rolling_cents"
    " FROM base",
)
def win_range_interval(spark, sf_dir):
    """Time-interval RANGE frame: per-user rolling 1-hour sum over event
    time — the trailing-window aggregation sensor/rate-limit/abuse
    pipelines run, as a BATCH window (the streaming flavor is
    stream_sliding_window). Value goes through exact integer cents so
    the rolling sum is order-independent. RANGE frames include ALL
    peers, so duplicate timestamps within a user still yield a
    deterministic multiset.

    Both engines frame over the BIGINT epoch-ms projection (RANGE
    3600000 PRECEDING), never the raw timestamp: an `INTERVAL` RANGE
    frame's boundary arithmetic runs in each engine's native timestamp
    unit (µs vs ns builds differ), which was the round-8 driver hash
    mismatch on this key. Integer frames are unit-proof; the hazard
    class is pinned by tests/test_timestamp_unit_proof.py.

    Scale: one window exchange keyed on user_id; the frame is bounded
    by event density per hour, not partition size — Spark evaluates it
    with a sliding frame buffer, never materializing the full partition
    per row."""
    ev = load_table(spark, "events", sf_dir)
    ev.createOrReplaceTempView("wri_events")
    # parquet delivers ts as TIMESTAMP_NTZ; unix_millis requires TIMESTAMP
    # (the session is pinned UTC, so the cast is value-preserving)
    return spark.sql(
        "WITH base AS"
        " (SELECT user_id, unix_millis(CAST(ts AS TIMESTAMP)) AS ts_ms,"
        "  CAST(round(value * 100) AS BIGINT) AS cents"
        "  FROM wri_events WHERE user_id % 11 = 0)"
        " SELECT user_id, ts_ms,"
        " sum(cents) OVER"
        "  (PARTITION BY user_id ORDER BY ts_ms"
        "   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)"
        "  AS rolling_cents"
        " FROM base"
    )


@query(
    "win_range_rolling_ms",
    "WITH base AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ts_ms,"
    " CAST(round(value * 100) AS BIGINT) AS cents"
    " FROM events WHERE user_id % 11 = 0)"
    " SELECT user_id, ts_ms,"
    # CAST to BIGINT: un-CAST sum(BIGINT) is HUGEINT in DuckDB — the
    # driver-red hazard class; see win_range_interval's oracle comment.
    " CAST(sum(cents) OVER"
    "  (PARTITION BY user_id ORDER BY ts_ms"
    "   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)"
    "  AS BIGINT) AS rolling_cents"
    " FROM base",
)
def win_range_rolling_ms(spark, sf_dir):
    """Identical query body to win_range_interval registered under a
    FRESH key name (round-10 task 1a): the r8/r9 driver rows for the old
    key were byte-identical despite a local full pass of the fixed code,
    consistent with carried-forward results — a new key name forces a
    fresh driver execution. The oracle spells the µs->ms conversion as
    explicit integer floor division (``epoch_ns(ts) // 1000000``), immune
    to any oracle build's rounding mode; the Spark side's ``unix_millis``
    floors by definition. See win_range_interval for semantics and the
    scale notes."""
    ev = load_table(spark, "events", sf_dir)
    ev.createOrReplaceTempView("wrm_events")
    return spark.sql(
        "WITH base AS"
        " (SELECT user_id, unix_millis(CAST(ts AS TIMESTAMP)) AS ts_ms,"
        "  CAST(round(value * 100) AS BIGINT) AS cents"
        "  FROM wrm_events WHERE user_id % 11 = 0)"
        " SELECT user_id, ts_ms,"
        " sum(cents) OVER"
        "  (PARTITION BY user_id ORDER BY ts_ms"
        "   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)"
        "  AS rolling_cents"
        " FROM base"
    )


@query(
    "win_range_probe",
    "WITH base AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ts_ms,"
    " CAST(round(value * 100) AS BIGINT) AS cents"
    " FROM events WHERE user_id % 11 = 0),"
    " win AS (SELECT user_id, ts_ms, cents,"
    "  sum(cents) OVER (PARTITION BY user_id ORDER BY ts_ms"
    "   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS rolling_cents"
    "  FROM base)"
    " SELECT CAST(count(*) AS BIGINT) AS n_rows,"
    " CAST(sum(ts_ms) AS BIGINT) AS sum_ts_ms,"
    " CAST(min(ts_ms) AS BIGINT) AS min_ts_ms,"
    " CAST(max(ts_ms) AS BIGINT) AS max_ts_ms,"
    " CAST(sum(cents) AS BIGINT) AS sum_cents,"
    " CAST(sum(rolling_cents) AS BIGINT) AS sum_rolling_cents"
    " FROM win",
)
def win_range_probe(spark, sf_dir):
    """Stage-checksum diagnostic companion to win_range_rolling_ms: ONE
    row of BIGINT checksums over each stage of the rolling-window query
    (row count; sum/min/max of the epoch-ms projection; sum of the exact
    integer cents input; sum of the rolling sums). If the main key's
    driver row ever reds again, this row localizes the diverging stage:
    a sum_ts_ms mismatch means the µs->ms conversion differs (rounding
    vs flooring), a sum_cents mismatch means the value projection
    differs, and a sum_rolling_cents-only mismatch means the RANGE frame
    membership itself differs. All-BIGINT so the hash surface carries no
    float formatting."""
    ev = load_table(spark, "events", sf_dir)
    ev.createOrReplaceTempView("wrp_events")
    return spark.sql(
        "WITH base AS"
        " (SELECT user_id, unix_millis(CAST(ts AS TIMESTAMP)) AS ts_ms,"
        "  CAST(round(value * 100) AS BIGINT) AS cents"
        "  FROM wrp_events WHERE user_id % 11 = 0),"
        " win AS (SELECT user_id, ts_ms, cents,"
        "  sum(cents) OVER (PARTITION BY user_id ORDER BY ts_ms"
        "   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)"
        "   AS rolling_cents"
        "  FROM base)"
        " SELECT CAST(count(*) AS BIGINT) AS n_rows,"
        " CAST(sum(ts_ms) AS BIGINT) AS sum_ts_ms,"
        " CAST(min(ts_ms) AS BIGINT) AS min_ts_ms,"
        " CAST(max(ts_ms) AS BIGINT) AS max_ts_ms,"
        " CAST(sum(cents) AS BIGINT) AS sum_cents,"
        " CAST(sum(rolling_cents) AS BIGINT) AS sum_rolling_cents"
        " FROM win"
    )


@query(
    "win_rows_sliding",
    "WITH base AS (SELECT l_orderkey, l_linenumber, l_returnflag,"
    " l_partkey, l_suppkey, l_quantity, l_extendedprice,"
    " CAST(round(l_extendedprice * 100) AS BIGINT) AS cents"
    " FROM lineitem WHERE l_orderkey % 17 = 0)"
    " SELECT l_orderkey, l_linenumber, l_returnflag,"
    " CAST(sum(cents) OVER w AS BIGINT) AS win_cents,"
    " CAST(count(*) OVER w AS BIGINT) AS win_n"
    " FROM base"
    " WINDOW w AS (PARTITION BY l_returnflag"
    " ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,"
    " l_quantity, l_extendedprice"
    " ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)",
)
def win_rows_sliding(spark, sf_dir):
    """Centered ROWS frame (2 PRECEDING..2 FOLLOWING) — the moving-
    average smoothing window; emitted as exact integer (sum, count)
    pairs so no division hits the hash (the caller divides). ROWS
    frames demand a total order — the six-column candidate key again —
    because unlike RANGE they do NOT include peers, so a tie-broken
    order changes which rows fall in the frame.

    Scale: one window exchange on l_returnflag; a ROWS frame holds a
    constant 5-row buffer per row regardless of partition size."""
    li = load_table(spark, "lineitem", sf_dir)
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice",
        )
        .rowsBetween(-2, 2)
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return li.where(F.col("l_orderkey") % 17 == 0).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.sum(cents).over(w).alias("win_cents"),
        F.count(F.lit(1)).over(w).alias("win_n"),
    )


@query(
    "fn_binary_encode",
    "SELECT doc_id,"
    " upper(hex(lang)) AS lang_hex,"
    " to_base64(encode(source)) AS src_b64,"
    " (decode(from_base64(to_base64(encode(source)))) = source)"
    "  AS roundtrip_ok"
    " FROM documents WHERE doc_id % 9 = 0",
)
def fn_binary_encode(spark, sf_dir):
    """Binary encodings: hex + base64 encode/decode roundtrip — the
    wire-format scalars manifest/export paths use on binary media
    columns. hex case differs per engine for string input (Spark
    uppercase, DuckDB lowercase) — upper() on both sides is the
    contract. Narrow codegen projection, scan-bound, zero exchanges."""
    d = load_table(spark, "documents", sf_dir)
    src_bin = F.col("source").cast("binary")
    return d.where(F.col("doc_id") % 9 == 0).select(
        "doc_id",
        F.upper(F.hex(F.col("lang"))).alias("lang_hex"),
        F.base64(src_bin).alias("src_b64"),
        (
            F.unbase64(F.base64(src_bin)).cast("string") == F.col("source")
        ).alias("roundtrip_ok"),
    )


@query(
    "ext_bpe_pair_counts",
    "WITH words AS ("
    f" SELECT unnest(regexp_split_to_array({_NORM_SQL}, ' ')) AS w"
    " FROM documents),"
    " idx AS (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i"
    "  FROM words WHERE len(w) >= 2),"
    " pairs AS (SELECT substr(w, CAST(i AS INT), 2) AS pair FROM idx)"
    " SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM pairs"
    " GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20",
)
def ext_bpe_pair_counts(spark, sf_dir):
    """Tokenizer training primitive: the FIRST BPE merge step — count
    adjacent symbol pairs across the corpus and rank the top merge
    candidates (Sennrich et al. 2016; with the initial character vocab,
    pair frequency == within-word character-bigram frequency, which is
    what both engines compute here, deterministically tie-broken by
    pair).

    Scale: bigrams explode via sequence() codegen (no Python), then ONE
    map-side-combined hash agg whose key domain is tiny (|alphabet|^2 —
    a few thousand keys at any corpus size), so the exchange carries
    O(distinct pairs x partitions) rows regardless of corpus bytes;
    top-20 is TakeOrderedAndProject, never a global sort. Iterating
    merges at 100 TB keeps this shape per round: re-tokenize against the
    grown vocab (a narrow projection) + the same tiny-domain agg."""
    from incremental_etl_on_lakehouse_spark.operators.text import (
        normalize_text,
    )

    d = load_table(spark, "documents", sf_dir)
    words = d.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("w")
    ).where(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# ext_bpe_train: the FULL BPE tokenizer-training loop (extends the single
# merge-step primitive ext_bpe_pair_counts into N iterated merges).
# ---------------------------------------------------------------------------

_BPE_STEPS = 6


def _bpe_iter_sql(k: int) -> str:
    """One BPE merge iteration as engine-neutral CTE text (identical SQL
    runs on Spark and DuckDB): count adjacent symbol pairs weighted by
    word frequency, pick the argmax with a deterministic (cnt DESC, l, r)
    tiebreak, then apply the merge canonically left-to-right — islands of
    chain-adjacent candidates (only possible when l = r) merge at even
    offsets only, exactly Sennrich et al.'s non-overlapping scan."""
    p = k - 1
    # Every window in the round shares ONE partition spec (wid, ordered
    # by position) so each engine plans a single sort+window pass per
    # stage — chain-adjacency is resolved with a running max of the last
    # non-candidate seq (a cand row's offset in its island = seq -
    # last_non_cand_seq - 1), never a (wid, island)-keyed second shuffle.
    return (
        f" s{k} AS MATERIALIZED (SELECT wid, freq, pos, sym,"
        f"  row_number() OVER (PARTITION BY wid ORDER BY pos) AS seq,"
        f"  lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS nxt"
        f"  FROM w{p}),"
        f" p{k} AS MATERIALIZED (SELECT sym AS l, nxt AS r,"
        f"  CAST(sum(freq) AS BIGINT) AS cnt"
        f"  FROM s{k} WHERE nxt IS NOT NULL GROUP BY sym, nxt),"
        f" b{k} AS MATERIALIZED (SELECT l, r, cnt FROM p{k}"
        f"  ORDER BY cnt DESC, l, r LIMIT 1),"
        f" c{k} AS MATERIALIZED (SELECT s.wid, s.freq, s.pos, s.sym, s.seq,"
        f"  (s.sym = b.l AND s.nxt = b.r) AS cand"
        f"  FROM s{k} s CROSS JOIN b{k} b),"
        f" m{k} AS MATERIALIZED (SELECT *, cand AND ((seq - coalesce(max(CASE WHEN"
        f"   NOT cand THEN seq END) OVER (PARTITION BY wid ORDER BY seq"
        f"   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) - 1)"
        f"   % 2 = 0) AS mstart FROM c{k}),"
        f" g{k} AS MATERIALIZED (SELECT *, lag(mstart)"
        f"   OVER (PARTITION BY wid ORDER BY seq) AS pm FROM m{k}),"
        f" w{k} AS MATERIALIZED (SELECT g.wid, g.freq, g.pos,"
        f"  CASE WHEN g.mstart THEN b.l || b.r ELSE g.sym END AS sym"
        f"  FROM g{k} g CROSS JOIN b{k} b"
        f"  WHERE g.mstart OR NOT coalesce(g.pm, false)"
        # merges exhausted (no pairs left -> b{k} empty -> the cross join
        # yields nothing): carry the previous symbol table forward, so the
        # chain's final state matches the Python loop's break-and-keep —
        # without this, a degenerate corpus zeroes every later w{k} and
        # the encode aggregate silently returns empty
        f"  UNION ALL SELECT wid, freq, pos, sym FROM w{p}"
        f"  WHERE NOT EXISTS (SELECT 1 FROM b{k}))"
    )


def _bpe_final_sql(n: int) -> str:
    parts = [
        f"SELECT CAST({k} AS BIGINT) AS step, l AS left_sym,"
        f" r AS right_sym, cnt AS pair_count FROM b{k}"
        for k in range(1, n + 1)
    ]
    return " UNION ALL ".join(parts)


_BPE_CHAIN = (
    "WITH tok AS (SELECT unnest(regexp_split_to_array("
    f"{_NORM_SQL}, ' ')) AS w FROM documents),"
    " wf AS (SELECT w AS wid, CAST(count(*) AS BIGINT) AS freq"
    "  FROM tok WHERE len(w) >= 2 GROUP BY w),"
    " w0 AS MATERIALIZED (SELECT wid, freq, CAST(i AS BIGINT) AS pos,"
    "  substr(wid, CAST(i AS INT), 1) AS sym FROM"
    "  (SELECT wid, freq, unnest(generate_series(1, len(wid))) AS i"
    "   FROM wf)),"
    + ",".join(_bpe_iter_sql(k) for k in range(1, _BPE_STEPS + 1))
)

_BPE_ORACLE = _BPE_CHAIN + " " + _bpe_final_sql(_BPE_STEPS)


@query("ext_bpe_train", _BPE_ORACLE)
def ext_bpe_train(spark, sf_dir):
    """Full BPE tokenizer training (Sennrich et al. 2016): N=6 merge
    iterations over the corpus, each counting adjacent symbol pairs,
    picking the most frequent pair (deterministic cnt DESC, l, r
    tiebreak), and applying the merge canonically left-to-right across
    every word. Returns the learned merge table (step, left_sym,
    right_sym, pair_count) — the artifact a tokenizer ships. Extends the
    single-step ext_bpe_pair_counts primitive into the real training
    operator the registry previously approximated.

    Architecture (the standard scale design, distributed): the corpus is
    folded ONCE into a distinct word-frequency table, and every
    iteration runs over O(distinct words) rows, never the corpus — at
    100 TB the corpus pass is one explode+groupBy shuffle and each merge
    round then touches a table millions of rows small. A round is: one
    windowed pair projection (partitioned by word — bounded partitions,
    word length <= tens of symbols), one map-side-combined agg over the
    bounded pair domain, a 1-row TakeOrdered argmax (the only driver
    collect: one row per round), and a narrow windowed rewrite of the
    symbol table. localCheckpoint() between rounds bounds lineage like
    ext_graph_pagerank's fixed-point loop. The merge application is the
    canonical non-overlapping left-to-right scan: chain-adjacent
    candidate islands (only when left = right) merge at even offsets —
    verified against a run-of-5 fixture in tests.

    Oracle: the IDENTICAL algorithm as an unrolled CTE chain (6
    iterations of the same engine-neutral SQL text, one CTE block per
    round) — a full-value oracle despite the iterative shape, like
    sql_recursive_cte."""
    from incremental_etl_on_lakehouse_spark.operators.text import (
        bpe_train,
        normalize_text,
    )

    d = load_table(spark, "documents", sf_dir)
    words = (
        d.select(
            F.explode(F.split(normalize_text(F.col("text")), " ")).alias("w")
        )
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    merges = bpe_train(words, _BPE_STEPS)
    return spark.createDataFrame(
        merges,
        "step BIGINT, left_sym STRING, right_sym STRING, pair_count BIGINT",
    )


@query(
    "ext_bpe_encode",
    _BPE_CHAIN
    + f" SELECT sym AS token,"
    " CAST(count(DISTINCT wid) AS BIGINT) AS n_words,"
    " CAST(sum(freq) AS BIGINT) AS total_count"
    f" FROM w{_BPE_STEPS} GROUP BY sym",
)
def ext_bpe_encode(spark, sf_dir):
    """Tokenizer APPLICATION: encode the corpus with the 6 trained BPE
    merges and emit the resulting subword vocabulary — per final token,
    the number of distinct words containing it and its total corpus
    occurrence count. This is the step a training-data pipeline runs
    after ext_bpe_train: the token histogram that sizes the vocab and
    feeds sequence packing.

    Scale: the encode IS the training loop's final symbol table (no
    second corpus pass — see operators/text.py bpe_encode), plus one
    map-side-combined agg over the O(vocab) symbol rows. The oracle
    reuses the training chain's unrolled CTEs and aggregates w6
    directly, so both engines derive the merges AND the encoding from
    the same specification."""
    from incremental_etl_on_lakehouse_spark.operators.text import (
        bpe_encode,
        normalize_text,
    )

    d = load_table(spark, "documents", sf_dir)
    words = (
        d.select(
            F.explode(F.split(normalize_text(F.col("text")), " ")).alias("w")
        )
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return bpe_encode(words, _BPE_STEPS)


# ---------------------------------------------------------------------------
# Round-12 ingest/merge hardening keys (driver attestation of the
# microsecond-timestamp + NULL-safe-order-guard fixes)
# ---------------------------------------------------------------------------


@query(
    "src_json_micro_ts",
    "SELECT event_id, user_id,"
    " CAST((epoch_ns(ts) // 1000) -"
    " (SELECT min(epoch_ns(ts) // 1000) FROM events) AS BIGINT)"
    " AS ts_us_rel FROM events",
)
def src_json_micro_ts(spark, sf_dir):
    """JSON ingest of MICROSECOND-fraction timestamps — the spelling the
    reference's own landing data uses (data/db_cdc_log_demo_sample.json:10,
    "2023-01-08 21:32:22.987432"). Round-trips events.ts through a JSON
    landing zone and back through read_json_batch's CDC timestampFormat;
    the oracle compares exact per-row microsecond offsets against the
    parquet source, so any fraction-ladder regression (a [.SSS]-only
    format nulls 6-digit fractions) breaks the hash, not just a unit
    test. The output is epoch-micros RELATIVE to the table minimum, not
    absolute: the registry's rounding-mode proof shifts every timestamp
    by a uniform +500 µs and demands unchanged output, which absolute
    sub-ms values cannot satisfy — differences can (the shift cancels)
    while still attesting every row's exact microsecond fraction.

    Scale: a narrow schema-applied JSON scan — no shuffle; the 1-row min
    rides a broadcast crossJoin (the repo's bounded-metadata pattern);
    the format ladder is per-record CPU inside the JacksonParser."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
    )
    out = os.path.join(_tmpdir(), "micro_landing")
    ev.write.mode("overwrite").json(out)
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    df = read_json_batch(spark, out, schema, multiline=False)
    mn = df.agg(F.min(F.unix_micros("ts")).alias("__mn"))
    return df.crossJoin(F.broadcast(mn)).select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.col("__mn")).alias("ts_us_rel"),
    )


@query(
    "merge_cdc_null_order",
    "WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS id,"
    " CAST(c_acctbal AS DECIMAL(12,2)) AS val FROM customer)"
    " SELECT id, CAST(round((CASE WHEN id % 3 = 0 THEN val + 100"
    " WHEN id % 3 = 1 THEN val + 500 ELSE val END) * 100) AS BIGINT)"
    " AS val_cents FROM base WHERE id % 9 <> 2",
)
def merge_cdc_null_order(spark, sf_dir):
    """CDC MERGE whose ordering column is NULL for most records — the state
    an unparseable upstream event-time leaves behind. The NULL-safe
    lexicographic order guard (operators/cdc.py lex_greater_sql) must fall
    through to the ingest-sequence tiebreak instead of evaluating to NULL
    and freezing the snapshot:

    - batch2 UPDATE (order NULL -> NULL, seq 2 > 1): applies via tiebreak;
    - batch3 UPDATE (order non-NULL vs NULL target, OLDER seq): applies —
      a known event-time beats an unknown one (NULL ordered smallest);
    - batch4 DELETE (order NULL, seq 2): fires the guarded DELETE clause.

    Scale: same single hash-guarded MERGE shape as merge_cdc_upsert; the
    guard is clause SQL, zero extra exchanges."""
    c = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_acctbal").cast(DEC).alias("val"),
    )

    def cdc(df, op, seq, order_ts):
        return df.select(
            "id",
            "val",
            F.lit(order_ts).cast("timestamp").alias("order_ts"),
            F.lit(seq).cast("long").alias("seq"),
            F.lit(op).alias("cdc_operation"),
            F.md5(F.concat_ws("|", "id", "val")).alias("data_hash"),
        )

    b1 = cdc(c, "INSERT", 1, None)
    tbl = LakeTable.create(
        spark, os.path.join(_tmpdir(), "null_order"), b1.schema
    )
    batches = [
        b1,
        cdc(
            c.where(F.col("id") % 3 == 0).withColumn(
                "val", (F.col("val") + 100).cast(DEC)
            ),
            "UPDATE",
            2,
            None,
        ),
        cdc(
            c.where(F.col("id") % 3 == 1).withColumn(
                "val", (F.col("val") + 500).cast(DEC)
            ),
            "UPDATE",
            1,
            "2023-01-01 00:00:00",
        ),
        cdc(c.where(F.col("id") % 9 == 2), "DELETE", 2, None),
    ]
    for b in batches:
        merge_cdc_batch(
            tbl,
            b,
            key_cols=["id"],
            order_cols=["order_ts"],
            tiebreak_cols=["seq"],
            order_guard_cols=["order_ts", "seq"],
        )
    # exact-cents BIGINT output: DECIMAL is outside the fetch-path-safe
    # oracle output whitelist (driver-rendering hazard class)
    return tbl.to_df().select(
        "id",
        F.round(F.col("val") * 100).cast("long").alias("val_cents"),
    )


_JOIN_MM_CACHE: dict[tuple[int, str], object] = {}


@query(
    "view_join_minmax",
    _SQL_CDC
    + """
, dim AS (
  SELECT user_id,
         CASE WHEN user_id IN (SELECT user_id FROM b2 WHERE user_id % 3 = 0)
              THEN user_id % 4 + 10 ELSE user_id % 4 END AS segment
  FROM (SELECT DISTINCT user_id FROM cdc)
)
SELECT d.segment,
       CAST(min(f.value_cents) AS BIGINT) AS min_cents,
       CAST(max(f.value_cents) AS BIGINT) AS max_cents,
       CAST(count(f.value_cents) AS BIGINT) AS n_vals
FROM final f JOIN dim d USING (user_id)
GROUP BY d.segment""",
)
def view_join_minmax(spark, sf_dir):
    """MIN/MAX + count(col) maintained in an incremental JOIN view — the
    non-subtractable extension of view_incremental_join (same interleaved
    feeds: fact batch, dim batch, fact batch with DELETEs that remove
    group extremes, dim segment reassignment). Inserts tighten the stored
    extremes monotonically; the extremum-removing DELETE batch exercises
    the touched-group recompute (the groups' join at the pinned new
    versions, dim pre-filtered by a broadcast semi-join on the touched
    segments).

    Scale: the recompute is O(rows joining into touched groups), never
    O(table) — extremes-touching removals are the rare path, everything
    else is least/greatest against micro-batch aggregates."""
    from incremental_etl_on_lakehouse_spark.operators.join_view import (
        IncrementalJoinView,
    )

    cache_key = (id(spark), sf_dir)
    view = _JOIN_MM_CACHE.get(cache_key)
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
                "min_cents": ("min", "value_cents"),
                "max_cents": ("max", "value_cents"),
                "n_vals": ("count", "value_cents"),
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
            view.refresh()
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
            view.refresh()
        _JOIN_MM_CACHE[cache_key] = view
    return view.to_df().select(
        "segment", "min_cents", "max_cents", "n_vals"
    )


_STACK_CACHE: dict[tuple[int, str], object] = {}


@query(
    "view_stacked_rollup",
    _SQL_CDC
    + """
, dim AS (
  SELECT user_id,
         CASE WHEN user_id IN (SELECT user_id FROM b2 WHERE user_id % 3 = 0)
              THEN user_id % 4 + 10 ELSE user_id % 4 END AS segment
  FROM (SELECT DISTINCT user_id FROM cdc)
)
, gold AS (
  SELECT d.segment, f.event_type,
         sum(f.value_cents) AS total_cents,
         count(*) AS n_rows
  FROM final f JOIN dim d USING (user_id)
  GROUP BY d.segment, f.event_type
)
SELECT event_type,
       CAST(sum(total_cents) AS BIGINT) AS sum_cents,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(max(total_cents) AS BIGINT) AS max_group_cents
FROM gold GROUP BY event_type""",
)
def view_stacked_rollup(spark, sf_dir):
    """STACKED incremental views — the multi-hop Gold -> Platinum
    topology: a published join view (fact-silver ⋈ dim, grouped by
    (segment, event_type), publish=True) materializes its logical output
    into a CDF-enabled lake table O(changed groups) per refresh, and a
    downstream IncrementalAggView consumes that table AS A SOURCE,
    rolling the per-(segment, event_type) Golds up to per-event_type
    Platinum (sum of group totals, group count, max group total) purely
    from the published change feed.

    Scale: each hop is O(its own changed groups) — the publish merge
    no-op-suppresses unchanged groups, so downstream refreshes see only
    real group movements, never the base tables. This is how a lakehouse
    keeps a DAG of aggregates fresh without any full recomputes."""
    from incremental_etl_on_lakehouse_spark.operators.cdc import (
        IncrementalAggView,
    )
    from incremental_etl_on_lakehouse_spark.operators.join_view import (
        IncrementalJoinView,
    )

    cache_key = (id(spark), sf_dir)
    cached = _STACK_CACHE.get(cache_key)
    if cached is not None and os.path.isdir(cached.root):
        plat = cached
    else:
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
        gold = IncrementalJoinView(
            silver,
            dim,
            os.path.join(root, "gold"),
            join_keys=["user_id"],
            group_cols=["segment", "event_type"],
            aggs={
                "total_cents": ("sum", "value_cents"),
                "n_rows": ("count", "*"),
            },
            publish=True,
        )
        plat = IncrementalAggView(
            gold.published,
            os.path.join(root, "plat"),
            group_cols=["event_type"],
            aggs={
                "sum_cents": ("sum", "total_cents"),
                "n_groups": ("count", "*"),
                "max_group_cents": ("max", "total_cents"),
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
            gold.refresh()
            plat.refresh()
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
            gold.refresh()
            plat.refresh()
        _STACK_CACHE[cache_key] = plat
    return plat.to_df().select(
        "event_type",
        F.col("sum_cents").cast("long").alias("sum_cents"),
        "n_groups",
        F.col("max_group_cents").cast("long").alias("max_group_cents"),
    )


_MV_WHERE_CACHE: dict[tuple[int, str], object] = {}


@query(
    "view_matview_where",
    "WITH post AS ("
    "  SELECT CAST(c_custkey AS BIGINT) AS id,"
    "         CAST(c_custkey % 7 AS BIGINT) AS grp,"
    "         CAST(round(c_acctbal * 100) AS BIGINT)"
    "           - CASE WHEN c_custkey % 5 = 0 THEN 200000 ELSE 0 END"
    "           AS bal_cents"
    "  FROM customer WHERE c_custkey % 11 <> 0)"
    " SELECT grp, CAST(sum(bal_cents) AS BIGINT) AS t,"
    " CAST(count(*) AS BIGINT) AS n,"
    " CAST(max(bal_cents) AS BIGINT) AS hi"
    " FROM post WHERE bal_cents >= 0 GROUP BY grp HAVING count(*) > 3",
)
def view_matview_where(spark, sf_dir):
    """MATERIALIZED VIEW with WHERE + HAVING through the SQL front door:
    the MV filters negative balances BEFORE aggregation (maintained
    incrementally — batch 2's -2000.00 update pushes some rows across the
    0 boundary OUT of the aggregate, and its deletes remove group maxima,
    driving the FILTERED min/max recompute), while HAVING prunes small
    groups at read time. The oracle replays the post-state in plain SQL
    with the same WHERE/HAVING.

    Scale: the WHERE rides the change feed (no base rescan); the
    boundary-crossing update is just a preimage(-1)/postimage(filtered)
    pair; the recompute reads only extremum-touched groups through the
    predicate."""
    from incremental_etl_on_lakehouse_spark.lake.catalog import LakeCatalog

    cache_key = (id(spark), sf_dir)
    cached = _MV_WHERE_CACHE.get(cache_key)
    if cached is not None and os.path.isdir(cached.root):
        cat = cached
    else:
        cat = LakeCatalog(spark, os.path.join(_tmpdir(), "cat"))
        cat.create_database("db1")
        t = cat.create_table(
            "db1",
            "balances",
            StructType(
                [
                    StructField("id", LongType()),
                    StructField("grp", LongType()),
                    StructField("bal_cents", LongType()),
                ]
            ),
            properties={
                "enableChangeDataFeed": "true",
                "statsColumns": "id,grp",
            },
        )
        c = load_table(spark, "customer", sf_dir).select(
            F.col("c_custkey").cast("long").alias("id"),
            (F.col("c_custkey") % 7).cast("long").alias("grp"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        )
        t.append(c)
        cat.sql(
            "CREATE MATERIALIZED VIEW db1.mv AS"
            " SELECT grp, sum(bal_cents) AS t, count(*) AS n,"
            " max(bal_cents) AS hi"
            " FROM db1.balances WHERE bal_cents >= 0 GROUP BY grp"
            " HAVING n > 3"
        )
        t.update({"bal_cents": "bal_cents - 200000"}, "id % 5 = 0")
        t.delete("id % 11 = 0")
        cat.sql("REFRESH MATERIALIZED VIEW db1.mv")
        _MV_WHERE_CACHE[cache_key] = cat
    return cat.sql("SELECT grp, t, n, hi FROM db1.mv")
