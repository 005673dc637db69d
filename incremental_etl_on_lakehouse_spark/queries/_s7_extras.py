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
    " ORDER BY l_orderkey, l_linenumber)",
)
def win_nth_value(spark, sf_dir):
    """``nth_value`` over the engines' shared default frame (RANGE
    UNBOUNDED PRECEDING..CURRENT ROW): NULL until n rows are visible, then
    the n-th by the unique (orderkey, linenumber) order — completes the
    ranking/value window family (rank/dense/lag/first_last/ntile/
    percent_rank/cume_dist keys). One window exchange on l_returnflag."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_returnflag").orderBy("l_orderkey", "l_linenumber")
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
