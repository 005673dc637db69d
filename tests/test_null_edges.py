"""NULL-semantics edge cases vs DuckDB.

The driver's testdata tables contain ZERO nulls (verified across every
column at sf0.01), so the oracle sweep structurally cannot catch
NULL-handling bugs — exactly the class the round-3 advisory flagged twice
(merge_distinct_state NULL accumulation; IncrementalAggView inner-join
dropping all-NULL min/max groups, both since fixed). These tests feed
synthetic NULL-bearing batches through the operator APIs and compare
against DuckDB running the equivalent ANSI SQL on the same rows.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from incremental_etl_on_lakehouse_spark.operators.cdc import dedup_latest
from incremental_etl_on_lakehouse_spark.operators.joins import asof_join


@pytest.fixture()
def ddb():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    yield con
    con.close()


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def _compare(sdf, con, sql):
    sc, sr = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = con.execute(sql)
    oc = [d[0] for d in res.description]
    oc, orr = _norm(oc, res.fetchall())
    assert sc == oc, (sc, oc)
    assert sr == orr, (sr[:5], orr[:5])


def _register(con, name, rows, cols):
    import pandas as pd

    con.register(name, pd.DataFrame(rows, columns=cols).convert_dtypes())


def test_groupby_null_keys_and_values(spark, ddb):
    """NULL group keys form their own group (Spark & SQL agree); SUM/AVG
    skip NULL values; COUNT(col) excludes NULLs; COUNT(*) includes them."""
    rows = [
        ("a", 1), ("a", None), (None, 5), (None, None), ("b", None),
    ]
    df = spark.createDataFrame(
        rows,
        StructType(
            [StructField("k", StringType()), StructField("v", LongType())]
        ),
    )
    out = df.groupBy("k").agg(
        F.sum("v").alias("s"),
        F.count("v").alias("nv"),
        F.count(F.lit(1)).alias("n"),
    )
    _register(ddb, "t", rows, ["k", "v"])
    _compare(
        out,
        ddb,
        "SELECT k, CAST(sum(v) AS BIGINT) AS s, count(v) AS nv,"
        " count(*) AS n FROM t GROUP BY k",
    )


def test_count_distinct_excludes_nulls(spark, ddb):
    """COUNT(DISTINCT v) must exclude NULLs — the advisory's
    merge_distinct_state contract, checked at the batch-aggregation level."""
    rows = [("a", 1), ("a", 1), ("a", None), ("b", None), ("b", None)]
    df = spark.createDataFrame(
        rows,
        StructType(
            [StructField("k", StringType()), StructField("v", LongType())]
        ),
    )
    out = df.groupBy("k").agg(F.countDistinct("v").alias("nd"))
    _register(ddb, "t", rows, ["k", "v"])
    _compare(out, ddb, "SELECT k, count(DISTINCT v) AS nd FROM t GROUP BY k")


def test_min_max_all_null_group_survives(spark, ddb):
    """A group whose min/max column is entirely NULL must still appear,
    with NULL min/max — the advisory's IncrementalAggView regression shape
    at the batch level."""
    rows = [("a", 1), ("a", 3), ("b", None), ("b", None)]
    df = spark.createDataFrame(
        rows,
        StructType(
            [StructField("k", StringType()), StructField("v", LongType())]
        ),
    )
    out = df.groupBy("k").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    _register(ddb, "t", rows, ["k", "v"])
    _compare(
        out,
        ddb,
        "SELECT k, min(v) AS mn, max(v) AS mx, count(*) AS n"
        " FROM t GROUP BY k",
    )


def test_dedup_latest_null_order_and_tiebreak(spark, ddb):
    """row_number over DESC ordering: Spark sorts NULL timestamps LAST in
    descending order (nulls last), same as SQL ORDER BY v DESC NULLS LAST
    — a NULL-ts record never shadows a real one, and an all-NULL key still
    yields exactly one row."""
    rows = [
        (1, 10, 100), (1, None, 999), (1, 10, 99),   # ts tie -> tiebreak
        (2, None, 5),                                 # all-NULL ts key
        (3, 7, None), (3, 7, 8),                      # NULL tiebreak loses
    ]
    df = spark.createDataFrame(
        rows,
        StructType(
            [
                StructField("k", LongType()),
                StructField("ts", LongType()),
                StructField("tb", LongType()),
            ]
        ),
    )
    out = dedup_latest(df, ["k"], ["ts"], ["tb"])
    _register(ddb, "t", rows, ["k", "ts", "tb"])
    _compare(
        out,
        ddb,
        "SELECT k, ts, tb FROM (SELECT *, row_number() OVER ("
        " PARTITION BY k ORDER BY ts DESC NULLS LAST, tb DESC NULLS LAST"
        ") AS rn FROM t) WHERE rn = 1",
    )


def test_asof_join_null_ts_rows_never_match(spark, ddb):
    """Left rows with NULL timestamps get NULL payloads (no time to match
    at); right rows with NULL timestamps are never candidates. DuckDB's
    ASOF JOIN has the same contract (NULL fails every inequality)."""
    left_rows = [(1, 100), (1, None), (2, 50)]
    right_rows = [(1, 90, "x"), (1, None, "poison"), (2, 60, "y")]
    left = spark.createDataFrame(
        left_rows,
        StructType(
            [StructField("k", LongType()), StructField("ts", LongType())]
        ),
    )
    right = spark.createDataFrame(
        right_rows,
        StructType(
            [
                StructField("k", LongType()),
                StructField("rts", LongType()),
                StructField("val", StringType()),
            ]
        ),
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        value_cols=["val"],
    ).select("k", "ts", "val")
    _register(ddb, "l", left_rows, ["k", "ts"])
    _register(ddb, "r", right_rows, ["k", "rts", "val"])
    _compare(
        out,
        ddb,
        "SELECT l.k, l.ts, r.val FROM l ASOF LEFT JOIN r"
        " ON l.k = r.k AND l.ts >= r.rts",
    )


def test_exact_dedup_null_text_forms_one_group(spark):
    """NULL content rows: a hash-of-NULL must not silently collide with
    hash-of-empty-string; all NULL rows dedup to one survivor per the
    null-safe grouping, and empty-string rows stay distinct from them."""
    rows = [(1, None), (2, None), (3, ""), (4, ""), (5, "x")]
    df = spark.createDataFrame(
        rows,
        StructType(
            [StructField("doc_id", LongType()), StructField("text", StringType())]
        ),
    )
    # groupBy on the raw column is null-safe (NULL is its own group)
    survivors = (
        df.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    )
    got = {(r["text"], r["doc_id"]) for r in survivors.collect()}
    assert got == {(None, 1), ("", 3), ("x", 5)}


def test_merge_null_key_source_rows_insert_not_match(spark, tmp_path):
    """MERGE ON source.k = target.k: a NULL source key matches nothing
    (SQL equality), so it must take the INSERT branch — and two successive
    NULL-key batches must not accumulate matched updates against each
    other's inserted NULL rows (NULL never equals NULL)."""
    from incremental_etl_on_lakehouse_spark.lake import LakeTable
    from incremental_etl_on_lakehouse_spark.lake.table import MergeClause

    schema = StructType(
        [StructField("k", LongType()), StructField("v", LongType())]
    )
    t = LakeTable.create(spark, str(tmp_path / "nullmerge"), schema)
    t.append(spark.createDataFrame([(1, 10)], schema))
    for v in (100, 200):
        t.merge(
            spark.createDataFrame([(None, v)], schema),
            "source.k = target.k",
            [
                MergeClause("update", None, "*"),
                MergeClause("insert", None, "*"),
            ],
        )
    rows = sorted(
        ((r["k"], r["v"]) for r in t.to_df().collect()),
        key=lambda x: (str(x[0]), x[1]),
    )
    # both NULL-key rows inserted; neither "updated" the other
    assert rows == [(1, 10), (None, 100), (None, 200)], rows


def test_multimodal_null_content_does_not_crash(spark):
    """A NULL binary content cell must decode as empty bytes, not kill the
    task with bytes(None)."""
    from incremental_etl_on_lakehouse_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        [(1, "image", b"\x89PNGdata"), (2, "image", None)],
        "media_id long, media_type string, content binary",
    )
    feats = {r["media_id"]: r["features"] for r in MM.extract_features(df).collect()}
    assert feats[2] == [0.0] * 8  # empty-bytes fake decode
    assert feats[1][0] > 0
    thumbs = MM.resize_images(df).collect()
    assert len(thumbs) == 2


def test_asof_inner_keeps_match_with_null_payload(spark):
    """An inner as-of join must keep a matched left row even when the
    matched right row's payload is NULL — match-exists and payload-null
    are different things."""
    from incremental_etl_on_lakehouse_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 100), (2, 100)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 90, None)], "k long, rts long, val string"
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        value_cols=["val"], how="inner",
    ).collect()
    # k=1 matched (payload NULL); k=2 has no right row at all
    assert [(r["k"], r["val"]) for r in out] == [(1, None)]
    # empty value_cols must not crash the inner filter
    out2 = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        value_cols=[], how="inner",
    ).collect()
    assert sorted(r["k"] for r in out2) == [1]


def test_salted_join_rejects_right_outer(spark):
    from incremental_etl_on_lakehouse_spark.operators.joins import salted_join

    df = spark.createDataFrame([(1, "x")], "k long, v string")
    with pytest.raises(ValueError, match="salted_join does not support"):
        salted_join(df, df, on=["k"], how="full")


def test_quality_buckets_threshold_null_and_empty(spark):
    """Threshold bucketing's degenerate inputs: an EMPTY frame yields an
    empty result (thresholds degrade to NULL, every comparison falls to
    the otherwise-branch of zero rows); NULL scores sort before every
    threshold comparison, fail both `<=` tests, and land in the TOP bucket
    — callers scoring real corpora never produce them (zero-token docs are
    dropped by the tokenizer explode), but the operator must not crash or
    mis-bucket non-NULL rows around them."""
    from incremental_etl_on_lakehouse_spark.operators.text import (
        quality_buckets_by_threshold,
    )

    empty = spark.createDataFrame([], "doc_id long, cross_entropy double")
    assert quality_buckets_by_threshold(empty).count() == 0

    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0), (3, None)],
        "doc_id long, cross_entropy double",
    )
    out = {r["doc_id"]: r["ppl_bucket"]
           for r in quality_buckets_by_threshold(df).collect()}
    # NULL joins the histogram as its own group but cannot satisfy either
    # `score <= t` comparison -> bucket 3. With NULLS FIRST ordering the
    # NULL group consumes one cumulative slot, so thresholds shift down a
    # rank: t1 = 1.0 (cum 2 >= ceil(4/3)), t2 = 2.0 (cum 3 >= ceil(8/3))
    assert out == {0: 1, 1: 2, 2: 3, 3: 3}, out


def test_temperature_mix_sample_empty_and_null_stratum(spark):
    """Temperature sampling's degenerate inputs: an EMPTY corpus returns
    empty (no division by a zero weight total); a NULL stratum is a
    stratum like any other (groupBy keeps the NULL group; the broadcast
    join must be null-safe for its rows to survive) — pinned so a future
    join-condition change can't silently drop NULL-stratum rows."""
    from incremental_etl_on_lakehouse_spark.operators.sampling import (
        temperature_mix_sample,
    )

    empty = spark.createDataFrame([], "id long, g string")
    assert temperature_mix_sample(empty, "id", "g", target_rows=10).count() == 0

    df = spark.createDataFrame(
        [(i, "a") for i in range(20)] + [(100 + i, None) for i in range(20)],
        "id long, g string",
    )
    out = temperature_mix_sample(df, "id", "g", target_rows=40)
    by_g = {r["g"]: r["n"] for r in
            out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    # target >= corpus: every stratum's rate caps at 1 -> both kept whole,
    # INCLUDING the NULL stratum
    assert by_g.get("a") == 20, by_g
    assert by_g.get(None) == 20, by_g

    # ALL-NULL stratum column: type inference has no non-None value to work
    # with, so the counts frame needs its explicit schema (taken from the
    # corpus schema) — without it createDataFrame raises "Some of types
    # cannot be determined"
    all_null = spark.createDataFrame(
        [(i, None) for i in range(20)], "id long, g string"
    )
    kept = temperature_mix_sample(all_null, "id", "g", target_rows=40)
    assert kept.count() == 20
    assert kept.columns == ["id", "g"]
