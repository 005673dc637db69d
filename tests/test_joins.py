"""Unit tests for the specialized join operators (operators/joins.py).

Each operator is checked against a brute-force equivalent computed with
plain Spark SQL on the same data, so correctness does not depend on the
clever plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_etl_on_lakehouse_spark.operators.joins import (
    asof_join,
    range_join_binned,
    range_join_broadcast,
    salted_join,
)
from incremental_etl_on_lakehouse_spark.tables import load_table


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_asof_join_matches_bruteforce(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    # right side: purchases, deduped to one row per (user_id, ts)
    purch = (
        load_table(spark, "events", sf_dir)
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("p_event_id"),
            F.max(F.round(F.col("value") * 100).cast("long")).alias("p_cents"),
        )
    )
    got = asof_join(
        ev,
        purch,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["p_event_id", "p_cents"],
    )

    # brute force: max right ts <= left ts, then fetch payload
    ev.createOrReplaceTempView("bf_l")
    purch.createOrReplaceTempView("bf_r")
    want = spark.sql(
        """
        SELECT l.event_id, r.p_event_id, r.p_cents
        FROM bf_l l
        LEFT JOIN (
          SELECT l.event_id AS eid, max(r.ts) AS mts
          FROM bf_l l JOIN bf_r r
            ON l.user_id = r.user_id AND r.ts <= l.ts
          GROUP BY l.event_id
        ) m ON m.eid = l.event_id
        LEFT JOIN bf_r r
          ON r.user_id = l.user_id AND r.ts = m.mts
        """
    )
    assert _rows(got, "event_id", "p_event_id", "p_cents") == _rows(
        want, "event_id", "p_event_id", "p_cents"
    )
    # inner flavor drops unmatched lefts only
    inner = asof_join(
        ev, purch, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["p_event_id", "p_cents"], how="inner",
    )
    assert inner.count() == want.where("p_event_id IS NOT NULL").count()


def test_asof_equal_ts_is_inclusive(spark):
    l = spark.createDataFrame([(1, 100)], "k long, t long")
    r = spark.createDataFrame([(1, 100, "hit")], "k long, t long, v string")
    got = asof_join(l, r, on=["k"], left_ts="t", right_ts="t", value_cols=["v"])
    assert got.collect()[0]["v"] == "hit"


def test_range_join_binned_vs_broadcast(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    bands = spark.createDataFrame(
        [("tiny", 0.0, 40000.0), ("mid", 40000.0, 180000.0), ("big", 180000.0, 1e9)],
        "band string, lo double, hi double",
    )
    a = range_join_binned(o, bands, "o_totalprice", "lo", "hi", bin_width=50000.0)
    b = range_join_broadcast(o, bands, "o_totalprice", "lo", "hi")
    assert _rows(a, "o_orderkey", "band") == _rows(b, "o_orderkey", "band")
    # every order falls in exactly one band
    assert a.count() == o.count()


def test_range_join_bin_boundary_exclusive(spark):
    # point exactly at hi must not match; exactly at lo must match
    pts = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, x double")
    iv = spark.createDataFrame([("a", 10.0, 20.0)], "name string, lo double, hi double")
    got = range_join_binned(pts, iv, "x", "lo", "hi", bin_width=5.0)
    assert _rows(got, "id", "name") == [(1, "a")]


def test_salted_join_equals_plain(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id")
    dim = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_total"))
    )
    got = salted_join(ev, dim, on=["user_id"], n_salts=4)
    want = ev.join(dim, "user_id")
    assert _rows(got, "event_id", "n_total") == _rows(want, "event_id", "n_total")


def test_connected_components_known_graph(spark):
    from incremental_etl_on_lakehouse_spark.operators.dedup import (
        connected_components,
    )

    # two chains and one isolated-by-edges pair: {1,2,3,4}, {10,11}, {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_asof_join_empty_right(spark):
    l = spark.createDataFrame([(1, 100), (2, 50)], "k long, t long")
    r = spark.createDataFrame([], "k long, t long, v string")
    got = asof_join(l, r, on=["k"], left_ts="t", right_ts="t", value_cols=["v"])
    rows = got.orderBy("k").collect()
    assert [x["v"] for x in rows] == [None, None]
    inner = asof_join(
        l, r, on=["k"], left_ts="t", right_ts="t", value_cols=["v"], how="inner"
    )
    assert inner.count() == 0


def test_range_join_empty_intervals(spark):
    pts = spark.createDataFrame([(1, 5.0)], "id long, x double")
    iv = spark.createDataFrame([], "name string, lo double, hi double")
    assert range_join_binned(pts, iv, "x", "lo", "hi", bin_width=10.0).count() == 0


def test_connected_components_empty_edges(spark):
    from incremental_etl_on_lakehouse_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0


def test_asof_directions_small_fixture(spark):
    left = spark.createDataFrame(
        [(1, "k", 10), (2, "k", 25), (3, "k", 40), (4, "z", 5)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("k", 20, "a"), ("k", 30, "b"), ("z", 50, "c")],
        "k string, t long, v string",
    )

    def run(direction):
        out = asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            value_cols=["v"], direction=direction,
        )
        return {r.id: r.v for r in out.collect()}

    # backward: latest right at-or-before
    assert run("backward") == {1: None, 2: "a", 3: "b", 4: None}
    # forward: earliest right at-or-after
    assert run("forward") == {1: "a", 2: "b", 3: None, 4: "c"}
    # nearest: closer of the two; ties prefer backward
    # id=2 (t=25): backward a at 20 (d=5) vs forward b at 30 (d=5) -> a
    assert run("nearest") == {1: "a", 2: "a", 3: "b", 4: "c"}


def test_asof_forward_equal_ts_inclusive(spark):
    left = spark.createDataFrame([(1, "k", 20)], "id long, k string, t long")
    right = spark.createDataFrame([("k", 20, "x")], "k string, t long, v string")
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        value_cols=["v"], direction="forward",
    )
    assert out.collect()[0].v == "x"


def test_asof_nearest_matches_bruteforce(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    purch = (
        load_table(spark, "events", sf_dir)
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_event_id"))
    )
    got = asof_join(
        ev, purch, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["p_event_id"], direction="nearest",
    )
    ev.createOrReplaceTempView("l")
    purch.createOrReplaceTempView("r")
    want = spark.sql(
        """
        SELECT l.event_id, l.user_id,
          max_by(r.p_event_id,
                 struct(-abs(unix_micros(CAST(l.ts AS TIMESTAMP))
                             - unix_micros(CAST(r.ts AS TIMESTAMP))),
                        CASE WHEN r.ts <= l.ts THEN 1 ELSE 0 END,
                        r.p_event_id)) AS p_event_id
        FROM l LEFT JOIN r ON l.user_id = r.user_id
        GROUP BY l.event_id, l.user_id
        """
    )
    assert _rows(got, "event_id", "p_event_id") == _rows(
        want, "event_id", "p_event_id"
    )


def test_stats_driven_join_decisions(spark):
    from incremental_etl_on_lakehouse_spark.operators.joins import (
        stats_driven_join,
    )

    big = spark.range(1000).withColumnRenamed("id", "k")
    small = spark.range(10).withColumnRenamed("id", "k2")
    big_stats = {"numRows": 50_000_000, "columns": {}}
    small_stats = {"numRows": 10, "columns": {}}

    _, d = stats_driven_join(
        big, small, big.k == small.k2, big_stats, small_stats
    )
    assert d == "broadcast_right"
    _, d = stats_driven_join(
        small, big, small.k2 == big.k, small_stats, big_stats
    )
    assert d == "broadcast_left"
    big2 = spark.range(1000).withColumnRenamed("id", "k2")
    _, d = stats_driven_join(
        big, big2, big.k == big2.k2, big_stats, big_stats
    )
    assert d == "shuffle"
    # missing stats on both sides: never guess a broadcast
    _, d = stats_driven_join(big, small, big.k == small.k2, None, None)
    assert d == "shuffle"
    # result correctness: equals the plain join
    joined, _ = stats_driven_join(
        big, small, big.k == small.k2, big_stats, small_stats
    )
    assert joined.count() == 10
