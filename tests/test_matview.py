"""SQL-defined MATERIALIZED VIEWs: CREATE/REFRESH/DROP/SHOW through the
catalog front door, backed by the incremental maintainers — a
single-table MV rides IncrementalAggView (full aggregate algebra), a
two-table equi-join MV rides IncrementalJoinView (subtractable family).
Reads are snapshot reads (stale until REFRESH); state + checkpoints
persist across catalog instances."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.catalog import LakeCatalog
from incremental_etl_on_lakehouse_spark.lake.matview import (
    parse_matview_select,
)

FACT = StructType(
    [
        StructField("k", LongType()),
        StructField("grp", StringType()),
        StructField("v", LongType()),
    ]
)
DIM = StructType(
    [StructField("k", LongType()), StructField("seg", StringType())]
)
CDF = {"enableChangeDataFeed": "true", "statsColumns": "k"}


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, str(tmp_path / "cat"))
    c.create_database("db1")
    t = c.create_table("db1", "fact", FACT, properties=CDF)
    t.append(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 5)], FACT
        )
    )
    return c


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_single_table_matview_lifecycle(cat, spark):
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.mv AS"
        " SELECT grp, sum(v) AS total, count(*) AS n, avg(v) AS mean,"
        " min(v) AS lo, max(v) AS hi, median(v) AS med, mode(v) AS mo"
        " FROM db1.fact GROUP BY grp"
    )
    assert cat.sql("SHOW MATERIALIZED VIEWS IN db1") == ["mv"]
    got = _rows(cat.sql("SELECT grp, total, n, lo, hi, med FROM db1.mv"))
    assert got == {("a", 30, 2, 10, 20, 10), ("b", 5, 1, 5, 5, 5)}
    # staleness: new rows are INVISIBLE until REFRESH
    cat.table("db1", "fact").append(
        spark.createDataFrame([(4, "b", 100)], FACT)
    )
    stale = _rows(cat.sql("SELECT grp, total FROM db1.mv"))
    assert stale == {("a", 30), ("b", 5)}
    cat.sql("REFRESH MATERIALIZED VIEW db1.mv")
    fresh = _rows(cat.sql("SELECT grp, total, hi FROM db1.mv"))
    assert fresh == {("a", 30, 20), ("b", 105, 100)}
    cat.sql("DROP MATERIALIZED VIEW db1.mv")
    assert cat.matviews("db1") == []
    assert not os.path.isdir(
        os.path.join(cat.root, "db1", ".__mv__", "mv")
    )  # state removed


def test_matview_persists_and_resumes_across_instances(cat, spark):
    cat.create_materialized_view(
        "db1", "mv", "SELECT grp, sum(v) AS total FROM db1.fact GROUP BY grp"
    )
    fresh_cat = LakeCatalog(spark, cat.root)
    assert fresh_cat.matviews("db1") == ["mv"]
    # a rehydrated maintainer resumes from the CHECKPOINT: refresh with no
    # new commits applies nothing (no double count), with new commits it
    # folds only the tail
    fresh_cat.sql("REFRESH MATERIALIZED VIEW db1.mv")
    assert _rows(fresh_cat.read_matview("db1", "mv")) == {("a", 30), ("b", 5)}
    fresh_cat.table("db1", "fact").append(
        spark.createDataFrame([(9, "a", 1)], FACT)
    )
    fresh_cat.sql("REFRESH MATERIALIZED VIEW db1.mv")
    assert _rows(fresh_cat.read_matview("db1", "mv")) == {
        ("a", 31),
        ("b", 5),
    }


def test_join_matview_via_sql(cat, spark):
    dim = cat.create_table("db1", "dim", DIM, properties=CDF)
    dim.append(spark.createDataFrame([(1, "x"), (2, "y"), (3, "x")], DIM))
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.jmv AS"
        " SELECT seg, sum(v) AS total, count(*) AS n"
        " FROM db1.fact JOIN db1.dim USING (k) GROUP BY seg"
    )
    assert _rows(cat.sql("SELECT seg, total, n FROM db1.jmv")) == {
        ("x", 15, 2),
        ("y", 20, 1),
    }
    # both feeds advance; one refresh folds both
    cat.table("db1", "fact").append(
        spark.createDataFrame([(2, "a", 7)], FACT)
    )
    dim.delete("k = 3")
    cat.sql("REFRESH MATERIALIZED VIEW db1.jmv")
    assert _rows(cat.sql("SELECT seg, total, n FROM db1.jmv")) == {
        ("x", 10, 1),
        ("y", 27, 2),
    }


def test_join_matview_minmax_via_sql(cat, spark):
    """MIN/MAX in a join MV (the round-12 touched-group-recompute path):
    an extremum-removing delete on one feed converges through REFRESH."""
    dim = cat.create_table("db1", "dim", DIM, properties=CDF)
    dim.append(spark.createDataFrame([(1, "x"), (2, "y"), (3, "x")], DIM))
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.mmv AS"
        " SELECT seg, min(v) AS lo, max(v) AS hi, count(v) AS nv"
        " FROM db1.fact JOIN db1.dim USING (k) GROUP BY seg"
    )
    assert _rows(cat.sql("SELECT seg, lo, hi, nv FROM db1.mmv")) == {
        ("x", 5, 10, 2),
        ("y", 20, 20, 1),
    }
    # delete the current max of 'x' -> recompute path
    cat.table("db1", "fact").delete("v = 10")
    cat.sql("REFRESH MATERIALIZED VIEW db1.mmv")
    assert _rows(cat.sql("SELECT seg, lo, hi, nv FROM db1.mmv")) == {
        ("x", 5, 5, 1),
        ("y", 20, 20, 1),
    }


def test_matview_rejections(cat, spark, tmp_path):
    with pytest.raises(ValueError, match="plain row predicates"):
        cat.create_materialized_view(
            "db1", "m1",
            "SELECT grp, sum(v) AS t FROM db1.fact"
            " WHERE v > (SELECT avg(v) FROM db1.fact) GROUP BY grp",
        )
    with pytest.raises(ValueError, match="at least one aggregate"):
        parse_matview_select("SELECT grp FROM t GROUP BY grp")
    with pytest.raises(ValueError, match="per-group join-result"):
        parse_matview_select(
            "SELECT grp, p90(v) AS q FROM a JOIN b USING (k) GROUP BY grp"
        )
    with pytest.raises(ValueError, match="same name"):
        parse_matview_select(
            "SELECT g, sum(v) AS t FROM a JOIN b ON a.k = b.j GROUP BY g"
        )
    with pytest.raises(ValueError, match="GROUP BY"):
        parse_matview_select(
            "SELECT grp, sum(v) AS t FROM t GROUP BY other"
        )
    # non-CDF source refused by the maintainer
    plain = cat.create_table("db1", "plain", FACT)  # no CDF props
    with pytest.raises(ValueError, match="enableChangeDataFeed"):
        cat.create_materialized_view(
            "db1", "m2",
            "SELECT grp, sum(v) AS t FROM db1.plain GROUP BY grp",
        )
    # aggregates need aliases
    with pytest.raises(ValueError, match="unsupported select item"):
        parse_matview_select("SELECT grp, sum(v) FROM t GROUP BY grp")


def test_matview_namespace_shadowing(cat):
    cat.create_materialized_view(
        "db1", "mv", "SELECT grp, sum(v) AS t FROM db1.fact GROUP BY grp"
    )
    with pytest.raises(ValueError, match="is a view"):
        cat.create_table("db1", "mv", FACT)
    with pytest.raises(ValueError, match="materialized"):
        cat.create_view("db1", "mv", "SELECT 1 AS x")
    with pytest.raises(ValueError, match="cannot shadow"):
        cat.create_materialized_view(
            "db1", "fact", "SELECT grp, sum(v) AS t FROM db1.fact GROUP BY grp"
        )
    with pytest.raises(ValueError, match="materialized view exists"):
        cat.create_materialized_view(
            "db1", "mv", "SELECT grp, count(*) AS n FROM db1.fact GROUP BY grp"
        )
    # OR REPLACE swaps definition AND state
    cat.sql(
        "CREATE OR REPLACE MATERIALIZED VIEW db1.mv AS"
        " SELECT grp, count(*) AS n FROM db1.fact GROUP BY grp"
    )
    assert _rows(cat.read_matview("db1", "mv")) == {("a", 2), ("b", 1)}


def test_matview_plain_view_composition(cat):
    """A late-bound plain view can SELECT over a materialized view."""
    cat.create_materialized_view(
        "db1", "mv", "SELECT grp, sum(v) AS total FROM db1.fact GROUP BY grp"
    )
    cat.create_view(
        "db1", "big", "SELECT grp FROM db1.mv"
    )
    assert {r["grp"] for r in cat.read_view("db1", "big").collect()} == {
        "a",
        "b",
    }


def test_drop_database_covers_matviews(cat):
    cat.create_materialized_view(
        "db1", "mv", "SELECT grp, sum(v) AS t FROM db1.fact GROUP BY grp"
    )
    with pytest.raises(ValueError, match="not empty"):
        cat.drop_database("db1")
    cat.drop_database("db1", cascade=True)
    assert cat.matviews("db1") == []


def test_count_col_counts_non_nulls(cat, spark):
    """count(col) in a single-table MV is the maintained NON-NULL count
    (batch SQL count(col) semantics), distinct from count(*)."""
    cat.table("db1", "fact").append(
        spark.createDataFrame([(7, "a", None), (8, None, 3)], FACT)
    )
    cat.create_materialized_view(
        "db1", "cmv",
        "SELECT grp, count(*) AS n_all, count(v) AS n_v FROM db1.fact"
        " GROUP BY grp",
    )
    got = {
        r["grp"]: (r["n_all"], r["n_v"])
        for r in cat.read_matview("db1", "cmv").collect()
    }
    assert got["a"] == (3, 2)  # one NULL v in group a
    assert got[None] == (1, 1)  # NULL group key is a first-class group
    # deletes maintain it: remove the NULL-v row, counts diverge -> converge
    cat.table("db1", "fact").delete("k = 7")
    cat.refresh_materialized_view("db1", "cmv")
    got = {
        r["grp"]: (r["n_all"], r["n_v"])
        for r in cat.read_matview("db1", "cmv").collect()
    }
    assert got["a"] == (2, 2)
    # join MVs accept count(col) since round 12; quantile-class stays out
    spec = parse_matview_select(
        "SELECT g, count(v) AS c FROM a JOIN b USING (k) GROUP BY g"
    )
    assert spec["aggs"] == {"c": ("count", "v")}
    with pytest.raises(ValueError, match="per-group join-result"):
        parse_matview_select(
            "SELECT g, median(v) AS m FROM a JOIN b USING (k) GROUP BY g"
        )


def test_count_string_column(cat, spark):
    """count(col) of a STRING column: only the non-null count is
    maintained — no running sum of strings (which would crash under ANSI
    the first refresh)."""
    cat.table("db1", "fact").append(
        spark.createDataFrame([(9, None, 1)], FACT)
    )
    cat.create_materialized_view(
        "db1", "smv",
        "SELECT k, count(grp) AS ng, count(*) AS n FROM db1.fact GROUP BY k",
    )
    got = {
        r["k"]: (r["ng"], r["n"])
        for r in cat.read_matview("db1", "smv").collect()
    }
    assert got[9] == (0, 1)  # NULL string not counted
    assert got[1] == (1, 1)


def test_drop_table_on_matview_redirects(cat):
    cat.create_materialized_view(
        "db1", "mv", "SELECT grp, sum(v) AS t FROM db1.fact GROUP BY grp"
    )
    with pytest.raises(ValueError, match="DROP MATERIALIZED VIEW"):
        cat.sql("DROP TABLE db1.mv")
    assert cat.matviews("db1") == ["mv"]  # still registered


def test_single_table_mv_refresh_exactly_once_on_crash(
    cat, spark, monkeypatch
):
    """Crash between the additive merge and the reader's checkpoint
    write: the replayed batch must NOT double-count (txn guard keyed on
    the CDF version)."""
    from incremental_etl_on_lakehouse_spark.lake.streaming import Checkpoint

    cat.create_materialized_view(
        "db1", "mv", "SELECT grp, sum(v) AS total FROM db1.fact GROUP BY grp"
    )
    cat.table("db1", "fact").append(
        spark.createDataFrame([(10, "a", 100)], FACT)
    )
    real_write = Checkpoint.write
    calls = {"n": 0}

    def failing(self, v):
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("crash before checkpoint")
        real_write(self, v)

    monkeypatch.setattr(Checkpoint, "write", failing)
    with pytest.raises(RuntimeError, match="crash before checkpoint"):
        cat.refresh_materialized_view("db1", "mv")
    monkeypatch.undo()
    cat.refresh_materialized_view("db1", "mv")  # replay: guard no-ops
    got = {r["grp"]: r["total"] for r in cat.read_matview("db1", "mv").collect()}
    assert got["a"] == 130  # 10 + 20 + 100, never 230


def test_chain_matview_three_tables(cat, spark):
    """A 3-table join chain through the SQL MV grammar maintains via
    IncrementalChainJoinView from all three change feeds."""
    dim = cat.create_table("db1", "dim", DIM, properties=CDF)
    dim.append(spark.createDataFrame([(1, "x"), (2, "y"), (3, "x")], DIM))
    reg_schema = StructType(
        [StructField("seg", StringType()), StructField("region", StringType())]
    )
    reg = cat.create_table(
        "db1", "reg", reg_schema,
        properties={"enableChangeDataFeed": "true"},
    )
    reg.append(spark.createDataFrame([("x", "eu"), ("y", "us")], reg_schema))
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.cmv3 AS"
        " SELECT region, sum(v) AS total, count(*) AS n"
        " FROM db1.fact JOIN db1.dim USING (k) JOIN db1.reg USING (seg)"
        " GROUP BY region"
    )
    got = {
        r["region"]: (r["total"], r["n"])
        for r in cat.sql("SELECT region, total, n FROM db1.cmv3").collect()
    }
    assert got == {"eu": (15, 2), "us": (20, 1)}
    # all three feeds advance; one REFRESH folds everything
    cat.table("db1", "fact").append(
        spark.createDataFrame([(2, "a", 50)], FACT)
    )
    dim.delete("k = 3")
    reg.append(spark.createDataFrame([("z", "apac")], reg_schema))
    cat.sql("REFRESH MATERIALIZED VIEW db1.cmv3")
    want = {
        r["region"]: (r["t"], r["n"])
        for r in cat.table("db1", "fact").to_df()
        .join(dim.to_df(), on=["k"])
        .join(reg.to_df(), on=["seg"])
        .groupBy("region")
        .agg(F.sum("v").alias("t"), F.count("*").alias("n"))
        .collect()
    }
    got = {
        r["region"]: (r["total"], r["n"])
        for r in cat.read_matview("db1", "cmv3").collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# PUBLISH + stacked MVs (round 12)
# ---------------------------------------------------------------------------


def test_stacked_matviews_via_publish(cat, spark):
    """CREATE MATERIALIZED VIEW ... PUBLISH AS ... materializes the join
    MV's logical output into a CDF lake table; a downstream MV names the
    published MV in FROM and maintains a second-level rollup from its
    change feed — the multi-hop DAG in pure SQL."""
    dim = cat.create_table("db1", "dim", DIM, properties=CDF)
    dim.append(spark.createDataFrame([(1, "x"), (2, "y"), (3, "x")], DIM))
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.gold PUBLISH AS"
        " SELECT seg, grp, sum(v) AS total, count(*) AS n"
        " FROM db1.fact JOIN db1.dim USING (k) GROUP BY seg, grp"
    )
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.plat AS"
        " SELECT grp, sum(total) AS sum_total, count(*) AS n_segs,"
        " max(total) AS max_total"
        " FROM db1.gold GROUP BY grp"
    )
    assert _rows(cat.sql("SELECT grp, sum_total, n_segs FROM db1.plat")) == {
        ("a", 30, 2),
        ("b", 5, 1),
    }
    # source change flows gold -> published -> plat through two REFRESHes
    cat.table("db1", "fact").append(
        spark.createDataFrame([(3, "b", 100)], FACT)
    )
    cat.sql("REFRESH MATERIALIZED VIEW db1.gold")
    # plat is STALE until its own refresh (standard MV semantics)
    assert _rows(cat.sql("SELECT grp, sum_total FROM db1.plat")) == {
        ("a", 30),
        ("b", 5),
    }
    cat.sql("REFRESH MATERIALIZED VIEW db1.plat")
    assert _rows(
        cat.sql("SELECT grp, sum_total, n_segs, max_total FROM db1.plat")
    ) == {("a", 30, 2, 20), ("b", 105, 1, 105)}
    # the published binding survives catalog rehydration
    fresh = LakeCatalog(spark, cat.root)
    fresh.table("db1", "fact").delete("v = 100")
    fresh.sql("REFRESH MATERIALIZED VIEW db1.gold")
    fresh.sql("REFRESH MATERIALIZED VIEW db1.plat")
    assert _rows(fresh.sql("SELECT grp, sum_total FROM db1.plat")) == {
        ("a", 30),
        ("b", 5),
    }


def test_publish_guards(cat, spark):
    dim = cat.create_table("db1", "dim", DIM, properties=CDF)
    dim.append(spark.createDataFrame([(1, "x")], DIM))
    # PUBLISH works on single-table MVs too (round-12 late addition):
    # the published table carries the assembled logical output
    cat.create_materialized_view(
        "db1", "m1",
        "SELECT grp, sum(v) AS t, median(v) AS med FROM db1.fact"
        " GROUP BY grp",
        publish=True,
    )
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.m2 AS"
        " SELECT grp, sum(t) AS tt, max(med) AS mm FROM db1.m1"
        " GROUP BY grp"
    )
    # med is the engine's exact LOWER percentile (10 of [10, 20])
    assert _rows(cat.sql("SELECT grp, tt, mm FROM db1.m2")) == {
        ("a", 30, 10),
        ("b", 5, 5),
    }
    # an UNpublished MV cannot feed another MV
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.gold AS"
        " SELECT seg, sum(v) AS total FROM db1.fact JOIN db1.dim USING (k)"
        " GROUP BY seg"
    )
    with pytest.raises(ValueError, match="without PUBLISH"):
        cat.sql(
            "CREATE MATERIALIZED VIEW db1.p AS"
            " SELECT seg, sum(total) AS t FROM db1.gold GROUP BY seg"
        )
    # a published MV with dependents refuses DROP (and OR REPLACE)
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.gold2 PUBLISH AS"
        " SELECT seg, grp, sum(v) AS total FROM db1.fact"
        " JOIN db1.dim USING (k) GROUP BY seg, grp"
    )
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.p2 AS"
        " SELECT grp, sum(total) AS t FROM db1.gold2 GROUP BY grp"
    )
    with pytest.raises(ValueError, match="consume its published output"):
        cat.sql("DROP MATERIALIZED VIEW db1.gold2")
    cat.sql("DROP MATERIALIZED VIEW db1.p2")
    cat.sql("DROP MATERIALIZED VIEW db1.gold2")  # now fine


def test_refresh_cascade_walks_the_dag(cat, spark):
    """REFRESH ... CASCADE brings a Gold -> Platinum chain current in
    dependency order with one statement."""
    dim = cat.create_table("db1", "dim", DIM, properties=CDF)
    dim.append(spark.createDataFrame([(1, "x"), (2, "y"), (3, "x")], DIM))
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.gold PUBLISH AS"
        " SELECT seg, grp, sum(v) AS total FROM db1.fact"
        " JOIN db1.dim USING (k) GROUP BY seg, grp"
    )
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.plat AS"
        " SELECT grp, sum(total) AS t FROM db1.gold GROUP BY grp"
    )
    cat.table("db1", "fact").append(
        spark.createDataFrame([(1, "a", 1000)], FACT)
    )
    # a plain refresh of plat alone sees a STALE gold
    cat.sql("REFRESH MATERIALIZED VIEW db1.plat")
    assert _rows(cat.sql("SELECT grp, t FROM db1.plat")) == {
        ("a", 30),
        ("b", 5),
    }
    # CASCADE refreshes gold first, then plat
    cat.sql("REFRESH MATERIALIZED VIEW db1.plat CASCADE")
    assert _rows(cat.sql("SELECT grp, t FROM db1.plat")) == {
        ("a", 1030),
        ("b", 5),
    }


# ---------------------------------------------------------------------------
# WHERE / HAVING (round 12)
# ---------------------------------------------------------------------------


def test_matview_where_single_table(cat, spark):
    """WHERE filters rows before aggregation and is maintained
    incrementally — including the min/max recompute, which must read the
    base THROUGH the filter (a filtered-out row must never become a
    group's extreme)."""
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.wmv AS"
        " SELECT grp, sum(v) AS t, count(*) AS n, max(v) AS hi"
        " FROM db1.fact WHERE v >= 10 GROUP BY grp"
    )
    assert _rows(cat.sql("SELECT grp, t, n, hi FROM db1.wmv")) == {
        ("a", 30, 2, 20),
    }  # the (3, 'b', 5) row is filtered; group b has no qualifying rows
    # an update moving a row ACROSS the predicate boundary: v 20 -> 3
    # leaves the filtered aggregate, and the max must recompute to 10 —
    # NOT pick up the now-unqualified 3
    cat.table("db1", "fact").update({"v": "3"}, "k = 2")
    cat.sql("REFRESH MATERIALIZED VIEW db1.wmv")
    assert _rows(cat.sql("SELECT grp, t, n, hi FROM db1.wmv")) == {
        ("a", 10, 1, 10),
    }
    # and back across: v 3 -> 50 re-enters
    cat.table("db1", "fact").update({"v": "50"}, "k = 2")
    cat.sql("REFRESH MATERIALIZED VIEW db1.wmv")
    assert _rows(cat.sql("SELECT grp, t, n, hi FROM db1.wmv")) == {
        ("a", 60, 2, 50),
    }


def test_matview_where_join(cat, spark):
    dim = cat.create_table("db1", "dim", DIM, properties=CDF)
    dim.append(spark.createDataFrame([(1, "x"), (2, "y"), (3, "x")], DIM))
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.wj AS"
        " SELECT seg, sum(v) AS t, min(v) AS lo"
        " FROM db1.fact JOIN db1.dim USING (k)"
        " WHERE v > 5 AND seg <> 'zzz' GROUP BY seg"
    )
    assert _rows(cat.sql("SELECT seg, t, lo FROM db1.wj")) == {
        ("x", 10, 10),
        ("y", 20, 20),
    }
    # delete the only qualifying x row -> filtered recompute drains x
    cat.table("db1", "fact").delete("v = 10")
    cat.sql("REFRESH MATERIALIZED VIEW db1.wj")
    assert _rows(cat.sql("SELECT seg, t, lo FROM db1.wj")) == {
        ("y", 20, 20),
    }


def test_matview_having_read_time(cat, spark):
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.hmv AS"
        " SELECT grp, sum(v) AS t, count(*) AS n FROM db1.fact"
        " GROUP BY grp HAVING t > 10"
    )
    assert _rows(cat.sql("SELECT grp, t, n FROM db1.hmv")) == {("a", 30, 2)}
    # HAVING is read-time: the group reappears as soon as it qualifies
    cat.table("db1", "fact").append(
        spark.createDataFrame([(9, "b", 100)], FACT)
    )
    cat.sql("REFRESH MATERIALIZED VIEW db1.hmv")
    assert _rows(cat.sql("SELECT grp, t, n FROM db1.hmv")) == {
        ("a", 30, 2),
        ("b", 105, 2),
    }


def test_single_table_publish_full_algebra(cat, spark):
    """A published single-table MV carrying the FULL aggregate algebra
    (sum/count/avg/min/max/count-distinct/median/mode) stays byte-equal
    to its logical read through inserts, boundary updates, and
    extreme-removing deletes — and the published CDF drives a downstream
    MV correctly."""
    cat.create_materialized_view(
        "db1", "pub",
        "SELECT grp, sum(v) AS t, count(*) AS n, avg(v) AS mean,"
        " min(v) AS lo, max(v) AS hi, count(DISTINCT v) AS nd,"
        " median(v) AS med, mode(v) AS mo FROM db1.fact GROUP BY grp",
        publish=True,
    )
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.roll AS"
        " SELECT grp, sum(t) AS tt, min(lo) AS lolo FROM db1.pub"
        " GROUP BY grp"
    )

    def converged(ctx):
        mv = cat._matview("db1", "pub")
        cols = sorted(mv.published.to_df().columns)
        # compare BY NAME: the metastore JSON roundtrip alphabetizes the
        # spec's agg order, so the rehydrated logical frame's column
        # ORDER differs from the published schema (values don't)
        pub = sorted(
            tuple(r[c] for c in cols)
            for r in mv.published.to_df().collect()
        )
        logical = sorted(
            tuple(r[c] for c in cols) for r in mv.to_df().collect()
        )
        assert pub == logical, (ctx, pub, logical)
        roll = {
            (r["grp"]): (r["tt"], r["lolo"])
            for r in cat.read_matview("db1", "roll").collect()
        }
        exp = {
            r["grp"]: (r["t"], r["lo"])
            for r in mv.to_df().collect()
        }
        assert roll == exp, (ctx, roll, exp)

    converged("initial")
    cat.table("db1", "fact").append(
        spark.createDataFrame([(7, "a", 100), (8, "b", -3)], FACT)
    )
    cat.sql("REFRESH MATERIALIZED VIEW db1.roll CASCADE")
    converged("appends")
    # delete the max of 'a' -> minmax recompute -> published update
    cat.table("db1", "fact").delete("v = 100")
    cat.sql("REFRESH MATERIALIZED VIEW db1.roll CASCADE")
    converged("extreme delete")
    # drain 'b' entirely -> published DELETE -> downstream group vanishes
    cat.table("db1", "fact").delete("grp = 'b'")
    cat.sql("REFRESH MATERIALIZED VIEW db1.roll CASCADE")
    converged("drain")
    assert "b" not in {
        r["grp"] for r in cat.read_matview("db1", "roll").collect()
    }


def test_left_join_matview_via_sql(cat, spark):
    """LEFT JOIN MV: unmatched fact rows aggregate under the NULL
    segment; a dim arrival moves them matched-ward through REFRESH."""
    dim = cat.create_table("db1", "dim", DIM, properties=CDF)
    dim.append(spark.createDataFrame([(1, "x")], DIM))
    cat.sql(
        "CREATE MATERIALIZED VIEW db1.lmv AS"
        " SELECT seg, sum(v) AS t, count(*) AS n"
        " FROM db1.fact LEFT JOIN db1.dim USING (k) GROUP BY seg"
    )
    assert _rows(cat.sql("SELECT seg, t, n FROM db1.lmv")) == {
        ("x", 10, 1),
        (None, 25, 2),  # keys 2 and 3 unmatched
    }
    dim.append(spark.createDataFrame([(2, "y"), (3, "x")], DIM))
    cat.sql("REFRESH MATERIALIZED VIEW db1.lmv")
    assert _rows(cat.sql("SELECT seg, t, n FROM db1.lmv")) == {
        ("x", 15, 2),
        ("y", 20, 1),
    }
