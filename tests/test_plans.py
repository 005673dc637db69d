"""Plan-shape regression tests: pushdown, pruning, broadcast, shuffle counts.

These encode the 100 TB design contract: a filter that stops reaching the
parquet scan or a dimension join that stops broadcasting is a correctness
bug for the performance model, even though results stay right.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from incremental_etl_on_lakehouse_spark import plans
from incremental_etl_on_lakehouse_spark.queries import QUERIES
from incremental_etl_on_lakehouse_spark.tables import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    df = li.where(F.col("l_returnflag") == "N").select("l_orderkey")
    assert plans.has_pushed_filters(df, "l_returnflag"), plans.formatted_plan(df)


def test_column_pruning(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    df = li.select("l_orderkey", "l_quantity")
    cols = plans.read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_small_dim_join_broadcasts(spark, sf_dir):
    df = QUERIES["agg_sum_groupby"](spark, sf_dir)
    assert plans.uses_broadcast_join(df), plans.formatted_plan(df)


def test_q1_single_shuffle(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    # one aggregation: exactly one exchange (partial agg -> final agg)
    assert plans.shuffle_count(df) == 1, plans.formatted_plan(df)


def test_topk_uses_take_ordered(spark, sf_dir):
    df = QUERIES["q_top_customers"](spark, sf_dir)
    assert "TakeOrderedAndProject" in plans.formatted_plan(df)


def test_whole_stage_codegen_active(spark, sf_dir):
    # AQE's placeholder plan hides codegen subtrees until execution, so
    # inspect the statically-planned query
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES["q1_pricing_summary"](spark, sf_dir)
        assert plans.codegen_stage_count(df) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
