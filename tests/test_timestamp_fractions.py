"""Fractional-second ingest + NULL-safe order guards.

The reference's own sample landing data carries MICROSECOND cdc_timestamps
(``data/db_cdc_log_demo_sample.json:10`` — ``"2023-01-08 21:32:22.987432"``).
Before round 12 the ingest's timestampFormat only accepted ``[.SSS]``, so
every such value parsed to NULL — and a NULL ordering column made the Silver
merge's lexicographic order guard unfireable, silently freezing the key's
snapshot row on its first value forever. These tests pin both layers:

1. the format ladder parses 1/3/6/9-digit fractions, 'T'/space, offsets;
2. ``lex_greater_sql`` falls through NULL guard columns to the tiebreak
   column instead of evaluating to NULL (NULL ordered smallest, matching
   ``dedup_latest``'s desc_nulls_last);
3. the end-to-end pipeline applies a cross-batch UPDATE whose timestamps
   use the reference sample's exact microsecond spelling.
"""

from __future__ import annotations

import datetime
import json

from incremental_etl_on_lakehouse_spark.operators.cdc import lex_greater_sql
from incremental_etl_on_lakehouse_spark.pipeline import MedallionPipeline
from incremental_etl_on_lakehouse_spark.sources.json_source import (
    CDC_TIMESTAMP_FORMAT,
    read_json_batch,
)
from pyspark.sql.types import StructField, StructType, TimestampType

_TS_SCHEMA = StructType([StructField("ts", TimestampType())])


def _parse(spark, tmp_path, values):
    p = tmp_path / "ts.json"
    p.write_text("\n".join(json.dumps({"ts": v}) for v in values))
    df = read_json_batch(spark, str(p), _TS_SCHEMA, multiline=False)
    return [r["ts"] for r in df.collect()]


def test_fraction_ladder_parses_micro_milli_nano(spark, tmp_path):
    got = _parse(
        spark,
        tmp_path,
        [
            "2023-01-08 21:32:22.987432",  # the reference sample's spelling
            "2023-01-08 21:32:22.987",
            "2023-01-08 21:32:22.9",
            "2023-01-08 21:32:22",
            "2023-01-08T21:32:22.123456789",
        ],
    )
    assert None not in got
    assert got[0].microsecond == 987432
    assert got[1].microsecond == 987000
    assert got[2].microsecond == 900000
    assert got[3].microsecond == 0
    assert got[4].microsecond == 123456  # nanos truncate, never null


def test_fraction_ladder_keeps_offset_support(spark, tmp_path):
    got = _parse(
        spark,
        tmp_path,
        ["2023-01-08 21:32:22.987432+02:00", "2023-01-08T21:32:22.987Z"],
    )
    assert None not in got
    # +02:00 normalizes to UTC (session tz): 19:32 wall
    assert (got[0].hour, got[0].microsecond) == (19, 987432)


def test_constant_carries_full_fraction_ladder():
    assert ".SSSSSS" in CDC_TIMESTAMP_FORMAT


def _guard_fires(spark, src_ts, src_tb, tgt_ts, tgt_tb):
    rows = [
        datetime.datetime(2023, 1, 8, 21, 0, s) if isinstance(s, int) else s
        for s in (src_ts, src_tb, tgt_ts, tgt_tb)
    ]
    df = spark.createDataFrame(
        [tuple(rows)],
        StructType(
            [
                StructField("s_o", TimestampType()),
                StructField("s_t", TimestampType()),
                StructField("t_o", TimestampType()),
                StructField("t_t", TimestampType()),
            ]
        ),
    )
    sql = (
        lex_greater_sql(["o", "t"])
        .replace("source.`o`", "s_o")
        .replace("source.`t`", "s_t")
        .replace("target.`o`", "t_o")
        .replace("target.`t`", "t_t")
    )
    return df.selectExpr(f"coalesce({sql}, false) AS fire").first()["fire"]


def test_lex_guard_null_order_falls_through_to_tiebreak(spark):
    # order col NULL on both sides -> tiebreak decides
    assert _guard_fires(spark, None, 20, None, 10) is True
    assert _guard_fires(spark, None, 10, None, 20) is False
    assert _guard_fires(spark, None, 10, None, 10) is False  # identical redelivery


def test_lex_guard_null_orders_smallest(spark):
    # non-NULL source beats NULL target; NULL source never beats non-NULL
    assert _guard_fires(spark, 5, 10, None, 20) is True
    assert _guard_fires(spark, None, 20, 5, 10) is False
    # plain ordering still strict
    assert _guard_fires(spark, 6, 10, 5, 20) is True
    assert _guard_fires(spark, 5, 20, 5, 20) is False


def _rec(i, country, nv, op, ts):
    return {
        "id": i,
        "country": country,
        "district": f"District_{abs(i) % 10}",
        "visit_timestamp": "2023-01-08 11:02:17",
        "num_visitors": nv,
        "cdc_operation": op,
        "cdc_timestamp": ts,
    }


def test_pipeline_applies_update_with_microsecond_cdc_timestamps(
    spark, tmp_path
):
    root = tmp_path / "pipe"
    landing = tmp_path / "landing"
    landing.mkdir()
    p = MedallionPipeline(spark, str(root), str(landing))
    b1 = [
        _rec(7, "England", 247, "INSERT", "2023-01-08 21:32:22.987432"),
        _rec(7, "England", 934, "UPDATE", "2023-01-08 21:32:27.756295"),
    ]
    (landing / "b1.json").write_text(json.dumps(b1))
    p.run_available()
    silver = {r["id"]: r for r in p.silver.to_df().collect()}
    assert silver[7]["num_visitors"] == 934
    assert silver[7]["cdc_timestamp"] is not None  # the round-12 bug: NULL
    # the cross-batch UPDATE must apply (frozen forever before the fix)
    b2 = [_rec(7, "England", 10934, "UPDATE", "2023-01-08 21:32:31.000005")]
    (landing / "b2.json").write_text(json.dumps(b2))
    p.run_available()
    assert {
        r["id"]: r["num_visitors"] for r in p.silver.to_df().collect()
    } == {7: 10934}
    gold = {r["country"]: r["sum_visitors"] for r in p.gold.to_df().collect()}
    assert gold == {"England": 10934}
