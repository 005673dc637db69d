"""Structured Streaming windowed aggregation, watermark, and streaming dedup."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from incremental_etl_on_lakehouse_spark.sources.json_source import read_json_stream
from incremental_etl_on_lakehouse_spark.streaming import (
    dedup_stream,
    run_to_memory,
    windowed_agg,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("ts", TimestampType()),
        StructField("kind", StringType()),
        StructField("v", LongType()),
    ]
)


def write_events_file(path, rows):
    with open(path, "w") as f:
        for (id_, ts, kind, v) in rows:
            f.write(json.dumps({"id": id_, "ts": ts, "kind": kind, "v": v}) + "\n")


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    write_events_file(
        d / "f1.json",
        [
            (1, "2024-01-01 00:01:00", "a", 10),
            (2, "2024-01-01 00:04:00", "a", 20),
            (3, "2024-01-01 00:07:00", "b", 30),
            (3, "2024-01-01 00:07:00", "b", 30),  # duplicate id
            (4, "2024-01-01 01:00:00", "a", 40),  # advances watermark past 00:xx
        ],
    )
    return str(d)


def test_windowed_agg_tumbling(spark, landing, tmp_path):
    stream = read_json_stream(spark, landing, SCHEMA, multiline=False)
    out = windowed_agg(
        stream,
        "ts",
        "5 minutes",
        [F.sum("v").alias("sum_v"), F.count("*").alias("n")],
        group_cols=["kind"],
        watermark="10 minutes",
    )
    got = run_to_memory(out, str(tmp_path / "ck1"))
    rows = {
        (r["window_start"].strftime("%H:%M"), r["kind"]): (r["sum_v"], r["n"])
        for r in got.collect()
    }
    # append mode only emits windows the watermark has passed: the 01:00
    # event holds its own window open, earlier windows close
    assert rows == {
        ("00:00", "a"): (30, 2),
        ("00:05", "b"): (60, 2),
    }


def test_streaming_dedup_within_watermark(spark, landing, tmp_path):
    stream = read_json_stream(spark, landing, SCHEMA, multiline=False)
    out = dedup_stream(stream, ["id"], "ts", watermark="30 minutes")
    got = run_to_memory(out, str(tmp_path / "ck2"))
    ids = sorted(r["id"] for r in got.collect())
    assert ids == [1, 2, 3, 4]


def test_windowed_agg_sliding(spark, landing, tmp_path):
    stream = read_json_stream(spark, landing, SCHEMA, multiline=False)
    out = windowed_agg(
        stream,
        "ts",
        "10 minutes",
        [F.count("*").alias("n")],
        slide_duration="5 minutes",
        watermark="5 minutes",
    )
    got = run_to_memory(out, str(tmp_path / "ck3"))
    rows = {r["window_start"].strftime("%H:%M"): r["n"] for r in got.collect()}
    # each event lands in two sliding windows (dup id=3 counts twice here —
    # dedup is a separate operator); closed windows only
    assert rows == {"23:55": 2, "00:00": 4, "00:05": 2}


def test_stateful_top2_tws_guarded(spark, tmp_path):
    """Spark 4 transformWithStateInPandas variant — its driver worker
    imports google.protobuf, absent in minimal environments; the helper
    fails fast with ImportError instead of crashing mid-stream."""
    import pytest as _pytest

    from incremental_etl_on_lakehouse_spark.streaming import stateful_top2_tws

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with _pytest.raises(ImportError):
            stateful_top2_tws(spark.readStream.format("rate").load())
        return
    import json

    land = tmp_path / "land"
    land.mkdir()
    (land / "a.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "cents": 10},
                {"user_id": 1, "cents": 30},
                {"user_id": 2, "cents": 5},
            ]
        )
    )
    stream = (
        spark.readStream.schema("user_id bigint, cents bigint")
        .json(str(land))
    )
    out = stateful_top2_tws(stream)
    rows = []
    (
        out.writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {r["user_id"]: (r["top1"], r["top2"]) for r in rows}
    assert got == {1: (30, 10), 2: (5, None)}
