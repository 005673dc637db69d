"""Per-file JSON format dispatch in the landing zone.

Spark's JSON source parses a whole landing zone with ONE format setting:
multiLine=true silently truncates an NDJSON file to its first record
(Jackson ignores trailing bytes), multiLine=false corrupts pretty-printed
array files. The auto readers (sources/json_source.py) dispatch per file,
so a zone mixing the reference's array landings
(``notebooks/demo-notebook.py:146``) with log-shipper NDJSON loses nothing.
"""

from __future__ import annotations

import json

import pytest

from incremental_etl_on_lakehouse_spark.pipeline import MedallionPipeline
from incremental_etl_on_lakehouse_spark.sources.json_source import (
    infer_schema_auto,
    read_json_auto_batch,
    read_json_auto_stream,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [StructField("a", LongType()), StructField("b", StringType())]
)


def _batch(spark, path):
    df = read_json_auto_batch(spark, str(path), SCHEMA, corrupt_col="_cr")
    good = [(r["a"], r["b"]) for r in df.collect() if r["_cr"] is None]
    bad = [r["_cr"] for r in df.collect() if r["_cr"] is not None]
    return sorted(good), sorted(bad)


def test_ndjson_file_reads_every_record(spark, tmp_path):
    p = tmp_path / "f.json"
    p.write_text("\n".join(json.dumps({"a": i, "b": f"r{i}"}) for i in range(5)))
    good, bad = _batch(spark, tmp_path)
    assert good == [(i, f"r{i}") for i in range(5)]
    assert bad == []


def test_pretty_array_file(spark, tmp_path):
    (tmp_path / "f.json").write_text(
        json.dumps([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}], indent=1)
    )
    good, bad = _batch(spark, tmp_path)
    assert good == [(1, "x"), (2, "y")] and bad == []


def test_pretty_single_object_file(spark, tmp_path):
    (tmp_path / "f.json").write_text(json.dumps({"a": 9, "b": "solo"}, indent=2))
    good, bad = _batch(spark, tmp_path)
    assert good == [(9, "solo")] and bad == []


def test_mixed_zone_loses_nothing(spark, tmp_path):
    (tmp_path / "arr.json").write_text(json.dumps([{"a": 1, "b": "x"}]))
    (tmp_path / "nd.json").write_text(
        json.dumps({"a": 2, "b": "y"}) + "\n" + json.dumps({"a": 3, "b": "z"})
    )
    good, bad = _batch(spark, tmp_path)
    assert good == [(1, "x"), (2, "y"), (3, "z")] and bad == []


def test_bad_ndjson_line_quarantined_good_lines_kept(spark, tmp_path):
    (tmp_path / "f.json").write_text(
        json.dumps({"a": 1, "b": "x"}) + "\n{broken!!\n" + json.dumps({"a": 2, "b": "y"})
    )
    good, bad = _batch(spark, tmp_path)
    assert good == [(1, "x"), (2, "y")]
    assert bad == ["{broken!!"]


def test_garbage_array_file_whole_file_corrupt(spark, tmp_path):
    (tmp_path / "f.json").write_text("[{not valid json")
    good, bad = _batch(spark, tmp_path)
    assert good == [] and bad == ["[{not valid json"]


def test_empty_file_zero_rows(spark, tmp_path):
    (tmp_path / "f.json").write_text("")
    df = read_json_auto_batch(spark, str(tmp_path), SCHEMA, corrupt_col="_cr")
    assert df.count() == 0


def test_infer_schema_auto_unions_formats(spark, tmp_path):
    # the array file carries column c, the NDJSON file carries column d —
    # single-format inference would miss one of them
    (tmp_path / "arr.json").write_text(json.dumps([{"a": 1, "c": "only-arr"}]))
    (tmp_path / "nd.json").write_text(
        json.dumps({"a": 2, "d": 7}) + "\n" + json.dumps({"a": 3, "d": 8})
    )
    names = set(infer_schema_auto(spark, str(tmp_path)).fieldNames())
    assert {"a", "c", "d"} <= names


def test_stream_paces_one_file_per_trigger(spark, tmp_path):
    land = tmp_path / "land"
    land.mkdir()
    (land / "a.json").write_text(json.dumps([{"a": 1, "b": "x"}]))
    (land / "b.json").write_text(json.dumps({"a": 2, "b": "y"}))
    batches = []
    stream = read_json_auto_stream(spark, str(land), SCHEMA, corrupt_col="_cr")
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _i: batches.append(sorted((r["a"], r["b"]) for r in df.collect()))
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(x for b in batches for x in b) == [(1, "x"), (2, "y")]
    assert len(batches) == 2  # maxFilesPerTrigger=1 honoured by the text source


def test_pipeline_end_to_end_with_ndjson_landing(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    p = MedallionPipeline(spark, str(tmp_path / "lake"), str(landing))
    rec = lambda i, c, n, op, ts: {
        "id": i, "country": c, "district": "D", "visit_timestamp": ts,
        "num_visitors": n, "cdc_operation": op, "cdc_timestamp": ts,
    }
    # NDJSON landing file — two countries, both must reach Gold
    (landing / "f1.json").write_text(
        json.dumps(rec(7, "England", 247, "INSERT", "2023-01-01 10:00:00"))
        + "\n"
        + json.dumps(rec(20, "Scotland", 600, "INSERT", "2023-01-01 10:00:00"))
    )
    p.run_available()
    gold = {r["country"]: r["sum_visitors"] for r in p.gold.to_df().collect()}
    assert gold == {"England": 247, "Scotland": 600}
    # follow-up ARRAY file in the same zone (mixed formats, one pipeline)
    (landing / "f2.json").write_text(
        json.dumps([rec(7, "England", 934, "UPDATE", "2023-01-01 11:00:00")])
    )
    p.run_available()
    gold = {r["country"]: r["sum_visitors"] for r in p.gold.to_df().collect()}
    assert gold == {"England": 934, "Scotland": 600}
    # malformed NDJSON line lands in quarantine, good line still flows
    (landing / "f3.json").write_text(
        "{half a record\n"
        + json.dumps(rec(30, "Wales", 500, "INSERT", "2023-01-02 10:00:00"))
    )
    p.run_available()
    gold = {r["country"]: r["sum_visitors"] for r in p.gold.to_df().collect()}
    assert gold == {"England": 934, "Scotland": 600, "Wales": 500}
    quarantined = [
        r["_corrupt_record"] for r in p.quarantine.to_df().collect()
    ]
    assert quarantined == ["{half a record"]


def test_pipeline_accepts_iso8601_t_timestamps(spark, tmp_path):
    """ISO-8601 'T'-separated timestamps — the spelling most CDC emitters
    produce — must ingest to Bronze, not quarantine. Before round 9 the
    pipeline's timestampFormat only accepted the demo's space-separated
    spelling, so an all-ISO NDJSON batch quarantined wholesale (no silent
    loss, but no ingest either). Mixed spellings in ONE file must also
    work: the format dispatch is per-record, not per-file."""
    landing = tmp_path / "landing"
    landing.mkdir()
    p = MedallionPipeline(spark, str(tmp_path / "lake"), str(landing))
    rec = lambda i, c, n, op, ts: {
        "id": i, "country": c, "district": "D", "visit_timestamp": ts,
        "num_visitors": n, "cdc_operation": op, "cdc_timestamp": ts,
    }
    (landing / "f1.json").write_text(
        json.dumps(rec(1, "England", 100, "INSERT", "2023-01-01T10:00:00"))
        + "\n"
        + json.dumps(rec(2, "Wales", 50, "INSERT", "2023-01-01 10:00:00"))
        + "\n"
        + json.dumps(rec(3, "Scotland", 75, "INSERT", "2023-01-01T10:00:00Z"))
    )
    p.run_available()
    gold = {r["country"]: r["sum_visitors"] for r in p.gold.to_df().collect()}
    assert gold == {"England": 100, "Wales": 50, "Scotland": 75}
    assert p.quarantine.to_df().count() == 0
