"""Ingest-pacing knobs: maxBytesPerTrigger + trigger(availableNow).

Round-11 verdict item 6 — the one Autoloader pacing knob not yet
mirrored (``cloudFiles.maxBytesPerTrigger``; the reference uses the
files flavor at ``notebooks/demo-notebook.py:161``). Pins, under BOTH
knobs, that trigger(availableNow) honors the limit across all catch-up
batches and that batch boundaries always fall on whole files/commits —
on the JSON sources (Spark's own file-source implementation, probed:
greedy soft maximum, at least one file per batch, the two options
mutually exclusive) and on the lake commit stream (our implementation
of the same contract).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.types import LongType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.lake.streaming import LakeStreamReader
from incremental_etl_on_lakehouse_spark.sources.json_source import (
    read_json_auto_stream,
    read_json_stream,
)

SCHEMA = StructType([StructField("id", LongType())])


def _land(tmp_path, n_files: int, rows_per_file: int = 1) -> tuple[str, int]:
    """n equal-size NDJSON files; returns (dir, per-file size)."""
    d = str(tmp_path / "land")
    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        with open(os.path.join(d, f"f{i}.json"), "w") as f:
            for j in range(rows_per_file):
                # 4-digit ids => identical byte length in every file
                f.write(json.dumps({"id": (i + 1) * 1000 + j}) + "\n")
    return d, os.path.getsize(os.path.join(d, "f0.json"))


def _run(stream, ck: str) -> list[int]:
    """availableNow drain; returns non-empty batch row counts in order."""
    batches: list[int] = []

    def fn(df, _bid):
        n = df.count()
        if n:
            batches.append(n)

    (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return batches


@pytest.mark.parametrize("files_per_batch", [1, 2])
def test_json_stream_max_bytes_whole_file_batches(
    spark, tmp_path, files_per_batch
):
    """Byte budget of N equal files -> ceil(4/N) batches of whole files,
    honored across every availableNow catch-up batch."""
    d, size = _land(tmp_path, 4, rows_per_file=3)
    batches = _run(
        read_json_stream(
            spark,
            d,
            SCHEMA,
            multiline=False,
            max_bytes_per_trigger=files_per_batch * size,
        ),
        str(tmp_path / "ck"),
    )
    assert len(batches) == -(-4 // files_per_batch)
    # whole-file boundaries: every batch is a multiple of rows-per-file
    assert all(b % 3 == 0 for b in batches)
    assert sum(batches) == 12


def test_json_stream_byte_budget_is_soft_minimum_one_file(spark, tmp_path):
    """A budget smaller than any single file still makes progress: at
    least one whole file per batch (Spark's soft-maximum semantics)."""
    d, size = _land(tmp_path, 3)
    batches = _run(
        read_json_stream(
            spark, d, SCHEMA, multiline=False, max_bytes_per_trigger=size // 2
        ),
        str(tmp_path / "ck"),
    )
    assert batches == [1, 1, 1]


def test_json_stream_both_knobs_rejected(spark, tmp_path):
    d, size = _land(tmp_path, 1)
    with pytest.raises(ValueError, match="both"):
        read_json_stream(
            spark,
            d,
            SCHEMA,
            max_files_per_trigger=1,
            max_bytes_per_trigger=size,
        )


def test_json_auto_stream_max_bytes_keeps_per_file_dispatch(spark, tmp_path):
    """Byte pacing on the auto reader: array and NDJSON files still parse
    per-file while batching by byte budget."""
    d = str(tmp_path / "land")
    os.makedirs(d)
    with open(os.path.join(d, "a_array.json"), "w") as f:
        f.write(json.dumps([{"id": 1}, {"id": 2}]))
    with open(os.path.join(d, "b_nd.json"), "w") as f:
        f.write('{"id": 3}\n{"id": 4}\n')
    stream = read_json_auto_stream(
        spark, d, SCHEMA, max_bytes_per_trigger=1  # force 1 file per batch
    )
    batches = _run(stream, str(tmp_path / "ck"))
    assert batches == [2, 2]  # both records of each file, one file per batch


def test_lake_stream_max_bytes_coalesces_commits(spark, tmp_path):
    """The lake commit stream's byte budget: equal-size append commits
    coalesce greedily to whole-commit windows — 4 commits under a
    2-commit budget -> 2 batches; a budget below any commit -> one
    commit per batch (soft minimum)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    for i in range(4):
        t.append(spark.createDataFrame([(i,)], SCHEMA).coalesce(1))
    per_commit = LakeStreamReader(
        t, str(tmp_path / "ckp.json"), mode="append", starting_version=1
    )._commit_bytes(t._commits()[1])
    assert per_commit > 0

    seen: list[tuple[int, int]] = []  # (last_version, n_rows)
    reader = LakeStreamReader(
        t,
        str(tmp_path / "ck.json"),
        mode="append",
        starting_version=1,
        max_bytes_per_trigger=2 * per_commit,
    )
    n = reader.process_available(lambda df, v: seen.append((v, df.count())))
    assert n == 2
    assert [v for v, _ in seen] == [2, 4]
    assert [r for _, r in seen] == [2, 2]

    tiny: list[int] = []
    reader2 = LakeStreamReader(
        t,
        str(tmp_path / "ck2.json"),
        mode="append",
        starting_version=1,
        max_bytes_per_trigger=1,
    )
    assert reader2.process_available(lambda df, v: tiny.append(df.count())) == 4
    assert tiny == [1, 1, 1, 1]


@pytest.mark.parametrize("seed", range(3))
def test_lake_stream_byte_pacing_fuzz(spark, tmp_path, seed):
    """Property fuzz of the byte-budget commit windows: random commit
    sizes + a random budget must yield windows that (a) never split a
    commit, (b) are GREEDY-maximal (adding the next commit would exceed
    the budget, except at the head), (c) only exceed the budget when a
    single commit alone does, (d) deliver every appended row exactly
    once, and (e) survive an interrupt/resume from the checkpoint
    mid-drain."""
    import random

    from pyspark.sql.types import LongType, StructField, StructType

    rng = random.Random(11_700 + seed)
    schema = StructType([StructField("id", LongType())])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema)
    next_id = 0
    rows_per_commit: list[int] = []
    for _ in range(rng.randint(5, 9)):
        k = rng.randint(1, 20)
        t.append(
            spark.createDataFrame(
                [(next_id + j,) for j in range(k)], schema
            ).coalesce(1)
        )
        rows_per_commit.append(k)
        next_id += k

    probe = LakeStreamReader(t, str(tmp_path / "probe.json"), mode="append")
    commits = {c.version: c for c in t._commits()}
    # versions from the reader's starting_version on (0 is CREATE)
    bytes_of = {
        v: probe._commit_bytes(commits[v]) for v in commits if v >= 1
    }
    budget = rng.randint(1, int(sum(bytes_of.values()) * 0.7) + 1)

    windows: list[tuple[int, int]] = []  # (hi_version, n_rows)
    seen_rows: list[int] = []
    reader = LakeStreamReader(
        t,
        str(tmp_path / "ck.json"),
        mode="append",
        starting_version=1,
        max_bytes_per_trigger=budget,
    )

    def fn(df, hi):
        rows = [r.id for r in df.collect()]
        windows.append((hi, len(rows)))
        seen_rows.extend(rows)

    # interrupt/resume: a first reader drains exactly 2 windows (the
    # interrupt fires BEFORE the 3rd window is processed, so its offset
    # is never checkpointed and the resume redelivers it cleanly — the
    # at-least-once boundary), then a FRESH reader on the same checkpoint
    # finishes the backlog
    first = LakeStreamReader(
        t,
        str(tmp_path / "ck.json"),
        mode="append",
        starting_version=1,
        max_bytes_per_trigger=budget,
    )
    done = {"n": 0}

    class _Stop(Exception):
        pass

    def fn_interrupt(df, hi):
        if done["n"] == 2:
            raise _Stop()
        fn(df, hi)
        done["n"] += 1

    try:
        first.process_available(fn_interrupt)
    except _Stop:
        pass
    reader.process_available(fn)  # same checkpoint file: resumes

    # (d) exactly-once delivery of every appended row
    assert sorted(seen_rows) == list(range(next_id)), (seed, budget)
    # (a)+(b)+(c): reconstruct the expected greedy windows and compare
    expected = _expected_windows(bytes_of, budget)
    assert [hi for hi, _n in windows] == expected, (
        seed, budget, windows, expected, bytes_of,
    )


def _expected_windows(bytes_of: dict[int, int], budget: int) -> list[int]:
    """Greedy whole-commit windows (the Spark file-source contract):
    returns the window-end versions."""
    versions = sorted(bytes_of)
    out = []
    i = 0
    while i < len(versions):
        used = bytes_of[versions[i]]
        j = i
        while j + 1 < len(versions) and used + bytes_of[versions[j + 1]] <= budget:
            used += bytes_of[versions[j + 1]]
            j += 1
        out.append(versions[j])
        i = j + 1
    return out


def test_lake_stream_both_knobs_rejected(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    with pytest.raises(ValueError, match="both"):
        LakeStreamReader(
            t,
            str(tmp_path / "ck.json"),
            max_versions_per_trigger=2,
            max_bytes_per_trigger=100,
        )


def test_lake_stream_cdf_max_bytes(spark, tmp_path):
    """Byte pacing in cdf mode counts the CDF sidecar payload."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        properties={"enableChangeDataFeed": "true"},
    )
    for i in range(3):
        t.append(spark.createDataFrame([(i,)], SCHEMA).coalesce(1))
    got: list[int] = []
    reader = LakeStreamReader(
        t,
        str(tmp_path / "ck.json"),
        mode="cdf",
        starting_version=1,
        max_bytes_per_trigger=1,  # below any commit: one commit per batch
    )
    assert reader.process_available(lambda df, v: got.append(df.count())) == 3
    assert got == [1, 1, 1]
