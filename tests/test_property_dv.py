"""Differential property test: a deletion-vector table and a rewrite table
driven through IDENTICAL random operation sequences must agree on every
snapshot, every time-travel version, and the full change feed. This pins
the DV read path (anti-join masking), cumulative vectors, update staging,
restore reconciliation, and compaction against the long-standing rewrite
semantics as the oracle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake import LakeTable

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("grp", StringType()),
        StructField("val", LongType()),
    ]
)


def snap(t, version=None):
    return sorted(tuple(r) for r in t.to_df(version=version).collect())


def feed(t):
    df = t.read_changes(starting_version=0)
    return sorted(
        (r["id"], r["grp"], r["val"], r["_change_type"], r["_commit_version"])
        for r in df.collect()
    )


@pytest.mark.parametrize("seed", [7, 23])
def test_dv_vs_rewrite_random_sequences(spark, tmp_path, seed):
    rng = random.Random(seed)
    tables = {}
    for kind, dv in (("dv", "true"), ("rw", "false")):
        tables[kind] = LakeTable.create(
            spark,
            str(tmp_path / kind),
            SCHEMA,
            properties={
                "enableChangeDataFeed": "true",
                "enableDeletionVectors": dv,
            },
        )
    next_id = 0
    for step in range(8):
        op = rng.choice(["append", "append", "delete", "update", "restore", "compact"])
        if op == "append":
            n = rng.randint(1, 6)
            rows = [
                (next_id + i, rng.choice("abc"), rng.randint(0, 50))
                for i in range(n)
            ]
            next_id += n
            for t in tables.values():
                t.append(spark.createDataFrame(rows, SCHEMA).coalesce(rng.choice([1, 2])))
        elif op == "delete":
            cond = rng.choice(
                [f"val < {rng.randint(5, 25)}", f"grp = '{rng.choice('abc')}'", "id % 3 = 0"]
            )
            for t in tables.values():
                t.delete(cond)
        elif op == "update":
            cond = rng.choice([f"val > {rng.randint(20, 40)}", f"grp = '{rng.choice('abc')}'"])
            for t in tables.values():
                t.update({"val": "val + 100"}, cond)
        elif op == "restore":
            v = tables["dv"].version()
            if v >= 2:
                back = rng.randint(1, v - 1)
                for t in tables.values():
                    t.restore(back)
        else:
            for t in tables.values():
                t.compact()
        assert snap(tables["dv"]) == snap(tables["rw"]), f"step {step} ({op})"
    # versions advanced in lockstep; every historical snapshot agrees
    assert tables["dv"].version() == tables["rw"].version()
    for v in range(tables["dv"].version() + 1):
        assert snap(tables["dv"], v) == snap(tables["rw"], v), f"version {v}"
    # the change feeds tell the same row-level story
    assert feed(tables["dv"]) == feed(tables["rw"])
