"""Property-based tests for CDC merge semantics (hypothesis).

Model: a random sequence of CDC records (key, ts, value, op). The expected
snapshot is computed by a 10-line Python model (latest record per key by
(ts, seq); absent if it's a DELETE). The engine must reproduce it:

- `merge_cdc_batch` over time-ordered batches (the reference's delivery
  assumption),
- `merge_cdc_batch_tombstone` over ARBITRARILY ordered batches (the engine
  extension), including duplicated batches.
"""

from __future__ import annotations

import os
import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from incremental_etl_on_lakehouse_spark.lake import LakeTable
from incremental_etl_on_lakehouse_spark.operators.cdc import (
    live_view,
    merge_cdc_batch,
    merge_cdc_batch_tombstone,
)

RECORD = st.tuples(
    st.integers(min_value=0, max_value=5),  # key
    st.integers(min_value=0, max_value=50),  # ts
    st.integers(min_value=0, max_value=999),  # value
    st.sampled_from(["UPDATE", "UPDATE", "UPDATE", "DELETE"]),
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("ts", LongType()),
        StructField("seq", LongType()),
        StructField("value", LongType()),
        StructField("data_hash", StringType()),
        StructField("cdc_operation", StringType()),
    ]
)


def expected_state(records):
    """records: list of (key, ts, value, op) in sequence order."""
    latest = {}
    for seq, (k, ts, v, op) in enumerate(records):
        cur = latest.get(k)
        if cur is None or (ts, seq) > (cur[0], cur[1]):
            latest[k] = (ts, seq, v, op)
    return {
        k: (ts, v)
        for k, (ts, seq, v, op) in latest.items()
        if op != "DELETE"
    }


def to_df(spark, records, seq_offset=0):
    rows = [
        (k, ts, seq_offset + i, v, f"h-{k}-{ts}-{v}-{op}", op)
        for i, (k, ts, v, op) in enumerate(records)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def order_key_df(df):
    # encode (ts, seq) as a single guard column: ts * 10^6 + seq
    return df.withColumn("ord", (F.col("ts") * 1000000 + F.col("seq")).cast("long"))


ORD_SCHEMA = StructType(SCHEMA.fields + [StructField("ord", LongType())])


@pytest.mark.parametrize("salts", [None, 4])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(records=st.lists(RECORD, min_size=1, max_size=30), n_batches=st.integers(1, 3))
def test_inorder_merge_matches_model(
    spark, tmp_path_factory, records, n_batches, salts
):
    """salts=4 runs the identical property through the skew-salted dedup
    path (round 11) — the 6-key domain makes every batch hot-key-heavy, so
    the two-phase argmax is exercised on real collisions."""
    path = str(tmp_path_factory.mktemp("prop") / uuid.uuid4().hex)
    table = LakeTable.create(spark, path, ORD_SCHEMA)
    # time-ordered batches: sort by (ts, seq), then split contiguously
    ordered = sorted(enumerate(records), key=lambda p: (p[1][1], p[0]))
    chunk = max(1, len(ordered) // n_batches)
    batches = [ordered[i : i + chunk] for i in range(0, len(ordered), chunk)]
    for batch in batches:
        rows = [
            (k, ts, seq, v, f"h-{k}-{ts}-{v}-{op}", op)
            for seq, (k, ts, v, op) in batch
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        merge_cdc_batch(
            table,
            order_key_df(df),
            key_cols=["id"],
            order_cols=["ts", "seq"],
            order_guard_col="ord",
            dedup_skew_salts=salts,
        )
    got = {
        r["id"]: (r["ts"], r["value"]) for r in table.to_df().collect()
    }
    assert got == expected_state(records)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    records=st.lists(RECORD, min_size=1, max_size=24),
    perm_seed=st.integers(0, 1000),
)
def test_tombstone_merge_converges_any_order(spark, tmp_path_factory, records, perm_seed):
    import random

    path = str(tmp_path_factory.mktemp("prop") / uuid.uuid4().hex)
    table = LakeTable.create(
        spark, path, StructType(ORD_SCHEMA.fields + [StructField("_deleted", BooleanType())])
    )
    indexed = list(enumerate(records))
    rnd = random.Random(perm_seed)
    rnd.shuffle(indexed)
    # arbitrary batching of the shuffled sequence + one duplicated batch
    batches = [indexed[i : i + 8] for i in range(0, len(indexed), 8)]
    if batches:
        batches.append(batches[0])  # re-delivery
    for batch in batches:
        rows = [
            (k, ts, seq, v, f"h-{k}-{ts}-{v}-{op}", op)
            for seq, (k, ts, v, op) in batch
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        merge_cdc_batch_tombstone(
            table,
            order_key_df(df),
            key_cols=["id"],
            order_cols=["ts", "seq"],
            order_guard_col="ord",
        )
    got = {
        r["id"]: (r["ts"], r["value"]) for r in live_view(table).collect()
    }
    assert got == expected_state(records)


# ---------------------------------------------------------------------------
# SCD Type-2 history merge vs a pure-Python model
# ---------------------------------------------------------------------------

SCD2_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("attr", LongType()),
        StructField("ord", LongType()),
        StructField("data_hash", StringType()),
        StructField("__start_ts", LongType()),
        StructField("__end_ts", LongType()),
        StructField("__is_current", BooleanType()),
    ]
)


def scd2_expected(batches):
    """batches: lists of (key, ord, attr) applied in order, each batch
    already deduped to latest-per-key. Returns the full history set."""
    closed, current = [], {}  # current: key -> (attr, start)
    for batch in batches:
        latest = {}
        for k, o, a in batch:
            if k not in latest or o > latest[k][0]:
                latest[k] = (o, a)
        for k, (o, a) in sorted(latest.items()):
            cur = current.get(k)
            if cur is None:
                current[k] = (a, o)
            elif cur[0] != a:
                closed.append((k, cur[0], cur[1], o, False))
                current[k] = (a, o)
    return set(closed) | {
        (k, a, s, None, True) for k, (a, s) in current.items()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    records=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # key
            st.integers(min_value=0, max_value=50),  # ts
            st.integers(min_value=0, max_value=3),   # attr (small: real no-ops)
        ),
        min_size=1,
        max_size=24,
    ),
    n_batches=st.integers(1, 3),
)
def test_scd2_merge_matches_model(spark, tmp_path_factory, records, n_batches):
    from incremental_etl_on_lakehouse_spark.operators.cdc import scd2_merge

    path = str(tmp_path_factory.mktemp("prop") / uuid.uuid4().hex)
    table = LakeTable.create(spark, path, SCD2_SCHEMA)
    # in-order delivery: sort by (ts, seq), split contiguously; ord encodes
    # the total order so later batches carry strictly larger stamps
    ordered = sorted(enumerate(records), key=lambda p: (p[1][1], p[0]))
    chunk = max(1, len(ordered) // n_batches)
    chunks = [ordered[i : i + chunk] for i in range(0, len(ordered), chunk)]
    model_batches = []
    for batch in chunks:
        rows = [
            (k, a, ts * 1000000 + seq, f"h-{a}")
            for seq, (k, ts, a) in batch
        ]
        df = spark.createDataFrame(rows, "id long, attr long, ord long, data_hash string")
        scd2_merge(table, df, key_cols=["id"], ts_col="ord")
        model_batches.append([(k, ts * 1000000 + seq, a) for seq, (k, ts, a) in batch])
    got = {
        (r["id"], r["attr"], r["__start_ts"], r["__end_ts"], r["__is_current"])
        for r in table.to_df().collect()
    }
    assert got == scd2_expected(model_batches)


def test_gold_catchup_coalescing_equivalence(spark, tmp_path):
    """Round-8 semantic pin: maintaining an additive gold aggregate from
    the change feed with per-commit pacing (max_versions_per_trigger=1)
    and with catch-up coalescing (=64) must converge to the SAME state —
    signed deltas are additive across commits. Exercised over seeded
    random multi-batch CDC sequences with inserts, updates, and deletes."""
    import random as _random

    from incremental_etl_on_lakehouse_spark.lake.streaming import (
        LakeStreamReader,
    )
    from incremental_etl_on_lakehouse_spark.operators.cdc import (
        cdf_signed_deltas,
        merge_agg_delta,
    )
    from pyspark.sql.types import StructType as _ST, StructField as _SF

    gold_schema = _ST(
        [_SF("grp", StringType()), _SF("total", LongType())]
    )

    for seed in range(3):
        rng = _random.Random(900 + seed)
        # silver with CDF: 3-5 random batches over 6 keys / 2 groups
        silver = LakeTable.create(
            spark,
            str(tmp_path / f"silver_{seed}"),
            StructType(
                [
                    StructField("id", LongType()),
                    StructField("grp", StringType()),
                    StructField("value", LongType()),
                    StructField("data_hash", StringType()),
                    StructField("cdc_operation", StringType()),
                    StructField("ts", LongType()),
                    StructField("seq", LongType()),
                ]
            ),
            properties={"enableChangeDataFeed": "true"},
        )
        seq = 0
        for _b in range(rng.randint(3, 5)):
            rows = []
            for _ in range(rng.randint(2, 8)):
                k = rng.randint(0, 5)
                op = rng.choice(["UPDATE", "UPDATE", "UPDATE", "DELETE"])
                v = rng.randint(0, 99)
                rows.append(
                    (k, f"g{k % 2}", v, f"h{seq}", op, seq, seq)
                )
                seq += 1
            batch = spark.createDataFrame(rows, silver.schema())
            merge_cdc_batch(
                silver, batch, key_cols=["id"], order_cols=["ts"],
                tiebreak_cols=["seq"], order_guard_col="ts",
            )

        states = {}
        for trigger, tag in ((1, "paced"), (64, "coalesced")):
            gold = LakeTable.create(
                spark, str(tmp_path / f"gold_{seed}_{tag}"), gold_schema
            )
            reader = LakeStreamReader(
                silver,
                str(tmp_path / f"ck_{seed}_{tag}.json"),
                mode="cdf",
                starting_version=1,
                max_versions_per_trigger=trigger,
            )

            def apply(changes, _v, gold=gold):
                deltas = cdf_signed_deltas(
                    changes, group_cols=["grp"], value_col="value"
                )
                merge_agg_delta(
                    gold, deltas, group_cols=["grp"], agg_col="total"
                )

            reader.process_available(apply)
            states[tag] = {
                r["grp"]: r["total"]
                for r in gold.to_df().where(F.col("total") != 0).collect()
            }
        assert states["paced"] == states["coalesced"], (seed, states)
        # and both equal the full recompute over the final silver state
        full = {
            r["grp"]: r["total"]
            for r in silver.to_df()
            .groupBy("grp")
            .agg(F.sum("value").alias("total"))
            .where(F.col("total") != 0)
            .collect()
        }
        assert states["paced"] == full, (seed, states["paced"], full)
