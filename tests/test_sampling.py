"""Unit tests for deterministic sampling / sequence packing
(operators/sampling.py): reproducibility and packing invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_etl_on_lakehouse_spark.operators.sampling import (
    hash_sample,
    pack_sequences,
    stratified_hash_sample,
)
from incremental_etl_on_lakehouse_spark.operators.text import token_count_ws
from incremental_etl_on_lakehouse_spark.tables import load_table


def test_hash_sample_deterministic_and_in_bounds(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    a = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect())
    # identical under a different partitioning (df.sample would differ)
    b = sorted(
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), "doc_id", 0.3).collect()
    )
    assert a == b and len(a) > 0
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # ~binomial(n, .3), generous bounds
    # monotone: a smaller fraction selects a subset
    c = set(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect())
    assert c <= set(a)


def test_stratified_fractions_respected(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    out = stratified_hash_sample(docs, "doc_id", "source", {"src0": 1.0, "src1": 0.0})
    got = {r["source"] for r in out.select("source").distinct().collect()}
    assert got == {"src0"}
    n_src0 = docs.where(F.col("source") == "src0").count()
    assert out.count() == n_src0  # fraction 1.0 keeps everything


def test_pack_sequences_invariants(spark, sf_dir):
    budget = 2048
    docs = load_table(spark, "documents", sf_dir)
    sized = docs.select(
        "doc_id", "source", token_count_ws(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(
        sized, "n_tokens", ["doc_id"], budget=budget, partition_cols=["source"]
    )
    rows = packed.orderBy("source", "doc_id").collect()
    # replay per partition: shards are contiguous, start at 0, and a shard's
    # token total only exceeds the budget by less than its last document
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        assert rs[0]["shard"] == 0
        cum = 0
        for prev, cur in zip(rs, rs[1:]):
            assert cur["shard"] in (prev["shard"], prev["shard"] + 1)
        # recompute expected shard ids from scratch
        cum = 0
        for r in rs:
            assert r["shard"] == cum // budget, (src, r)
            cum += r["n_tokens"]


def test_global_pack_equals_single_reducer_reference(spark, sf_dir):
    """The distributed prefix-sum global packing (range partition +
    per-partition window + broadcast offsets) must equal the naive global
    window bit-for-bit when order keys are unique."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.length("text").alias("n")
    ).repartition(5)
    got = pack_sequences(docs, "n", ["doc_id"], budget=2000)
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = docs.withColumn(
        "shard", F.floor((F.sum("n").over(w) - F.col("n")) / 2000).cast("long")
    )
    a = sorted((r.doc_id, r.shard) for r in got.collect())
    b = sorted((r.doc_id, r.shard) for r in want.collect())
    assert a == b


def test_budget_mix_sample_regimes(spark, sf_dir):
    """Budget-driven mixing: budget >= stratum total keeps the whole
    stratum, zero budget and absent strata drop entirely, partial budgets
    select a hash-stable subset, and the verdict is repartition-invariant."""
    from incremental_etl_on_lakehouse_spark.operators.sampling import (
        budget_mix_sample,
    )

    docs = load_table(spark, "documents", sf_dir)
    budgets = {"src0": 10**9, "src1": 4000, "src2": 0}
    out = budget_mix_sample(docs, "doc_id", "source", "n_chars", budgets)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_src0 = docs.where(F.col("source") == "src0").count()
    assert by_src.get("src0") == n_src0          # budget >= total: all kept
    assert 0 < by_src.get("src1", 0) < docs.where(
        F.col("source") == "src1"
    ).count()                                     # partial budget: strict subset
    assert "src2" not in by_src                   # zero budget
    assert set(by_src) == {"src0", "src1"}        # absent strata dropped

    # deterministic under re-partitioning (the point of hash sampling)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in budget_mix_sample(
            docs.repartition(7), "doc_id", "source", "n_chars", budgets
        ).collect()
    )
    assert a == b

    # kept size is in the budget's neighborhood for the partial stratum
    kept_chars = (
        out.where(F.col("source") == "src1")
        .agg(F.sum("n_chars").alias("s"))
        .collect()[0]["s"]
    )
    total_chars = (
        docs.where(F.col("source") == "src1")
        .agg(F.sum("n_chars").alias("s"))
        .collect()[0]["s"]
    )
    assert kept_chars < total_chars


def test_temperature_mix_sample_rebalances(spark, sf_dir):
    """alpha=0.5 temperature sampling: small strata keep a HIGHER rate than
    big ones (the rebalancing point), a stratum whose allocation exceeds
    its size is kept whole (rate caps at 1), the realized total sits near
    the target, and the kept set is repartition-invariant. alpha=1
    degenerates to natural proportions (equal rates)."""
    from incremental_etl_on_lakehouse_spark.operators.sampling import (
        temperature_mix_sample,
    )

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.expr(
            "CASE WHEN CAST(substring(source, 4) AS INT) < 14 THEN 'big'"
            " WHEN CAST(substring(source, 4) AS INT) < 19 THEN 'mid'"
            " ELSE 'small' END"
        ).alias("g"),
    )
    sizes = {r["g"]: r["n"] for r in
             docs.groupBy("g").agg(F.count("*").alias("n")).collect()}
    out = temperature_mix_sample(docs, "doc_id", "g", target_rows=250)
    kept = {r["g"]: r["n"] for r in
            out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    rate = {g: kept.get(g, 0) / sizes[g] for g in sizes}
    assert rate["small"] == 1.0, rate             # allocation > size: kept whole
    assert rate["small"] > rate["mid"] > rate["big"], rate
    total = sum(kept.values())
    assert 200 <= total <= 260, kept              # near the 250 target

    # repartition-invariant (hash verdicts, not row order)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_mix_sample(
            docs.repartition(7), "doc_id", "g", target_rows=250
        ).collect()
    )
    assert a == b

    # alpha=1: natural proportions — every stratum sampled at ~target/N
    nat = temperature_mix_sample(docs, "doc_id", "g", target_rows=250, alpha=1.0)
    kept1 = {r["g"]: r["n"] for r in
             nat.groupBy("g").agg(F.count("*").alias("n")).collect()}
    n_tot = sum(sizes.values())
    for g, n in sizes.items():
        expect = 250 * n / n_tot
        assert abs(kept1.get(g, 0) - expect) < 0.35 * expect + 5, (g, kept1)

    # validation
    import pytest

    with pytest.raises(ValueError, match="target_rows"):
        temperature_mix_sample(docs, "doc_id", "g", target_rows=-1)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix_sample(docs, "doc_id", "g", target_rows=10, alpha=-0.5)
