"""Deterministic sampling and sequence-packing operators for training-data
pipelines.

Random sampling (``df.sample``/``sampleBy``) is non-reproducible across
retries and cluster layouts — a replayed micro-batch would sample different
rows, breaking exactly-once downstreams. These operators derive every
decision from a *content hash* instead: same input ⇒ same sample, on any
cluster, at any parallelism, under any retry. All expressions are JVM-side
(md5/conv/window), no UDFs.

- ``hash_sample``: keep a deterministic ~fraction of rows keyed by id.
- ``stratified_hash_sample``: per-stratum fractions (training-mixture
  weighting, e.g. upsample wiki, downsample crawl).
- ``pack_sequences``: assign ordered documents to fixed-token-budget shards —
  the batch/shard planning step of sequence packing for LLM training. A
  running token total over a deterministic order maps each doc to
  ``floor(cumsum_before / budget)``.

Scale notes: hash sampling is a narrow map (no shuffle, fully pushed into
the scan projection). Packing needs a global order — implemented as a single
window over the order key; at 100 TB you partition first (e.g. per source
shard) and pack within partitions, which this API supports via
``partition_cols``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

# 16^8 buckets from the first 8 hex chars of md5 — portable to any engine
# with md5() (DuckDB, Trino, ...), unlike xxhash64.
_BUCKETS = 16**8


def _hash_bucket(key: Column) -> Column:
    """Uniform bucket in [0, 16^8) from the md5 of the key's string form."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose md5-bucket falls
    under the threshold. Reproducible and stable under re-partitioning,
    unlike ``df.sample`` (seeded per-partition)."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.where(_hash_bucket(F.col(key_col)) < int(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame, key_col: str, stratum_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (training-mixture weighting).
    Strata absent from ``fractions`` are dropped (fraction 0)."""
    expr = None
    for stratum, frac in fractions.items():
        cond = F.col(stratum_col) == stratum
        val = F.lit(int(frac * _BUCKETS))
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    thresh = expr.otherwise(F.lit(0)) if expr is not None else F.lit(0)
    return df.where(_hash_bucket(F.col(key_col)) < thresh)


def pack_sequences(
    df: DataFrame,
    size_col: str,
    order_cols: list[str],
    budget: int,
    partition_cols: list[str] | None = None,
    shard_col: str = "shard",
) -> DataFrame:
    """Assign each row to a fixed-budget shard: rows are taken in
    ``order_cols`` order and a shard closes when its cumulative ``size_col``
    reaches ``budget`` (a document larger than the budget gets its own
    shard; documents are never split).

    shard = floor(cumsum_exclusive / budget) over the running total — the
    standard greedy sequential packing. With ``partition_cols`` the packing
    (and its window) runs independently per partition (an ordinary keyed
    shuffle). WITHOUT partition_cols the global running total is computed
    as a distributed prefix sum instead of a single-reducer global window:
    range-partition on the order keys, run the cumulative window PER
    partition (parallel), and add each partition's exclusive offset —
    collected as one metadata-scale row per partition — so the global
    packing scales like a sort, not like one reducer. Results are
    identical to the global window whenever ``order_cols`` is a total
    order (ties, as in any packing, are arbitrarily broken).
    """
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum_excl = F.sum(F.col(size_col)).over(w) - F.col(size_col)
        return df.withColumn(
            shard_col, F.floor(cum_excl / F.lit(budget)).cast("long")
        )
    # localCheckpoint pins ONE materialized range partitioning: the range
    # boundaries come from a per-execution sample, so without pinning the
    # offsets job and the output job could disagree on row placement and
    # silently mis-shard boundary rows. The materialization is the same
    # order of cost as the sort's own shuffle files.
    ranged = (
        df.repartitionByRange(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = sorted(
        (r["__pid"], r["t"])
        for r in ranged.groupBy("__pid").agg(F.sum(size_col).alias("t")).collect()
    )
    offsets, acc = {}, 0
    for pid, t in totals:
        offsets[pid] = acc
        acc += t or 0
    if offsets:
        omap = F.create_map(
            *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
        )
        offset = F.coalesce(omap[F.col("__pid")], F.lit(0))
    else:
        offset = F.lit(0)
    w = Window.partitionBy("__pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_excl = offset + F.sum(F.col(size_col)).over(w) - F.col(size_col)
    return ranged.withColumn(
        shard_col, F.floor(cum_excl / F.lit(budget)).cast("long")
    ).drop("__pid")


def temperature_mix_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    target_rows: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-smoothed multinomial mixture sampling — the standard
    multilingual/multi-source rebalancing spec (mBERT/XLM-R/mT5): stratum
    ``s`` is sampled with probability ``q_s ∝ n_s^alpha``, flattening the
    head and upweighting the tail as ``alpha → 0`` (``alpha = 1`` is
    natural proportions, ``alpha = 0`` uniform across strata). The expected
    take from ``s`` is ``target_rows·q_s``, i.e. keep-rate
    ``r_s = min(1, target_rows·q_s / n_s)`` — the min is the
    without-replacement cap (a tail stratum smaller than its allocation is
    kept whole, so the realized total can undershoot ``target_rows``).

    Engine-exact verdicts, same discipline as :func:`budget_mix_sample`:
    the smoothed weight is fixed to integer micro-units
    ``w_s = round(n_s^alpha · 1e6)`` (for the default ``alpha = 0.5`` via
    ``sqrt``, which IEEE 754 requires to be correctly rounded — bit-equal
    on every engine; other alphas go through ``pow``, deterministic in
    practice but not IEEE-guaranteed), and a row is kept iff

        bucket(key) · Σw · n_s  <  target_rows · w_s · BUCKETS

    — all-integer DECIMAL arithmetic, no float division to flip a verdict
    (the rate cap is automatic: ``r_s ≥ 1`` makes the RHS dominate every
    bucket). Magnitudes: bucket < 2^32, Σw ≤ strata·1e12, n_s ≤ 1e12 keeps
    the product < 1e38 (DECIMAL(38,0)-exact) out to corpus sizes far past
    100 TB.

    Scale: ONE corpus scan computes the per-stratum counts (map-side
    combined; the O(strata) result is collected — metadata-scale, the same
    precedent as :func:`pack_sequences`' partition offsets) and is rebuilt
    as a local frame so the smoothing/total math never re-scans the
    corpus; the weights broadcast back into a scan-bound filter — the
    corpus itself never shuffles (plan-guarded).
    """
    if target_rows < 0:
        raise ValueError(f"target_rows must be >= 0, got {target_rows}")
    if not (0.0 <= alpha <= 1.0):
        # temperature smoothing is defined on [0, 1] (1 = natural
        # proportions, 0 = uniform); alpha > 1 would also overflow the
        # micro-unit weights on large strata (n_s^alpha * 1e6 past
        # Long.MAX saturates silently under non-ANSI casts)
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    count_rows = df.groupBy(stratum_col).agg(F.count("*").alias("__n_s")).collect()
    if not count_rows:
        return df.where(F.lit(False))
    # the smoothing stays in SPARK expressions (sqrt/round/sum over the
    # tiny local frame), not driver-side Python: Python's round() is
    # half-even while Spark's is half-up, and keeping one engine's
    # arithmetic is what makes the kept set engine-exact.
    # Explicit schema: an ALL-NULL stratum column defeats type inference
    # ("Some of types cannot be determined"), and NULL is a legal stratum.
    counts_schema = T.StructType(
        [df.schema[stratum_col], T.StructField("__n_s", T.LongType())]
    )
    counts = df.sparkSession.createDataFrame(count_rows, counts_schema)
    smoothed = (
        F.sqrt(F.col("__n_s"))
        if alpha == 0.5
        else F.pow(F.col("__n_s"), F.lit(float(alpha)))
    )
    weights = counts.withColumn(
        "__w_micro", F.round(smoothed * F.lit(1e6)).cast("long")
    )
    total = weights.agg(F.sum("__w_micro").alias("__sum_w_micro"))

    def dec(c: Column) -> Column:
        return c.cast("decimal(19,0)")

    keep = (
        dec(_hash_bucket(F.col(key_col)))
        * dec(F.col("__sum_w_micro"))
        * dec(F.col("__n_s"))
    ) < (
        dec(F.lit(int(target_rows)))
        * dec(F.col("__w_micro"))
        * dec(F.lit(_BUCKETS))
    )
    # null-safe join: a NULL stratum is a stratum like any other (groupBy
    # kept its group above) — a plain equi-join would silently drop every
    # NULL-stratum row
    meta = weights.crossJoin(total).withColumnRenamed(stratum_col, "__stratum")
    return (
        df.join(
            F.broadcast(meta),
            F.col(stratum_col).eqNullSafe(F.col("__stratum")),
        )
        .where(keep)
        .drop("__stratum", "__n_s", "__w_micro", "__sum_w_micro")
    )


def budget_mix_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    size_col: str,
    budgets: dict[str, int],
) -> DataFrame:
    """Budget-driven mixture sampling: keep a deterministic hash-sample of
    each stratum sized (in ``size_col`` units, e.g. tokens or chars) to
    approximately its budget — the way practitioners actually specify a
    training mixture ("20 B tokens of wiki, 5 B of crawl"), rather than
    the fractions :func:`stratified_hash_sample` takes as inputs.

    A row is kept iff ``bucket(key) * stratum_total < budget * BUCKETS`` —
    the per-stratum rate ``min(1, budget/total)`` restated in exact
    decimal arithmetic (19,0 operands -> 38,0 product), so no float
    division can flip a row's
    verdict between engines (and a budget >= the stratum total keeps the
    whole stratum). Strata without a budget are dropped — including a
    NULL stratum, which cannot name a budget entry (the equi-join's
    null-rejection and the missing-budget rule agree; contrast
    :func:`temperature_mix_sample`, where every observed stratum gets an
    allocation and the join is therefore null-safe).

    Scale: one metadata-size aggregate (per-stratum totals; map-side
    combined, one tiny shuffle) broadcast back into a scan-bound filter —
    the corpus itself never shuffles. The product stays exactly
    representable: bucket < 2^32 and a 100 TB corpus total < 2^50,
    so bucket * total < 2^82 << 10^38.
    """
    for stratum, b in budgets.items():
        if b < 0:
            raise ValueError(f"negative budget for {stratum!r}: {b}")
    totals = df.groupBy(stratum_col).agg(
        F.sum(F.col(size_col).cast("long")).alias("__stratum_total")
    )
    expr = None
    for stratum, b in budgets.items():
        cond = F.col(stratum_col) == stratum
        val = F.lit(int(b)).cast("decimal(19,0)")
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    budget = (
        expr.otherwise(F.lit(None).cast("decimal(19,0)"))
        if expr is not None
        else F.lit(None).cast("decimal(19,0)")
    )
    keep = (
        _hash_bucket(F.col(key_col)).cast("decimal(19,0)")
        * F.col("__stratum_total").cast("decimal(19,0)")
    ) < budget * F.lit(_BUCKETS).cast("decimal(19,0)")
    return (
        df.join(F.broadcast(totals), stratum_col)
        .where(keep)
        .drop("__stratum_total")
    )
