"""Structured Streaming operators beyond the reference's surface.

The reference handles streams exclusively as Delta micro-batches +
``foreachBatch`` MERGE (SURVEY.md §2.10) and explicitly has *no* watermarks,
event-time windows, or streaming dedup. Large-scale pipelines need them, so
this module adds the standard event-time toolkit on Spark's native streaming
engine (state store-backed, checkpointable):

- ``windowed_agg``: tumbling/sliding event-time windows with a watermark —
  the canonical bounded-state streaming aggregation;
- ``dedup_stream``: ``dropDuplicatesWithinWatermark`` keyed dedup (bounded
  state, unlike the unbounded global ``dropDuplicates``);
- ``run_to_memory``: test/debug harness executing a streaming query with
  ``availableNow`` and returning the materialized result.

State scale note: watermarks bound state to (watermark horizon / slide) x
|keys| windows; at 100 TB/day the state store is RocksDB
(``spark.sql.streaming.stateStore.providerClass``) and the shuffle key is
(key, window), uniform unless keys are skewed — salting applies as usual.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: list[Column],
    group_cols: list[str] | None = None,
    slide_duration: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed aggregation with late-data bound.

    Returns window_start/window_end plus the aggregates; output mode
    ``append`` emits each window once its watermark passes (exactly-once
    per window with checkpointing).
    """
    win = (
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(ts_col), window_duration)
    )
    keys = [win.alias("w")] + [F.col(c) for c in (group_cols or [])]
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def session_windowed_agg(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    aggs: list[Column],
    group_cols: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based session windows over an event-time stream (the batch
    counterpart is the ``win_session`` key): a session extends while
    consecutive events arrive within ``gap``; append mode emits a session
    once the watermark passes its end (last event + gap), so state per key
    is bounded by the watermark horizon. Shuffle key is the group columns
    — session merging is per-key and never global."""
    keys = [F.session_window(F.col(ts_col), gap).alias("w")] + [
        F.col(c) for c in (group_cols or [])
    ]
    out = stream.withWatermark(ts_col, watermark).groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *[c for c in out.columns if c != "w"],
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates of a key arriving
    within the watermark horizon are dropped; state for older keys is evicted.
    (The batch-side generalization is ``operators.dedup.dedup_exact``.)"""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def run_to_memory(
    stream_df: DataFrame,
    checkpoint: str | None = None,
    output_mode: str = "append",
) -> DataFrame:
    """Execute a streaming DataFrame with trigger(availableNow) into an
    in-memory table; returns the materialized batch DataFrame.
    ``output_mode="complete"`` for unwatermarked aggregates (each trigger
    rewrites the full result table)."""
    name = f"mem_{uuid.uuid4().hex}"
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    writer.start().awaitTermination()
    return stream_df.sparkSession.table(name)


def stateful_running_counts(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a per-key running event count that survives across micro-batches in the
    state store (the engine's template for arbitrary user-defined streaming
    state — Arrow-batched, bounded memory per key group).

    Emits the updated cumulative count for every key seen in a batch
    (output mode ``update``). State is one long per key; at 100 TB the state
    store backend should be RocksDB and the shuffle key is ``key_col``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_counts(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update_counts,
        outputStructType=f"{key_col} long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each left row with right
    rows of the same key whose timestamp falls in
    ``[left_ts, left_ts + max_delay]``.

    Both sides carry watermarks and the join condition bounds event time in
    both directions, so the state store can evict rows once the watermark
    passes ``ts + max_delay`` — state is O(in-flight window), not O(stream).
    With availableNow over a finite input the result equals the equivalent
    batch interval join (oracle-checkable).
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner")


def stateful_top2(
    stream: DataFrame, key_col: str = "user_id", value_col: str = "cents"
) -> DataFrame:
    """Per-key top-2 values in streaming state (``applyInPandasWithState``).

    Emits the updated (top1, top2) per key seen in each micro-batch
    (update mode). State is two longs per key; ties keep duplicates
    (two rows with the equal max -> top1 == top2), which is what makes
    the result exactly oracle-checkable. The Spark 4
    ``transformWithStateInPandas`` spelling of the same operator is
    :func:`stateful_top2_tws` (its driver worker needs ``google.protobuf``,
    absent in minimal environments — import-gated there).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_top2(key, pdfs, state):
        cand = [v for v in (state.get if state.exists else (None, None)) if v is not None]
        for pdf in pdfs:
            cand.extend(int(v) for v in pdf[value_col].nlargest(2))
        cand.sort(reverse=True)
        m1 = cand[0] if cand else None
        m2 = cand[1] if len(cand) > 1 else None
        state.update((m1, m2))
        yield pd.DataFrame({key_col: [key[0]], "top1": [m1], "top2": [m2]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update_top2,
        outputStructType=f"{key_col} bigint, top1 bigint, top2 bigint",
        stateStructType="m1 bigint, m2 bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_top2_tws(
    stream: DataFrame, key_col: str = "user_id", value_col: str = "cents"
) -> DataFrame:
    """Per-key top-2 via Spark 4's ``transformWithStateInPandas`` — the
    typed-state successor of applyInPandasWithState (ValueState here;
    ListState/MapState/timers available) on the RocksDB-backed state
    engine. Identical semantics to :func:`stateful_top2`; kept separate
    because the TWS driver worker imports ``google.protobuf``, which
    minimal Spark environments (like this one) may not ship — callers
    without it get an ImportError here, not a mid-stream crash.
    """
    import google.protobuf  # noqa: F401 — fail fast with a clear error
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    stream.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    class Top2(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.top = handle.getValueState("top2", "m1 bigint, m2 bigint")

        def handleInputRows(self, key, rows, timer_values):
            cur = list(self.top.get()) if self.top.exists() else [None, None]
            cand = [v for v in cur if v is not None]
            for pdf in rows:
                # vectorized per Arrow batch: only the batch's top-2 can
                # displace state
                cand.extend(int(v) for v in pdf[value_col].nlargest(2))
            cand.sort(reverse=True)
            m1 = cand[0] if cand else None
            m2 = cand[1] if len(cand) > 1 else None
            self.top.update((m1, m2))
            yield pd.DataFrame(
                {key_col: [key[0]], "top1": [m1], "top2": [m2]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        Top2(),
        f"{key_col} bigint, top1 bigint, top2 bigint",
        "Update",
        "None",
    )
