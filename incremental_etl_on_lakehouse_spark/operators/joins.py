"""Specialized join operators the reference lacks but a lakehouse engine needs.

The reference exercises only equi-joins (SURVEY.md §2.3 — right-outer
validation join `notebooks/demo-notebook.py:527-538` and the MERGE key join
`:269,418`). Time-series and skewed workloads at 100 TB need three more
shapes, each implemented here with an explicitly scalable plan:

- ``asof_join``: for every left row, the most recent right row at-or-before
  its timestamp (per key). Implemented as union + ordered window with
  ``last(..., ignorenulls)`` — ONE shuffle on the key, no range cross
  product, same cost envelope as a sort-merge join. This is the standard
  distributed as-of algorithm (a sorted merge), not a correlated-subquery
  translation.
- ``range_join_binned``: point-in-interval join without the
  BroadcastNestedLoopJoin cross product: intervals are exploded to the
  fixed-width bins they overlap, points hash to their bin, and the join is a
  plain equi-join on the bin id plus a residual predicate. Cost is
  O(points + intervals x bins-per-interval); correct for arbitrary interval
  sets. (When the interval side is dim-table small, a broadcast range join
  is also provided.)
- ``salted_join``: equi-join with a deterministic salt on the skewed side so
  one hot key spreads across ``n_salts`` reducers instead of one straggler.
  AQE's skew-join split handles moderate skew; salting is the explicit tool
  when one key dominates a partition beyond what splitting fixes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_LEFT_MARK = "__asof_is_left"
_TS = "__asof_ts"
_MATCH = "__asof_match"
_BIN = "__range_bin"
_SALT = "__join_salt"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str = "left",
    tiebreak_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (inclusive): attach to each left row the ``value_cols``
    of the matching right row for the same key, where the match is

    - ``backward`` (default): latest right row with ``right_ts <= left_ts``
      — DuckDB ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``;
    - ``forward``: earliest right row with ``right_ts >= left_ts`` —
      DuckDB's ``l.ts <= r.ts`` spelling;
    - ``nearest``: whichever of the two is closer in time (ties prefer
      backward) — pandas ``merge_asof(direction='nearest')``.

    When several right rows share (key, ts), the one with the greatest
    ``tiebreak_col`` wins (callers that need strict determinism should pass
    one or pre-dedupe the right side).

    Plan shape: union the two inputs (right rows carry the payload, left
    rows carry nulls), shuffle ONCE on ``on``, sort each key group by
    (ts, side), and propagate the last non-null payload. Right rows order
    before left rows at equal timestamps, making the match inclusive in
    every direction. ``nearest`` adds a second sort over the SAME exchange
    (two windows, one shuffle), comparing epoch distances per row.
    Skewed keys degrade to a single sorted partition per key — the same
    failure mode as any PARTITION BY window; AQE cannot split a window
    partition, so pathological keys should be pre-filtered or bucketed by a
    coarser time range first.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left/inner, got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    order_tail = [F.col(tiebreak_col).asc_nulls_first()] if tiebreak_col else []
    if tiebreak_col and tiebreak_col not in left.columns:
        left = left.withColumn(tiebreak_col, F.lit(None))

    lt = left.withColumn(_LEFT_MARK, F.lit(1)).withColumn(_TS, F.col(left_ts))
    for c in value_cols:
        lt = lt.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    # match marker: propagated exactly like a payload column, so "a match
    # exists" is never conflated with "the matched payload is NULL"
    lt = lt.withColumn(_MATCH, F.lit(None).cast("int"))
    rt = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_LEFT_MARK),
        *[F.col(c) for c in value_cols],
        *([F.col(tiebreak_col)] if tiebreak_col else []),
    )
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    rt = rt.withColumn(_MATCH, F.lit(1))

    unioned = lt.unionByName(rt)

    def frame(ts_order):
        return (
            Window.partitionBy(*on)
            .orderBy(ts_order, F.col(_LEFT_MARK).asc(), *order_tail)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    w_b = frame(F.col(_TS).asc())
    w_f = frame(F.col(_TS).desc())
    keep = [c for c in left.columns if c not in value_cols]
    prop_cols = [*value_cols, _MATCH]
    if direction in ("backward", "forward"):
        w = w_b if direction == "backward" else w_f
        matched = unioned.select(
            *keep,
            F.col(_LEFT_MARK),
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in prop_cols],
        )
    else:
        ts_type = dict(unioned.dtypes)[_TS]
        if "timestamp" in ts_type:
            # NTZ refuses a double cast; unix_micros over a TIMESTAMP cast
            # is the identity under the engine's pinned-UTC session
            epoch = F.unix_micros(F.col(_TS).cast("timestamp")).cast("double")
        else:
            epoch = F.col(_TS).cast("double")
        r_ts = F.when(F.col(_LEFT_MARK) == 0, epoch)
        bts = F.last(r_ts, ignorenulls=True).over(w_b)
        fts = F.last(r_ts, ignorenulls=True).over(w_f)
        here = epoch
        use_b = F.when(fts.isNull(), F.lit(True)).when(
            bts.isNull(), F.lit(False)
        ).otherwise((here - bts) <= (fts - here))
        matched = unioned.select(
            *keep,
            F.col(_LEFT_MARK),
            *[
                F.when(use_b, F.last(c, ignorenulls=True).over(w_b))
                .otherwise(F.last(c, ignorenulls=True).over(w_f))
                .alias(c)
                for c in prop_cols
            ],
        )
    matched = matched.where(F.col(_LEFT_MARK) == 1).drop(_LEFT_MARK, _TS)
    if how == "inner":
        # the propagated marker, not payload nullability: a matched right
        # row whose payload columns are all NULL is still a match
        matched = matched.where(F.col(_MATCH).isNotNull())
    return matched.drop(_MATCH)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join ``lo <= point < hi`` as a binned equi-join.

    Each interval is replicated into every fixed-width bin it overlaps
    (``F.sequence`` + ``explode``); each point lands in exactly one bin, so
    a (point, interval) pair meets at most once — no post-join dedup. The
    equi-join on the bin id shuffles both sides by a well-distributed
    integer key, and the residual range predicate filters within the bin.

    ``bin_width`` trades replication (wide intervals / small bins → many
    copies) against bin skew (huge bins → everything in one reducer).
    Pick it near the median interval width.
    """
    pb = points.withColumn(_BIN, F.floor(F.col(point_col) / bin_width))
    ib = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width),
                # hi is exclusive: a bin starting exactly at hi can't match
                F.floor((F.col(hi_col) - F.lit(1e-9)) / bin_width),
            )
        ),
    )
    cond = (
        (pb[_BIN] == ib[_BIN])
        & (pb[point_col] >= ib[lo_col])
        & (pb[point_col] < ib[hi_col])
    )
    return pb.join(ib, cond, how).drop(_BIN)


def range_join_broadcast(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join for dim-table-small interval sets: broadcast
    the intervals and evaluate the range predicate map-side (a
    BroadcastNestedLoopJoin — zero shuffle, linear in the fact side)."""
    cond = (points[point_col] >= intervals[lo_col]) & (
        points[point_col] < intervals[hi_col]
    )
    return points.join(F.broadcast(intervals), cond, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that spreads skewed left-side keys over ``n_salts``
    sub-partitions.

    The left (large, skewed) side gets a deterministic per-row salt —
    ``xxhash64`` of the full row, so identical rows collide but the hot
    key's many *distinct* rows spread evenly. The right side is replicated
    ``n_salts`` times (keep it the smaller input). The join key becomes
    (key, salt): the hot key's rows now land on ``n_salts`` reducers.
    Result is exactly the plain equi-join for the SUPPORTED join types:
    inner / left / left_semi / left_anti. Right and full outer joins are
    rejected — the replicated right side would emit each unmatched right
    row once per salt copy (n_salts duplicates); salt the other input
    instead (swap the arguments) or pre-aggregate.
    """
    h = how.replace("_", "").lower()
    if h not in ("inner", "left", "leftouter", "leftsemi", "leftanti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the right side is "
            "replicated per salt, so right/full outer joins would return "
            "unmatched right rows n_salts times"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    ls = left.withColumn(_SALT, salt)
    rs = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = ls.join(rs, on + [_SALT], how)
    return joined.drop(_SALT)


def stats_driven_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | Column | str,
    left_stats: dict | None,
    right_stats: dict | None,
    how: str = "inner",
    broadcast_threshold_bytes: int = 10 * 1024 * 1024,
) -> tuple[DataFrame, str]:
    """Equi-join whose physical strategy is chosen from ANALYZE stats
    (``LakeTable.table_stats()``) — the cost-based decision Spark's CBO
    makes from catalog statistics, reproduced for lake tables that live
    outside a metastore.

    Size estimate = numRows x a schema-derived row width (fixed widths
    for numeric/date types, the stats' observed max length for strings).
    The smaller side gets an explicit ``F.broadcast`` when its estimate
    is under the threshold (Spark's own
    ``spark.sql.autoBroadcastJoinThreshold`` default of 10 MB); otherwise
    the join is left to the shuffle path (where AQE may still convert it
    at runtime from EXACT sizes). Returns (joined, decision) with
    decision one of ``broadcast_left`` / ``broadcast_right`` /
    ``shuffle``.

    Scale: the decision is metadata-only (no scan at plan time — the
    scan happened once at ANALYZE). Stats-driven broadcasting matters
    most when the small side is a filtered view of a big table: file
    sizes overstate it, stats after ANALYZE don't.
    """
    _WIDTHS = {
        "long": 8, "int": 4, "integer": 4, "short": 2, "byte": 1,
        "double": 8, "float": 4, "boolean": 1, "date": 4,
        "timestamp": 8, "timestamp_ntz": 8,
    }

    def estimate(df: DataFrame, stats: dict | None) -> int | None:
        if not stats or "numRows" not in stats:
            return None
        width = 0
        cols = stats.get("columns", {})
        for f in df.schema.fields:
            t = f.dataType.typeName()
            if t in _WIDTHS:
                width += _WIDTHS[t]
            elif t == "string":
                mx = (cols.get(f.name) or {}).get("max")
                width += 20 + (len(mx) if isinstance(mx, str) else 20)
            else:
                width += 48  # arrays/structs/binary: coarse default
        return int(stats["numRows"]) * max(width, 1)

    lsize, rsize = estimate(left, left_stats), estimate(right, right_stats)
    # Spark cannot broadcast the outer-preserved side: a hint there is
    # silently dropped and the returned decision would misdescribe the
    # actual plan. Restrict candidates by join type first.
    h = how.replace("_", "").lower()
    can_bc_right = h in ("inner", "cross", "left", "leftouter", "leftsemi", "leftanti")
    can_bc_left = h in ("inner", "cross", "right", "rightouter")
    decision = "shuffle"
    if (
        can_bc_right
        and rsize is not None
        and rsize <= broadcast_threshold_bytes
        and (lsize is None or rsize <= lsize or not can_bc_left)
    ):
        right, decision = F.broadcast(right), "broadcast_right"
    elif (
        can_bc_left
        and lsize is not None
        and lsize <= broadcast_threshold_bytes
    ):
        left, decision = F.broadcast(left), "broadcast_left"
    return left.join(right, on, how), decision
