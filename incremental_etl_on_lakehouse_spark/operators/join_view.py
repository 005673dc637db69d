"""Incrementally-maintained JOIN views: a Gold defined as
``left ⋈ right`` + aggregate, maintained from BOTH inputs' change feeds
via delta-join algebra — the multi-table generalization of the
reference's Silver-CDF → Gold topology
(``notebooks/demo-notebook.py:428-435``), where the engine's
single-table :class:`~.cdc.IncrementalAggView` family stops.

For one refresh folding the left input from version ``a0 → a1`` and the
right from ``b0 → b1`` (signed multiset deltas ``ΔA``, ``ΔB``):

    Δ(A ⋈ B)  =  ΔA ⋈ B@b0   ∪   A@a1 ⋈ ΔB

The cross term ``ΔA ⋈ ΔB`` is covered exactly once because
``A@a1 = A@a0 + ΔA``. Both terms are O(changed rows) on the delta side:

- ``ΔA ⋈ B@b0`` joins the batch against the right table's OLD snapshot
  (a time-travel read — the lake log makes "the table as the last
  refresh saw it" a first-class input);
- ``A@a1 ⋈ ΔB``'s snapshot side is FILE-PRUNED by the batch's join-key
  min/max (``LakeTable.to_df_pruned``): when the join key carries file
  stats (``statsColumns``), only key-overlapping files of A are read —
  at 100 TB the table-side scan is proportional to the batch's key
  range, not the table. The joins themselves broadcast the delta side
  (a micro-batch) against the snapshot side.

The maintained aggregate state is the SUBTRACTABLE family (SUM /
COUNT(*) / AVG): signed join deltas merge into one additive gold table
(``merge_agg_deltas``) with the same NULL semantics as
``IncrementalAggView`` — per-summed-column signed non-null counts, so
SUM of an all-NULL group reads NULL and AVG divides by the non-null
count. Non-subtractable aggregates over a join (MIN/MAX/quantiles)
would need per-group join-result state; they are out of scope here and
rejected at construction.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from incremental_etl_on_lakehouse_spark.lake.table import LakeTable, _json_safe
from incremental_etl_on_lakehouse_spark.operators.cdc import (
    merge_agg_deltas,
    signed_agg_deltas,
    widen_sum_type,
)

__all__ = ["IncrementalJoinView"]


class _PairCheckpoint:
    """Durable cursor over both change feeds with a write-ahead INTENT
    record: ``{"left","right"}`` is the last APPLIED version pair,
    ``"epoch"`` the count of maintenance merges committed, and
    ``"intent"`` (when present) the version pair a merge was about to
    apply. Together with the gold table's ``txn.<app_id>`` guard this
    makes refresh exactly-once across crashes at ANY point: the intent
    pins the replayed batch to the same version range, and the txn
    guard no-ops the merge if it already committed."""

    def __init__(self, path: str):
        self.path = path

    def read(self) -> dict:
        if not os.path.exists(self.path):
            return {"left": 0, "right": 0, "epoch": 0, "intent": None}
        with open(self.path) as f:
            d = json.load(f)
        d.setdefault("epoch", 0)
        d.setdefault("intent", None)
        return d

    def write(self, d: dict) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(d, f)
        os.replace(tmp, self.path)


class IncrementalJoinView:
    """Materialized ``left ⋈ right`` + GROUP BY aggregate view maintained
    from both change feeds. See the module docstring for the algebra.

    Parameters
    ----------
    left, right : CDF-enabled :class:`LakeTable` inputs.
    root : directory for the view's state (gold table + checkpoint).
    join_keys : equi-join column names, present on BOTH sides (the join
        is ``INNER`` on name equality; NULL keys never match — batch SQL
        semantics).
    group_cols : output grouping columns of the joined relation; every
        non-join-key column name must be unambiguous (live on exactly
        one side).
    aggs : ``{output_name: (kind, column)}`` with kinds ``sum`` /
        ``count`` (column ``"*"``) / ``avg``.
    """

    def __init__(
        self,
        left: LakeTable,
        right: LakeTable,
        root: str,
        join_keys: list[str],
        group_cols: list[str],
        aggs: dict[str, tuple[str, str]],
    ):
        for side, t in (("left", left), ("right", right)):
            if not t.cdf_enabled():
                raise ValueError(
                    f"IncrementalJoinView needs enableChangeDataFeed on the "
                    f"{side} input"
                )
        self.left, self.right, self.root = left, right, root
        self.join_keys = list(join_keys)
        self.group_cols = list(group_cols)
        self.aggs = dict(aggs)

        lcols = {f.name: f.dataType for f in left.schema().fields}
        rcols = {f.name: f.dataType for f in right.schema().fields}
        for k in self.join_keys:
            if k not in lcols or k not in rcols:
                raise ValueError(f"join key {k!r} must exist on both sides")
        # joined-relation column -> side ("l"/"r"); join keys read "l"
        self._side: dict[str, str] = {}
        joined_types: dict[str, object] = {}
        for name in set(lcols) | set(rcols):
            if name in self.join_keys:
                self._side[name] = "l"
                joined_types[name] = lcols[name]
            elif name in lcols and name in rcols:
                continue  # ambiguous — only an error if actually used
            elif name in lcols:
                self._side[name] = "l"
                joined_types[name] = lcols[name]
            else:
                self._side[name] = "r"
                joined_types[name] = rcols[name]

        self._sum_cols: dict[str, str] = {}
        self._avg_specs: dict[str, str] = {}
        used = list(self.group_cols)
        for name, (kind, col) in self.aggs.items():
            if kind == "sum":
                self._sum_cols[name] = f"__sum_{col}"
                used.append(col)
            elif kind == "avg":
                self._avg_specs[name] = f"__sum_{col}"
                used.append(col)
            elif kind == "count":
                if col != "*":
                    raise ValueError("count supports '*' only")
            else:
                raise ValueError(
                    f"unsupported join-view aggregate kind: {kind!r} (the "
                    "subtractable family sum/count/avg only — MIN/MAX/"
                    "quantiles over a join need per-group join-result "
                    "state)"
                )
        for c in used:
            if c in set(lcols) & set(rcols) and c not in self.join_keys:
                raise ValueError(f"ambiguous column {c!r}: on both sides")
            if c not in joined_types:
                raise ValueError(f"unknown column {c!r}")

        spark = left.spark
        fields = [StructField(c, joined_types[c]) for c in self.group_cols]
        fields.append(StructField("__n", LongType()))
        self._hidden_sums = sorted(
            set(self._sum_cols.values()) | set(self._avg_specs.values())
        )
        for h in self._hidden_sums:
            src = h[len("__sum_"):]
            fields.append(StructField(h, widen_sum_type(joined_types[src])))
            fields.append(StructField(f"__nn_{src}", LongType()))
        self.add_table = LakeTable.create(
            spark,
            os.path.join(root, "additive"),
            StructType(fields),
            if_not_exists=True,
        )
        self._ckpt = _PairCheckpoint(os.path.join(root, "checkpoint.json"))
        self._txn_app_id = "incremental-join-view"

    # ------------------------------------------------------------ internals

    def _signed(self, changes: DataFrame, side: str) -> DataFrame:
        """CDF rows -> narrow signed rows: join keys + this side's used
        columns + ``__s`` (±1). Narrowing BEFORE the join keeps the
        exchange at delta width, not table width."""
        sign = F.when(
            F.col("_change_type").isin("update_preimage", "delete"),
            F.lit(-1),
        ).when(
            F.col("_change_type").isin("update_postimage", "insert"), F.lit(1)
        )
        keep = self._side_cols(side)
        return (
            changes.withColumn("__s", sign)
            .where(F.col("__s").isNotNull())
            .select(*self.join_keys, *keep, "__s")
        )

    def _side_cols(self, side: str) -> list[str]:
        """The non-join-key columns of ``side`` the view actually uses."""
        used = set(self.group_cols) | {
            h[len("__sum_"):] for h in self._hidden_sums
        }
        return sorted(
            c
            for c in used
            if c not in self.join_keys and self._side[c] == side
        )

    def _snapshot(self, table: LakeTable, side: str, version: int,
                  prune_from: DataFrame | None = None) -> DataFrame:
        """Snapshot projected to the columns this view needs. With
        ``prune_from`` (the other feed's delta batch), the read is
        file-pruned to the batch's join-key min/max range."""
        cols = [*self.join_keys, *self._side_cols(side)]
        if prune_from is not None:
            stats = set(table.stats_columns())
            keys = [k for k in self.join_keys if k in stats]
            if keys:
                row = prune_from.agg(
                    *[
                        f
                        for k in keys
                        for f in (
                            F.min(k).alias(f"__mn_{k}"),
                            F.max(k).alias(f"__mx_{k}"),
                        )
                    ]
                ).collect()[0]
                ranges = {
                    k: (
                        _json_safe(row[f"__mn_{k}"]),
                        _json_safe(row[f"__mx_{k}"]),
                    )
                    for k in keys
                    if row[f"__mn_{k}"] is not None
                }
                if ranges:
                    return table.to_df_pruned(ranges, version=version).select(
                        *cols
                    )
        return table.to_df(version=version).select(*cols)

    def _has_changes(self, table: LakeTable, lo: int, hi: int) -> bool:
        if hi < lo:
            return False
        # log-retention guard: if cleanup removed commits at/below lo,
        # changes_in_range would scan only the survivors and read a
        # cleaned-away range as "provably empty" — the view would advance
        # its cursor past changes it never folded. Mirror read_changes'
        # incomplete-feed error instead of silently diverging.
        earliest = table._commits()[0].version
        if earliest > 0 and lo < earliest:
            raise ValueError(
                f"join-view feed needs changes from v{lo} but log "
                f"retention cleanup kept v{earliest}+ only — the view "
                "state is unrecoverable incrementally; rebuild it"
            )
        return table.changes_in_range(lo, hi) is not False

    # ------------------------------------------------------------ interface

    def refresh(self) -> int:
        """Fold all unprocessed commits of BOTH feeds through one
        delta-join maintenance merge; returns the number of feed sides
        that had changes. Signed deltas are additive across commits, so
        the whole backlog of each side folds into the one algebraic
        step (availableNow-style catch-up coalescing).

        Exactly-once across crashes: the checkpoint records a
        write-ahead INTENT (the version pair about to be applied) before
        the merge, and the merge itself carries a ``txn.<app_id>`` guard
        at epoch+1 — a replay after a crash between merge-commit and
        checkpoint-finalize recomputes the SAME pinned range and the
        guard no-ops the double apply."""
        ck = self._ckpt.read()
        a0, b0 = ck["left"], ck["right"]
        if ck["intent"] is not None:
            # crash recovery: a merge for this exact range may or may not
            # have committed; re-run it (the txn guard decides) with the
            # PINNED bounds, never the current head
            a1, b1 = ck["intent"]
        else:
            a1, b1 = self.left.version(), self.right.version()
        terms: list[DataFrame] = []
        applied = 0
        d_b = None
        if self._has_changes(self.right, b0 + 1, b1):
            d_b = self._signed(
                self.right.read_changes(b0 + 1, b1), "r"
            ).persist()
        d_a = None
        if self._has_changes(self.left, a0 + 1, a1):
            applied += 1
            # persisted: the delta feeds both a bounds job (file pruning
            # of the snapshot side) and the maintenance merge
            d_a = self._signed(
                self.left.read_changes(a0 + 1, a1), "l"
            ).persist()
            # ΔA joins the right side's OLD snapshot (time travel):
            # ΔA ⋈ ΔB is NOT in this term — A@a1 ⋈ ΔB carries it
            terms.append(
                d_a.join(
                    self._snapshot(self.right, "r", b0, prune_from=d_a),
                    on=self.join_keys,
                    how="inner",
                )
            )
        if d_b is not None:
            applied += 1
            terms.append(
                self._snapshot(
                    self.left, "l", a1, prune_from=d_b
                ).join(d_b, on=self.join_keys, how="inner")
            )
        if not terms:
            self._ckpt.write(
                {"left": a1, "right": b1, "epoch": ck["epoch"], "intent": None}
            )
            return 0
        # write-ahead intent: pin the range BEFORE the merge so a crash
        # replays exactly this batch
        self._ckpt.write({**ck, "intent": [a1, b1]})
        joined = terms[0]
        for t in terms[1:]:
            joined = joined.unionByName(t)

        sum_srcs = [h[len("__sum_"):] for h in self._hidden_sums]
        deltas, delta_cols = signed_agg_deltas(
            joined, self.group_cols, sum_cols=sum_srcs, nn_cols=sum_srcs
        )
        merge_agg_deltas(
            self.add_table,
            deltas,
            group_cols=self.group_cols,
            agg_cols={c: f"d_{c}" for c in delta_cols},
            txn_app_id=self._txn_app_id,
            txn_version=ck["epoch"] + 1,
        )
        for d in (d_a, d_b):
            if d is not None:
                d.unpersist()
        self._ckpt.write(
            {
                "left": a1,
                "right": b1,
                "epoch": ck["epoch"] + 1,
                "intent": None,
            }
        )
        return applied

    def to_df(self) -> DataFrame:
        """Assemble the current view: groups whose joined row count
        reached zero disappear, SUM of an all-NULL group reads NULL, AVG
        divides by the non-null count — batch INNER JOIN + GROUP BY
        semantics exactly."""
        out = self.add_table.to_df().where(F.col("__n") > 0)
        sel = [F.col(c) for c in self.group_cols]
        for name, (kind, col) in self.aggs.items():
            if kind == "sum":
                sel.append(
                    F.when(
                        F.col(f"__nn_{col}") > 0, F.col(self._sum_cols[name])
                    ).alias(name)
                )
            elif kind == "count":
                sel.append(F.col("__n").alias(name))
            else:  # avg
                nn = f"__nn_{col}"
                sel.append(
                    F.when(
                        F.col(nn) > 0,
                        F.col(self._avg_specs[name]).cast("double")
                        / F.col(nn),
                    ).alias(name)
                )
        return out.select(*sel)
