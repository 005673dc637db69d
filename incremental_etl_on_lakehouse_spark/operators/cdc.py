"""CDC operators: latest-wins dedup, CDC MERGE upsert, incremental aggregation.

These are the reference's two genuinely novel operators (SURVEY.md §4) made
reusable:

1. ``dedup_latest`` — intra-batch dedup keeping the newest CDC record per key
   (reference ``ROW_NUMBER() OVER (PARTITION BY id ORDER BY cdc_timestamp
   DESC) ... QUALIFY rnk = 1``, ``notebooks/demo-notebook.py:262-266``).
2. ``merge_cdc_batch`` — the 3-way conditional MERGE applying a deduped batch
   to a snapshot table (``notebooks/demo-notebook.py:244-280``): DELETE on
   matched deletes, UPDATE on matched updates *only when the content hash
   differs* (inter-batch dedup / no-op-update elimination, ``:276``), INSERT
   on unmatched.
3. ``cdf_signed_deltas`` + ``merge_agg_delta`` — incremental aggregate
   maintenance from a change feed (``notebooks/demo-notebook.py:384-425``):
   pre-images/deletes contribute ``-x``, post-images/inserts ``+x``; the
   grouped deltas are additively merged into the running aggregate. Only the
   *changes* are ever aggregated, never the full table — the property that
   makes the Gold update O(changed keys) instead of O(100 TB).

Scale notes: the window shuffles on the CDC key (fine — keys are high-
cardinality ids; AQE splits stragglers); the merge broadcast-joins the
micro-batch against the target scan and rewrites only touched files; the
delta aggregation is a partial-aggregated shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from incremental_etl_on_lakehouse_spark.lake.table import LakeTable, MergeClause


def dedup_latest(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the latest record per key: row_number over (key, order desc).

    ``tiebreak_cols`` make the result deterministic when two records share the
    ordering timestamp (the reference's sample data never ties; real CDC logs
    do).
    """
    order = [F.col(c).desc() for c in order_cols] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rnk", F.row_number().over(w))
        .where(F.col("__rnk") == 1)
        .drop("__rnk")
    )


def merge_cdc_batch(
    table: LakeTable,
    batch: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "cdc_operation",
    hash_col: str = "data_hash",
    delete_op: str = "DELETE",
    update_op: str = "UPDATE",
    tiebreak_cols: list[str] | None = None,
    order_guard_col: str | None = None,
) -> dict:
    """Dedup a CDC micro-batch and MERGE it into the snapshot table.

    Mirrors ``notebooks/demo-notebook.py:244-280``:
    - WHEN MATCHED AND op = DELETE           -> DELETE
    - WHEN MATCHED AND op = UPDATE AND source.hash <> target.hash -> UPDATE SET *
    - WHEN NOT MATCHED (AND op <> DELETE)    -> INSERT *

    Engine extensions over the reference:
    - the ``NOT MATCHED AND op <> DELETE`` guard (the reference would insert
      a DELETE-op row that never matched; its data never exercises this);
    - ``order_guard_col``: a column present in BOTH source and target (e.g.
      an event-time epoch) added as ``source.col > target.col`` to the
      matched clauses, so a *late* re-delivered batch can never regress the
      snapshot to older values. The reference only handles the
      identical-redelivery case via the hash guard; with an order guard the
      "latest cdc_timestamp wins" semantic holds under arbitrary reordering.

    Idempotence under at-least-once replay: a re-delivered batch fires zero
    clauses -> zero files rewritten (file pruning includes clause conditions).
    """
    deduped = dedup_latest(batch, key_cols, order_cols, tiebreak_cols)
    cond = " AND ".join(f"source.`{k}` = target.`{k}`" for k in key_cols)
    guard = (
        f" AND source.`{order_guard_col}` > target.`{order_guard_col}`"
        if order_guard_col
        else ""
    )
    clauses = [
        MergeClause("delete", f"source.`{op_col}` = '{delete_op}'" + guard),
        MergeClause(
            "update",
            f"source.`{op_col}` = '{update_op}' AND source.`{hash_col}` <> target.`{hash_col}`"
            + guard,
            "*",
        ),
        MergeClause("insert", f"source.`{op_col}` <> '{delete_op}'", "*"),
    ]
    # file-stats skipping on the merge keys (active when the table declares
    # them in its statsColumns property)
    return table.merge(
        deduped, cond, clauses, stats_prune={k: k for k in key_cols}
    )


def merge_cdc_batch_tombstone(
    table: LakeTable,
    batch: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    order_guard_col: str,
    op_col: str = "cdc_operation",
    delete_op: str = "DELETE",
    tombstone_col: str = "_deleted",
    tiebreak_cols: list[str] | None = None,
) -> dict:
    """CDC merge with tombstoned deletes: convergent under ARBITRARY reorder.

    The reference's hard-delete merge (``notebooks/demo-notebook.py:270-272``)
    has a re-insertion hole: once a key's row is physically gone, a late
    re-delivered older UPDATE looks like a fresh insert. Keeping deletes as
    tombstone rows (``tombstone_col = true``) closes it: every key always has
    exactly one row carrying the max ``order_guard_col`` seen so far, and a
    matched row is replaced only when the incoming one is strictly newer.
    The live snapshot is ``WHERE NOT tombstone`` (see ``live_view``).

    This is the standard lakehouse pattern for out-of-order CDC at scale
    (tombstones compact away later); the cost is storing deleted keys.
    """
    deduped = dedup_latest(batch, key_cols, order_cols, tiebreak_cols)
    cond = " AND ".join(f"source.`{k}` = target.`{k}`" for k in key_cols)
    src_cols = set(batch.columns)
    is_delete = f"source.`{op_col}` = '{delete_op}'"
    assignments = {
        f.name: (f"source.`{f.name}`" if f.name in src_cols else f"target.`{f.name}`")
        for f in table.schema().fields
        if f.name != tombstone_col
    }
    assignments[tombstone_col] = is_delete
    insert_assignments = {
        f.name: (f"source.`{f.name}`" if f.name in src_cols else "NULL")
        for f in table.schema().fields
        if f.name != tombstone_col
    }
    insert_assignments[tombstone_col] = is_delete
    clauses = [
        MergeClause(
            "update",
            f"source.`{order_guard_col}` > target.`{order_guard_col}`",
            assignments,
        ),
        MergeClause("insert", None, insert_assignments),
    ]
    return table.merge(deduped, cond, clauses)


def live_view(table: LakeTable, tombstone_col: str = "_deleted") -> DataFrame:
    """Current-state rows of a tombstoned snapshot (deletes filtered out)."""
    return table.to_df().where(~F.col(tombstone_col)).drop(tombstone_col)


def cdf_signed_deltas(
    changes: DataFrame,
    group_cols: list[str],
    value_col: str,
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Convert change-feed rows into grouped signed deltas.

    Reference CASE (``notebooks/demo-notebook.py:400-413``):
    ``update_preimage``/``delete`` -> ``-value``; ``update_postimage``/
    ``insert`` -> ``+value``; then ``SUM`` per group. Valid for any
    subtractable aggregate (SUM/COUNT); MIN/MAX need recompute-on-delete.
    """
    signed = F.when(
        F.col(change_type_col).isin("update_preimage", "delete"),
        F.lit(-1) * F.col(value_col),
    ).when(
        F.col(change_type_col).isin("update_postimage", "insert"),
        F.col(value_col),
    )
    return (
        changes.withColumn("__signed", signed)
        .where(F.col("__signed").isNotNull())
        .groupBy(*group_cols)
        .agg(F.sum("__signed").alias("delta_value"))
        .where(F.col("delta_value") != 0)
    )


def merge_agg_delta(
    gold: LakeTable,
    deltas: DataFrame,
    group_cols: list[str],
    agg_col: str,
    delta_col: str = "delta_value",
) -> dict:
    """Additively merge grouped deltas into the running aggregate table.

    Reference (``notebooks/demo-notebook.py:419-424``):
    WHEN MATCHED -> UPDATE SET agg = agg + delta;
    WHEN NOT MATCHED -> INSERT (group, delta).
    """
    cond = " AND ".join(f"source.`{k}` = target.`{k}`" for k in group_cols)
    assignments = {agg_col: f"target.`{agg_col}` + source.`{delta_col}`"}
    insert_assignments = {k: f"source.`{k}`" for k in group_cols}
    insert_assignments[agg_col] = f"source.`{delta_col}`"
    clauses = [
        MergeClause("update", None, assignments),
        MergeClause("insert", None, insert_assignments),
    ]
    return gold.merge(deltas, cond, clauses)
