"""SQL-defined MATERIALIZED VIEWs over the incremental-maintenance
machinery: ``CREATE MATERIALIZED VIEW db.mv AS SELECT ...`` parses a
restricted aggregate query and binds it to the engine's change-feed
maintainers — :class:`~..operators.cdc.IncrementalAggView` for
single-table aggregates (the full algebra: SUM/COUNT/AVG/MIN/MAX/
COUNT(DISTINCT)/MEDIAN/pNN/MODE) and
:class:`~..operators.join_view.IncrementalJoinView` for two-table
equi-join aggregates (sum/count/count(col)/avg plus the round-12
touched-group-recompute min/max). ``REFRESH MATERIALIZED
VIEW`` folds the unprocessed change feed(s); reads are SNAPSHOT reads of
the maintained state (stale until refreshed — standard MV semantics,
unlike the late-bound plain views).

Supported SELECT shape (anything else raises with the reason):

    SELECT g1, g2, ..., agg(col) AS name, ...
    FROM t1 [JOIN t2 USING (k, ...) | JOIN t2 ON t1.k = t2.k [AND ...]]
       [JOIN t3 USING (...) | ON ...] ...
    [WHERE <row predicate>]
    GROUP BY g1, g2, ...
    [HAVING <predicate over output aliases / group cols>]

WHERE filters rows BEFORE aggregation and is maintained incrementally
(a stateless predicate commutes with signed-delta maintenance; the
min/max recompute reads the base through it). HAVING filters the
ASSEMBLED view at read time. Neither accepts subqueries or window
functions.

A chain of joins maintains via :class:`IncrementalChainJoinView` — each
JOIN's keys bind table i to the accumulated prefix by name equality.

Aggregates: count(*), count(c) (non-null), sum(c), avg(c), min(c),
max(c), and — single-table only — count(distinct c), median(c), mode(c),
pNN(c) (p90, p75...).
Every aggregate needs an AS alias (the alias is the state column name).
"""

from __future__ import annotations

import re

from incremental_etl_on_lakehouse_spark.lake.sql import (
    split_top_level,
    strip_comments,
)

_NAME = r"[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?"

_AGG_RE = re.compile(
    r"^(?P<fn>[A-Za-z_]\w*)\s*\(\s*(?P<dis>DISTINCT\s+)?(?P<arg>\*|[A-Za-z_]\w*)"
    r"\s*\)\s+AS\s+(?P<alias>[A-Za-z_]\w*)$",
    re.IGNORECASE,
)

# aggregate kinds only the single-table maintainer supports (quantile-
# class state over a join would need the full per-group join result)
SINGLE_ONLY = {"count_distinct", "median", "mode"}


def parse_matview_select(sql: str) -> dict:
    """Parse the restricted MV SELECT into a spec:
    ``{"tables": [t1] | [t1, t2], "join_keys": [...] | None,
    "group_cols": [...], "aggs": {alias: (kind, col)}}``."""
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"SELECT\s+(?P<items>.*?)\s+FROM\s+(?P<t1>{_NAME})"
        rf"(?P<joins>(?:\s+(?:LEFT\s+(?:OUTER\s+)?)?JOIN\s+{_NAME}\s+"
        rf"(?:USING\s*\([^)]+\)"
        rf"|ON\s+(?:(?!\bJOIN\b|\bGROUP\b|\bWHERE\b).)*?))*)"
        rf"(?:\s+WHERE\s+(?P<where>(?:(?!\bGROUP\s+BY\b).)+?))?"
        rf"\s+GROUP\s+BY\s+(?P<grp>.+?)"
        rf"(?:\s+HAVING\s+(?P<having>.+))?$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(
            "unsupported materialized-view shape: need SELECT <group cols +"
            " aliased aggregates> FROM t [JOIN t2 USING(k)|ON a.k = b.k]..."
            " [WHERE <row predicate>] GROUP BY <group cols>"
            " [HAVING <predicate over output aliases>]"
        )
    for clause in ("where", "having"):
        pred = m.group(clause)
        if pred and re.search(
            r"\(\s*SELECT\b|\bOVER\s*\(", pred, re.IGNORECASE
        ):
            raise ValueError(
                f"{clause.upper()} supports plain row predicates only "
                "(no subqueries or window functions) — stage those in a "
                "silver table"
            )
    tables = [m.group("t1")]
    edges: list[list[str]] = [[]]
    hows: list[str] = []
    for jm in re.finditer(
        rf"\s+(?P<left>LEFT\s+(?:OUTER\s+)?)?JOIN\s+(?P<t>{_NAME})\s+"
        rf"(?:USING\s*\((?P<using>[^)]+)\)"
        rf"|ON\s+(?P<on>(?:(?!\bJOIN\b).)*?)(?=\s+(?:LEFT\s+)?JOIN\b|$))",
        m.group("joins") or "",
        re.IGNORECASE | re.DOTALL,
    ):
        tables.append(jm.group("t"))
        hows.append("left" if jm.group("left") else "inner")
        if jm.group("using"):
            edges.append(
                [c.strip().strip("`") for c in jm.group("using").split(",")]
            )
        else:
            keys = []
            for clause in re.split(
                r"\bAND\b", jm.group("on"), flags=re.IGNORECASE
            ):
                em = re.match(rf"\s*({_NAME})\s*=\s*({_NAME})\s*$", clause)
                if not em:
                    raise ValueError(
                        f"join condition must be equality of columns: "
                        f"{clause.strip()!r}"
                    )
                l, r = (x.split(".")[-1] for x in em.groups())
                if l != r:
                    raise ValueError(
                        f"join columns must have the same name on both sides "
                        f"(got {l!r} = {r!r}) — the maintainer joins by name"
                    )
                keys.append(l)
            edges.append(keys)
    how = "inner"
    if any(h == "left" for h in hows):
        if len(tables) != 2:
            raise ValueError(
                "LEFT JOIN materialized views support exactly two tables "
                "— stage the inner chain in a PUBLISHed MV and LEFT JOIN "
                "over it"
            )
        how = "left"
    join_keys = edges[1] if len(tables) == 2 else None
    group_cols: list[str] = []
    aggs: dict[str, tuple[str, str]] = {}
    for item in split_top_level(m.group("items")):
        item = item.strip()
        am = _AGG_RE.match(item)
        if am:
            fn = am.group("fn").lower()
            arg = am.group("arg")
            if am.group("dis"):
                if fn != "count":
                    raise ValueError(f"DISTINCT only with count: {item!r}")
                fn = "count_distinct"
            if fn not in (
                "count", "count_distinct", "sum", "avg", "min", "max",
                "median", "mode",
            ) and not re.fullmatch(r"p[1-9]\d?", fn):
                raise ValueError(f"unsupported aggregate: {item!r}")
            aggs[am.group("alias")] = (fn, arg)
        elif re.fullmatch(r"[A-Za-z_]\w*", item):
            group_cols.append(item)
        else:
            raise ValueError(
                f"unsupported select item {item!r}: bare group columns and"
                " aliased aggregates only"
            )
    grp = [c.strip().strip("`") for c in m.group("grp").split(",")]
    if grp != group_cols:
        raise ValueError(
            f"GROUP BY {grp} must list exactly the bare select columns "
            f"{group_cols}, in order"
        )
    if not aggs:
        raise ValueError("a materialized view needs at least one aggregate")
    if len(tables) >= 2:
        # min/max joined the join-view family in round 12 (touched-group
        # recompute); quantiles/mode/count-distinct still need per-group
        # join-result state
        bad = [n for n, (k, c) in aggs.items()
               if k in SINGLE_ONLY or re.fullmatch(r"p[1-9]\d?", k)]
        if bad:
            raise ValueError(
                f"join materialized views support sum/count/count(col)/"
                f"avg/min/max only; {bad} need per-group join-result "
                "state"
            )
    return {
        "tables": tables,
        "join_keys": join_keys,
        "edges": edges if len(tables) >= 2 else None,
        "group_cols": group_cols,
        "aggs": aggs,
        "where": (m.group("where") or "").strip() or None,
        "having": (m.group("having") or "").strip() or None,
        "how": how,
    }


def build_maintainer(
    spark,
    spec: dict,
    table_paths: list[str],
    root: str,
    publish: bool = False,
):
    """Instantiate (or REHYDRATE from ``root`` — both maintainers resume
    from their persisted state + checkpoints) the maintenance object for
    a parsed spec."""
    from incremental_etl_on_lakehouse_spark.lake.table import LakeTable
    from incremental_etl_on_lakehouse_spark.operators.cdc import (
        IncrementalAggView,
    )
    from incremental_etl_on_lakehouse_spark.operators.join_view import (
        IncrementalChainJoinView,
        IncrementalJoinView,
    )

    aggs = {k: tuple(v) for k, v in spec["aggs"].items()}
    where = spec.get("where")
    how = spec.get("how", "inner")
    if len(table_paths) == 1:
        return IncrementalAggView(
            LakeTable(spark, table_paths[0]),
            root,
            group_cols=spec["group_cols"],
            aggs=aggs,
            where=where,
            publish=publish,
        )
    if len(table_paths) == 2:
        return IncrementalJoinView(
            LakeTable(spark, table_paths[0]),
            LakeTable(spark, table_paths[1]),
            root,
            join_keys=spec.get("join_keys") or spec["edges"][1],
            group_cols=spec["group_cols"],
            aggs=aggs,
            publish=publish,
            where=where,
            how=how,
        )
    return IncrementalChainJoinView(
        [LakeTable(spark, p) for p in table_paths],
        spec["edges"],
        root,
        group_cols=spec["group_cols"],
        aggs=aggs,
        publish=publish,
        where=where,
    )
