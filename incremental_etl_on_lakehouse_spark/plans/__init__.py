"""Physical-plan introspection helpers.

The engine's performance story depends on plans having the right shape —
filters pushed into the parquet scan, small dimensions broadcast, codegen
covering the hot expressions. These helpers make those properties assertable
in tests and inspectable in notebooks, so a plan regression fails CI instead
of surfacing as a 10x slowdown at deployment scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, fragment: str | None = None) -> bool:
    """True if the scan reports pushed filters (optionally containing
    ``fragment``)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line and "[]" not in line.split("PushedFilters:")[1][:4]:
            if fragment is None or fragment in line:
                return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:")[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            # split only at TOP-LEVEL commas: decimal(p,s) and nested
            # struct<...>/map<...> types carry commas of their own, which
            # a naive split turns into phantom column names ('2)')
            depth = 0
            part_start = 0
            parts: list[str] = []
            for i, ch in enumerate(inner):
                if ch in "(<":
                    depth += 1
                elif ch in ")>":
                    depth -= 1
                elif ch == "," and depth == 0:
                    parts.append(inner[part_start:i])
                    part_start = i + 1
            parts.append(inner[part_start:])
            for part in parts:
                name = part.split(":")[0].strip()
                if name:
                    cols.append(name)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)  # format once: explainString is a JVM call
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan.

    Counts only the detail entries ("(N) Exchange"), not the tree echo, and
    excludes broadcast exchanges (those are the cheap kind).
    """
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))


def exchange_partitionings(df: DataFrame) -> list[str]:
    """The partitioning argument of every Exchange in the physical plan
    (e.g. ``hashpartitioning(__lh#25L, 32)``, ``RoundRobinPartitioning(32)``,
    ``rangepartitioning(doc_id#0L ASC NULLS FIRST, 32)``) — lets tests pin
    WHAT a shuffle is keyed on, not just how many there are."""
    import re

    plan = formatted_plan(df)
    lines = plan.splitlines()
    out: list[str] = []
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Exchange\b", line):
            for j in range(i, min(i + 6, len(lines))):
                if "Arguments:" in lines[j]:
                    out.append(lines[j].split("Arguments:")[1].strip())
                    break
    return out


def exchange_inputs(df: DataFrame) -> list[tuple[str, str]]:
    """(partitioning, input-columns) for every Exchange in the physical
    plan — lets tests pin WHAT PAYLOAD a shuffle carries, not just its
    keys (e.g. assert a band-bucket exchange ships 8-byte ids, not the
    shingle arrays the exact rescore needs later)."""
    import re

    plan = formatted_plan(df)
    lines = plan.splitlines()
    out: list[tuple[str, str]] = []
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Exchange\b", line):
            part = inp = ""
            for j in range(i, min(i + 6, len(lines))):
                if "Arguments:" in lines[j]:
                    part = lines[j].split("Arguments:")[1].strip()
                if re.search(r"^Input \[\d+\]:", lines[j]):
                    inp = lines[j].split(":", 1)[1].strip()
            out.append((part, inp))
    return out


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees (from the codegen explain —
    the AQE formatted plan hides codegen markers before execution)."""
    import re

    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0
