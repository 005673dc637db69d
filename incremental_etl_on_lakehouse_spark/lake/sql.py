"""SQL ``MERGE INTO`` front-end over :class:`LakeTable.merge`.

The reference drives its merges as SQL text through ``spark.sql``
(``notebooks/demo-notebook.py:244-280`` CDC upsert, ``:393-425`` additive
aggregate merge). OSS Spark without delta-spark has no MERGE target, so this
module parses the statement and executes it via the engine's programmatic
merge — the reference's MERGE text ports verbatim (modulo table names).

Supported grammar (the reference's full surface):

    MERGE INTO <table> [AS] [alias]
    USING (<subquery>) | <view> [AS] [alias]
    ON <condition>
    { WHEN MATCHED [AND <cond>] THEN DELETE
    | WHEN MATCHED [AND <cond>] THEN UPDATE SET * | UPDATE SET c = e [, ...]
    | WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN INSERT *
    | WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN INSERT (c, ...) VALUES (e, ...)
    | WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE
    | WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET c = e [, ...] }...

plus ``--`` comments anywhere and ``QUALIFY`` inside the source subquery
(Databricks/Snowflake syntax the reference relies on, rewritten here to a
wrapped ``WHERE`` because OSS Spark doesn't parse it).

Parsing is a small scanner, not a grammar: MERGE's clause structure is flat
and keyword-delimited, so quote/paren-aware splitting is exact for it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from incremental_etl_on_lakehouse_spark.lake.table import LakeTable, MergeClause

_IDENT = r"[A-Za-z_][\w.$]*"


def _skip_quoted(s: str, i: int) -> int:
    """``s[i]`` is an opening quote (``'``, ``"``, or backtick): return the
    index just past the closing quote. A doubled quote char is the escape
    for all three (SQL string escapes, quoted identifiers); string
    literals (``'``/``"``) additionally honor Spark's default backslash
    escapes (``\\'``, ``\\"``, ``\\\\``) — backtick identifiers do not.
    An unterminated quote consumes to end-of-input."""
    q = s[i]
    j, n = i + 1, len(s)
    while j < n:
        c = s[j]
        if c == "\\" and q != "`" and j + 1 < n:
            j += 2  # backslash escape: next char is content
            continue
        if c == q:
            if j + 1 < n and s[j + 1] == q:
                j += 2
                continue
            return j + 1
        j += 1
    return n


def strip_comments(sql: str) -> str:
    """Remove ``-- ...`` line comments, leaving quoted spans untouched —
    single-quoted strings, double-quoted strings, AND backtick identifiers
    (a ``--`` inside any of them is content, not a comment)."""
    out = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in "'\"`":
            j = _skip_quoted(sql, i)
            out.append(sql[i:j])
            i = j
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _depths(s: str) -> list[int]:
    """Paren depth at each index — quote-aware across all three quoted-span
    kinds (single/double-quoted strings, backtick identifiers), so a paren
    inside any of them never changes depth."""
    depths, d, i, n = [0] * len(s), 0, 0, len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            j = _skip_quoted(s, i)
            for k in range(i, min(j, n)):
                depths[k] = d
            i = j
            continue
        if c == "(":
            d += 1
        elif c == ")":
            d -= 1
        depths[i] = d
        i += 1
    return depths


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren depth 0 — quote-aware across single- and
    double-quoted strings and backtick identifiers (a ``sep`` inside any
    quoted span is content: ``SET v = "a,b"`` is ONE assignment)."""
    parts, buf, depth = [], [], 0
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            j = _skip_quoted(s, i)
            buf.append(s[i:j])
            i = j
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def rewrite_qualify(sql: str) -> str:
    """Rewrite every ``SELECT ... QUALIFY pred`` into
    ``SELECT * FROM (SELECT ...) WHERE pred`` (OSS Spark has no QUALIFY).

    The predicate's window-function aliases must be columns of the inner
    select — true for the reference's ``ROW_NUMBER() ... AS rnk QUALIFY
    rnk = 1`` and for QUALIFY's standard usage.
    """
    while True:
        m = re.search(r"\bQUALIFY\b", sql, re.IGNORECASE)
        if not m:
            return sql
        depths = _depths(sql)
        qpos = m.start()
        d = depths[qpos]
        # owning SELECT: nearest preceding SELECT at the same depth
        sel = None
        for sm in re.finditer(r"\bSELECT\b", sql[:qpos], re.IGNORECASE):
            if depths[sm.start()] == d:
                sel = sm.start()
        if sel is None:
            raise ValueError("QUALIFY without an owning SELECT")
        # predicate extends until the enclosing paren closes (depth < d)
        pend = len(sql)
        for i in range(m.end(), len(sql)):
            if depths[i] < d:
                pend = i
                break
        inner = sql[sel:qpos].rstrip()
        pred = sql[m.end() : pend].strip()
        sql = (
            sql[:sel]
            + "SELECT * FROM ( "
            + inner
            + " ) WHERE "
            + pred
            + " "
            + sql[pend:]
        )


@dataclass
class MergeStatement:
    target_name: str
    target_alias: str | None
    source_text: str  # subquery text OR view/table name
    source_is_subquery: bool
    source_alias: str | None
    on_condition: str
    clauses: list[MergeClause] = field(default_factory=list)
    schema_evolution: bool = False


def _canonicalize(expr: str, stmt: MergeStatement) -> str:
    """Rewrite ``<alias>.`` qualifiers to the engine's ``source.``/``target.``.
    Quote-aware like :func:`_strip_alias`: spans inside single-quoted
    string literals pass through untouched (``VALUES (s.id, 's. note')``
    must keep its literal byte-for-byte)."""
    pairs = []
    if stmt.target_alias:
        pairs.append((stmt.target_alias, "target"))
    pairs.append((stmt.target_name, "target"))
    if stmt.source_alias:
        pairs.append((stmt.source_alias, "source"))
    if not stmt.source_is_subquery:
        pairs.append((stmt.source_text, "source"))
    pairs = [(n, c) for n, c in pairs if n and n != c]

    def seg(segment: str) -> str:
        for name, canon in pairs:
            segment = re.sub(
                rf"\b{re.escape(name)}\s*\.",
                canon + ".",
                segment,
                flags=re.IGNORECASE,
            )
        return segment

    out, pos = [], 0
    for lm in _LITERAL.finditer(expr):
        out.append(seg(expr[pos : lm.start()]))
        out.append(lm.group(0))
        pos = lm.end()
    out.append(seg(expr[pos:]))
    return "".join(out).strip()


def _parse_action(
    action: str, matched: bool, cond: str | None, by_source: bool = False
) -> MergeClause:
    a = action.strip()
    if by_source:
        # WHEN NOT MATCHED BY SOURCE THEN DELETE | UPDATE SET c = e, ...
        if re.fullmatch(r"DELETE", a, re.IGNORECASE):
            return MergeClause("delete_by_source", cond)
        m = re.fullmatch(r"UPDATE\s+SET\s+(.*)", a, re.IGNORECASE | re.DOTALL)
        if m:
            body = m.group(1).strip()
            if body == "*":
                raise ValueError(
                    "NOT MATCHED BY SOURCE UPDATE SET * is invalid — "
                    "there is no source row"
                )
            assignments = {}
            for part in split_top_level(body):
                k, _, v = part.partition("=")
                col = k.strip().split(".")[-1].strip("` ")
                assignments[col] = v.strip()
            return MergeClause("update_by_source", cond, assignments)
        raise ValueError(f"unsupported NOT MATCHED BY SOURCE action: {a!r}")
    if matched and re.fullmatch(r"DELETE", a, re.IGNORECASE):
        return MergeClause("delete", cond)
    m = re.fullmatch(r"UPDATE\s+SET\s+(.*)", a, re.IGNORECASE | re.DOTALL)
    if m and matched:
        body = m.group(1).strip()
        if body == "*":
            return MergeClause("update", cond, "*")
        assignments = {}
        for part in split_top_level(body):
            k, _, v = part.partition("=")
            col = k.strip().split(".")[-1].strip("` ")
            assignments[col] = v.strip()
        return MergeClause("update", cond, assignments)
    m = re.fullmatch(r"INSERT\s+\*", a, re.IGNORECASE)
    if m and not matched:
        return MergeClause("insert", cond, "*")
    m = re.fullmatch(
        r"INSERT\s*\((?P<cols>.*?)\)\s*VALUES\s*\((?P<vals>.*)\)",
        a,
        re.IGNORECASE | re.DOTALL,
    )
    if m and not matched:
        cols = [c.strip().split(".")[-1].strip("` ") for c in split_top_level(m.group("cols"))]
        vals = split_top_level(m.group("vals"))
        if len(cols) != len(vals):
            raise ValueError(f"INSERT column/value arity mismatch: {a}")
        return MergeClause("insert", cond, dict(zip(cols, vals)))
    raise ValueError(f"unsupported MERGE action: {a!r} (matched={matched})")


def parse_merge(sql: str) -> MergeStatement:
    s = strip_comments(sql).rstrip().rstrip(";")
    m = re.match(
        rf"\s*MERGE\s+(?P<evo>WITH\s+SCHEMA\s+EVOLUTION\s+)?"
        rf"INTO\s+(?P<target>{_IDENT})"
        rf"(?:\s+AS)?(?:\s+(?P<talias>{_IDENT}))?\s+USING\b",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError("not a MERGE INTO statement")
    schema_evolution = m.group("evo") is not None
    target, talias = m.group("target"), m.group("talias")
    pos = m.end()
    while pos < len(s) and s[pos].isspace():
        pos += 1
    if pos < len(s) and s[pos] == "(":
        depths = _depths(s)
        close = next(
            i for i in range(pos + 1, len(s)) if depths[i] == depths[pos] - 1
        )
        source_text, source_is_subquery = s[pos + 1 : close].strip(), True
        pos = close + 1
    else:
        im = re.match(rf"(?P<src>{_IDENT})", s[pos:])
        if not im:
            raise ValueError("missing USING source")
        source_text, source_is_subquery = im.group("src"), False
        pos += im.end()
    am = re.match(
        rf"\s*(?:AS\s+)?(?:(?P<salias>{_IDENT})\s+)?ON\s+",
        s[pos:],
        re.IGNORECASE | re.DOTALL,
    )
    if not am or (am.group("salias") or "").upper() == "ON":
        raise ValueError("missing ON condition")
    salias = am.group("salias")
    pos += am.end()
    wm = re.search(r"\bWHEN\s+(?:NOT\s+)?MATCHED\b", s[pos:], re.IGNORECASE)
    if not wm:
        raise ValueError("MERGE has no WHEN clauses")
    stmt = MergeStatement(
        target_name=target,
        target_alias=talias,
        source_text=source_text,
        source_is_subquery=source_is_subquery,
        source_alias=salias,
        on_condition=s[pos : pos + wm.start()].strip(),
        clauses=[],
        schema_evolution=schema_evolution,
    )
    clause_re = re.compile(
        r"WHEN\s+(?P<not>NOT\s+)?MATCHED"
        r"(?:\s+BY\s+(?P<by>SOURCE|TARGET))?"
        r"(?:\s+AND\s+(?P<cond>.*?))?\s+THEN\s+"
        r"(?P<action>.*?)(?=\s*WHEN\s+(?:NOT\s+)?MATCHED\b|\s*$)",
        re.IGNORECASE | re.DOTALL,
    )
    for cm in clause_re.finditer(s[pos + wm.start() :]):
        matched = cm.group("not") is None
        by = (cm.group("by") or "").upper()
        if by and matched:
            raise ValueError(f"WHEN MATCHED BY {by} is not valid MERGE grammar")
        # NOT MATCHED [BY TARGET] = insert; NOT MATCHED BY SOURCE = the
        # target-sided clause family (Delta grammar)
        by_source = by == "SOURCE"
        cond = cm.group("cond")
        cond = _canonicalize(cond, stmt) if cond else None
        action = _canonicalize(cm.group("action"), stmt)
        stmt.clauses.append(
            _parse_action(action.strip(), matched, cond, by_source=by_source)
        )
    stmt.on_condition = _canonicalize(stmt.on_condition, stmt)
    if not stmt.clauses:
        raise ValueError("MERGE has no parseable WHEN clauses")
    return stmt


_LITERAL = re.compile(r"'(?:[^']|'')*'")


def _strip_alias(expr: str, names: list[str | None]) -> str:
    """Remove ``<alias>.``/``<table>.`` qualifiers: UPDATE/DELETE conditions
    refer to the single target table, whose columns are unqualified in the
    engine's programmatic API.  Quote-aware: spans inside single-quoted
    string literals pass through untouched (``SET note = 'see t.example'``
    must keep its literal byte-for-byte)."""
    pats = [
        re.compile(rf"\b{re.escape(n)}\s*\.", re.IGNORECASE)
        for n in names
        if n
    ]

    def strip_segment(seg: str) -> str:
        for pat in pats:
            seg = pat.sub("", seg)
        return seg

    out, pos = [], 0
    for lm in _LITERAL.finditer(expr):
        out.append(strip_segment(expr[pos : lm.start()]))
        out.append(lm.group(0))
        pos = lm.end()
    out.append(strip_segment(expr[pos:]))
    return "".join(out).strip()


def parse_update(sql: str) -> tuple[str, dict[str, str], str | None]:
    """``UPDATE <table> [AS] [alias] SET c = e [, ...] [WHERE cond]`` ->
    (table, assignments, condition)."""
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"UPDATE\s+(?P<t>{_IDENT})(?:\s+AS)?(?:\s+(?P<a>{_IDENT}))?\s+SET\s+",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if not m or (m.group("a") or "").upper() == "SET":
        raise ValueError("not an UPDATE statement")
    table, alias = m.group("t"), m.group("a")
    rest = s[m.end():]
    # quote/paren-aware WHERE search: 'WHERE' inside a string literal or a
    # subexpression must not terminate the SET list
    depths = _depths(rest)
    wpos = None
    for km in re.finditer(r"\bWHERE\b", rest, re.IGNORECASE):
        i = km.start()
        if depths[i] == 0 and rest[:i].count("'") % 2 == 0:
            wpos = km
            break
    set_text, cond = (
        (rest[: wpos.start()], rest[wpos.end():].strip())
        if wpos
        else (rest, None)
    )
    names = [alias, table]
    assignments = {}
    for part in split_top_level(set_text):
        k, eq, v = part.partition("=")
        if not eq:
            raise ValueError(f"bad SET assignment: {part!r}")
        col = k.strip().split(".")[-1].strip("` ")
        assignments[col] = _strip_alias(v, names)
    if not assignments:
        raise ValueError("UPDATE with empty SET list")
    return table, assignments, (_strip_alias(cond, names) if cond else None)


def parse_delete(sql: str) -> tuple[str, str | None]:
    """``DELETE FROM <table> [AS] [alias] [WHERE cond]`` ->
    (table, condition)."""
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"DELETE\s+FROM\s+(?P<t>{_IDENT})(?:\s+AS)?(?:\s+(?P<a>{_IDENT}))?"
        rf"(?:\s+WHERE\s+(?P<c>.*))?\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if not m or (m.group("a") or "").upper() == "WHERE":
        raise ValueError("not a DELETE statement")
    table, alias, cond = m.group("t"), m.group("a"), m.group("c")
    return table, (_strip_alias(cond, [alias, table]) if cond else None)


def parse_insert(sql: str) -> tuple[str, list[str] | None, str, str]:
    """``INSERT INTO|OVERWRITE [TABLE] <t> [(col, ...)] VALUES ...|SELECT ...``
    -> (table, column_list_or_None, mode 'into'|'overwrite', query_text).

    The source query is handed to ``spark.sql`` verbatim, so any Spark
    SELECT (over temp views) or VALUES list works. The SELECT must not be
    wrapped in parentheses (write ``INSERT INTO t SELECT ...``)."""
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?:TABLE\s+)?(?P<t>{_IDENT})\s*"
        rf"(?:\((?P<cols>[^)]*)\)\s*)?(?P<q>(?:VALUES|SELECT)\b.*)$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"unparseable INSERT statement: {sql!r}")
    cols = (
        [c.strip().strip("`") for c in m.group("cols").split(",")]
        if m.group("cols")
        else None
    )
    return (
        m.group("t"),
        cols,
        "into" if m.group("mode").upper() == "INTO" else "overwrite",
        m.group("q"),
    )


def execute_insert(spark: SparkSession, sql: str, resolve) -> int:
    """Run ``INSERT INTO`` (append) / ``INSERT OVERWRITE`` (replace) against
    a lake table. Without a column list the source is positional and must
    supply every writable column (identity columns are auto-generated and
    may not be supplied — Delta's contract); with a column list, absent
    columns fill as NULL or their generated-column expression (``_align``).
    Returns the new table version."""
    table, cols, mode, q = parse_insert(sql)
    target = _resolve(resolve, table)
    df = spark.sql(q)
    schema = target.schema()
    identity = set(target.identity_columns())
    if cols is None:
        writable = [f.name for f in schema.fields if f.name not in identity]
        if len(df.columns) != len(writable):
            raise ValueError(
                f"INSERT without column list must supply all {len(writable)} "
                f"columns of {table}, got {len(df.columns)}"
            )
        df = df.toDF(*writable)
    else:
        known = {f.name for f in schema.fields}
        bad = [c for c in cols if c not in known]
        if bad:
            raise ValueError(f"unknown columns in INSERT list: {bad}")
        if len(cols) != len(df.columns):
            raise ValueError(
                f"INSERT column list has {len(cols)} names but the source "
                f"query produces {len(df.columns)} columns"
            )
        df = df.toDF(*cols)
    if mode == "into":
        return target.append(df)
    return target.overwrite(df)  # overwrite aligns internally


def parse_create_table(sql: str) -> dict:
    """``CREATE TABLE [IF NOT EXISTS] <t> [(coldefs)] [USING <fmt>]
    [PARTITIONED BY (c, ...)] [TBLPROPERTIES (k = v, ...)] [AS SELECT ...]``

    Returns {table, if_not_exists, columns: [(name, type_ddl)], not_null:
    [col], generated: {col: expr}, identity: {col: (start, step)},
    partition_by: [col], properties: {k: v}, select: str|None}.

    Accepts the reference's DDL verbatim (``notebooks/demo-notebook.py:
    213-227``): the ``delta.`` property prefix is stripped (this engine's
    lake layer uses the bare names), and Delta's column clauses NOT NULL /
    GENERATED ALWAYS AS (expr) / GENERATED ALWAYS AS IDENTITY
    [(START WITH s INCREMENT BY i)] are recognized.
    """
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"CREATE\s+(?P<orr>OR\s+REPLACE\s+)?TABLE\s+"
        rf"(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<t>{_IDENT})\s*"
        rf"(?P<rest>.*)$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"unparseable CREATE TABLE statement: {sql!r}")
    if m.group("orr") and m.group("ine"):
        raise ValueError(
            "CREATE OR REPLACE TABLE cannot also be IF NOT EXISTS"
        )
    out: dict = {
        "table": m.group("t"),
        "or_replace": bool(m.group("orr")),
        "if_not_exists": bool(m.group("ine")),
        "columns": [],
        "not_null": [],
        "generated": {},
        "identity": {},
        "partition_by": [],
        "properties": {},
        "select": None,
        "location": None,
    }
    rest = m.group("rest").strip()
    if rest.startswith("("):
        depth = 0
        for i, c in enumerate(rest):
            depth += c == "("
            depth -= c == ")"
            if depth == 0:
                break
        coldefs, rest = rest[1:i], rest[i + 1 :].strip()
        for cd in split_top_level(coldefs):
            im = re.search(
                r"\s+GENERATED\s+ALWAYS\s+AS\s+IDENTITY"
                r"(?:\s*\(\s*START\s+WITH\s+(-?\d+)\s+INCREMENT\s+BY\s+"
                r"(-?\d+)\s*\))?\s*$",
                cd,
                re.IGNORECASE,
            )
            ident = None
            if im:
                ident = (int(im.group(1) or 1), int(im.group(2) or 1))
                cd = cd[: im.start()]
            gm = re.search(
                r"\s+GENERATED\s+ALWAYS\s+AS\s+\((.*)\)\s*$",
                cd,
                re.IGNORECASE | re.DOTALL,
            )
            gen = None
            if gm:
                gen = gm.group(1).strip()
                cd = cd[: gm.start()]
            nn = re.search(r"\s+NOT\s+NULL\s*$", cd, re.IGNORECASE)
            if nn:
                cd = cd[: nn.start()]
            cm = re.match(r"`?([\w]+)`?\s+(.+)$", cd.strip(), re.DOTALL)
            if not cm:
                raise ValueError(f"unparseable column definition: {cd!r}")
            name, typ = cm.group(1), " ".join(cm.group(2).split())
            out["columns"].append((name, typ))
            if nn:
                out["not_null"].append(name)
            if gen:
                out["generated"][name] = gen
            if ident:
                out["identity"][name] = ident
    pm = re.search(
        r"PARTITIONED\s+BY\s*\(([^)]*)\)", rest, re.IGNORECASE
    )
    if pm:
        out["partition_by"] = [
            c.strip().strip("`") for c in pm.group(1).split(",")
        ]
    tm = re.search(r"TBLPROPERTIES\s*\(", rest, re.IGNORECASE)
    if tm:
        # paren-depth scan to the MATCHING close paren: a lazy regex up to
        # ')\s*(AS|$)' backtracks past any later clause (e.g. PARTITIONED
        # BY after TBLPROPERTIES), silently corrupting property values
        depths = _depths(rest)
        open_idx = tm.end() - 1
        close_idx = next(
            (
                i
                for i in range(open_idx + 1, len(rest))
                if rest[i] == ")" and depths[i] == depths[open_idx] - 1
            ),
            None,
        )
        if close_idx is None:
            # callers treat ValueError as "parse failure"; a bare
            # StopIteration from next() would escape as the wrong kind
            raise ValueError("unbalanced TBLPROPERTIES parentheses")
        for kv in split_top_level(rest[tm.end():close_idx]):
            k, _, v = kv.partition("=")
            k = k.strip().strip("'\"`")
            if k.lower().startswith("delta."):
                k = k[len("delta."):]
            out["properties"][k] = v.strip().strip("'\"")
    lm = re.search(r"\bLOCATION\s+'([^']*)'", rest, re.IGNORECASE)
    if lm:
        out["location"] = lm.group(1)
    am = re.search(r"\bAS\s+(SELECT\b.*)$", rest, re.IGNORECASE | re.DOTALL)
    if am:
        out["select"] = am.group(1)
    if not out["columns"] and not out["select"]:
        raise ValueError("CREATE TABLE needs a column list or AS SELECT")
    return out


def execute_create_table(
    spark: SparkSession, sql: str, resolve=None, dest_path: str | None = None
) -> LakeTable:
    """Run CREATE TABLE [...] / CREATE TABLE ... AS SELECT against the lake
    layer. ``dest_path`` is the filesystem location for the new table (the
    stand-in for a catalog's name->location mapping, as with CLONE)."""
    p = parse_create_table(sql)
    if dest_path is None:
        # an explicit LOCATION clause IS the destination (Delta's external
        # table spelling); without either there is nowhere to create
        dest_path = p["location"]
    if dest_path is None:
        raise ValueError(
            "CREATE TABLE requires dest_path or a LOCATION clause"
        )
    props = dict(p["properties"])
    for col, expr in p["generated"].items():
        props[f"generated.{col}"] = expr
    for col, (start, step) in p["identity"].items():
        props[f"identity.{col}"] = f"{start},{step}"
    if p["columns"]:
        schema = StructType.fromDDL(
            ", ".join(f"{n} {t}" for n, t in p["columns"])
        )
    else:
        schema = spark.sql(p["select"]).schema
    if p.get("or_replace") and LakeTable.exists(dest_path):
        t = LakeTable(spark, dest_path)
        t.replace_definition(
            schema,
            properties=props,
            partition_by=p["partition_by"] or None,
        )
        for col in p["not_null"]:
            t.add_not_null(col)
        if p["select"]:
            t.append(spark.sql(p["select"]))
        return t
    existed = bool(LakeTable.exists(dest_path)) and p["if_not_exists"]
    t = LakeTable.create(
        spark,
        dest_path,
        schema,
        properties=props,
        if_not_exists=p["if_not_exists"],
        partition_by=p["partition_by"] or None,
    )
    if existed:
        return t  # IF NOT EXISTS no-op: leave constraints/content untouched
    for col in p["not_null"]:
        t.add_not_null(col)
    if p["select"]:
        t.append(spark.sql(p["select"]))
    return t


def _resolve(resolve, name: str) -> LakeTable:
    if isinstance(resolve, LakeTable):
        return resolve
    if isinstance(resolve, dict):
        return resolve[name]
    return resolve(name)


def execute_update(spark: SparkSession, sql: str, resolve) -> int:
    """Parse + run an UPDATE statement against a lake table (Delta's SQL
    UPDATE surface); returns the new version."""
    table, assignments, cond = parse_update(sql)
    return _resolve(resolve, table).update(assignments, cond)


def execute_delete(spark: SparkSession, sql: str, resolve) -> int:
    """Parse + run a DELETE FROM statement against a lake table; returns
    the new version. DELETE with no WHERE truncates (all rows removed),
    matching SQL semantics."""
    table, cond = parse_delete(sql)
    target = _resolve(resolve, table)
    return target.delete(cond if cond is not None else "true")


def execute_merge(
    spark: SparkSession,
    sql: str,
    resolve,
    source_df: DataFrame | None = None,
    stats_prune: dict[str, str] | None = None,
) -> dict:
    """Parse + run a MERGE INTO statement against a lake table.

    ``resolve``: LakeTable, dict name->LakeTable, or callable name->LakeTable
    (the stand-in for a catalog lookup). ``source_df`` overrides the USING
    source (useful inside foreachBatch where the batch is already a frame).
    Returns the merge metrics dict.
    """
    stmt = parse_merge(sql)
    if isinstance(resolve, LakeTable):
        target = resolve
    elif isinstance(resolve, dict):
        target = resolve[stmt.target_name]
    else:
        target = resolve(stmt.target_name)
    if source_df is None:
        if stmt.source_is_subquery:
            source_df = spark.sql(rewrite_qualify(stmt.source_text))
        else:
            source_df = spark.table(stmt.source_text)
    return target.merge(
        source_df,
        stmt.on_condition,
        stmt.clauses,
        stats_prune=stats_prune,
        merge_schema=stmt.schema_evolution,
    )


def parse_alter_constraint(sql: str) -> tuple[str, str, str, str | None]:
    """``ALTER TABLE <t> ADD CONSTRAINT <name> CHECK (<expr>)`` or
    ``ALTER TABLE <t> DROP CONSTRAINT [IF EXISTS] <name>`` ->
    (table, action, name, expr|None). Delta's constraint DDL surface."""
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+ADD\s+CONSTRAINT\s+"
        rf"(?P<n>{_IDENT})\s+CHECK\s*\((?P<e>.*)\)\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        return m.group("t"), "add", m.group("n"), m.group("e").strip()
    m = re.match(
        rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+DROP\s+CONSTRAINT\s+"
        rf"(?:IF\s+EXISTS\s+)?(?P<n>{_IDENT})\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        return m.group("t"), "drop", m.group("n"), None
    raise ValueError("not an ALTER TABLE ... CONSTRAINT statement")


def execute_alter_constraint(spark: SparkSession, sql: str, resolve) -> int:
    """Parse + run constraint DDL against a lake table; returns the new
    version. DROP CONSTRAINT IF EXISTS on a missing name is a no-op
    returning the current version."""
    table, action, name, expr = parse_alter_constraint(sql)
    target = _resolve(resolve, table)
    if action == "add":
        return target.add_constraint(name, expr)
    if name not in target.constraints() and re.search(
        r"IF\s+EXISTS", sql, re.IGNORECASE
    ):
        return target.version()
    return target.drop_constraint(name)


def parse_alter_rename_column(sql: str) -> tuple[str, str, str]:
    """``ALTER TABLE <t> RENAME COLUMN <old> TO <new>`` ->
    (table, old, new)."""
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+RENAME\s+COLUMN\s+"
        rf"(?P<o>{_IDENT})\s+TO\s+(?P<n>{_IDENT})\s*$",
        s,
        re.IGNORECASE,
    )
    if not m:
        raise ValueError("not an ALTER TABLE ... RENAME COLUMN statement")
    return m.group("t"), m.group("o").strip("`"), m.group("n").strip("`")


def execute_alter_rename_column(spark: SparkSession, sql: str, resolve) -> int:
    table, old, new = parse_alter_rename_column(sql)
    return _resolve(resolve, table).rename_column(old, new)


def parse_alter_columns(sql: str) -> tuple[str, str, object]:
    """``ALTER TABLE <t> ADD COLUMNS (c1 TYPE, c2 TYPE, ...)`` or
    ``ALTER TABLE <t> DROP COLUMN <c>`` -> (kind, table, payload)."""
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+ADD\s+COLUMNS?\s*"
        rf"\((?P<cols>.+)\)\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        cols = []
        for cd in split_top_level(m.group("cols")):
            cm = re.match(r"`?([\w]+)`?\s+(.+)$", cd.strip(), re.DOTALL)
            if not cm:
                raise ValueError(f"unparseable column definition: {cd!r}")
            cols.append((cm.group(1), " ".join(cm.group(2).split())))
        return "add_columns", m.group("t"), cols
    m = re.match(
        rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+DROP\s+COLUMN\s+"
        rf"`?(?P<c>[\w]+)`?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        return "drop_column", m.group("t"), m.group("c")
    raise ValueError(f"not an ADD/DROP COLUMN statement: {sql!r}")


def execute_alter_columns(spark: SparkSession, sql: str, resolve) -> int:
    kind, table, payload = parse_alter_columns(sql)
    target = _resolve(resolve, table)
    if kind == "add_columns":
        typed = [
            (n, StructType.fromDDL(f"x {t}").fields[0].dataType)
            for n, t in payload
        ]
        return target.add_columns(typed)
    return target.drop_column(payload)


def parse_alter_properties(sql: str) -> tuple[str, str, object]:
    """``ALTER TABLE <t> SET TBLPROPERTIES (k = v, ...)`` or
    ``ALTER TABLE <t> UNSET TBLPROPERTIES (k, ...)``."""
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+SET\s+TBLPROPERTIES\s*"
        rf"\((?P<kv>.+)\)\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        props = {}
        for kv in split_top_level(m.group("kv")):
            k, _, v = kv.partition("=")
            k = k.strip().strip("'\"`")
            if k.lower().startswith("delta."):
                k = k[len("delta."):]
            props[k] = v.strip().strip("'\"")
        return "set", m.group("t"), props
    m = re.match(
        rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+UNSET\s+TBLPROPERTIES\s*"
        rf"\((?P<ks>.+)\)\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        keys = []
        for k in split_top_level(m.group("ks")):
            k = k.strip().strip("'\"`")
            if k.lower().startswith("delta."):
                k = k[len("delta."):]
            keys.append(k)
        return "unset", m.group("t"), keys
    raise ValueError(f"not a SET/UNSET TBLPROPERTIES statement: {sql!r}")


def execute_alter_properties(spark: SparkSession, sql: str, resolve) -> int:
    kind, table, payload = parse_alter_properties(sql)
    target = _resolve(resolve, table)
    if kind == "set":
        return target.set_properties(payload)
    return target.unset_properties(payload)


def parse_copy_into(sql: str) -> tuple[str, str, str, str]:
    """``COPY INTO <t> FROM '<path>' FILEFORMAT = <fmt> [PATTERN = '<glob>']``
    -> (table, source_path, format, pattern)."""
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"COPY\s+INTO\s+(?P<t>{_IDENT})\s+FROM\s+'(?P<p>[^']+)'\s+"
        rf"FILEFORMAT\s*=\s*(?P<f>\w+)"
        rf"(?:\s+PATTERN\s*=\s*'(?P<g>[^']+)')?\s*$",
        s,
        re.IGNORECASE,
    )
    if not m:
        raise ValueError(f"unparseable COPY INTO statement: {sql!r}")
    return m.group("t"), m.group("p"), m.group("f"), m.group("g") or "*"


def execute_copy_into(spark: SparkSession, sql: str, resolve) -> dict:
    table, path, fmt, pattern = parse_copy_into(sql)
    return _resolve(resolve, table).copy_into(path, fmt, pattern)


def parse_utility(sql: str) -> tuple[str, str, dict]:
    """Utility DDL/maintenance statements -> (kind, table, params):

    - ``OPTIMIZE <t> [ZORDER BY (a, b, ...)]``
    - ``VACUUM <t> [LITE] [RETAIN <n> HOURS] [DRY RUN]``
    - ``RESTORE TABLE <t> TO VERSION AS OF <v>``
    - ``CREATE TABLE <c> [SHALLOW|DEEP] CLONE <t>``
    """
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"OPTIMIZE\s+(?P<t>{_IDENT})"
        rf"(?:\s+WHERE\s+(?P<w>.*?))?"
        rf"(?:\s+ZORDER\s+BY\s*\((?P<z>[^)]+)\))?\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        cols = (
            [c.strip().strip("`") for c in m.group("z").split(",")]
            if m.group("z")
            else []
        )
        return "optimize", m.group("t"), {
            "zorder_by": cols,
            "where": (m.group("w") or "").strip() or None,
        }
    m = re.match(
        rf"GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+"
        rf"(?P<t>{_IDENT})\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        return "generate_manifest", m.group("t"), {}
    m = re.match(rf"VACUUM\s+(?P<t>`[^`]+`|{_IDENT})(?P<rest>(?:\s+.*)?)\s*$",
                 s, re.IGNORECASE | re.DOTALL)
    if m:
        t, rest = m.group("t").strip("`"), m.group("rest") or ""
        if m.group("t").upper() == "LITE":
            # a bare identifier LITE is far more likely a misplaced
            # keyword (`VACUUM LITE t`) than a table named LITE; demand
            # backticks for the table so the keyword can never be
            # swallowed silently
            raise ValueError(
                "VACUUM: ambiguous identifier LITE — LITE is the "
                "log-driven-reclaim keyword and goes AFTER the table "
                "name (VACUUM t LITE); a table literally named LITE "
                "must be backtick-quoted (VACUUM `LITE`)"
            )
        # trailing clauses accepted in ANY order, each at most once —
        # `VACUUM t DRY RUN LITE` must not silently drop the LITE
        opts = {"retain_hours": None, "dry_run": False, "lite": False}
        while rest.strip():
            rest = rest.lstrip()
            cm = re.match(r"LITE\b", rest, re.IGNORECASE)
            if cm and not opts["lite"]:
                opts["lite"] = True
                rest = rest[cm.end():]
                continue
            cm = re.match(r"RETAIN\s+(\d+)\s+HOURS\b", rest, re.IGNORECASE)
            if cm and opts["retain_hours"] is None:
                opts["retain_hours"] = int(cm.group(1))
                rest = rest[cm.end():]
                continue
            cm = re.match(r"DRY\s+RUN\b", rest, re.IGNORECASE)
            if cm and not opts["dry_run"]:
                opts["dry_run"] = True
                rest = rest[cm.end():]
                continue
            raise ValueError(
                f"VACUUM: cannot parse clause at {rest.strip()!r} "
                "(expected LITE, RETAIN n HOURS, or DRY RUN, each once)"
            )
        # Delta 3.3's VACUUM ... LITE: log-driven reclaim, no listing
        return "vacuum", t, opts
    m = re.match(
        rf"RESTORE\s+TABLE\s+(?P<t>{_IDENT})\s+TO\s+VERSION\s+AS\s+OF\s+"
        rf"(?P<v>\d+)\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        return "restore", m.group("t"), {"version": int(m.group("v"))}
    m = re.match(
        rf"CREATE\s+TABLE\s+(?P<c>{_IDENT})\s+(?:(?P<k>SHALLOW|DEEP)\s+)?CLONE\s+"
        rf"(?P<t>{_IDENT})\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        return "clone", m.group("t"), {
            "dest": m.group("c"),
            "shallow": (m.group("k") or "SHALLOW").upper() == "SHALLOW",
        }
    m = re.match(
        rf"CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<c>{_IDENT})"
        rf"\s+LIKE\s+(?P<t>{_IDENT})\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        # Delta's CREATE TABLE ... LIKE: a new EMPTY table with the
        # source's schema, table properties (incl. partitioning,
        # constraints, generated/identity columns), and zero data —
        # the definition-copy sibling of CLONE's data-copy
        return "create_like", m.group("t"), {
            "dest": m.group("c"),
            "if_not_exists": bool(m.group("ine")),
        }
    m = re.match(
        r"CONVERT\s+TO\s+LAKE\s+parquet\s*\.\s*`(?P<p>[^`]+)`\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        return "convert", m.group("p"), {}
    raise ValueError("not a supported utility statement")


def execute_utility(spark: SparkSession, sql: str, resolve, dest_path=None):
    """Run OPTIMIZE / VACUUM / RESTORE / CLONE SQL against lake tables.
    ``dest_path``: filesystem path for CLONE's new table (the stand-in for
    a catalog's name->location mapping)."""
    kind, table, p = parse_utility(sql)
    if kind == "convert":
        # CONVERT TO LAKE parquet.`/path`: the "table" IS the directory
        # path — no catalog resolution, the directory becomes the table
        return LakeTable.convert_from_parquet(spark, table)
    target = _resolve(resolve, table)
    if kind == "optimize":
        return target.compact(
            zorder_by=p["zorder_by"] or None, where=p.get("where")
        )
    if kind == "vacuum":
        kwargs = {"dry_run": p["dry_run"], "lite": p.get("lite", False)}
        if p["retain_hours"] is not None:
            kwargs["retention_ms"] = p["retain_hours"] * 3600 * 1000
        return target.vacuum(**kwargs)
    if kind == "restore":
        return target.restore(p["version"])
    if kind == "generate_manifest":
        # Delta's GENERATE symlink_format_manifest FOR TABLE t: export the
        # live snapshot's file list for external parquet readers
        return target.generate_manifest()
    if dest_path is None:
        raise ValueError(
            f"{kind.upper()} requires dest_path for the new table"
        )
    if kind == "create_like":
        return LakeTable.create(
            spark,
            dest_path,
            target.schema(),
            properties=dict(target.properties()),
            if_not_exists=p["if_not_exists"],
        )
    return target.clone(dest_path, shallow=p["shallow"])


def execute_analyze(spark: SparkSession, sql: str, resolve) -> dict:
    """``ANALYZE TABLE <t> COMPUTE STATISTICS [FOR COLUMNS a, b, ...]`` —
    routes to :meth:`LakeTable.analyze` (approximate NDV; the scalable
    default)."""
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"ANALYZE\s+TABLE\s+(?P<t>{_IDENT})\s+COMPUTE\s+STATISTICS"
        r"(?:\s+FOR\s+COLUMNS\s+(?P<cols>.+))?\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError("not an ANALYZE TABLE statement")
    target = _resolve(resolve, m.group("t"))
    cols = None
    if m.group("cols"):
        cols = [c.strip().strip("`") for c in m.group("cols").split(",")]
    return target.analyze(columns=cols)


def execute_describe(spark: SparkSession, sql: str, resolve):
    """``DESCRIBE HISTORY <t>`` -> commit list, ``DESCRIBE DETAIL <t>`` ->
    snapshot-summary dict, ``SHOW TBLPROPERTIES <t>`` -> properties dict.
    All metadata-only (commit log + file stats, no data scan)."""
    s = strip_comments(sql).strip().rstrip(";")
    m = re.match(
        rf"(?:DESCRIBE|DESC)\s+(?P<kind>HISTORY|DETAIL)\s+(?P<t>{_IDENT})\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        target = _resolve(resolve, m.group("t"))
        if m.group("kind").upper() == "HISTORY":
            return target.history()
        return target.detail()
    m = re.match(
        rf"SHOW\s+TBLPROPERTIES\s+(?P<t>{_IDENT})\s*$", s, re.IGNORECASE
    )
    if m:
        return _resolve(resolve, m.group("t")).properties()
    raise ValueError("not a DESCRIBE HISTORY/DETAIL or SHOW TBLPROPERTIES")


def execute_statement(spark: SparkSession, sql: str, resolve, **kw):
    """One front door for every supported statement kind: MERGE INTO,
    INSERT INTO/OVERWRITE, UPDATE, DELETE FROM, ALTER TABLE (constraints,
    rename), OPTIMIZE, VACUUM, RESTORE, ANALYZE TABLE, CREATE TABLE
    (column DDL with NOT NULL / generated / identity clauses, AS SELECT,
    or ... CLONE)."""
    s = strip_comments(sql).lstrip()
    head = s.split(None, 1)[0].upper() if s.split() else ""
    if head == "MERGE":
        return execute_merge(spark, sql, resolve, **kw)
    if head == "INSERT":
        return execute_insert(spark, sql, resolve)
    if head == "COPY":
        return execute_copy_into(spark, sql, resolve)
    if head == "CREATE":
        # route on which grammar PARSES (same rule as the ALTER branch):
        # only a parse failure falls through to CREATE TABLE — executor
        # errors from a real CLONE (dest already exists, missing
        # dest_path) must propagate, not be re-reported as CREATE TABLE
        # syntax errors
        try:
            parse_utility(sql)
        except ValueError:
            return execute_create_table(spark, sql, resolve, **kw)
        return execute_utility(spark, sql, resolve, **kw)  # ... CLONE
    if head == "UPDATE":
        return execute_update(spark, sql, resolve)
    if head == "DELETE":
        return execute_delete(spark, sql, resolve)
    if head == "ANALYZE":
        return execute_analyze(spark, sql, resolve)
    if head in ("DESCRIBE", "DESC", "SHOW"):
        return execute_describe(spark, sql, resolve)
    if head == "ALTER":
        # route on which grammar PARSES; executor errors (missing column,
        # dependent constraint, ...) propagate instead of being mistaken
        # for "try the next statement kind"
        last = None
        for parser, runner in (
            (parse_alter_constraint, execute_alter_constraint),
            (parse_alter_rename_column, execute_alter_rename_column),
            (parse_alter_columns, execute_alter_columns),
            (parse_alter_properties, execute_alter_properties),
        ):
            try:
                parser(sql)
            except ValueError as exc:
                last = exc
                continue
            return runner(spark, sql, resolve)
        raise last
    return execute_utility(spark, sql, resolve, **kw)


def split_statements(script: str) -> list[str]:
    """Split a multi-statement SQL script on top-level semicolons —
    quote-aware (single-quoted strings, double-quoted strings, and
    backtick identifiers, each with doubled-char escapes) and paren-aware,
    with ``--`` comments stripped first so a ';' inside a comment can't
    split. Empty fragments (trailing ';', blank lines) are dropped."""
    s = strip_comments(script)
    out: list[str] = []
    depth, start = 0, 0
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            i = _skip_quoted(s, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == ";" and depth == 0:
            out.append(s[start:i])
            start = i + 1
        i += 1
    out.append(s[start:])
    return [x.strip() for x in out if x.strip()]


def execute_script(
    spark: SparkSession,
    script: str,
    resolve,
    dest_paths: dict[str, str] | None = None,
    **kw,
) -> list:
    """Run a multi-statement SQL script (the shape of a migrated notebook
    cell) through :func:`execute_statement`, one statement at a time in
    order; returns the per-statement results. Statements run eagerly, so a
    failure stops the script at that statement (results up to it are
    committed — each lake statement is individually atomic; there is no
    cross-statement transaction, same as Delta SQL).

    ``dest_paths`` maps a created table's name -> filesystem location
    (the catalog stand-in) and is consulted only for CREATE statements —
    other statement kinds never see it, and two CREATEs in one script get
    their own paths. Remaining ``kw`` goes to every statement verbatim,
    so pass only kwargs valid for all of them."""
    results = []
    for stmt in split_statements(script):
        head = stmt.split(None, 1)[0].upper() if stmt.split() else ""
        stmt_kw = dict(kw)
        if head == "CREATE" and dest_paths:
            m = re.match(
                rf"CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+"
                rf"(?:IF\s+NOT\s+EXISTS\s+)?(?P<t>{_IDENT})",
                stmt,
                re.IGNORECASE,
            )
            if m and m.group("t") in dest_paths:
                stmt_kw["dest_path"] = dest_paths[m.group("t")]
        results.append(execute_statement(spark, stmt, resolve, **stmt_kw))
    return results
