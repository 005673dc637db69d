"""Property-based tests for the SQL script scanner family (hypothesis).

``split_statements`` / ``strip_comments`` / ``split_top_level`` share one
quote-scanning discipline (``_skip_quoted``): single-/double-quoted string
literals (doubled-char and backslash escapes) and backtick identifiers
(doubled-char escapes) are opaque spans. These properties build scripts
from adversarial fragments — separators, comment markers, parens, and
escapes INSIDE quoted spans — and assert the statement boundaries land
exactly where they were constructed. Pure string functions: no Spark
session needed, so hundreds of examples run in milliseconds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from incremental_etl_on_lakehouse_spark.lake.sql import (
    split_statements,
    split_top_level,
    strip_comments,
)

# content that may appear INSIDE a quoted span: the separators and markers
# the scanners must treat as opaque, plus escape sequences
_INNER = st.lists(
    st.sampled_from(
        ["a", "b c", ";", ",", "(", ")", "--", "\\'", '\\"', "\\\\", " "]
    ),
    min_size=0,
    max_size=6,
).map("".join)


def _sq(inner: str) -> str:
    # a valid single-quoted literal under BOTH escape conventions:
    # backslashes are backslash-escaped (a bare trailing backslash would
    # eat the closing quote) and bare quotes are doubled
    return "'" + inner.replace("\\", "\\\\").replace("'", "''") + "'"


def _dq(inner: str) -> str:
    return '"' + inner.replace("\\", "\\\\").replace('"', '""') + '"'


def _bt(inner: str) -> str:
    # backtick identifiers have no backslash escapes — strip backslashes
    return "`" + inner.replace("\\", "").replace("`", "``") + "`"


_QUOTED = st.one_of(
    _INNER.map(_sq), _INNER.map(_dq), _INNER.map(_bt)
)

# one statement: plain words and quoted spans, never a bare ';'
_STMT = st.lists(
    st.one_of(st.sampled_from(["SELECT", "x", "FROM t", "(1, 2)"]), _QUOTED),
    min_size=1,
    max_size=5,
).map(" ".join)


@settings(max_examples=300, deadline=None)
@given(st.lists(_STMT, min_size=1, max_size=5))
def test_split_statements_round_trips(stmts):
    """Joining statements with ';' and splitting returns exactly the
    originals — no quoted-span content can leak a boundary."""
    script = "; ".join(stmts)
    expect = [s.strip() for s in stmts if s.strip()]
    assert split_statements(script) == expect


@settings(max_examples=300, deadline=None)
@given(_STMT)
def test_strip_comments_preserves_quoted_spans(stmt):
    """A statement with no comment outside quotes survives strip_comments
    byte-identically, then gains nothing but the marker's removal when a
    real trailing comment is appended."""
    assert strip_comments(stmt) == stmt
    with_comment = stmt + " -- trailing; comment (x"
    assert strip_comments(with_comment) == stmt + " "


@settings(max_examples=300, deadline=None)
@given(st.lists(_STMT, min_size=1, max_size=4))
def test_split_top_level_round_trips(parts):
    """Joining fragments with ',' splits back to the originals; fragments
    wrapped in parens collapse into their neighbors never happen (depth
    tracking), and quoted commas stay inside."""
    joined = ", ".join(parts)
    expect = [p.strip() for p in parts if p.strip()]
    assert split_top_level(joined) == expect
