"""Scalar/column functions used across the engine.

Covers the reference's scalar-function surface (SURVEY.md §2.9; reference
``notebooks/demo-notebook.py:168-170,253,401-413,528-530``) as reusable column
expressions, plus vector helpers for the similarity-search operators. Everything
here is a JVM-side Catalyst expression (whole-stage-codegen friendly) — no
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def data_hash(*cols: str | Column) -> Column:
    """Content hash of business columns — the reference's ``data_hash``.

    Reference: ``md5(concat(col("id"), col("country"), ...))``
    (``notebooks/demo-notebook.py:168``). We separate fields with a unit
    separator and null-guard each one: plain ``concat`` returns NULL if any
    input is NULL, and unseparated concat makes ("ab","c") collide with
    ("a","bc"). At 100 TB this hash is the no-op-update guard that decides
    whether a MERGE touches a file at all, so collisions matter.
    """
    parts = [F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"), F.lit("\x00")) for c in cols]
    return F.md5(F.concat_ws("\x1f", *parts))


def nvl(col: str | Column, default) -> Column:
    """Reference's ``nvl(x, 0)`` (``notebooks/demo-notebook.py:528,530``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def to_utc(col: str | Column, tz: str = "Europe/Paris") -> Column:
    """Reference's ``to_utc_timestamp(ts, 'Europe/Paris')`` (``:253``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_utc_timestamp(c, tz)


# --------------------------------------------------------------------------
# Vector helpers (EXT similarity operators) — pure Catalyst higher-order
# functions over array<float>/array<double>; stay JVM-side and codegen-able.
# --------------------------------------------------------------------------


def vec_dot(a: str | Column, b: str | Column) -> Column:
    """Dot product of two array columns via ``zip_with`` + ``aggregate``."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: str | Column) -> Column:
    """L2 norm of an array column."""
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(ca, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two array columns (NULL-safe on zero vectors)."""
    dot = vec_dot(a, b)
    denom = vec_norm(a) * vec_norm(b)
    return F.when(denom != 0.0, dot / denom)
