"""Numeric array literals built with ONE expression parse.

r12 optimization (guide §1.2 step 2, applied to the DRIVER): building
an n-element literal array as ``F.array(*[F.lit(x) ...])`` costs one
py4j round-trip per element — the trained-model folds (PQ codebooks,
IVF centroids, hyperplane components, SQ stats) were paying seconds of
pure query-CONSTRUCTION time per run on thousands of such calls (the
ANN family measured build≈2-5 s vs exec≈0.7 s).  Rendering the same
values as one SQL string and parsing it once produces an identical
expression tree:

- ``repr(float)`` is shortest-repr and Java's ``Double.parseDouble``
  round-trips it exactly (verified for 2k random magnitudes), and the
  ``D`` suffix pins the literal to DOUBLE (a bare decimal literal
  would be DECIMAL — the verify-skill gotcha);
- bare integer literals follow the same INT-if-it-fits-else-BIGINT
  widening as ``F.lit`` on a Python int, so array element types (and
  therefore generated code) are unchanged.

Only finite numbers are accepted; strings keep the element-wise form
elsewhere (escaping a text literal into SQL is a cross-engine risk the
numeric path doesn't have).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _double_sql(v: float) -> str:
    v = float(v)
    if not math.isfinite(v):
        raise ValueError(f"non-finite double literal: {v}")
    return f"{v!r}D"


def lit_double_array(values: Sequence[float]) -> Column:
    """``array<double>`` literal from one expression parse."""
    return F.expr("array(" + ",".join(_double_sql(v) for v in values) + ")")


def lit_double_array_2d(rows: Sequence[Sequence[float]]) -> Column:
    """``array<array<double>>`` literal from one expression parse."""
    inner = (
        "array(" + ",".join(_double_sql(v) for v in row) + ")" for row in rows
    )
    return F.expr("array(" + ",".join(inner) + ")")


def _int_sql(v: int) -> str:
    v = int(v)
    # Outside BIGINT range a bare SQL literal silently parses as
    # DECIMAL(19+,0) — a different array element type than F.lit(int),
    # which raises.  Mirror _double_sql's strictness: loud error, never
    # a silently decimal-typed array (ADVICE r12).
    if not (-(2**63) <= v < 2**63):
        raise ValueError(f"integer literal outside BIGINT range: {v}")
    return str(v)


def lit_int_array(values: Sequence[int]) -> Column:
    """Integer array literal (INT or BIGINT elements exactly as
    ``F.array(*[F.lit(int(v)) ...])`` would widen them)."""
    return F.expr(
        "array(" + ",".join(_int_sql(v) for v in values) + ")"
    )
