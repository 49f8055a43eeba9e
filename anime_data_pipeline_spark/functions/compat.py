"""Cross-engine deterministic helpers for oracle comparison.

Spark's ``round()`` rounds the shortest decimal string of a double
(HALF_UP on ``BigDecimal(Double.toString(x))``); DuckDB rounds the
binary value. They disagree on boundary values like 123.455. For the
correctness gate both sides therefore use the same IEEE-only formula::

    dround(x, n) = floor(x * 10^n + 0.5) / 10^n

Every operation (multiply, add, floor, divide) is an exact-semantics
IEEE-754 op, so identical inputs give bit-identical outputs in any
engine. Summation *order* can still differ between engines; keep n
small enough that ~1e-9 pre-round jitter cannot cross a boundary in
practice.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column, digits: int = 2) -> Column:
    """Deterministic cross-engine rounding (see module docstring)."""
    factor = float(10**digits)
    return F.floor(col * F.lit(factor) + F.lit(0.5)) / F.lit(factor)


def dround_sql(expr: str, digits: int = 2) -> str:
    """The identical formula as DuckDB SQL text."""
    factor = float(10**digits)
    return f"floor(({expr}) * {factor} + 0.5) / {factor}"
