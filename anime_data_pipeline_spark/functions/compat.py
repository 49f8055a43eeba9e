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


# ---------------------------------------------------------------------------
# MONEY IN INTEGER UNITS — the order-insensitive sum convention.
#
# ``dround(sum(double), 2)`` is ORDER-SENSITIVE: the double partial
# sums depend on which rows each engine adds first, and the r10 100×
# stress sweep proved the accumulated jitter can flip a .xx5 cent
# boundary (q174: 463797812.935 summed in two orders lands on either
# side of the half). The registry-wide convention (r10 verdict #2) for
# every 2-decimal money/value SUM is therefore:
#
#   1. quantize per row: ``floor(x * scale + 0.5)`` cast to BIGINT —
#      bit-identical IEEE ops in both engines; exact for inputs whose
#      true decimal value has <= log10(scale) places (2-dp money at the
#      default 1e4; use 1e6 for 6-dp products like charge =
#      price*(1-disc)*(1+tax)),
#   2. sum EXACTLY as BIGINT — associative, no order sensitivity,
#   3. convert once: ``floor(CAST(su AS DOUBLE)/(scale/100) + 0.5)/100``
#      — a fixed sequence of IEEE ops on one identical BIGINT, so both
#      engines agree bit-for-bit regardless of sign (unlike integer
#      ``div``, which truncates toward zero in Spark and would mis-round
#      negative sums such as acctbal by a cent).
#
# Overflow headroom: BIGINT caps at 9.2e18; at the 100× stress tier the
# largest unit-sum (lineitem charge at 1e6 scale, ~6e7 rows × ~4e4
# dollars) stays below ~2.4e18. CAST(su AS DOUBLE) above 2^53 rounds,
# but identically in both engines — determinism, the property the gate
# needs, survives. Past ~40× more volume per GROUP the long sum would
# overflow — LOUDLY, since Spark 4's default ANSI mode errors on sum
# overflow rather than wrapping — and the one-cast mitigation is
# sum(units.cast("decimal(38,0)")) (exact to 1e38; DuckDB already
# sums BIGINT into HUGEINT, and the shared to-double conversion
# absorbs the type difference on both sides). Not applied at gate SFs:
# decimal aggregation is measurably slower than long and the headroom
# is 40×.
#
# The OTHER dround(sum(...), 6) sites in the registry (chi2 / PSI / JS
# / PMI contributions and similar statistical functionals) are a
# different class and intentionally stay on dround: their summands are
# real-valued ratios with no decimal lattice, so a .xxxxxx5 boundary
# hit requires the true sum to land within ~1e-15·|sum| of the half —
# not constructible from count ratios — while per-row quantization
# would CHANGE the statistic. Money has a lattice; statistics don't.
# ---------------------------------------------------------------------------


def money_units(col: Column, scale: float = 10_000.0) -> Column:
    """Per-row exact integer money units (step 1 above)."""
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def money_units_sql(expr: str, scale: float = 10_000.0) -> str:
    """The identical per-row quantization as DuckDB SQL text."""
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)"


def units_money(col: Column, scale: float = 10_000.0) -> Column:
    """BIGINT unit-sum → round-half-up 2-decimal dollars (step 3)."""
    return F.floor(col.cast("double") / F.lit(scale / 100.0) + F.lit(0.5)) / F.lit(100.0)


def units_money_sql(expr: str, scale: float = 10_000.0) -> str:
    """The identical conversion as DuckDB SQL text."""
    return f"floor(CAST(({expr}) AS DOUBLE) / {scale / 100.0} + 0.5) / 100.0"


def money_sum(col: Column, scale: float = 10_000.0) -> Column:
    """``units_money(sum(money_units(col)))`` in one aggregate Column —
    the drop-in replacement for ``dround(F.sum(col), 2)``."""
    return units_money(F.sum(money_units(col, scale)), scale)


def money_sum_sql(expr: str, scale: float = 10_000.0) -> str:
    """The identical aggregate as DuckDB SQL text."""
    return units_money_sql(f"sum({money_units_sql(expr, scale)})", scale)
