"""Falsifiability of the integer-units money convention (r10 verdict
#2, applied registry-wide in r11): these tests PROVE the failure mode
the convention exists to kill — `dround(sum(double), 2)` depends on
summation order and can flip a .xx5 cent boundary — and pin that the
replacement (`money_units`/`units_money`, functions/compat.py) is
order-insensitive, sign-safe, and engine-parity-exact.

The boundary construction: 2-decimal inputs can never produce an
exact half-cent sum (their ten-thousandths are multiples of 100), but
4-decimal money products (price·(1−discount)) can — generate 2,000
ten-thousandths values whose exact total ends in ...50, the knife
edge where IEEE partial-sum jitter decides the rounded cent.
"""

from __future__ import annotations

import math
import random

import pytest

SEED = 0
N = 2000


def _boundary_values(seed: int = SEED, n: int = N) -> list[float]:
    """Deterministic 4-decimal money values whose EXACT decimal sum
    lands on a half cent (total ten-thousandths ≡ 50 mod 100)."""
    r = random.Random(seed)
    t = [r.randrange(1, 800_000_000) for _ in range(n - 1)]
    pad = (50 - sum(t)) % 100 + 100 * r.randrange(1000, 100_000)
    t.append(pad)
    assert sum(t) % 100 == 50
    return [x / 10000.0 for x in t]


def _dround2(x: float) -> float:
    return math.floor(x * 100 + 0.5) / 100


def _units(x: float) -> int:
    return int(math.floor(x * 10000.0 + 0.5))


def _units_money(su: int) -> float:
    return math.floor(float(su) / 100.0 + 0.5) / 100.0


def test_double_sum_convention_is_order_sensitive():
    """The OLD convention really does flip: two orderings of the same
    values round to different cents. (If this ever stops failing for
    every seed, the boundary construction is broken — the convention's
    reason to exist is falsifiable.)"""
    v = _boundary_values()
    r = random.Random(SEED)
    seen = set()
    for _ in range(50):
        vv = v[:]
        r.shuffle(vv)
        seen.add(_dround2(sum(vv)))
        seen.add(_dround2(sum(sorted(vv))))
        if len(seen) > 1:
            break
    assert len(seen) > 1, (
        "expected dround(sum(double)) to flip across orderings on the "
        "half-cent lattice; construction no longer exercises the boundary"
    )


def test_integer_units_sum_is_order_invariant():
    """The NEW convention cannot flip: exact BIGINT sums are
    associative, so every ordering gives the identical cent."""
    v = _boundary_values()
    r = random.Random(SEED)
    results = set()
    for _ in range(50):
        vv = v[:]
        r.shuffle(vv)
        results.add(_units_money(sum(_units(x) for x in vv)))
        results.add(_units_money(sum(sorted(_units(x) for x in vv))))
    assert len(results) == 1


def test_units_money_sign_safe():
    """Negative sums (acctbal) round identically to the positive
    mirror shifted by sign — floor-in-double on both engines, no
    truncate-toward-zero off-by-a-cent (the q06 hazard)."""
    # -1.0049 -> -1.00 ; -1.005 -> -1.00 (half toward +inf) ; -1.0051 -> -1.01
    assert _units_money(_units(-1.0049)) == -1.00
    assert _units_money(_units(-1.0051)) == -1.01
    # truncate-toward-zero would give -0.99 here:
    assert _units_money(-10049) == -1.00


def test_spark_duckdb_parity_on_the_boundary(spark):
    """Engine parity on the exact construction that flips the old
    convention: Spark's money_sum equals DuckDB's money_sum_sql
    bit-for-bit, regardless of partitioning (sum order differs wildly
    between 32 partitions and DuckDB's scan order)."""
    import duckdb

    from anime_data_pipeline_spark.functions.compat import (
        money_sum,
        money_sum_sql,
    )

    v = _boundary_values()
    sdf = spark.createDataFrame([(x,) for x in v], "v double").repartition(32)
    got = sdf.agg(money_sum(sdf.v).alias("s")).collect()[0]["s"]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in v])
    want = con.execute(f"SELECT {money_sum_sql('v')} FROM t").fetchone()[0]

    assert got == want
    # and both equal the exact integer-arithmetic answer
    assert got == _units_money(sum(_units(x) for x in v))


def test_quantization_recovers_exact_cents_under_double_jitter():
    """2-decimal money stored as double carries ~1e-13 representation
    jitter (19.17 * 100 != 1917 exactly); floor(x*1e4 + 0.5) must
    still recover the exact decimal units."""
    for cents in (1917, 1231, 3629, 655, 163, 49002, 1):
        x = cents / 100.0  # the jittered double
        assert _units(x) == cents * 100
    assert pytest.approx(19.17 * 100) == 1917 and 19.17 * 100 != 1917


def test_overflow_mitigation_decimal38_path_parity(spark):
    """r11 verdict #8: exercise the documented one-cast overflow
    mitigation (functions/compat.py) BEFORE anyone needs it at 400×.
    A unit-sum past BIGINT range must (a) fail LOUDLY on the default
    long path under Spark's ANSI mode — never wrap — and (b) produce
    the DuckDB-parity answer through
    ``sum(units.cast("decimal(38,0)"))`` + the shared to-double
    conversion (DuckDB sums BIGINT into HUGEINT natively; the one
    identical integer flows through the same IEEE conversion on both
    sides)."""
    import duckdb

    from pyspark.sql import functions as F

    from anime_data_pipeline_spark.functions.compat import (
        units_money,
        units_money_sql,
    )

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    units = [9_000_000_000_000_000_000, 8_500_000_000_000_000_001, 7] * 2
    assert sum(units) > (1 << 63) - 1  # genuinely past BIGINT
    sdf = spark.createDataFrame([(u,) for u in units], "units long").repartition(4)

    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC_OVERFLOW"):
        sdf.agg(F.sum("units")).collect()

    got = sdf.agg(
        units_money(F.sum(F.col("units").cast("decimal(38,0)"))).alias("s")
    ).collect()[0]["s"]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(units BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in units])
    want = con.execute(
        f"SELECT {units_money_sql('sum(units)')} AS s FROM t"
    ).fetchone()[0]
    assert got == want
