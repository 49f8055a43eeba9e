"""Exact-mode comparator of scripts/driver_check.py.

The r5 driver red row (q172) passed the builder's local gate because
the old comparator coerced Decimal→float with a 1e-9 tolerance; the
driver's value-hash, by contrast, sees ``Decimal('1.720000')`` and
``1.72`` as different. ``--exact`` mirrors the driver: these tests
seed exactly that divergence (and a last-ULP float drift) and assert
the checker REFUSES them, plus sanity-check that identical frames
still pass.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
import pytest

import importlib.util
import os
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_driver_check():
    # driver_check runs module-level argv parsing; import it with a
    # clean argv so the test doesn't inherit pytest's flags.
    spec = importlib.util.spec_from_file_location(
        "driver_check", os.path.join(_repo, "scripts", "driver_check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    argv, sys.argv = sys.argv, ["driver_check.py"]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    return mod


dc = _load_driver_check()


def test_exact_catches_decimal_vs_double():
    a = pd.DataFrame({"revenue": [Decimal("261332995.720000")]})  # Spark DECIMAL
    e = pd.DataFrame({"revenue": [261332995.72]})  # DuckDB DOUBLE
    with pytest.raises(AssertionError, match="dtype kind"):
        dc.compare_exact(a, e)


def test_exact_catches_last_ulp_float_drift():
    x = 261332995.72
    a = pd.DataFrame({"v": [x]})
    import numpy as np

    e = pd.DataFrame({"v": [np.nextafter(x, np.inf)]})
    with pytest.raises(AssertionError, match="zero tolerance"):
        dc.compare_exact(a, e)


def test_exact_passes_identical_and_int_width():
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int32"), "s": ["a", None]})
    e = pd.DataFrame({"n": pd.array([1, 2], dtype="int64"), "s": ["a", None]})
    dc.compare_exact(a, e)  # int width is not a value divergence
    f = pd.DataFrame({"v": [1.5, float("nan")]})
    dc.compare_exact(f, f.copy())


def test_exact_catches_string_mismatch():
    a = pd.DataFrame({"s": ["a", "b"]})
    e = pd.DataFrame({"s": ["a", "B"]})
    with pytest.raises(AssertionError, match="mismatched values"):
        dc.compare_exact(a, e)


def test_exact_canonicalizes_datetime_representations():
    """Spark toPandas yields datetime64[ns] (and DATE → object of
    datetime.date); DuckDB fetch_df yields datetime64[us]. The driver
    hash stringifies both the same, so unit/representation must NOT
    fail exact mode — but a real value drift must."""
    import datetime

    a = pd.DataFrame({"t": pd.to_datetime(["2024-01-01", "2024-06-01"]).astype("datetime64[ns]")})
    e = pd.DataFrame({"t": pd.to_datetime(["2024-01-01", "2024-06-01"]).astype("datetime64[us]")})
    dc.compare_exact(a, e)
    d = pd.DataFrame({"t": [datetime.date(2024, 1, 1), datetime.date(2024, 6, 1)]})
    dc.compare_exact(d, e)
    bad = pd.DataFrame({"t": pd.to_datetime(["2024-01-01", "2024-06-02"]).astype("datetime64[us]")})
    with pytest.raises(AssertionError, match="datetime values differ"):
        dc.compare_exact(a, bad)
