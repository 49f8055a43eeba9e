"""Shared pytest fixtures: one SparkSession per test session, plus a
DuckDB-oracle parity helper mirroring the driver's correctness gate."""

from __future__ import annotations

import os
import sys

# Make the suite runnable from any cwd (python -m pytest /root/repo/tests).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pytest

from anime_data_pipeline_spark.catalog import TABLES
from anime_data_pipeline_spark.session import get_spark

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark(app_name="tests", cpus=8)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted frame (the driver's compare is
    order-insensitive and sorts columns by name before hashing)."""
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_parity(spark_df, oracle: str, duck_con, atol: float = 1e-9) -> None:
    actual = normalize(spark_df.toPandas())
    expected = normalize(duck_con.execute(oracle).fetch_df())
    assert list(actual.columns) == list(expected.columns), (
        f"column mismatch: spark={list(actual.columns)} oracle={list(expected.columns)}"
    )
    assert len(actual) == len(expected), f"row count: spark={len(actual)} oracle={len(expected)}"
    for col in actual.columns:
        a, e = actual[col], expected[col]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(e):
            pd.testing.assert_series_equal(
                a.astype(float), e.astype(float), check_names=False, atol=atol, rtol=0
            )
        else:
            ae = a.astype(str).where(a.notna(), "<null>")
            ee = e.astype(str).where(e.notna(), "<null>")
            pd.testing.assert_series_equal(ae, ee, check_names=False)
