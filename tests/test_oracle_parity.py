"""Run every registered query against its DuckDB oracle at sf0.001 —
a faster local mirror of the driver's sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from anime_data_pipeline_spark.registry import all_oracles, all_queries
from tests.conftest import assert_parity

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    assert_parity(df, ORACLES[name], duck)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    """Queries without an oracle must at least run and return a schema."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    df.collect()


def test_entry_smoke(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    assert df.count() > 0


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_events_ts_normalized_to_timestamp(spark, sf_dir):
    """events.ts parquet type has drifted across testdata generations
    (NANOS → timestamp[us]/TIMESTAMP_NTZ). Both load paths must hand
    downstream code a plain microsecond TIMESTAMP, whatever the file
    says — unix_micros() and withWatermark() reject anything else."""
    from anime_data_pipeline_spark.catalog import load_table
    from anime_data_pipeline_spark.streaming.pipeline import read_events_stream

    assert dict(load_table(spark, sf_dir, "events").dtypes)["ts"] == "timestamp"
    assert dict(read_events_stream(spark, sf_dir).dtypes)["ts"] == "timestamp"
