"""applyInPandasWithState across REAL micro-batch boundaries: the
events table is split into 4 files and streamed with
maxFilesPerTrigger=1, so per-user state must survive and accumulate
over 4 state-store checkpoints; the final running totals must equal
the batch groupBy."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.functions.compat import money_sum
from anime_data_pipeline_spark.streaming.pipeline import run_available_now
from anime_data_pipeline_spark.streaming.stateful import running_user_totals


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="events_split_")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def test_running_totals_across_batches(spark, sf_dir, split_events_dir):
    schema = spark.read.parquet(split_events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(split_events_dir)
    )
    emitted = run_available_now(running_user_totals(stream), "update")

    # update mode emits one row per user per batch it appears in: more
    # rows than users ⇒ state genuinely crossed batch boundaries.
    n_users = emitted.select("user_id").distinct().count()
    assert emitted.count() > n_users

    # final state per user = the row with the max running count
    final = (
        emitted.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )
    # the stateful operator accumulates exact BIGINT money units
    # (compat.py convention), so the batch twin using the same
    # convention must match EXACTLY — no tolerance needed.
    expected = (
        spark.read.parquet(split_events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("total_value"),
        )
    )
    f = {r["user_id"]: r for r in final.collect()}
    e = {r["user_id"]: r for r in expected.collect()}
    assert set(f) == set(e)
    for uid in e:
        assert f[uid]["n_events"] == e[uid]["n_events"], uid
        assert f[uid]["total_value"] == e[uid]["total_value"], uid
