"""q195's late-data watermark gate — the streaming analog of q49's
falsifiability close (r9 verdict #3): proves the watermark, not the
replay construction, is what drops the late set.

The registered query is oracle-checked by test_oracle_parity like
every other gate; this file pins the properties the parity hash alone
cannot attribute: (a) the replay really delivers the late rows in a
final out-of-order batch, (b) a disabled watermark ADMITS them (the
drop disappears, so the green gate row is falsifiable), and (c) the
resplit cache rebuilds rather than silently streaming fewer batches
when a slice file vanishes (ADVICE r9).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from anime_data_pipeline_spark.queries.streaming_q import (
    _1H_US,
    _Q195_HORIZON_US,
    _Q195_LATE_MOD,
)
from anime_data_pipeline_spark.streaming.pipeline import (
    read_split_stream,
    resplit_events,
    run_available_now,
)


def _split(spark, sf_dir):
    return resplit_events(
        spark,
        sf_dir,
        n_files=4,
        late_mod=_Q195_LATE_MOD,
        late_horizon_us=_Q195_HORIZON_US,
    )


def _windowed(stream, delay: str):
    return (
        stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_w"))
    )


def test_late_file_is_out_of_order_and_exact(spark, sf_dir):
    """The 5th file holds exactly the closed-form late set, and its
    rows all precede the in-order tail — i.e. they really are late."""
    split = _split(spark, sf_dir)
    files = sorted(f for f in os.listdir(split) if f.endswith(".parquet"))
    assert len(files) == 6, files  # 4 slices + empty sentinel + late
    assert spark.read.parquet(os.path.join(split, files[-2])).count() == 0
    late = spark.read.parquet(os.path.join(split, files[-1]))
    kept = spark.read.parquet(*[os.path.join(split, f) for f in files[:4]])
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    n_late = late.count()
    assert n_late > 0
    assert n_late + kept.count() == total
    max_us = kept.agg(F.max(F.unix_micros(F.col("ts").cast("timestamp")))).collect()[0][0]
    bad = late.filter(
        (F.col("event_id") % _Q195_LATE_MOD != 0)
        | (
            (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(_1H_US)) + 1) * _1H_US
            + _Q195_HORIZON_US
            > max_us
        )
    ).count()
    assert bad == 0, "late file contains a row outside the closed-form late set"


def test_disabled_watermark_admits_late_rows(spark, sf_dir):
    """FALSIFIABILITY: the same replay with an effectively-disabled
    watermark (delay > the whole timeline) aggregates every row — so
    the gated variant's missing mass is attributable to the watermark
    drop and nothing else, and a watermark that stops dropping flips
    the driver row."""
    split = _split(spark, sf_dir)
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    late_n = spark.read.parquet(os.path.join(split, "005.parquet")).count()

    gated = run_available_now(
        _windowed(read_split_stream(spark, split), "30 minutes"), "update"
    )
    gated_total = (
        gated.groupBy("w").agg(F.max("n_w").alias("n")).agg(F.sum("n")).collect()[0][0]
    )
    assert gated_total == total - late_n

    open_wm = run_available_now(
        _windowed(read_split_stream(spark, split), "3650 days"), "update"
    )
    open_total = (
        open_wm.groupBy("w").agg(F.max("n_w").alias("n")).agg(F.sum("n")).collect()[0][0]
    )
    assert open_total == total, (
        "an unbounded watermark should admit the late batch in full"
    )
    # the late batch also adds emissions on its windows — the channel
    # that catches the evict-but-readmit half-failure max() would mask
    gated_em = gated.count()
    open_em = open_wm.count()
    assert open_em > gated_em


def test_resplit_cache_rebuilds_on_missing_slice(spark, sf_dir):
    """ADVICE r9: a partially cleaned split dir must MISS the memo and
    rebuild, not stream fewer batches."""
    split = _split(spark, sf_dir)
    victim = os.path.join(split, "002.parquet")
    os.remove(victim)
    rebuilt = _split(spark, sf_dir)
    assert rebuilt != split
    assert len([f for f in os.listdir(rebuilt) if f.endswith(".parquet")]) == 6
