"""Structured Streaming over the `events` table: watermarked tumbling /
sliding / session windows and stateful dedup.

The reference has no streaming at all (SURVEY.md §2.9) — this is the
extension surface, built on vanilla Structured Streaming so the same
code runs against Kafka/files at cluster scale; here the file source
replays the parquet table as a stream.

Execution harness: ``run_available_now`` drives a streaming DataFrame
to completion with ``trigger(availableNow=True)`` into a memory sink
and returns the result as a batch DataFrame — which is how the
streaming gate queries stay oracle-checkable: the plan genuinely
executes through the streaming engine (StateStore, watermarks,
incremental aggregation), and the finished result is compared against
DuckDB like any batch query.

Watermark notes for the replay harness: with a single availableNow
replay there is no late data, so aggregations use ``complete`` output
mode (every window emitted regardless of final watermark) and dedup
uses ``append`` (stateful dedup emits first-seen rows immediately).
At a real deployment the same transformations run with ``update`` /
``append`` and the watermark bounds state size.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events.parquet as a stream (file source needs an explicit
    schema; the TIMESTAMP(NANOS) column comes in as long and is
    downcast to microsecond timestamps, mirroring catalog.load_table)."""
    path = f"{sf_dir}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # The file stream source requires a directory basePath: stream the
    # sf dir, filtered down to the events file.
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        # div, not `/`: see catalog.load_table (double rounds nano epochs).
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def tumbling_agg(
    stream: DataFrame, width: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window count + value sum per event_type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


def sliding_agg(
    stream: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding-window count + value sum (overlapping)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("win.start").alias("window_start"), "n", "total_value")
    )


def session_agg(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Gap-based session windows per user (session_window merges events
    closer than ``gap``; the stateful analogue of batch q19)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("win.start").alias("session_start"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def dedup_stream(stream: DataFrame, keys: list[str], watermark: str = "10 minutes") -> DataFrame:
    """Stateful exact dedup: first row per key wins; watermark bounds
    how long each key is remembered (state eviction at scale)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lower_s: int,
    upper_s: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: match right rows with
    ``l.ts - lower_s <= r.ts <= l.ts + upper_s`` per key. Both sides
    are watermarked so the join state (buffered unmatched rows) is
    evicted once the band cannot match anymore — the state-bound
    requirement for unbounded streams."""
    l = left.withWatermark("ts", watermark).alias("l")
    r = (
        right.withColumnRenamed("ts", "r_ts")
        .withWatermark("r_ts", watermark)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.r_ts") >= F.col("l.ts") - F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (F.col("r.r_ts") <= F.col("l.ts") + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    return l.join(r, cond, "inner")


def run_available_now(
    stream_df: DataFrame, output_mode: str, timeout_s: int = 300
) -> DataFrame:
    """Drive a streaming DataFrame to completion; return the memory-sink
    table as a batch DataFrame."""
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(f"streaming query {name} still running after {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()
    return stream_df.sparkSession.table(name)
