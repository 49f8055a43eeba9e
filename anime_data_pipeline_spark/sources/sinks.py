"""Table sinks (SURVEY S9 + BASELINE "Parquet/Delta writes").

Parquet is the native interchange between stages; Delta (when the
delta-spark package is present — it is not in this container) adds
ACID upserts for the J5 metadata-merge path. The JSON compatibility
exporter lives in sources/json_compat.

Scale rules encoded here:
- partition by a LOW-cardinality column (dt, source, bucket_reso — not
  image_key) so the file count stays sane;
- target ~128 MB files via a pre-write repartition on the partition
  columns (one file per partition-dir per shuffle task otherwise);
- writer-side sort within partitions gives parquet min/max stats that
  downstream range filters prune on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - delta-spark not installed in this environment
    from delta.tables import DeltaTable  # type: ignore

    HAS_DELTA = True
except Exception:  # ModuleNotFoundError and friends
    DeltaTable = None  # type: ignore
    HAS_DELTA = False


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Partitioned columnar write with stats-friendly layout."""
    if fmt == "delta" and not HAS_DELTA:
        raise NotImplementedError(
            "delta-spark is not installed in this environment; use fmt='parquet'"
        )
    if partition_by:
        df = df.repartition(*[F.col(c) for c in partition_by])
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows hash-clustered (and optionally
    sorted) by the join key at WRITE time, so every later equi-join or
    aggregation on that key runs shuffle-free — the pre-paid exchange.
    Both sides of a co-located join must use the same n_buckets.

    At 100 TB this is the difference between shuffling the fact table
    per query and shuffling it once at ingest."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def upsert_table(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    fmt: str = "parquet",
) -> None:
    """J5 upsert sink: new rows inserted, matching keys overwritten.

    Delta: a real MERGE INTO (row-level, ACID). Parquet fallback:
    full-outer rewrite — anti-join the existing table against the
    updates and union (correct, but rewrites the table; Delta is the
    scale path)."""
    if fmt == "delta":
        if not HAS_DELTA:
            raise NotImplementedError("delta-spark not installed")
        target = DeltaTable.forPath(spark, path)
        cond = " AND ".join(f"t.{k} = u.{k}" for k in key_cols)
        (
            target.alias("t")
            .merge(updates.alias("u"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    try:
        existing = spark.read.parquet(path)
    except Exception:
        updates.write.mode("overwrite").parquet(path)
        return
    keep = existing.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = keep.unionByName(updates)
    # Rewrite through a temp dir: the plan reads `path` lazily, so an
    # in-place overwrite would consume its own partially-deleted input.
    tmp = path.rstrip("/") + "__tmp_upsert"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
