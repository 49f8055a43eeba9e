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

import os

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


def merge_condition(
    key_cols: list[str], target_alias: str = "t", updates_alias: str = "u"
) -> str:
    """The MERGE INTO match condition for a composite key — the
    semantics core of the J5 upsert, extracted so it is unit-testable
    without the delta-spark package."""
    if not key_cols:
        raise ValueError("upsert requires at least one key column")
    for k in key_cols:
        if not k.replace("_", "a").isalnum():
            raise ValueError(f"unsafe key column name: {k!r}")
    return " AND ".join(f"{target_alias}.{k} = {updates_alias}.{k}" for k in key_cols)


def build_merge(target_table, updates: DataFrame, key_cols: list[str]):
    """Compose the Delta MERGE builder chain (update-all on key match,
    insert-all otherwise) against any DeltaTable-shaped object.

    Takes the duck-typed table rather than a path so a contract test
    can drive it with a fake; production passes
    ``DeltaTable.forPath(spark, path)``. Returns the un-executed
    builder — callers ``.execute()`` it."""
    return (
        target_table.alias("t")
        .merge(updates.alias("u"), merge_condition(key_cols))
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
    )


def upsert_table_partitioned(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    partition_col: str,
    fmt: str = "parquet",
) -> None:
    """J5 upsert against a PARTITIONED parquet table without Delta:
    rewrite only the partitions the updates touch, atomically per
    partition via dynamic partition overwrite.

    The Delta-less scale pattern: at 100 TB a full-table rewrite per
    merge is absurd — but updates almost always cluster in few
    partitions (recent dt, one source). Plan shape:

    1. affected = updates' distinct partition values (a tiny driver
       list — partition columns are low-cardinality by layout rule);
    2. read ONLY those partitions (partition pruning via filter);
    3. anti-join existing rows against update keys, union updates;
    4. write with ``partitionOverwriteMode=dynamic``: Spark replaces
       exactly the partitions present in the written data, leaving
       every untouched partition's files alone.

    Rows whose ``partition_col`` CHANGES between snapshots land in the
    new partition while the stale copy survives in the old one — same
    caveat as Hive-style dynamic overwrite; keys must not migrate
    partitions (true for dt-style layouts), or use Delta MERGE.
    """
    if fmt == "delta":
        if not HAS_DELTA:
            raise NotImplementedError("delta-spark not installed")
        build_merge(DeltaTable.forPath(spark, path), updates, key_cols).execute()
        return
    affected = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not affected:
        return
    # Bootstrap ONLY on a positive "table does not exist" signal (path
    # absence). A broad except here was an r3 advice finding: any
    # transient read failure (permissions, corrupt footer, schema) would
    # be mistaken for first-write and silently overwrite every existing
    # partition with just the updates. Real read errors now propagate.
    if not os.path.exists(path):
        updates.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        return
    existing = spark.read.parquet(path).filter(
        F.col(partition_col).isin(affected)
    )
    keep = existing.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = keep.unionByName(updates).repartition(F.col(partition_col))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet table into
    ~``target_file_bytes`` files, returning the new file count.

    Streaming sinks and per-partition upserts accrete small files;
    at 100 TB a scan's task count (and the namenode/liststatus bill)
    is file-bound, so periodic compaction is table maintenance, not
    optimization. Sizing comes from the table's CURRENT on-disk bytes
    (compression-representative), not row counts. Optional
    ``sort_by`` re-sorts within output files so parquet min/max
    stats stay selective after the rewrite. Atomic via the same
    tmp-dir + rename swap as :func:`upsert_table` (local/POSIX;
    object stores should compact into Delta/Iceberg snapshots)."""
    import math
    import os
    import shutil

    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path).repartition(n_files)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    tmp = path.rstrip("/") + "__tmp_compact"
    old = path.rstrip("/") + "__old_compact"
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path.rstrip("/"), old)
    os.rename(tmp, path.rstrip("/"))
    shutil.rmtree(old, ignore_errors=True)
    return n_files


def upsert_table(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    fmt: str = "parquet",
) -> None:
    """J5 upsert sink: new rows inserted, matching keys overwritten.

    Delta: a real MERGE INTO (row-level, ACID) — the scale path.
    Parquet fallback: full rewrite — anti-join the existing table
    against the updates, union, write to a sibling dir, then swap via
    two directory renames. The swap assumes a LOCAL/POSIX filesystem
    (rename is atomic per directory; the window between the two renames
    is crash-recoverable from `path + '__tmp_upsert'`). On object
    stores use Delta — plain parquet has no atomic commit there."""
    if fmt == "delta":
        if not HAS_DELTA:
            raise NotImplementedError("delta-spark not installed")
        build_merge(DeltaTable.forPath(spark, path), updates, key_cols).execute()
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
    # The old data stays intact until the new table is fully written;
    # the swap is two renames, not a delete-then-copy.
    import os
    import shutil

    tmp = path.rstrip("/") + "__tmp_upsert"
    old = path.rstrip("/") + "__old_upsert"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path.rstrip("/"), old)
    os.rename(tmp, path.rstrip("/"))
    shutil.rmtree(old, ignore_errors=True)
