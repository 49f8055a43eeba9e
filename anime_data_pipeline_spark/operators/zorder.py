"""Z-order (Morton) clustering for multi-dimensional data skipping.

The 100 TB problem this solves: a table queried by BOTH customer and
date can be sorted by only one of them — the other predicate then hits
every file. Interleaving the bits of the two keys (Morton order: Morton
1966; the layout behind Delta/Databricks ``OPTIMIZE ZORDER BY`` and
Iceberg's z-ordered sort, both public designs) gives a single sort key
whose ranges are small rectangles in (x, y) space, so per-file min/max
stats prune files for predicates on EITHER dimension.

Everything here is plain integer arithmetic (shift/and/add) — identical
in Spark and DuckDB, whole-stage-codegen friendly, no UDF:

- :func:`zvalue` — the interleaved key as a column expression;
- :func:`zorder_write` — range-partition by z-value and write, giving
  each output file a contiguous (disjoint) z-range;
- :func:`bucket_minmax_stats` — the per-bucket min/max manifest a
  data-skipping reader consults, plus pruning decisions for a probe
  rectangle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative int
    columns: x occupies even bit positions, y odd. Pure shift/mask
    expression — stays inside codegen, scales with the scan."""
    xs = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ys = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a + b, terms).alias("zval")


def zvalue_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical Morton fold as DuckDB SQL text."""
    mask = (1 << bits) - 1
    xs = f"(CAST({x_expr} AS BIGINT) & {mask})"
    ys = f"(CAST({y_expr} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xs} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ys} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 32,
) -> None:
    """Write ``df`` as parquet clustered by z-value: repartitionByRange
    gives every output file a DISJOINT z-range (range exchange samples
    boundaries), and the within-partition sort makes row groups locally
    contiguous too — min/max footer stats then prune on either
    dimension. One range exchange total; at 100 TB set ``n_files`` from
    target file size (~128-512 MB each)."""
    z = zvalue(F.col(x_col), F.col(y_col), bits)
    (
        df.withColumn("zval", z)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def bucket_minmax_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    bucket_shift: int = 26,
) -> DataFrame:
    """The data-skipping manifest: bucket rows by the top z-value bits
    (bucket = zval >> ``bucket_shift``, a stand-in for one output file)
    and report each bucket's row count and (x, y) min/max envelope —
    exactly the footer stats a reader consults to skip files. One
    partial-aggregated groupBy on an 8-byte key."""
    z = zvalue(F.col(x_col), F.col(y_col), bits)
    return (
        df.withColumn("zval", z)
        .withColumn("bucket", F.shiftright(F.col("zval"), bucket_shift))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
    )


def pruned_for_rect(
    stats: DataFrame,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
) -> DataFrame:
    """Mark which buckets a probe rectangle can SKIP (no envelope
    overlap) — the planning-time decision a z-aware reader makes from
    the manifest alone, without touching data."""
    overlap = (
        (F.col("x_min") <= x_hi)
        & (F.col("x_max") >= x_lo)
        & (F.col("y_min") <= y_hi)
        & (F.col("y_max") >= y_lo)
    )
    return stats.withColumn("pruned", ~overlap)
