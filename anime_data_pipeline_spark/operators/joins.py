"""Temporal join operators Spark lacks as primitives (task brief:
"as-of join, range join"): composed from existing DataFrame ops so
Catalyst still owns the physical plan.

- **as-of join**: for each left row, the LATEST right row with
  right.ts <= left.ts per key. NOT implemented as a theta-join (which
  degenerates to BroadcastNestedLoop/cartesian): both sides are
  UNIONED, sorted once per key, and matched with a running
  last-non-null window — one shuffle by key, linear scan, no pair
  blowup. The kdb/pandas merge_asof semantics at Spark scale.

- **range (interval) join**: events ⋈ intervals with start <= ts <
  end and NO equi key. The naive theta-join is quadratic; the scale
  form buckets time into fixed-width cells: intervals explode to the
  cells they cover, events map to their one cell, the join becomes an
  equi-join on cell + a residual range filter. Candidate count =
  events × overlapping-intervals-per-cell, not events × intervals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the most recent
    ``right`` values at-or-before its timestamp (per ``key``).

    Ties at equal ts match (<= semantics: the right row sorts before
    the left row at the same instant). Right (key, ts) pairs should be
    unique — with duplicates the latest by sort order wins.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, ts_col)
    ]
    l_tagged = left.withColumn("_side", F.lit(1))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r_tagged = right.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    for c in left.columns:
        if c not in (key, ts_col):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(key)
        .orderBy(ts_col, "_side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    for c in value_cols:
        u = u.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    return (
        u.filter(F.col("_side") == 1)
        .drop("_side")
        .select(
            *left.columns,
            *[F.col(f"_r_{c}").alias(f"right_{c}") for c in value_cols],
        )
    )


def range_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width_s: int = 300,
) -> DataFrame:
    """events ⋈ intervals on ``start <= ts < end`` via time-cell
    equi-join. Interval rows explode to every covered cell; each event
    joins its single cell; the residual filter restores exactness.
    Each (event, interval) match appears once (an event has one cell).
    """
    width = F.lit(bucket_width_s).cast("long")
    e = events.withColumn(
        "_cell", (F.unix_micros(F.col(ts_col)) / F.lit(1_000_000) / width).cast("long")
    )
    s_cell = (F.unix_micros(F.col(start_col)) / F.lit(1_000_000) / width).cast("long")
    # end is exclusive: the last covered cell is the one containing
    # (end - 1 microsecond)
    e_cell = (
        (F.unix_micros(F.col(end_col)) - 1) / F.lit(1_000_000) / width
    ).cast("long")
    i = intervals.withColumn("_cell", F.explode(F.sequence(s_cell, e_cell)))
    joined = e.join(i, "_cell").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_cell")
