"""Snapshot diff (CDC-style change detection between two table
versions).

A recurring ingestion need the reference handles implicitly through
its upsert merge (J5, plans/legacy.py EP3): given yesterday's and
today's snapshot of the same logical table, classify every key as
added / deleted / modified (with the changed column names) — the
change feed that drives incremental downstream recomputation instead
of full reprocessing.

Scale shape: one full-outer shuffle join on the key columns — the
minimum possible; at 100 TB both snapshots are bucketed by key at
ingest (sources/sinks.write_bucketed) and the join runs
exchange-free. Column comparison is null-safe eqNullSafe inside the
join projection — no hashing pass over either table, and unchanged
rows can be filtered before anything else consumes the feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots.

    Output: key columns + ``change_type`` ('added' | 'deleted' |
    'modified' | 'unchanged') + ``changed_cols`` (sorted array of the
    compare columns whose values differ; empty unless 'modified')."""
    o = old.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"_k_{k}") == F.col(f"_nk_{k}")
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")

    changed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                    ).otherwise(F.lit(None))
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"_k_{k}"), F.col(f"_nk_{k}")).alias(k)
            for k in key_cols
        ],
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("deleted"))
        .when(F.size(changed) > 0, F.lit("modified"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        F.when(
            F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull(), changed
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def scd2_merge(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    *,
    old_version: int = 1,
    new_version: int = 2,
    open_to: int = 9999,
) -> DataFrame:
    """Build the SCD Type-2 row set for a two-snapshot dimension: one
    row per (key, attribute version) with ``valid_from`` /
    ``valid_to`` / ``is_current`` — the warehouse versioning pattern
    the upsert merge (J5) and snapshot_diff feed into.

    Classification per key (null-safe attr compare, same discipline as
    snapshot_diff):
    - unchanged → one open row (old_version, open_to, current)
    - modified  → closed old row (old_version, new_version, not
      current) + open new row (new_version, open_to, current)
    - deleted   → closed old row only
    - added     → open new row only

    Scale shape: ONE full-outer key join (exchange-free when both
    snapshots are bucketed by key at ingest) + a map-only
    array-explode that emits 1–2 version rows per key. No window, no
    second pass.
    """
    o = old.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in attr_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in attr_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"_k_{k}") == F.col(f"_nk_{k}")
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")

    same = None
    for c in attr_cols:
        e = F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        same = e if same is None else same & e

    def _row(version_cols: dict, vfrom, vto, cur) -> F.Column:  # type: ignore[name-defined]
        return F.struct(
            *[version_cols[c].alias(c) for c in attr_cols],
            F.lit(vfrom).cast("long").alias("valid_from"),
            F.lit(vto).cast("long").alias("valid_to"),
            F.lit(cur).alias("is_current"),
        )

    o_attrs = {c: F.col(f"_o_{c}") for c in attr_cols}
    n_attrs = {c: F.col(f"_n_{c}") for c in attr_cols}
    rows = (
        F.when(
            F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull() & same,
            F.array(_row(o_attrs, old_version, open_to, True)),
        )
        .when(
            F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull(),
            F.array(
                _row(o_attrs, old_version, new_version, False),
                _row(n_attrs, new_version, open_to, True),
            ),
        )
        .when(
            F.col("_in_old").isNotNull(),
            F.array(_row(o_attrs, old_version, new_version, False)),
        )
        .otherwise(F.array(_row(n_attrs, new_version, open_to, True)))
    )
    keys = [
        F.coalesce(F.col(f"_k_{k}"), F.col(f"_nk_{k}")).alias(k) for k in key_cols
    ]
    out = j.select(*keys, F.explode(rows).alias("_v"))
    return out.select(
        *key_cols,
        *[F.col(f"_v.{c}").alias(c) for c in attr_cols],
        F.col("_v.valid_from").alias("valid_from"),
        F.col("_v.valid_to").alias("valid_to"),
        F.col("_v.is_current").alias("is_current"),
    )
