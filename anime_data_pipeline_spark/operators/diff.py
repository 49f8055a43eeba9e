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
