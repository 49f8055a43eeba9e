"""Skew-aware join utilities.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two cases need explicit treatment at 100 TB:

- **broadcast-able dimension**: no skew possible — always prefer
  ``F.broadcast`` (the engine does this throughout).
- **large ⋈ large with hot keys** (e.g. bucket resolutions clustering
  on a few aspect ratios, SURVEY §4.2): salt the hot side N ways and
  explode the other side N ways so one hot key spreads over N shuffle
  partitions. Deterministic salt (hash-mod, not rand()) keeps runs
  reproducible and lets AQE still coalesce the cold keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anime_data_pipeline_spark.functions.hashing import polyhash


def salted_join(
    big: DataFrame,
    skewed: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ skewed`` on ``key`` with an N-way salt.

    ``skewed`` (the side whose keys are hot) gets a deterministic salt
    in [0, salts) derived from ``salt_source`` (a high-cardinality
    column, default: the row's own key string — degenerate but still
    deterministic); ``big`` is exploded ``salts``× so every salted
    partner exists. Shuffle width for a hot key grows from 1 partition
    to ``salts`` partitions; the ``big`` side pays a ``salts``× row
    blowup on the exchange, so keep N small (4-16) and only salt joins
    AQE cannot fix.
    """
    src = F.col(salt_source) if salt_source else F.col(key).cast("string")
    salted = skewed.withColumn(
        "_salt", (polyhash(src.cast("string")) % F.lit(salts)).cast("int")
    )
    exploded = big.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return exploded.join(salted, [key, "_salt"], how).drop("_salt")


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Hot-key diagnostic: the top-N key frequencies (run before
    deciding to salt; one groupBy + small collect)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"))
        .limit(top)
    )
