"""Z-order clustering gate queries over `orders`: the Morton key
itself (q83) and the data-skipping manifest + pruning decision it
enables (q84).

Dimensions: x = o_custkey (fits 8 bits at test scale), y = epoch-day of
o_orderdate (~9k-12k, fits 14 bits) — both well inside the 16-bit
interleave. The oracle recomputes the identical shift/mask fold in
DuckDB, so the key, the bucketing, and the pruning decisions are all
hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.operators.zorder import (
    bucket_minmax_stats,
    pruned_for_rect,
    zvalue,
    zvalue_sql,
)
from anime_data_pipeline_spark.registry import register

_BITS = 16
_SHIFT = 20  # bucket = zval >> 20 → one "file" per ~1M z-cells

_DAY_SQL = "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"
_Z_SQL = zvalue_sql("o_custkey", _DAY_SQL, _BITS)

# Probe rectangle for the pruning decision: customers 10-20, year 1997.
_X_LO, _X_HI = 10, 20
_Y_LO, _Y_HI = 9862, 10226  # epoch days for 1997-01-01 .. 1997-12-31


def _with_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("epoch_day"),
    )


@register(
    "q83_zorder_key",
    oracle=f"""
    SELECT o_orderkey,
           o_custkey,
           CAST({_DAY_SQL} AS BIGINT) AS epoch_day,
           {_Z_SQL} AS zval,
           ({_Z_SQL} >> {_SHIFT}) AS bucket
    FROM orders
    """,
)
def q83_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_day(spark, sf_dir)
    return df.select(
        "o_orderkey",
        "o_custkey",
        "epoch_day",
        zvalue(F.col("o_custkey"), F.col("epoch_day"), _BITS).alias("zval"),
        F.shiftright(
            zvalue(F.col("o_custkey"), F.col("epoch_day"), _BITS), _SHIFT
        ).alias("bucket"),
    )


@register(
    "q84_zorder_skipping",
    oracle=f"""
    WITH z AS (SELECT o_custkey AS x, CAST({_DAY_SQL} AS BIGINT) AS y,
                      ({_Z_SQL} >> {_SHIFT}) AS bucket
               FROM orders)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max,
           NOT (min(x) <= {_X_HI} AND max(x) >= {_X_LO}
                AND min(y) <= {_Y_HI} AND max(y) >= {_Y_LO}) AS pruned
    FROM z GROUP BY bucket
    """,
)
def q84_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_day(spark, sf_dir)
    stats = bucket_minmax_stats(
        df, "o_custkey", "epoch_day", bits=_BITS, bucket_shift=_SHIFT
    )
    out = pruned_for_rect(stats, _X_LO, _X_HI, _Y_LO, _Y_HI)
    return out.select(
        "bucket",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("x_min").alias("x_min"),
        F.col("x_max").alias("x_max"),
        F.col("y_min").alias("y_min"),
        F.col("y_max").alias("y_max"),
        "pruned",
    )
