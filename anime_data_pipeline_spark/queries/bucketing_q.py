"""Bucketing queries for the correctness gate.

Image dimensions are synthesized deterministically from ``part``
(p_partkey arithmetic — identical integer math in Spark and DuckDB),
covering: generic odd sizes, an exact predefined-reso hit (832x1216,
the short-circuit at bucket_manager.py:104-106), and oversized images
(no-upscale shrink path, bucket_manager.py:120-154).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.functions.compat import dround
from anime_data_pipeline_spark.operators.bucketing import (
    BucketConfig,
    assign_bucket_columns,
    bucket_noupscale_oracle_sql,
    bucket_oracle_sql,
)
from anime_data_pipeline_spark.registry import register

_IMGS_SQL = """
  SELECT p_partkey AS image_key,
         CAST(CASE WHEN p_partkey % 19 = 0 THEN 832
                   WHEN p_partkey % 23 = 0 THEN 2400
                   ELSE 137 + (p_partkey * 73) % 1897 END AS INTEGER) AS width,
         CAST(CASE WHEN p_partkey % 19 = 0 THEN 1216
                   WHEN p_partkey % 23 = 0 THEN 1800
                   ELSE 119 + (p_partkey * 131) % 1411 END AS INTEGER) AS height
  FROM part
"""


def synthetic_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return part.select(
        k.alias("image_key"),
        F.when(k % 19 == 0, 832)
        .when(k % 23 == 0, 2400)
        .otherwise(137 + (k * 73) % 1897)
        .cast("int")
        .alias("width"),
        F.when(k % 19 == 0, 1216)
        .when(k % 23 == 0, 1800)
        .otherwise(119 + (k * 131) % 1411)
        .cast("int")
        .alias("height"),
    )


_COLS = ["image_key", "bucket_w", "bucket_h", "resized_w", "resized_h", "ar_error",
         "train_w", "train_h"]


@register("q21_bucket_assign", oracle=bucket_oracle_sql(_IMGS_SQL, BucketConfig()))
def q21_bucket_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 upscale path: exact-reso short-circuit else 1-NN on aspect ratio."""
    imgs = synthetic_images(spark, sf_dir)
    return assign_bucket_columns(imgs, cfg=BucketConfig()).select(*_COLS)


@register(
    "q22_bucket_assign_noupscale",
    oracle=bucket_noupscale_oracle_sql(_IMGS_SQL, BucketConfig(no_upscale=True)),
)
def q22_bucket_assign_noupscale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 no-upscale path: sqrt-area shrink, dual-orientation rounding."""
    imgs = synthetic_images(spark, sf_dir)
    return assign_bucket_columns(imgs, cfg=BucketConfig(no_upscale=True)).select(*_COLS)


@register(
    "q23_bucket_stats",
    oracle=f"""
    WITH assigned AS ({bucket_oracle_sql(_IMGS_SQL, BucketConfig())})
    SELECT bucket_w, bucket_h, count(*) AS n_images,
           floor((avg(abs(ar_error))) * 1000000.0 + 0.5) / 1000000.0 AS mean_abs_ar_error
    FROM assigned
    GROUP BY bucket_w, bucket_h
    """,
)
def q23_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: the reference's bucket report — per-bucket counts + mean
    |ar_error| (bucket_manager.py:213-226, bucketing_to_metadata.py:126-131)."""
    imgs = synthetic_images(spark, sf_dir)
    assigned = assign_bucket_columns(imgs, cfg=BucketConfig())
    return assigned.groupBy("bucket_w", "bucket_h").agg(
        F.count(F.lit(1)).alias("n_images"),
        dround(F.avg(F.abs(F.col("ar_error"))), 6).alias("mean_abs_ar_error"),
    )
