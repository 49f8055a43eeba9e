"""Tag-vocabulary CSV source (SURVEY S6, J7).

Mirrors ``assets/selected_tags.csv`` (tag_id,name,category,count; 9,083
rows; category 0=general, 4=character, 9=rating — tagger.py:32-38,
novelai_order.py:6-9). A classic broadcast dimension: explicit schema
(no inferSchema scan), loaded once, broadcast to every join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB_SCHEMA = T.StructType(
    [
        T.StructField("tag_id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("category", T.IntegerType(), False),
        T.StructField("count", T.LongType(), True),
    ]
)

CATEGORY_GENERAL, CATEGORY_CHARACTER, CATEGORY_RATING = 0, 4, 9


def read_tag_vocab(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, header=True, schema=VOCAB_SCHEMA)


def vocab_names_by_category(vocab: DataFrame, category: int) -> DataFrame:
    """Normalized (underscore → space, novelai_order.py:9) name list for
    one category."""
    return vocab.filter(F.col("category") == category).select(
        F.regexp_replace(F.col("name"), "_", " ").alias("name")
    )
