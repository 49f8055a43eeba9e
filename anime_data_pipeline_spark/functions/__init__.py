"""Column-expression libraries (keys, tags, text, math, compat)."""

from anime_data_pipeline_spark.functions.compat import dround, dround_sql

__all__ = ["dround", "dround_sql"]
