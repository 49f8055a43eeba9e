"""Query modules — importing this package registers every query."""

from anime_data_pipeline_spark.queries import bucketing_q, relational, tags_q  # noqa: F401
