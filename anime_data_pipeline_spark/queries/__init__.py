"""Query modules — importing this package registers every query."""

from anime_data_pipeline_spark.queries import (  # noqa: F401
    bucketing_q,
    coverage_q,
    curation_q,
    dedup_q,
    graph_q,
    mix_q,
    multimodal_q,
    relational,
    selection_q,
    similarity_q,
    streaming_q,
    tags_q,
    temporal_q,
    text_q,
    web_q,
    zorder_q,
)
