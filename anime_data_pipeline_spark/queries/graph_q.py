"""Link-graph gate queries (LLM-pipeline extension surface).

q154 — PageRank crawl-frontier prioritization: the classic host/page
quality prior for web-scale corpus curation (pairs with q152's URL
canonicalization — canonicalize, dedup, THEN rank the frontier). A
deterministic link graph is synthesized from `documents` (two affine
edge families mod 97; src 13's out-edges removed so the dangling-mass
path is always exercised), and `operators/graph.pagerank` runs a
fixed 5-round damped power iteration. The DuckDB oracle replays the
identical iterations as unrolled CTE stages (pagerank_oracle_sql), so
every join, out-degree division, dangling redistribution, and
teleport term is hash-checked round-for-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.functions.compat import dround, dround_sql
from anime_data_pipeline_spark.operators.graph import pagerank, pagerank_oracle_sql
from anime_data_pipeline_spark.registry import register

_Q154_EDGES_SQL = """
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
    UNION ALL
    SELECT (doc_id * 17 + 3) % 97, (doc_id * 53 + 11) % 97 FROM documents
  ) WHERE src <> dst AND src <> 13
"""


def _q154_oracle() -> str:
    inner = pagerank_oracle_sql(_Q154_EDGES_SQL, damping=0.85, n_iter=5)
    return f"""
    SELECT CAST(node AS BIGINT) AS node,
           {dround_sql("pr", 6)} AS pr
    FROM ({inner})
    """


def _q154_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    e1 = docs.select((i % 97).alias("src"), ((i * 31 + 7) % 97).alias("dst"))
    e2 = docs.select(
        ((i * 17 + 3) % 97).alias("src"), ((i * 53 + 11) % 97).alias("dst")
    )
    return (
        e1.unionByName(e2)
        .distinct()
        .filter((F.col("src") != F.col("dst")) & (F.col("src") != 13))
    )


@register("q154_pagerank", oracle=_q154_oracle())
def q154_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = pagerank(_q154_edges(spark, sf_dir), damping=0.85, n_iter=5)
    return ranks.select(
        F.col("node").cast("long").alias("node"), dround(F.col("pr"), 6).alias("pr")
    )
