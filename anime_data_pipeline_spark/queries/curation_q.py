"""q35 — the full curation pipeline as ONE oracle-checked query:
quality filter → exact dedup → LSH near-dup removal, over the mutated
corpus (which contains both exact and near duplicates by
construction). The DuckDB oracle rebuilds the identical chain,
including the banded LSH, so a hash-match certifies the composition,
not just the stages."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anime_data_pipeline_spark.functions.compat import dround, dround_sql
from anime_data_pipeline_spark.functions.hashing import polyhash_sql
from anime_data_pipeline_spark.operators.textstats import quality_sql_projection
from anime_data_pipeline_spark.plans.curation import curate_corpus
from anime_data_pipeline_spark.queries.dedup_q import (
    _CORPUS_SQL,
    minhash_pairs_sql,
    mutated_corpus,
)
from anime_data_pipeline_spark.registry import register

_QT = 0.7
_N, _K, _BANDS, _JT = 3, 12, 4, 0.5


def _uniq_sql() -> str:
    """Survivors of quality filter + exact dedup, as one nested SELECT
    (no WITH — this gets embedded as a CTE body elsewhere)."""
    score = quality_sql_projection("text")["quality_score"]
    kept = f"SELECT doc_id, text FROM ({_CORPUS_SQL}) WHERE ({score}) >= {_QT}"
    return f"""
    SELECT doc_id, text FROM (
      SELECT doc_id, text,
             min(doc_id) OVER (PARTITION BY {polyhash_sql("text")}) AS keeper
      FROM ({kept})
    ) WHERE doc_id = keeper
    """


def _q35_oracle() -> str:
    proj = quality_sql_projection("text")
    return f"""
    WITH pairs AS ({minhash_pairs_sql(_uniq_sql(), _N, _K, _BANDS, _JT)}),
    uniq AS ({_uniq_sql()})
    SELECT doc_id,
           {proj["n_tokens"]} AS n_tokens,
           {dround_sql(proj["quality_score"], 6)} AS quality_score
    FROM uniq
    WHERE doc_id NOT IN (SELECT id_b FROM pairs)
    """


@register("q35_curation_pipeline", oracle=_q35_oracle())
def q35_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = mutated_corpus(spark, sf_dir)
    curated = curate_corpus(
        corpus,
        "doc_id",
        "text",
        quality_threshold=_QT,
        n=_N,
        k=_K,
        bands=_BANDS,
        jaccard_threshold=_JT,
    )
    return curated.select(
        "doc_id",
        F.col("n_tokens"),
        dround(F.col("quality_score"), 6).alias("quality_score"),
    )
