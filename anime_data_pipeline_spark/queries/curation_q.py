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


# ---------------------------------------------------------------------------
# q88 — the COMPLETE pretraining-corpus preparation chain, end-to-end:
# hygiene (langid + quality) → exact dedup → LSH near-dup →
# decontamination vs a benchmark split → greedy packing. The corpus is
# salted so each stage demonstrably removes its class: exact copies
# (+100000), near-dup suffixed copies (+200000), and rows contaminated
# with the first benchmark doc's text (+300000). The oracle rebuilds
# all five stages, ending in the q67-style recursive-CTE pack replay.
# ---------------------------------------------------------------------------
_Q88_BUDGET = 256
_Q88_CONTAM_N = 8
_Q88_SUFFIX = " qq ww ee rr"


def _q88_train_sql() -> str:
    b0 = "(SELECT substr(text, 1, 200) FROM documents WHERE doc_id = 0)"
    return f"""
    SELECT doc_id, source, text FROM documents WHERE doc_id % 29 <> 0
    UNION ALL
    SELECT doc_id + 100000, source, text FROM documents
    WHERE doc_id % 29 <> 0 AND doc_id % 3 = 0
    UNION ALL
    SELECT doc_id + 200000, source, text || '{_Q88_SUFFIX}' FROM documents
    WHERE doc_id % 29 <> 0 AND doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 300000, source, text || ' ' || {b0} FROM documents
    WHERE doc_id % 29 <> 0 AND doc_id % 13 = 0
    """


def _q88_oracle() -> str:
    from anime_data_pipeline_spark.functions.hashing import shingle_hashes_sql
    from anime_data_pipeline_spark.functions.text import tokens_sql
    from anime_data_pipeline_spark.operators.textstats import (
        language_id_sql,
        ws_token_count_sql,
    )

    pred, _ = language_id_sql("text")
    score = quality_sql_projection("text")["quality_score"]
    ph = polyhash_sql("text")
    n = _Q88_CONTAM_N
    return f"""
    WITH RECURSIVE train AS ({_q88_train_sql()}),
    hygiene AS (SELECT doc_id, source, text FROM train
                WHERE ({pred}) = 'en' AND ({score}) >= {_QT}),
    uniq AS (
      SELECT doc_id, source, text FROM (
        SELECT doc_id, source, text,
               min(doc_id) OVER (PARTITION BY {ph}) AS keeper
        FROM hygiene
      ) WHERE doc_id = keeper),
    pairs AS ({minhash_pairs_sql("SELECT doc_id, text FROM uniq", _N, _K, _BANDS, _JT)}),
    surv AS (SELECT * FROM uniq WHERE doc_id NOT IN (SELECT id_b FROM pairs)),
    bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 29 = 0),
    sth AS (SELECT doc_id, list_transform({tokens_sql("text")},
                     t -> {polyhash_sql("t")}) AS th FROM surv),
    shash AS (SELECT doc_id,
                     list_distinct({shingle_hashes_sql("th", n)}) AS hashes
              FROM sth),
    bth AS (SELECT doc_id, list_transform({tokens_sql("text")},
                     t -> {polyhash_sql("t")}) AS th FROM bench),
    universe AS (SELECT DISTINCT unnest(
                   list_distinct({shingle_hashes_sql("th", n)})) AS sh FROM bth),
    ex AS (SELECT doc_id, unnest(hashes) AS sh FROM shash),
    hits AS (SELECT doc_id, count(*) AS n_hits
             FROM ex JOIN universe USING (sh) GROUP BY doc_id),
    clean AS (SELECT s.doc_id, s.source, s.text FROM surv s
              LEFT JOIN hits h USING (doc_id)
              WHERE coalesce(h.n_hits, 0) = 0),
    docs2 AS MATERIALIZED (SELECT doc_id, source, {ws_token_count_sql("text")} AS n_tokens,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY doc_id) AS rn
              FROM clean),
    step(source, rn, doc_id, n_tokens, chunk_id, acc) AS (
      SELECT source, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM docs2 WHERE rn = 1
      UNION ALL
      SELECT d.source, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN s.acc > 0 AND s.acc + d.n_tokens > {_Q88_BUDGET}
                  THEN s.chunk_id + 1 ELSE s.chunk_id END,
             CASE WHEN s.acc > 0 AND s.acc + d.n_tokens > {_Q88_BUDGET}
                  THEN d.n_tokens ELSE s.acc + d.n_tokens END
      FROM step s JOIN docs2 d ON d.source = s.source AND d.rn = s.rn + 1
    )
    SELECT doc_id, source, n_tokens, chunk_id FROM step
    """


@register("q88_pretraining_corpus", oracle=_q88_oracle())
def q88_pretraining_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.catalog import load_table
    from anime_data_pipeline_spark.plans.curation import prepare_pretraining_corpus

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    train_base = d.filter(F.col("doc_id") % 29 != 0)
    bench = d.filter(F.col("doc_id") % 29 == 0).select("doc_id", "text")
    b0 = F.broadcast(
        d.filter(F.col("doc_id") == 0).select(
            F.substring("text", 1, 200).alias("_b0")
        )
    )
    exact = train_base.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "source", "text"
    )
    near = train_base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        "source",
        F.concat(F.col("text"), F.lit(_Q88_SUFFIX)).alias("text"),
    )
    contam = (
        train_base.filter(F.col("doc_id") % 13 == 0)
        .crossJoin(b0)
        .select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            "source",
            F.concat(F.col("text"), F.lit(" "), F.col("_b0")).alias("text"),
        )
    )
    corpus = (
        train_base.unionByName(exact).unionByName(near).unionByName(contam)
    )
    return prepare_pretraining_corpus(
        corpus,
        bench,
        quality_threshold=_QT,
        n=_N,
        k=_K,
        bands=_BANDS,
        jaccard_threshold=_JT,
        contam_n=_Q88_CONTAM_N,
        budget=_Q88_BUDGET,
    )
