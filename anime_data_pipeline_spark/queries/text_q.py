"""Text-analysis gate queries over `documents`: token counting, quality
scoring, language ID, winnowing fingerprints — plus a corpus-level
quality × language rollup.

The raw documents are uniform lowercase word streams, so a mutated
variant (punctuation / digits / short docs injected deterministically
by doc_id, identically in both engines) gives the metrics real
variance to discriminate on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.functions.compat import dround, dround_sql
from anime_data_pipeline_spark.functions.hashing import P, perm_constants, polyhash_sql
from anime_data_pipeline_spark.functions.text import tokens_sql
from anime_data_pipeline_spark.operators.textstats import (
    bpe_token_count,
    bpe_token_count_sql,
    language_id,
    language_id_sql,
    quality_columns,
    quality_sql_projection,
    winnow_fingerprints,
    winnow_fingerprints_sql,
    ws_token_count,
    ws_token_count_sql,
)
from anime_data_pipeline_spark.registry import register

# Deterministic mutation: punctuation-heavy / digit-heavy / truncated
# variants so ratios and the composite score take distinct values.
_MUT_SQL = """CASE CAST(doc_id % 4 AS INTEGER)
  WHEN 0 THEN text || ' !!! ??? ... ;;; ((()))'
  WHEN 1 THEN text || ' 12345 67890 42 7 999'
  WHEN 2 THEN substr(text, 1, 40)
  ELSE text END"""


def _mutated(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(" !!! ??? ... ;;; ((()))")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.col("text"), F.lit(" 12345 67890 42 7 999")))
        .when(F.col("doc_id") % 4 == 2, F.substring(F.col("text"), 1, 40))
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", "lang", m.alias("text"))


_DOCS_CTE = f"SELECT doc_id, lang, ({_MUT_SQL}) AS text FROM documents"


# ---------------------------------------------------------------------------
# q51 — token counting (whitespace + BPE-ish regex segmentation)
# ---------------------------------------------------------------------------
@register(
    "q51_token_counts",
    oracle=f"""
    WITH docs AS ({_DOCS_CTE})
    SELECT doc_id,
           {ws_token_count_sql("text")} AS ws_tokens,
           {bpe_token_count_sql("text")} AS bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_m
    FROM docs
    """,
)
def q51_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _mutated(spark, sf_dir)
    return docs.select(
        "doc_id",
        ws_token_count(F.col("text")).alias("ws_tokens"),
        bpe_token_count(F.col("text")).alias("bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_m"),
    )


# ---------------------------------------------------------------------------
# q52 — quality scoring (per-doc components + composite)
# ---------------------------------------------------------------------------
def _q52_oracle() -> str:
    proj = quality_sql_projection("text")
    cols = ", ".join(
        f"{dround_sql(expr, 6)} AS {name}"
        if name in ("punct_ratio", "digit_ratio", "stopword_ratio",
                    "mean_token_len", "quality_score")
        else f"{expr} AS {name}"
        for name, expr in proj.items()
    )
    return f"WITH docs AS ({_DOCS_CTE}) SELECT doc_id, {cols} FROM docs"


@register("q52_quality_score", oracle=_q52_oracle())
def q52_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = quality_columns(_mutated(spark, sf_dir), "text")
    ratio_cols = ["punct_ratio", "digit_ratio", "stopword_ratio",
                  "mean_token_len", "quality_score"]
    for c in ratio_cols:
        out = out.withColumn(c, dround(F.col(c), 6))
    return out.select("doc_id", "n_chars_m", "n_tokens", *ratio_cols)


# ---------------------------------------------------------------------------
# q53 — language ID by function-word profiles
# ---------------------------------------------------------------------------
def _q53_oracle() -> str:
    pred, hits = language_id_sql("text")
    return f"""
    WITH docs AS ({_DOCS_CTE})
    SELECT doc_id, lang, {pred} AS pred_lang, {hits} AS profile_hits FROM docs
    """


@register("q53_language_id", oracle=_q53_oracle())
def q53_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(_mutated(spark, sf_dir), "text").select(
        "doc_id", "lang", "pred_lang", "profile_hits"
    )


# ---------------------------------------------------------------------------
# q54 — winnowing fingerprints (k=3 token-grams, window 4)
# ---------------------------------------------------------------------------
@register(
    "q54_winnow_fingerprints",
    oracle=winnow_fingerprints_sql(_DOCS_CTE, "doc_id", "text", k=3, w=4),
)
def q54_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_fingerprints(_mutated(spark, sf_dir), "doc_id", "text", k=3, w=4)


# ---------------------------------------------------------------------------
# q55 — corpus rollup: quality filter rate per (lang, quality band).
# The downstream curation question ("what survives the filter, where")
# as one partial-aggregated groupBy.
# ---------------------------------------------------------------------------
def _q55_oracle() -> str:
    proj = quality_sql_projection("text")
    return f"""
    WITH docs AS ({_DOCS_CTE}),
    scored AS (SELECT doc_id, lang, {proj["quality_score"]} AS q FROM docs)
    SELECT lang,
           CAST(floor(q * 4.0 + 0.5) AS BIGINT) AS q_band,
           count(*) AS n_docs,
           {dround_sql("avg(q)", 6)} AS avg_q
    FROM scored GROUP BY lang, q_band
    """


@register("q55_quality_rollup", oracle=_q55_oracle())
def q55_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = quality_columns(_mutated(spark, sf_dir), "text")
    return (
        scored.groupBy(
            "lang",
            F.floor(F.col("quality_score") * 4.0 + 0.5).cast("long").alias("q_band"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dround(F.avg("quality_score"), 6).alias("avg_q"),
        )
    )


# ---------------------------------------------------------------------------
# q82 — Gopher rule bundle (Rae et al. 2021 Table A1): deterministic
# mutations give every rule both passing and failing docs (stop-word
# phrase, bullet lines, ellipsis line endings, symbol runs).
# ---------------------------------------------------------------------------
_GOPHER_MUT_SQL = """
    (CASE WHEN doc_id % 5 = 0 THEN text || ' the data of and that have with'
          ELSE text END)
    || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || '- bullet item' || chr(10) || '* second item'
             ELSE '' END)
    || (CASE WHEN doc_id % 6 = 0 THEN chr(10) || 'and the story trails off...'
             ELSE '' END)
    || (CASE WHEN doc_id % 9 = 0 THEN ' ## ### ##' ELSE '' END)
"""


def _gopher_mutated(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    t = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(t, F.lit(" the data of and that have with")),
    ).otherwise(t)
    t = F.concat(
        t,
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit("\n- bullet item\n* second item"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 6 == 0,
            F.lit("\nand the story trails off..."),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 9 == 0, F.lit(" ## ### ##")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", t.alias("text"))


def _q82_oracle() -> str:
    from anime_data_pipeline_spark.operators.textstats import gopher_sql_projection

    proj = gopher_sql_projection("text")
    frac_cols = ("mean_word_len", "symbol_ratio", "bullet_frac",
                 "ellipsis_frac", "alpha_word_frac")
    cols = ", ".join(
        f"{dround_sql(expr, 6)} AS {name}" if name in frac_cols
        else f"{expr} AS {name}"
        for name, expr in proj.items()
    )
    return (
        f"WITH docs AS (SELECT doc_id, ({_GOPHER_MUT_SQL}) AS text FROM documents) "
        f"SELECT doc_id, {cols} FROM docs"
    )


@register("q82_gopher_rules", oracle=_q82_oracle())
def q82_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.textstats import gopher_rules

    out = gopher_rules(_gopher_mutated(spark, sf_dir), "text")
    for c in ("mean_word_len", "symbol_ratio", "bullet_frac",
              "ellipsis_frac", "alpha_word_frac"):
        out = out.withColumn(c, dround(F.col(c), 6))
    return out.drop("text")


# ---------------------------------------------------------------------------
# q94 — RAG sliding-window chunking: overlapping token windows per
# document (chunk 64, stride 48), the retrieval-index ingestion step.
# Oracle mirrors the sequence-of-starts explode and slice+join.
# ---------------------------------------------------------------------------
_Q94_CHUNK, _Q94_STRIDE = 64, 48

_Q94_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id AS doc, {tokens_sql("text")} AS t FROM documents
    ),
    starts AS (
      SELECT doc, t, unnest(range(0, greatest(len(t), 1), {_Q94_STRIDE})) AS s
      FROM toks
    )
    SELECT doc,
           CAST(s / {_Q94_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(t, s + 1, s + {_Q94_CHUNK})) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(list_slice(t, s + 1, s + {_Q94_CHUNK}), ' ')
             AS chunk_text
    FROM starts
"""


@register("q94_rag_chunking", oracle=_Q94_ORACLE)
def q94_rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.textstats import sliding_chunks

    docs = load_table(spark, sf_dir, "documents")
    return sliding_chunks(
        docs, "doc_id", "text", chunk_tokens=_Q94_CHUNK, stride=_Q94_STRIDE
    )


# ---------------------------------------------------------------------------
# q105 — quality-score distribution drift between two corpus versions
# (raw vs mutated): fixed-bin histograms, add-half-smoothed shares,
# per-bin PSI contribution — the monitoring op a production pipeline
# runs on every corpus refresh (Σ psi_contrib > 0.2 = the classic
# shift alarm). Bin membership is identical IEEE math in both engines.
# ---------------------------------------------------------------------------
_Q105_BINS = 20


def _q105_oracle() -> str:
    score = quality_sql_projection("text")["quality_score"]
    nb = _Q105_BINS
    return f"""
    WITH v1 AS (SELECT ({score}) AS s FROM documents),
    v2 AS (SELECT ({score}) AS s FROM ({_DOCS_CTE})),
    ha AS (SELECT greatest(least(CAST(floor(s * {nb}) AS INT), {nb - 1}), 0) AS bin,
                  count(*) AS n_a FROM v1 GROUP BY 1),
    hb AS (SELECT greatest(least(CAST(floor(s * {nb}) AS INT), {nb - 1}), 0) AS bin,
                  count(*) AS n_b FROM v2 GROUP BY 1),
    ta AS (SELECT sum(n_a) AS t FROM ha),
    tb AS (SELECT sum(n_b) AS t FROM hb),
    bins AS (SELECT CAST(g.i AS INT) AS bin FROM generate_series(0, {nb - 1}) g(i)),
    j AS (SELECT bins.bin,
                 (coalesce(ha.n_a, 0) + 0.5) / ((SELECT t FROM ta) + {0.5 * nb}) AS share_a,
                 (coalesce(hb.n_b, 0) + 0.5) / ((SELECT t FROM tb) + {0.5 * nb}) AS share_b
          FROM bins LEFT JOIN ha USING (bin) LEFT JOIN hb USING (bin))
    SELECT bin, {dround_sql("share_a", 6)} AS share_a,
           {dround_sql("share_b", 6)} AS share_b,
           {dround_sql("(share_a - share_b) * ln(share_a / share_b)", 6)} AS psi_contrib
    FROM j
    """


@register("q105_quality_drift", oracle=_q105_oracle())
def q105_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.profiling import histogram_drift
    from anime_data_pipeline_spark.operators.textstats import quality_columns

    raw = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    v1 = quality_columns(raw, "text").select("quality_score")
    v2 = quality_columns(_mutated(spark, sf_dir), "text").select("quality_score")
    out = histogram_drift(v1, v2, "quality_score", n_bins=_Q105_BINS)
    return out.select(
        "bin",
        dround(F.col("share_a"), 6).alias("share_a"),
        dround(F.col("share_b"), 6).alias("share_b"),
        dround(F.col("psi_contrib"), 6).alias("psi_contrib"),
    )


# ---------------------------------------------------------------------------
# q107 — Okapi BM25 retrieval: top-10 documents for a fixed bag-of-
# terms query — the lexical-search baseline of every RAG stack. Ranks
# order by the rounded score so ln()'s last-ulp engine differences
# cannot flip top-k membership.
# ---------------------------------------------------------------------------
_Q107_TERMS = ("spark", "hash", "window")
_Q107_K, _Q107_K1, _Q107_B = 10, 1.2, 0.75

def _bm25_cte(terms: tuple[str, ...], k1: float, b: float) -> str:
    """CTE chain ``tok … r`` ending in r(doc, bm25-rounded) — shared by
    the plain retrieval gate (q107) and the rerank composition (q110)."""
    return f"""tok AS (SELECT doc_id AS doc, unnest({tokens_sql("text")}) AS term
                 FROM documents),
    postings AS (SELECT doc, term, count(*) AS tf FROM tok
                 WHERE term IN {str(tuple(terms))}
                 GROUP BY doc, term),
    dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
    lens AS (SELECT doc_id AS doc,
                    len({tokens_sql("text")}) AS dl FROM documents),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
    scored AS (SELECT p.doc,
                      sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                          * (tf * {k1 + 1.0!r})
                          / (tf + {k1!r} * ({1.0 - b!r}
                             + {b!r} * dl / avgdl))) AS bm25
               FROM postings p
               JOIN dfreq USING (term)
               JOIN lens USING (doc)
               CROSS JOIN stats
               GROUP BY p.doc),
    r AS (SELECT doc, {dround_sql("bm25", 6)} AS bm25 FROM scored)"""


_Q107_ORACLE = f"""
    WITH {_bm25_cte(_Q107_TERMS, _Q107_K1, _Q107_B)},
    ranked AS (SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc) AS rank
               FROM r)
    SELECT doc, bm25, rank FROM ranked WHERE rank <= {_Q107_K}
"""


@register("q107_bm25_topk", oracle=_Q107_ORACLE)
def q107_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.terms import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    out = bm25_topk(
        docs, "doc_id", "text", list(_Q107_TERMS),
        k=_Q107_K, k1=_Q107_K1, b=_Q107_B,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# q109 — PMI collocations: top-20 adjacent bigrams by pointwise mutual
# information with a min-support floor — the phrase-mining pass behind
# tokenizer vocab construction and tag normalization.
# ---------------------------------------------------------------------------
_Q109_K, _Q109_MIN = 20, 5

_Q109_ORACLE = f"""
    WITH toks AS (SELECT {tokens_sql("text")} AS t FROM documents),
    uni AS (SELECT unnest(t) AS term FROM toks),
    unic AS (SELECT term, count(*) AS n_term FROM uni GROUP BY term),
    big AS (SELECT t[i] AS t_a, t[i + 1] AS t_b FROM (
              SELECT t, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
              FROM toks)),
    bigc AS (SELECT t_a, t_b, count(*) AS n_pair FROM big
             GROUP BY t_a, t_b HAVING count(*) >= {_Q109_MIN}),
    nu AS (SELECT sum(n_term) AS n_tokens FROM unic),
    nb AS (SELECT sum(n_pair) AS n_bigrams FROM bigc),
    scored AS (SELECT b.t_a, b.t_b, b.n_pair,
                      ln((b.n_pair / n_bigrams)
                         / ((ua.n_term / n_tokens) * (ub.n_term / n_tokens))) AS pmi
               FROM bigc b
               JOIN unic ua ON ua.term = b.t_a
               JOIN unic ub ON ub.term = b.t_b
               CROSS JOIN nu CROSS JOIN nb),
    r AS (SELECT t_a, t_b, CAST(n_pair AS BIGINT) AS n_pair,
                 {dround_sql("pmi", 6)} AS pmi
          FROM scored),
    ranked AS (SELECT *, row_number() OVER (ORDER BY pmi DESC, t_a, t_b) AS rank
               FROM r)
    SELECT t_a, t_b, n_pair, pmi, rank FROM ranked WHERE rank <= {_Q109_K}
"""


@register("q109_pmi_collocations", oracle=_Q109_ORACLE)
def q109_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.terms import pmi_collocations

    docs = load_table(spark, sf_dir, "documents")
    out = pmi_collocations(docs, "doc_id", "text", k=_Q109_K, min_count=_Q109_MIN)
    return out.withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# q110 — retrieve-then-rerank: BM25 top-50 candidates re-scored by a
# stub cross-encoder (deterministic polyhash of text-prefix × query —
# the same replayable-fake-model convention as the q73 tagger), top-10
# by reranked score. The RAG serving path: cheap lexical recall stage,
# expensive model only on the candidate set.
# ---------------------------------------------------------------------------
_Q110_CAND, _Q110_K = 50, 10
_Q110_QUERY = " ".join(_Q107_TERMS)

_Q110_ORACLE = f"""
    WITH {_bm25_cte(_Q107_TERMS, _Q107_K1, _Q107_B)},
    cand AS (SELECT doc, bm25,
                    row_number() OVER (ORDER BY bm25 DESC, doc) AS brank
             FROM r),
    top AS (SELECT doc, bm25 FROM cand WHERE brank <= {_Q110_CAND}),
    rr AS (SELECT t.doc, t.bm25,
                  {dround_sql(
                      "CAST(" + polyhash_sql(
                          "substr(d.text, 1, 64) || '|" + _Q110_QUERY + "'"
                      ) + " AS DOUBLE) / " + str(P), 9)} AS rerank_score
           FROM top t JOIN documents d ON d.doc_id = t.doc),
    ranked AS (SELECT *, row_number() OVER (
                 ORDER BY rerank_score DESC, doc) AS rank FROM rr)
    SELECT doc, bm25, rerank_score, rank FROM ranked WHERE rank <= {_Q110_K}
"""


@register("q110_bm25_rerank", oracle=_Q110_ORACLE)
def q110_bm25_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from anime_data_pipeline_spark.functions.hashing import polyhash
    from anime_data_pipeline_spark.operators.terms import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    cand = bm25_topk(
        docs, "doc_id", "text", list(_Q107_TERMS),
        k=_Q110_CAND, k1=_Q107_K1, b=_Q107_B,
    ).select("doc", "bm25")
    # stub cross-encoder: executor-side deterministic score of
    # (doc-prefix, query) — a real model slots into the same join shape
    # (candidates only ever reach it, never the corpus)
    texts = docs.select(
        F.col("doc_id").alias("doc"),
        dround(
            polyhash(
                F.concat(F.substring("text", 1, 64), F.lit("|" + _Q110_QUERY))
            ).cast("double")
            / F.lit(float(P)),
            9,
        ).alias("rerank_score"),
    )
    rr = cand.join(texts, "doc")
    # TakeOrderedAndProject + rank over the k-row survivor set (the
    # input is already candidate-bounded; the limit keeps the pattern
    # structural for the plan-shape sweep).
    w = Window.partitionBy().orderBy(F.desc("rerank_score"), F.asc("doc"))
    return (
        rr.orderBy(F.desc("rerank_score"), F.asc("doc"))
        .limit(int(_Q110_K))
        .withColumn("rank", F.row_number().over(w))
        .select("doc", "bm25", "rerank_score", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# q124 — per-group discrete quantiles (round 5): p50/p90 of document
# length per language via deterministic (value, id) rank — the
# corpus-report quantile with NO percentile interpolation (the exact
# cross-engine-safe form; engine/DuckDB percentile_cont interpolation
# and ordering semantics differ). Value at rank ceil(q·n), ties broken
# by doc_id, so the answer is a real corpus value, reproducible at any
# parallelism. Per-group windows partition by lang (bounded groups).
# ---------------------------------------------------------------------------
@register(
    "q124_group_quantiles",
    oracle="""
    WITH ranked AS (
      SELECT lang, n_chars, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           CAST(max(n) AS BIGINT) AS n_docs,
           CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN n_chars END) AS BIGINT) AS p50_chars,
           CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                         THEN n_chars END) AS BIGINT) AS p90_chars
    FROM ranked GROUP BY lang
    """,
)
def q124_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    wc = Window.partitionBy("lang")
    ranked = docs.select(
        "lang",
        "n_chars",
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    pick = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"),
            F.col("n_chars"),
        )
    ).cast("long")
    return ranked.groupBy("lang").agg(
        F.max("n").cast("long").alias("n_docs"),
        pick(0.5).alias("p50_chars"),
        pick(0.9).alias("p90_chars"),
    )


# ---------------------------------------------------------------------------
# q127 — content-defined chunking (round 5): Rabin/FastCDC-style
# token-level chunk boundaries (hash(token) % 64 == 0), spans and
# span hashes computed entirely from the token-hash array. The
# revision-tolerant chunk-store dedup primitive: boundaries move with
# content, so an edited document re-aligns after its next boundary.
# Oracle replays the identical boundary filter + per-span fold.
# ---------------------------------------------------------------------------
_Q127_DIV = 64


def _q127_oracle() -> str:
    d = _Q127_DIV
    th = "list_transform(" + tokens_sql("text") + ", t -> " + polyhash_sql("t") + ")"
    return f"""
    WITH tha AS (SELECT doc_id AS doc, {th} AS th FROM documents),
    nz AS (SELECT doc, th, len(th) AS n FROM tha WHERE len(th) > 0),
    be AS (SELECT doc, th, n,
                  list_sort(list_distinct(list_concat(
                    list_filter(generate_series(1, n), i -> th[i] % {d} = 0),
                    [n]))) AS ends
           FROM nz),
    spans AS (SELECT doc, th, ends, u.s AS i
              FROM be, unnest(generate_series(1, len(ends))) AS u(s)),
    sp AS (SELECT doc, th, i AS chunk_idx,
                  CASE WHEN i = 1 THEN 1 ELSE ends[CAST(i - 1 AS INT)] + 1 END AS s,
                  ends[CAST(i AS INT)] AS e
           FROM spans)
    SELECT doc, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(s AS BIGINT) AS start, CAST(e AS BIGINT) AS "end",
           CAST(e - s + 1 AS BIGINT) AS n_chunk_tokens,
           list_reduce(list_prepend(CAST(0 AS BIGINT), th[s:e]),
                       (a, b) -> (a * 31 + b) % {P}) AS chunk_hash
    FROM sp
    """


@register("q127_cdc_chunks", oracle=_q127_oracle())
def q127_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.textstats import cdc_chunks

    docs = load_table(spark, sf_dir, "documents")
    return cdc_chunks(docs, "doc_id", "text", divisor=_Q127_DIV)


# ---------------------------------------------------------------------------
# q128 — sequence-length bucketing (round 5): the TEXT twin of the
# reference's aspect-ratio image buckets (bucket_manager.py:99-159 —
# group samples into shape classes so batches pad minimally): each doc
# goes to the next power-of-two token-length bucket (clamped to
# [16, 2048]); per bucket, the doc count, true tokens, padded tokens,
# and the padding-waste fraction a bucketed batcher would pay. One
# map-only bucket expr + one partial-aggregated groupBy.
# ---------------------------------------------------------------------------
_Q128_MIN, _Q128_MAX = 16, 2048


def _q128_oracle() -> str:
    lo, hi = _Q128_MIN, _Q128_MAX
    n = ws_token_count_sql("text")
    b = (
        f"least(greatest(CAST(power(2, ceil(log2(greatest({n}, 1)))) AS BIGINT), "
        f"{lo}), {hi})"
    )
    return f"""
    WITH d AS (SELECT {n} AS n_tokens, {b} AS bucket FROM documents)
    SELECT bucket,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS true_tokens,
           CAST(sum(least(bucket, greatest(n_tokens, 0))) AS BIGINT) AS kept_tokens,
           CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
           {dround_sql("1.0 - sum(least(bucket, greatest(n_tokens, 0))) / CAST(count(*) * bucket AS DOUBLE)", 6)}
             AS pad_waste_frac
    FROM d GROUP BY bucket
    """


@register("q128_length_buckets", oracle=_q128_oracle())
def q128_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = ws_token_count(F.col("text"))
    bucket = F.least(
        F.greatest(
            F.pow(F.lit(2.0), F.ceil(F.log2(F.greatest(n, F.lit(1))))).cast("long"),
            F.lit(_Q128_MIN),
        ),
        F.lit(_Q128_MAX),
    )
    d = docs.select(n.alias("n_tokens"), bucket.alias("bucket"))
    kept = F.least(F.col("bucket"), F.greatest(F.col("n_tokens"), F.lit(0)))
    return d.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("true_tokens"),
        F.sum(kept).cast("long").alias("kept_tokens"),
        (F.count(F.lit(1)) * F.first("bucket")).cast("long").alias("padded_tokens"),
        dround(
            F.lit(1.0)
            - F.sum(kept) / (F.count(F.lit(1)) * F.first("bucket")).cast("double"),
            6,
        ).alias("pad_waste_frac"),
    )


# ---------------------------------------------------------------------------
# q129 — robust outlier flagging (round 5): per-language median and
# MAD (median absolute deviation) of document length from the same
# rank-exact discrete quantile as q124 — mean/std outlier rules break
# under the heavy-tailed length distributions real corpora have; the
# median/MAD rule does not. Two rank passes (median, then deviation
# median), both per-group windows; outliers = |x − med| > 3·MAD.
# ---------------------------------------------------------------------------
def _q129_oracle() -> str:
    return """
    WITH r1 AS (
      SELECT lang, n_chars, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ),
    med AS (SELECT lang, max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                                  THEN n_chars END) AS med
            FROM r1 GROUP BY lang),
    dev AS (SELECT d.lang, d.doc_id, d.n_chars,
                   abs(d.n_chars - m.med) AS dv, m.med
            FROM documents d JOIN med m USING (lang)),
    r2 AS (SELECT *,
                  row_number() OVER (PARTITION BY lang ORDER BY dv, doc_id) AS rn,
                  count(*) OVER (PARTITION BY lang) AS n
           FROM dev),
    mad AS (SELECT lang, max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                                  THEN dv END) AS mad
            FROM r2 GROUP BY lang)
    SELECT d.lang,
           count(*) AS n_docs,
           CAST(max(m.med) AS BIGINT) AS med_chars,
           CAST(max(a.mad) AS BIGINT) AS mad_chars,
           CAST(sum(CASE WHEN abs(d.n_chars - m.med) > 3 * a.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM documents d
    JOIN med m USING (lang)
    JOIN mad a USING (lang)
    GROUP BY d.lang
    """


@register("q129_robust_outliers", oracle=_q129_oracle())
def q129_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")

    def group_median(df, val_col, out_col):
        w = Window.partitionBy("lang").orderBy(F.asc(val_col), F.asc("doc_id"))
        wc = Window.partitionBy("lang")
        ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_n", F.count(F.lit(1)).over(wc)
        )
        return ranked.groupBy("lang").agg(
            F.max(
                F.when(
                    F.col("_rn") == F.ceil(F.lit(0.5) * F.col("_n")).cast("long"),
                    F.col(val_col),
                )
            ).alias(out_col)
        )

    med = group_median(docs, "n_chars", "med")
    dev = docs.join(F.broadcast(med), "lang").withColumn(
        "dv", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = group_median(dev, "dv", "mad")
    return (
        docs.join(F.broadcast(med), "lang")
        .join(F.broadcast(mad), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("med").cast("long").alias("med_chars"),
            F.max("mad").cast("long").alias("mad_chars"),
            F.sum(
                F.when(
                    F.abs(F.col("n_chars") - F.col("med")) > 3 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# q132 — BPE merge-pair counts: the first iteration of byte-pair-
# encoding tokenizer training. Adjacent CHARACTER pairs inside each
# distinct word, weighted by the word's corpus frequency — the pair
# with the highest count is BPE's first merge. Two map-side-combinable
# shuffles: the word-frequency agg (vocabulary-sized keys, never
# documents) and the pair agg (alphabet²-bounded keys); the per-word
# pair expansion runs on the DISTINCT vocabulary, so corpus-scale text
# is never re-scanned per pair. Global top-k is orderBy+limit
# (TakeOrderedAndProject) with rank derived over the survivors.
# ---------------------------------------------------------------------------
_Q132_TOPK = 20


def _q132_oracle() -> str:
    toks = tokens_sql("text")
    return f"""
    WITH words AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest({toks}) AS w FROM documents)
      GROUP BY w),
    pairs AS (
      SELECT substring(word, i, 1) AS l, substring(word, i + 1, 1) AS r, n
      FROM words, unnest(range(1, length(word))) AS t(i)
      WHERE length(word) >= 2),
    agg AS (
      SELECT l, r, CAST(sum(n) AS BIGINT) AS pair_count
      FROM pairs GROUP BY l, r),
    top AS (
      SELECT * FROM agg
      ORDER BY pair_count DESC, l, r LIMIT {_Q132_TOPK})
    SELECT l, r, pair_count,
           CAST(row_number() OVER (ORDER BY pair_count DESC, l, r) AS BIGINT) AS rank
    FROM top
"""


@register("q132_bpe_merge_pairs", oracle=_q132_oracle())
def q132_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from anime_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    pairs = (
        words.filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.struct(
                        F.col("word").substr(i, F.lit(1)).alias("l"),
                        F.col("word").substr(i + 1, F.lit(1)).alias("r"),
                    ),
                )
            ).alias("p"),
            F.col("n"),
        )
        .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "n")
    )
    agg = pairs.groupBy("l", "r").agg(F.sum("n").cast("long").alias("pair_count"))
    top = agg.orderBy(F.desc("pair_count"), "l", "r").limit(_Q132_TOPK)
    w = W.orderBy(F.desc("pair_count"), "l", "r")
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# q134 — tokenizer vocabulary coverage audit: derive a top-V vocabulary
# from corpus word frequencies (the vocabulary-construction step), then
# measure per-source OOV rates against it. Three map-side-combinable
# shuffles: word freq (vocabulary-sized keys), the top-V TakeOrdered,
# and the source rollup; the membership check is a broadcast
# left-join of exploded tokens against the V-row vocab (V is fixed —
# broadcastable at ANY corpus size).
# ---------------------------------------------------------------------------
_Q134_V = 500  # vocabulary size


def _q134_oracle() -> str:
    toks = tokens_sql("text")
    return f"""
    WITH freq AS (
      SELECT w AS word, count(*) AS n
      FROM (SELECT unnest({toks}) AS w FROM documents)
      GROUP BY w),
    vocab AS (SELECT word FROM freq ORDER BY n DESC, word LIMIT {_Q134_V}),
    tok AS (SELECT doc_id, source, unnest({toks}) AS w FROM documents),
    perdoc AS (
      SELECT tok.doc_id, tok.source,
             count(*) AS n_tok,
             count(*) FILTER (WHERE vocab.word IS NULL) AS n_oov
      FROM tok LEFT JOIN vocab ON tok.w = vocab.word
      GROUP BY tok.doc_id, tok.source)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(n_oov) AS BIGINT) AS oov_tokens,
           {dround_sql("sum(n_oov) / CAST(sum(n_tok) AS DOUBLE)", 6)} AS oov_rate
    FROM perdoc GROUP BY source
"""


@register("q134_vocab_coverage", oracle=_q134_oracle())
def q134_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(_Q134_V)
        .select(F.col("w").alias("vword"))
    )
    perdoc = (
        tok.join(F.broadcast(vocab), tok["w"] == vocab["vword"], "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.count(F.when(F.col("vword").isNull(), 1)).alias("n_oov"),
        )
    )
    return perdoc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum("n_oov").cast("long").alias("oov_tokens"),
        dround(
            F.sum("n_oov") / F.sum("n_tok").cast("double"), 6
        ).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# q135 — document-stitching detection: find (a, b) pairs where doc b
# CONTINUES doc a (b's first K tokens = a's last K tokens) — the
# shard-boundary-split / pagination artifact a scraped corpus needs
# re-joined before packing. Map-only head/tail K-gram hashing, one
# equi-join on the 8-byte hash, then a string verify of the actual
# K-grams (the dual-hash lesson: a bare polyhash match over ~2^30
# buckets WOULD birthday-collide at corpus scale). Planted
# continuation docs (doc_id % 13, +100000) give the detector known
# positives, identically derived in both engines.
# ---------------------------------------------------------------------------
_Q135_K = 8


def _q135_oracle() -> str:
    toks = tokens_sql("text")
    tail = f"array_to_string(list_slice({toks}, len({toks}) - {_Q135_K - 1}, len({toks})), ' ')"
    head = f"array_to_string(list_slice({toks}, 1, {_Q135_K}), ' ')"
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             {tail} || ' continuation segment follows here now' AS text
      FROM documents
      WHERE doc_id % 13 = 0 AND len({toks}) >= {_Q135_K}),
    keyed AS (
      SELECT doc_id,
             CASE WHEN len({toks}) >= {_Q135_K} THEN {head} END AS head_s,
             CASE WHEN len({toks}) >= {_Q135_K} THEN {tail} END AS tail_s
      FROM corpus),
    hashed AS (
      SELECT doc_id, head_s, tail_s,
             {polyhash_sql("head_s")} AS head_h,
             {polyhash_sql("tail_s")} AS tail_h
      FROM keyed)
    SELECT a.doc_id AS src_doc, b.doc_id AS cont_doc,
           CAST(a.tail_h AS BIGINT) AS overlap_hash
    FROM hashed a JOIN hashed b
      ON a.tail_h = b.head_h AND a.doc_id <> b.doc_id
    WHERE a.tail_s = b.head_s
"""


@register("q135_doc_stitching", oracle=_q135_oracle())
def q135_doc_stitching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.functions.hashing import polyhash
    from anime_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    k = _Q135_K
    tail_s = F.concat_ws(" ", F.slice(toks, -k, k))
    cont = (
        docs.filter((F.col("doc_id") % 13 == 0) & (F.size(toks) >= k))
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(
                tail_s, F.lit(" continuation segment follows here now")
            ).alias("text"),
        )
    )
    corpus = docs.unionByName(cont)
    ctoks = tokens(F.col("text"))
    keyed = corpus.select(
        "doc_id",
        F.when(F.size(ctoks) >= k, F.concat_ws(" ", F.slice(ctoks, 1, k))).alias(
            "head_s"
        ),
        F.when(F.size(ctoks) >= k, F.concat_ws(" ", F.slice(ctoks, -k, k))).alias(
            "tail_s"
        ),
    )
    hashed = keyed.select(
        "doc_id",
        "head_s",
        "tail_s",
        polyhash(F.col("head_s")).alias("head_h"),
        polyhash(F.col("tail_s")).alias("tail_h"),
    )
    a = hashed.select(
        F.col("doc_id").alias("src_doc"),
        F.col("tail_s").alias("a_tail_s"),
        F.col("tail_h").alias("overlap_hash"),
    )
    b = hashed.select(
        F.col("doc_id").alias("cont_doc"),
        F.col("head_s").alias("b_head_s"),
        F.col("head_h").alias("b_head_h"),
    )
    return (
        a.join(b, (a["overlap_hash"] == b["b_head_h"]) & (a["src_doc"] != b["cont_doc"]))
        .filter(F.col("a_tail_s") == F.col("b_head_s"))
        .select("src_doc", "cont_doc", F.col("overlap_hash").cast("long").alias("overlap_hash"))
    )


# ---------------------------------------------------------------------------
# q137 — blocklist phrase filtering: match a phrase dictionary (1- and
# 2-token phrases) against every document and emit hit counts, the
# matched phrases, and the block verdict — the safety/spam filter
# stage of a pretraining pipeline. The dictionary is a broadcast
# constant (fixed size at ANY corpus scale); matching explodes each
# doc's 1/2-gram shingles ONCE and equi-joins them against the
# dictionary — never a per-phrase scan, so cost is O(tokens), not
# O(tokens × phrases). Planted spam phrases (doc_id % 6 / % 10) give
# both verdicts real members.
# ---------------------------------------------------------------------------
_Q137_PHRASES = ["buy now", "click here", "limited offer", "winner"]


def _q137_oracle() -> str:
    toks = tokens_sql("text")
    phrases = ", ".join(f"('{p}')" for p in _Q137_PHRASES)
    return f"""
    WITH docs AS (
      SELECT doc_id, source,
             text || CASE WHEN doc_id % 6 = 0 THEN ' buy now limited offer' ELSE '' END
                  || CASE WHEN doc_id % 10 = 0 THEN ' click here winner' ELSE '' END AS text
      FROM documents),
    bl AS (SELECT * FROM (VALUES {phrases}) AS t(phrase)),
    grams AS (
      SELECT doc_id, source, unnest(
        list_concat({toks},
          list_transform(range(1, len({toks})),
            i -> ({toks})[i] || ' ' || ({toks})[i + 1]))) AS g
      FROM docs),
    hits AS (
      SELECT grams.doc_id, grams.source, bl.phrase
      FROM grams JOIN bl ON grams.g = bl.phrase),
    perdoc AS (
      SELECT doc_id, source,
             CAST(count(*) AS BIGINT) AS n_hits,
             string_agg(DISTINCT phrase, ',' ORDER BY phrase) AS matched
      FROM hits GROUP BY doc_id, source)
    SELECT d.doc_id, d.source,
           CAST(coalesce(p.n_hits, 0) AS BIGINT) AS n_hits,
           coalesce(p.matched, '') AS matched,
           (p.doc_id IS NOT NULL) AS blocked
    FROM docs d LEFT JOIN perdoc p USING (doc_id, source)
"""


@register("q137_blocklist_filter", oracle=_q137_oracle())
def q137_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 6 == 0, F.lit(" buy now limited offer")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 10 == 0, F.lit(" click here winner")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    bl = docs.sparkSession.createDataFrame(
        [(p,) for p in _Q137_PHRASES], "phrase string"
    )
    toks = tokens(F.col("text"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.concat(toks, F.when(F.size(toks) >= 2, bigrams).otherwise(F.array()))
        ).alias("g"),
    )
    hits = grams.join(F.broadcast(bl), grams["g"] == bl["phrase"])
    perdoc = (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.concat_ws(",", F.array_sort(F.collect_set("phrase"))).alias("matched"),
        )
        .select(
            F.col("doc_id").alias("h_doc"), "n_hits", "matched"
        )
    )
    return (
        docs.join(perdoc, docs["doc_id"] == perdoc["h_doc"], "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            F.coalesce(F.col("matched"), F.lit("")).alias("matched"),
            F.col("h_doc").isNotNull().alias("blocked"),
        )
    )


# ---------------------------------------------------------------------------
# q138 — multi-teacher majority-vote label resolution: three simulated
# teacher models label every document (the true lang, with seeded-hash
# noise flipping ~30% of each teacher's predictions to a hash-chosen
# lang) and the resolver takes the per-doc majority, ties broken by
# lexicographic label. The weak-supervision/distillation step: vote
# counting is one (doc, label) partial agg and the winner is a window
# partitioned BY DOC — parallelism = corpus, nothing global. Teacher
# noise is pure int64 hash math (no RNG state), identical in both
# engines at any parallelism.
# ---------------------------------------------------------------------------
_Q138_LANGS = ["de", "en", "es", "fr", "zh"]
_Q138_CONSTS = perm_constants(903)[900:903]


def _q138_oracle() -> str:
    langs = "[" + ", ".join(f"'{x}'" for x in _Q138_LANGS) + "]"
    teachers = "\n      UNION ALL\n".join(
        f"""      SELECT doc_id, source, {t} AS teacher,
             CASE WHEN (({a} * doc_id + {b}) % {P}) % 10 < 3
                  THEN ({langs})[CAST((({a} * doc_id + {b}) % {P}) % 5 AS INTEGER) + 1]
                  ELSE lang END AS pred
      FROM documents"""
        for t, (a, b) in enumerate(_Q138_CONSTS)
    )
    return f"""
    WITH preds AS (
{teachers}
    ),
    votes AS (SELECT doc_id, source, pred,
                     CAST(count(*) AS BIGINT) AS n_votes
              FROM preds GROUP BY doc_id, source, pred),
    win AS (SELECT *, row_number() OVER (
              PARTITION BY doc_id ORDER BY n_votes DESC, pred) AS rn
            FROM votes)
    SELECT doc_id, source, pred AS majority_label, n_votes,
           (n_votes = 3) AS unanimous
    FROM win WHERE rn = 1
"""


@register("q138_teacher_majority_vote", oracle=_q138_oracle())
def q138_teacher_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    langs_lit = F.array(*[F.lit(x) for x in _Q138_LANGS])

    def pred(a: int, b: int):
        h = (F.lit(a) * F.col("doc_id").cast("long") + F.lit(b)) % F.lit(P)
        return F.when(
            h % 10 < 3,
            F.element_at(langs_lit, (h % 5).cast("int") + 1),
        ).otherwise(F.col("lang"))

    preds = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array(*[pred(a, b) for a, b in _Q138_CONSTS])
        ).alias("pred"),
    )
    votes = preds.groupBy("doc_id", "source", "pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_votes")
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("n_votes"), F.asc("pred"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "source",
            F.col("pred").alias("majority_label"),
            "n_votes",
            (F.col("n_votes") == 3).alias("unanimous"),
        )
    )


# ---------------------------------------------------------------------------
# q149 — RAKE keyword extraction (Rose et al. 2010): candidate phrases
# are maximal stopword-free token runs (capped at 4 tokens), each word
# scores degree/frequency over the phrase corpus, and a phrase scores
# the sum of its word scores — the classic unsupervised keyword
# extractor. Per-doc segmentation is a running stopword-count window
# PARTITIONED BY DOC; word stats are one vocabulary-keyed agg; the
# final top-k is orderBy+limit with rank over the survivors. English
# docs only (the stopword list is the en profile).
# ---------------------------------------------------------------------------
_Q149_TOPK = 20
_Q149_MAXLEN = 4


def _q149_oracle() -> str:
    from anime_data_pipeline_spark.operators.textstats import STOPWORDS

    toks = tokens_sql("text")
    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
    WITH tok AS (
      SELECT doc_id, (u).pos AS pos, (u).w AS w FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(tk) + 1),
                 i -> struct_pack(pos := i, w := tk[i]))) AS u
        FROM (SELECT doc_id, {toks} AS tk FROM documents WHERE lang = 'en'))),
    seg AS (
      SELECT doc_id, pos, w, w IN ({stops}) AS is_stop,
             sum(CASE WHEN w IN ({stops}) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM tok),
    member AS (
      SELECT doc_id, grp, pos, w,
             count(*) OVER (PARTITION BY doc_id, grp) AS plen
      FROM seg WHERE NOT is_stop),
    capped AS (SELECT * FROM member WHERE plen <= {_Q149_MAXLEN}),
    wstats AS (
      SELECT w, count(*) AS freq, sum(plen) AS degree FROM capped GROUP BY w),
    phrases AS (
      SELECT c.doc_id, c.grp,
             string_agg(c.w, ' ' ORDER BY c.pos) AS phrase,
             {dround_sql("sum(ws.degree / CAST(ws.freq AS DOUBLE))", 6)} AS pscore
      FROM capped c JOIN wstats ws ON ws.w = c.w
      GROUP BY c.doc_id, c.grp),
    agg AS (
      SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
             max(pscore) AS score
      FROM phrases GROUP BY phrase),
    top AS (SELECT * FROM agg ORDER BY score DESC, phrase LIMIT {_Q149_TOPK})
    SELECT phrase, n_occurrences, score,
           CAST(row_number() OVER (ORDER BY score DESC, phrase) AS BIGINT) AS rank
    FROM top
"""


@register("q149_rake_keywords", oracle=_q149_oracle())
def q149_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from anime_data_pipeline_spark.functions.text import tokens
    from anime_data_pipeline_spark.operators.textstats import STOPWORDS

    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    tok = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    is_stop = F.col("w").isin(*STOPWORDS)
    seg = tok.withColumn(
        "grp",
        F.sum(is_stop.cast("int")).over(
            W.partitionBy("doc_id").orderBy("pos")
        ),
    ).filter(~is_stop)
    member = seg.withColumn(
        "plen", F.count(F.lit(1)).over(W.partitionBy("doc_id", "grp"))
    ).filter(F.col("plen") <= _Q149_MAXLEN)
    wstats = member.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree")
    )
    scored = member.join(wstats, "w").withColumn(
        "wscore", F.col("degree") / F.col("freq").cast("double")
    )
    phrases = scored.groupBy("doc_id", "grp").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("w")))
                ),
                lambda x: x["w"],
            ),
        ).alias("phrase"),
        dround(F.sum("wscore"), 6).alias("pscore"),
    )
    agg = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.max("pscore").alias("score"),
    )
    top = agg.orderBy(F.desc("score"), "phrase").limit(_Q149_TOPK)
    w_ = W.orderBy(F.desc("score"), "phrase")
    return top.withColumn("rank", F.row_number().over(w_).cast("long"))


# ---------------------------------------------------------------------------
# q158 — readability scoring (Flesch reading ease + Flesch–Kincaid
# grade): the reading-level prior for educational-quality mixing.
# Runs over the mutated corpus so sentence punctuation actually
# varies. Stateless map-only column math; the oracle recomputes every
# clamp and vowel-group count with the identical regex classes.
# ---------------------------------------------------------------------------
def _q158_oracle() -> str:
    from anime_data_pipeline_spark.operators.textstats import readability_sql_projection

    proj = readability_sql_projection("text")
    return f"""
    WITH docs AS ({_DOCS_CTE})
    SELECT doc_id,
           {proj["n_words"]} AS n_words,
           {proj["n_sentences"]} AS n_sentences,
           CAST({proj["n_syllables"]} AS BIGINT) AS n_syllables,
           {dround_sql(proj["flesch"], 6)} AS flesch,
           {dround_sql(proj["fk_grade"], 6)} AS fk_grade
    FROM docs
    """


@register("q158_readability", oracle=_q158_oracle())
def q158_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.textstats import readability_columns

    out = readability_columns(_mutated(spark, sf_dir), "text")
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        dround(F.col("flesch"), 6).alias("flesch"),
        dround(F.col("fk_grade"), 6).alias("fk_grade"),
    )


# ---------------------------------------------------------------------------
# q159 — Zipf rank-frequency slope per source: fit ln(freq) against
# ln(rank) over each source's top-100 tokens by closed-form OLS.
# Natural corpora sit near slope −1; a source whose slope is far off
# is template spam or tag soup — a corpus-health probe next to q156's
# JS divergence. One (source, token) wordcount shuffle (map-side
# combined), a per-source rank window, then 100-row-per-source sums.
# ---------------------------------------------------------------------------
_Q159_TOPK = 100

_Q159_ORACLE = f"""
    WITH tok AS (SELECT source, unnest({tokens_sql("text")}) AS t FROM documents),
    wc AS (SELECT source, t, count(*) AS freq FROM tok GROUP BY source, t),
    ranked AS (SELECT source, freq,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY freq DESC, t) AS rnk
               FROM wc),
    top AS (SELECT source, ln(CAST(rnk AS DOUBLE)) AS x,
                   ln(CAST(freq AS DOUBLE)) AS y
            FROM ranked WHERE rnk <= {_Q159_TOPK}),
    s AS (SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM top GROUP BY source)
    SELECT source, CAST(n AS BIGINT) AS n_top,
           {dround_sql("(n * sxy - sx * sy) / (n * sxx - sx * sx)", 6)} AS zipf_slope,
           {dround_sql("(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n", 6)} AS zipf_intercept
    FROM s
"""


@register("q159_zipf_slope", oracle=_Q159_ORACLE)
def q159_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from anime_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = W.partitionBy("source").orderBy(F.desc("freq"), F.asc("t"))
    top = (
        wc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _Q159_TOPK)
        .select(
            "source",
            F.log(F.col("rnk").cast("double")).alias("x"),
            F.log(F.col("freq").cast("double")).alias("y"),
        )
    )
    s = top.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "source",
        F.col("n").cast("long").alias("n_top"),
        dround(slope, 6).alias("zipf_slope"),
        dround((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "zipf_intercept"
        ),
    )


# ---------------------------------------------------------------------------
# q160 — positional index probe: find every (doc, position) occurrence
# of the corpus's most frequent bigram — the phrase-search primitive
# (positional postings) BM25 (q107) doesn't exercise. Engine: one
# bigram wordcount (map-side combined), top-1 via
# orderBy+limit(1) = TakeOrderedAndProject, then a broadcast
# semi-join back onto the positional postings — the corpus-sized side
# never shuffles. Positions are 0-based bigram starts.
# ---------------------------------------------------------------------------
_Q160_ORACLE = f"""
    WITH tok AS (SELECT doc_id, {tokens_sql("text")} AS toks FROM documents),
    bgl AS (SELECT doc_id,
                   list_transform(range(2, len(toks) + 1),
                                  i -> toks[i - 1] || ' ' || toks[i]) AS bgs
            FROM tok),
    ex AS (SELECT doc_id, unnest(bgs) AS bg,
                  generate_subscripts(bgs, 1) - 1 AS pos
           FROM bgl),
    top AS (SELECT bg, count(*) AS n_total FROM ex GROUP BY bg
            ORDER BY n_total DESC, bg LIMIT 1)
    SELECT e.doc_id, CAST(e.pos AS BIGINT) AS pos, e.bg AS bigram,
           CAST(t.n_total AS BIGINT) AS n_total
    FROM ex e JOIN top t USING (bg)
"""


@register("q160_top_bigram_positions", oracle=_Q160_ORACLE)
def q160_top_bigram_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("_toks")
    )
    bgs = F.when(
        F.size(F.col("_toks")) >= 2,
        F.expr(
            "transform(sequence(2, size(_toks)),"
            " i -> concat_ws(' ', _toks[i - 2], _toks[i - 1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = docs.select("doc_id", F.posexplode(bgs).alias("pos", "bg"))
    top = (
        ex.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n_total"))
        .orderBy(F.desc("n_total"), F.asc("bg"))
        .limit(1)
    )
    return ex.join(F.broadcast(top), "bg").select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("bg").alias("bigram"),
        F.col("n_total").cast("long").alias("n_total"),
    )


# ---------------------------------------------------------------------------
# q165 — quality-score calibration bins (reliability diagram): bucket
# the composite quality score into fixed-width deciles and report per
# bin the doc count, mean score, and the observed in-domain rate
# (lang = 'en' as the target proxy) — the calibration audit a learned
# quality classifier gets before its threshold is trusted. Fixed-width
# bins (least(floor(score·10), 9)), NOT ntile — ntile tie-splitting is
# engine-dependent; fixed edges are bit-deterministic. One agg over
# ≤10 groups after map-only scoring.
# ---------------------------------------------------------------------------
def _q165_oracle() -> str:
    score = quality_sql_projection("text")["quality_score"]
    return f"""
    WITH docs AS ({_DOCS_CTE}),
    scored AS (SELECT doc_id, lang, ({score}) AS q FROM docs),
    binned AS (SELECT least(CAST(floor(q * 10) AS BIGINT), 9) AS bin,
                      q, (lang = 'en') AS pos
               FROM scored)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
           {dround_sql("avg(q)", 6)} AS mean_score,
           {dround_sql("CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS pos_rate
    FROM binned GROUP BY bin
    """


@register("q165_calibration_bins", oracle=_q165_oracle())
def q165_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = quality_columns(_mutated(spark, sf_dir), "text").select(
        "doc_id", "lang", F.col("quality_score").alias("q")
    )
    binned = scored.select(
        F.least(F.floor(F.col("q") * 10).cast("long"), F.lit(9).cast("long")).alias(
            "bin"
        ),
        "q",
        (F.col("lang") == "en").alias("pos"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        dround(F.avg("q"), 6).alias("mean_score"),
        dround(
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("pos_rate"),
    )


# ---------------------------------------------------------------------------
# q180 — HTML → text extraction (round 6: the web-crawl ingest step —
# CCNet/RefinedWeb boilerplate stripping as pure column expressions,
# operators/html_extract.py). The corpus wraps each document's text
# fragment in a deterministic page (head block with title/style/meta,
# nav with two anchors incl. entities, h1, a script whose body
# contains raw `<`, `>` and `&&`, an HTML comment containing FAKE
# block tags, the fragment paragraph, an entity-dense footer); every
# 31st row is tagless plain text (the no-markup path), and rows with
# doc_id % 7 == 0 carry a 6-char fragment so the link-density filter
# actually discriminates. The oracle predicts the extracted text
# CLOSED-FORM from the page construction — it never runs the
# extraction regexes, so a bug anywhere in the strip chain (comment
# ordering, head removal, script tolerance of embedded `<`,
# block-newline mapping, entity decode order, whitespace collapse)
# breaks the string hash.
# ---------------------------------------------------------------------------
_Q180_FOOTER = "s''more <tags> & entities here"

_Q180_ORACLE = f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN trim(substr(text, 1, 6))
                  ELSE trim(substr(text, 1, 100)) END AS frag
      FROM documents
    ),
    built AS (
      SELECT doc_id,
             CASE WHEN doc_id % 31 = 0 THEN frag
                  ELSE 'Home About & Co' || chr(10) ||
                       'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
                       frag || chr(10) || '{_Q180_FOOTER}'
             END AS clean_text,
             CASE WHEN doc_id % 31 = 0 THEN 0 ELSE 2 END AS n_links,
             CASE WHEN doc_id % 31 = 0 THEN 0.0 ELSE 14.0 END AS anchor_chars
      FROM base
    )
    SELECT doc_id, clean_text,
           CAST(n_links AS INTEGER) AS n_links,
           CAST(length(clean_text) AS BIGINT) AS clean_len,
           {dround_sql("anchor_chars / length(clean_text)", 4)} AS link_density,
           {dround_sql("anchor_chars / length(clean_text)", 4)} < 0.2 AS kept
    FROM built
"""


@register("q180_html_extract", oracle=_Q180_ORACLE)
def q180_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.html_extract import (
        link_density,
        n_links,
        strip_html_text,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    frag = F.when(
        i % 7 == 0, F.trim(F.substring(F.col("text"), 1, 6))
    ).otherwise(F.trim(F.substring(F.col("text"), 1, 100)))
    page = F.concat(
        F.lit('<html><head><title>Doc '),
        i,
        F.lit('</title><style>p { color: red; }</style>'
              '<meta charset="utf-8"></head><body>'),
        F.lit('<nav><a href="/home">Home</a> '
              '<a href="/about">About &amp; Co</a></nav>'),
        F.lit("<h1>Doc "),
        i,
        F.lit("</h1>"),
        F.lit('<script type="text/javascript">var k = '),
        i,
        F.lit('; if (k < 10 && k > 1) { track("&amp;"); }</script>'),
        F.lit("<!-- comment with a <p>fake tag</p> inside -->"),
        F.lit("<p>"),
        frag,
        F.lit("</p>"),
        F.lit('<div class="footer">s&#39;more &lt;tags&gt; '
              "&amp; entities&nbsp;here</div>"),
        F.lit("</body></html>"),
    )
    raw = docs.select(
        "doc_id", F.when(i % 31 == 0, frag).otherwise(page).alias("raw_html")
    )
    clean = strip_html_text(F.col("raw_html"))
    out = raw.select(
        "doc_id",
        clean.alias("clean_text"),
        n_links(F.col("raw_html")).alias("n_links"),
        F.length(clean).cast("long").alias("clean_len"),
        dround(link_density(F.col("raw_html"), clean), 4).alias("link_density"),
        (dround(link_density(F.col("raw_html"), clean), 4) < 0.2).alias("kept"),
    )
    return out


# ---------------------------------------------------------------------------
# q194 — Gopher repetition signals (Rae et al. 2021 Table A2): the
# repetition-removal half of the Gopher filter (dup line/paragraph
# fractions, top-{2,3,4}-gram and dup-{5,10}-gram character coverage,
# conjunction keep flag) — the one Table the q82 rule bundle doesn't
# cover, and the filter Dolma/FineWeb/RedPajama-v2 all deploy.
# Deterministic EXCLUSIVE mutation branches give every signal both
# passing and failing docs: a fully-repetitive short doc (top-n-gram
# fails), duplicated lines, duplicated paragraphs, a doubled 10-gram.
# ---------------------------------------------------------------------------
_Q194_TEN = (
    "one two three four five six seven eight nine ten"
)

_Q194_MUT_SQL = f"""CASE CAST(doc_id % 6 AS INTEGER)
  WHEN 0 THEN 'spam ham eggs spam ham eggs spam ham eggs end'
  WHEN 1 THEN text || chr(10) || 'repeat line alpha' || chr(10)
           || 'repeat line alpha' || chr(10) || 'tail line'
  WHEN 2 THEN text || chr(10) || chr(10) || 'dup paragraph block'
           || chr(10) || chr(10) || 'dup paragraph block'
  WHEN 3 THEN text || ' {_Q194_TEN} {_Q194_TEN}'
  ELSE text END"""


def _q194_mutated(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    m = (
        F.when(
            F.col("doc_id") % 6 == 0,
            F.lit("spam ham eggs spam ham eggs spam ham eggs end"),
        )
        .when(
            F.col("doc_id") % 6 == 1,
            F.concat(
                t, F.lit("\nrepeat line alpha\nrepeat line alpha\ntail line")
            ),
        )
        .when(
            F.col("doc_id") % 6 == 2,
            F.concat(
                t, F.lit("\n\ndup paragraph block\n\ndup paragraph block")
            ),
        )
        .when(
            F.col("doc_id") % 6 == 3,
            F.concat(t, F.lit(f" {_Q194_TEN} {_Q194_TEN}")),
        )
        .otherwise(t)
    )
    return docs.select("doc_id", m.alias("text"))


def _q194_oracle() -> str:
    from anime_data_pipeline_spark.operators.textstats import repetition_sql

    return repetition_sql(
        f"SELECT doc_id, ({_Q194_MUT_SQL}) AS text FROM documents"
    )


_Q194_FRACS = (
    "dup_line_frac",
    "dup_line_char_frac",
    "dup_para_frac",
    "dup_para_char_frac",
    "top_2gram_char_frac",
    "top_3gram_char_frac",
    "top_4gram_char_frac",
    "dup_5gram_char_frac",
    "dup_10gram_char_frac",
)


@register("q194_repetition_signals", oracle=_q194_oracle())
def q194_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.textstats import repetition_signals

    out = repetition_signals(_q194_mutated(spark, sf_dir), "doc_id", "text")
    for c in _Q194_FRACS:
        out = out.withColumn(c, dround(F.col(c), 6))
    return out
