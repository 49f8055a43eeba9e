"""Data-selection gate queries: DSIR importance weighting and the
per-group rank-based quality filter.

Both generalize the reference's single scalar quality gate
(run.py:87-88, legacy/merge_final_train_metadata.py:14 — one global
aesthetic threshold) into the selection machinery a text pretraining
corpus needs: distribution-matching importance weights (DSIR) and
per-language adaptive cutoffs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.functions.compat import dround, dround_sql
from anime_data_pipeline_spark.functions.hashing import polyhash_sql
from anime_data_pipeline_spark.functions.text import tokens_sql
from anime_data_pipeline_spark.operators.selection import (
    dsir_logweights,
    quantile_filter_by_rank,
)
from anime_data_pipeline_spark.operators.textstats import (
    quality_columns,
    quality_sql_projection,
)
from anime_data_pipeline_spark.queries.text_q import _DOCS_CTE, _mutated
from anime_data_pipeline_spark.registry import register

_B = 1024  # DSIR hash-bucket count (fixed — independent of corpus size)


def _bucket_counts_ctes(carry: str = "") -> str:
    """Shared featurizer CTE chain (docs → tok → tha → feats → ex →
    counts) — the SQL mirror of operators/selection.doc_bucket_counts,
    used by BOTH the q95 and q193 oracles so the two gates cannot
    silently desynchronize their definition of the featurizer.
    ``carry`` is a comma-led column list riding through (q95: lang)."""
    from anime_data_pipeline_spark.functions.hashing import shingle_hashes_sql

    return f"""
    docs AS (SELECT doc_id{carry}, text FROM documents),
    tok AS (SELECT doc_id{carry}, {tokens_sql("text")} AS toks FROM docs),
    tha AS (SELECT doc_id{carry},
                   list_transform(toks, t -> {polyhash_sql("t")}) AS th
            FROM tok),
    feats AS (SELECT doc_id{carry},
                     list_transform(list_concat(th, {shingle_hashes_sql("th", 2)}),
                                    h -> h % {_B}) AS fb
              FROM tha),
    ex AS (SELECT doc_id{carry}, unnest(fb) AS bucket FROM feats),
    counts AS (SELECT doc_id{carry}, bucket, count(*) AS cnt
               FROM ex GROUP BY doc_id{carry}, bucket)"""


# ---------------------------------------------------------------------------
# q95 — DSIR importance log-weights (hashed unigram+bigram features,
# target = English subset, raw = whole corpus). The oracle reproduces
# the full featurize → distribution → log-ratio → per-doc sum chain.
# ---------------------------------------------------------------------------
def _q95_oracle() -> str:
    return f"""
    WITH {_bucket_counts_ctes(", lang")},
    rawtot AS (SELECT sum(cnt) AS tot FROM counts),
    rawd AS (SELECT bucket,
                    ln((sum(cnt) + 1.0) / ((SELECT tot FROM rawtot) + {_B}))
                      AS logq
             FROM counts GROUP BY bucket),
    tcounts AS (SELECT * FROM counts WHERE lang = 'en'),
    ttot AS (SELECT sum(cnt) AS tot FROM tcounts),
    tgtd AS (SELECT bucket,
                    ln((sum(cnt) + 1.0) / ((SELECT tot FROM ttot) + {_B}))
                      AS logp
             FROM tcounts GROUP BY bucket),
    ratio AS (SELECT r.bucket,
                     coalesce(t.logp,
                              ln(1.0 / ((SELECT tot FROM ttot) + {_B}))) - r.logq
                       AS logratio
              FROM rawd r LEFT JOIN tgtd t USING (bucket)),
    w AS (SELECT doc_id, sum(cnt * logratio) AS lw
          FROM counts JOIN ratio USING (bucket) GROUP BY doc_id)
    SELECT doc_id, {dround_sql("lw", 6)} AS dsir_logw FROM w
    """


@register("q95_dsir_logweights", oracle=_q95_oracle())
def q95_dsir_logweights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = dsir_logweights(
        docs, "doc_id", "text", target_pred=F.col("lang") == "en", buckets=_B
    )
    return out.select(
        F.col("doc").alias("doc_id"), dround(F.col("dsir_logw"), 6).alias("dsir_logw")
    )


# ---------------------------------------------------------------------------
# q99 — per-language adaptive quality filter: drop the bottom 25% of
# each language by (quality_score, doc_id) rank. Discrete rank cutoff —
# no percentile interpolation, so membership is engine-exact. Runs over
# the mutated corpus from text_q so scores take distinct values.
# ---------------------------------------------------------------------------
def _q99_oracle() -> str:
    score = quality_sql_projection("text")["quality_score"]
    return f"""
    WITH docs AS ({_DOCS_CTE}),
    scored AS (SELECT doc_id, lang, ({score}) AS quality_score FROM docs),
    ranked AS (SELECT *,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY quality_score, doc_id) AS rn,
                      count(*) OVER (PARTITION BY lang) AS n
               FROM scored)
    SELECT doc_id, lang, {dround_sql("quality_score", 6)} AS quality_score
    FROM ranked WHERE rn > floor(0.25 * n)
    """


# ---------------------------------------------------------------------------
# q103 — CCNet-style perplexity band (Wenzek et al. 2020): score every
# doc with the corpus's own unigram LM (q79's operator), then keep the
# middle (0.25, 0.75] rank band per source — head ≈ boilerplate, tail ≈
# noise. Ranks use the 6-digit-rounded score (a discrete key, so the
# band membership is engine-exact despite cross-engine summation-order
# jitter in the mean NLL).
# ---------------------------------------------------------------------------
_Q103_ORACLE = f"""
    WITH tok AS (SELECT doc_id AS doc, unnest({tokens_sql("text")}) AS term FROM documents),
    vocab AS (SELECT term, count(*) AS n_term FROM tok GROUP BY term),
    tot AS (SELECT CAST(sum(n_term) AS DOUBLE) AS n_total FROM vocab),
    scored AS (SELECT doc, -ln(n_term / n_total) AS nll
               FROM tok JOIN vocab USING (term) CROSS JOIN tot),
    per_doc AS (SELECT doc, {dround_sql("avg(nll)", 6)} AS mean_nll
                FROM scored GROUP BY doc),
    with_src AS (SELECT p.doc, d.source, p.mean_nll
                 FROM per_doc p JOIN documents d ON d.doc_id = p.doc),
    ranked AS (SELECT *,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY mean_nll, doc) AS rn,
                      count(*) OVER (PARTITION BY source) AS n
               FROM with_src)
    SELECT doc, source, mean_nll
    FROM ranked
    WHERE rn > floor(0.25 * n) AND rn <= floor(0.75 * n)
"""


@register("q103_perplexity_band", oracle=_Q103_ORACLE)
def q103_perplexity_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.selection import rank_band_filter
    from anime_data_pipeline_spark.operators.terms import unigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    scored = unigram_logprob(docs, "doc_id", "text").select(
        "doc", dround(F.col("mean_nll"), 6).alias("mean_nll")
    )
    # id→source is corpus-sized: a plain doc-keyed shuffle join (AQE
    # picks the strategy), NOT a broadcast — at scale the source column
    # would simply ride through the per-doc aggregation instead.
    with_src = scored.join(
        docs.select(F.col("doc_id").alias("doc"), "source"), "doc"
    )
    return rank_band_filter(with_src, "source", "mean_nll", "doc", lo=0.25, hi=0.75)


@register("q99_adaptive_quality_filter", oracle=_q99_oracle())
def q99_adaptive_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = quality_columns(_mutated(spark, sf_dir), "text").select(
        "doc_id", "lang", "quality_score"
    )
    kept = quantile_filter_by_rank(
        scored, "lang", "quality_score", "doc_id", drop_frac=0.25
    )
    return kept.select(
        "doc_id", "lang", dround(F.col("quality_score"), 6).alias("quality_score")
    )


# ---------------------------------------------------------------------------
# q114 — DSIR resampling: Gumbel top-k over the q95 importance
# log-weights — the step that actually CHANGES the corpus (sample
# ∝ softmax(logw)), with seeded-hash uniforms so the draw is
# reproducible in any engine and at any parallelism.
# ---------------------------------------------------------------------------
_Q114_N = 100
_Q114_A, _Q114_B2 = 48_271, 11


def _q114_oracle() -> str:
    from anime_data_pipeline_spark.functions.hashing import P as PP

    # q95's oracle ends in `SELECT doc_id, dround AS dsir_logw FROM w`;
    # reuse its CTE chain by embedding it as a subquery.
    inner = _q95_oracle()
    u = (
        f"((({_Q114_A} * (doc_id % {PP}) + {_Q114_B2}) % {PP}) + 1)"
        f" / {float(PP + 1)!r}"
    )
    return f"""
    WITH lw AS ({inner}),
    keyed AS (SELECT doc_id, dsir_logw,
                     {dround_sql(f"dsir_logw + (-ln(-ln({u})))", 6)} AS gumbel_key
              FROM lw),
    ranked AS (SELECT *, row_number() OVER (
                 ORDER BY gumbel_key DESC, doc_id) AS rank FROM keyed)
    SELECT doc_id, dsir_logw, gumbel_key, rank
    FROM ranked WHERE rank <= {_Q114_N}
    """


@register("q114_gumbel_resample", oracle=_q114_oracle())
def q114_gumbel_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.selection import gumbel_topk

    docs = load_table(spark, sf_dir, "documents")
    lw = dsir_logweights(
        docs, "doc_id", "text", target_pred=F.col("lang") == "en", buckets=_B
    ).select(
        F.col("doc").alias("doc_id"), dround(F.col("dsir_logw"), 6).alias("dsir_logw")
    )
    out = gumbel_topk(lw, "doc_id", "dsir_logw", n=_Q114_N, a=_Q114_A, b=_Q114_B2)
    return out.select(
        "doc_id", "dsir_logw", "gumbel_key", F.col("rank").cast("long").alias("rank")
    )


# ---------------------------------------------------------------------------
# q150 — DoReMi-style domain reweighting (Xie et al. 2023, one
# excess-loss round): each source's mix weight is its document share
# multiplied by exp(η · excess proxy loss), where the proxy loss is
# the corpus's own unigram LM (q79/q103's operator) and excess is the
# source loss above the corpus baseline — sources the LM finds
# surprising get UPweighted, the size prior keeps giants from
# vanishing. All post-NLL math runs on the |sources|-row table;
# baseline and the normalizer are 1-row broadcasts. exp() is applied
# to the 6-digit-rounded excess in BOTH engines, and the weight is
# re-rounded, so a 1-ulp libm divergence cannot surface.
# ---------------------------------------------------------------------------
_Q150_ETA = 2.0

_Q150_ORACLE = f"""
    WITH tok AS (SELECT doc_id AS doc, unnest({tokens_sql("text")}) AS term FROM documents),
    vocab AS (SELECT term, count(*) AS n_term FROM tok GROUP BY term),
    tot AS (SELECT CAST(sum(n_term) AS DOUBLE) AS n_total FROM vocab),
    scored AS (SELECT doc, -ln(n_term / n_total) AS nll
               FROM tok JOIN vocab USING (term) CROSS JOIN tot),
    per_doc AS (SELECT doc, {dround_sql("avg(nll)", 6)} AS mean_nll
                FROM scored GROUP BY doc),
    with_src AS (SELECT p.doc, d.source, p.mean_nll
                 FROM per_doc p JOIN documents d ON d.doc_id = p.doc),
    base AS (SELECT {dround_sql("avg(mean_nll)", 6)} AS baseline,
                    CAST(count(*) AS BIGINT) AS n_total_docs
             FROM with_src),
    per_src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                       {dround_sql("avg(mean_nll)", 6)} AS loss
                FROM with_src GROUP BY source),
    ex AS (SELECT s.source, s.n_docs, s.loss,
                  {dround_sql("greatest(0.0, s.loss - b.baseline)", 6)} AS excess,
                  (s.n_docs / CAST(b.n_total_docs AS DOUBLE))
                    * exp({_Q150_ETA} * {dround_sql("greatest(0.0, s.loss - b.baseline)", 6)}) AS raw_w
           FROM per_src s CROSS JOIN base b),
    z AS (SELECT sum(raw_w) AS zsum FROM ex)
    SELECT ex.source, ex.n_docs, ex.loss, ex.excess,
           {dround_sql("ex.raw_w / z.zsum", 6)} AS weight
    FROM ex CROSS JOIN z
"""


@register("q150_doremi_reweight", oracle=_Q150_ORACLE)
def q150_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.terms import unigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    scored = unigram_logprob(docs, "doc_id", "text").select(
        "doc", dround(F.col("mean_nll"), 6).alias("mean_nll")
    )
    # Persisted stage boundary: the NLL chain feeds BOTH the baseline
    # agg and the per-source agg (and `ex` below feeds the normalizer
    # and the final projection) — without the persists the full
    # tokenize→vocab→join chain re-derives 4× (measured 68 exchanges
    # in the physical plan vs 20 with them).
    with_src = scored.join(
        docs.select(F.col("doc_id").alias("doc"), "source"), "doc"
    ).persist()
    base = with_src.agg(
        dround(F.avg("mean_nll"), 6).alias("baseline"),
        F.count(F.lit(1)).cast("long").alias("n_total_docs"),
    )
    per_src = with_src.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        dround(F.avg("mean_nll"), 6).alias("loss"),
    )
    excess = dround(
        F.greatest(F.lit(0.0), F.col("loss") - F.col("baseline")), 6
    )
    ex = per_src.crossJoin(F.broadcast(base)).select(
        "source",
        "n_docs",
        "loss",
        excess.alias("excess"),
        (
            (F.col("n_docs") / F.col("n_total_docs").cast("double"))
            * F.exp(F.lit(_Q150_ETA) * excess)
        ).alias("raw_w"),
    ).persist()
    z = ex.agg(F.sum("raw_w").alias("zsum"))
    return ex.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "loss",
        "excess",
        dround(F.col("raw_w") / F.col("zsum"), 6).alias("weight"),
    )


# ---------------------------------------------------------------------------
# q156 — pairwise source token-distribution JS divergence: which
# sources bring new token mass and which are near-copies of each
# other — the content-level complement of q105's numeric PSI drift.
# Hashed-unigram distributions over 256 fixed buckets (add-one
# smoothed), Jensen–Shannon with natural log. Everything after the
# one (source, bucket) aggregation runs on |sources|·256-row tables.
# ---------------------------------------------------------------------------
_Q156_B = 256

_Q156_ORACLE = f"""
    WITH tok AS (SELECT source, unnest({tokens_sql("text")}) AS t FROM documents),
    counts AS (SELECT source AS grp, {polyhash_sql("t")} % {_Q156_B} AS bucket,
                      count(*) AS cnt
               FROM tok GROUP BY 1, 2),
    totals AS (SELECT grp, sum(cnt) AS tot FROM counts GROUP BY grp),
    grid AS (SELECT grp, tot, unnest(range(0, {_Q156_B})) AS bucket FROM totals),
    dense AS (SELECT g.grp, g.bucket,
                     (coalesce(c.cnt, 0) + 1.0) / (g.tot + {_Q156_B}) AS p
              FROM grid g LEFT JOIN counts c
                ON c.grp = g.grp AND c.bucket = g.bucket),
    pairs AS (SELECT a.grp AS group_a, b.grp AS group_b, a.p AS pa, b.p AS pb
              FROM dense a JOIN dense b
                ON a.bucket = b.bucket AND a.grp < b.grp)
    SELECT group_a, group_b,
           {dround_sql("sum(0.5 * (pa * ln(pa / ((pa + pb) / 2)) + pb * ln(pb / ((pa + pb) / 2))))", 6)} AS js_div
    FROM pairs GROUP BY group_a, group_b
"""


@register("q156_source_js_divergence", oracle=_Q156_ORACLE)
def q156_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.selection import group_js_divergence

    docs = load_table(spark, sf_dir, "documents")
    out = group_js_divergence(docs, "source", "text", buckets=_Q156_B)
    return out.select(
        "group_a", "group_b", dround(F.col("js_div"), 6).alias("js_div")
    )


# ---------------------------------------------------------------------------
# q168 — Horvitz–Thompson sample-estimator audit: per source, the
# exact doc count next to the inverse-probability estimate from a
# deterministic 1-in-10 hash sample (membership = seeded affine hash
# of doc_id mod 10 — reproducible at any parallelism, in any engine;
# never rand()). The audit every sampled dashboard needs before its
# numbers are trusted. Sampling + estimate are one conditional agg —
# a SINGLE scan, no second pass for the exact side.
# ---------------------------------------------------------------------------
_Q168_A, _Q168_B, _Q168_P = 1_000_003, 337, 2_147_483_647

_Q168_ORACLE = f"""
    WITH marked AS (
      SELECT source,
             ((({_Q168_A} * (doc_id % {_Q168_P}) + {_Q168_B}) % {_Q168_P}) % 10 = 0)
               AS in_sample
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(10 * sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT) AS n_hat,
           {dround_sql("(10.0 * sum(CASE WHEN in_sample THEN 1 ELSE 0 END) - count(*)) / count(*)", 6)} AS rel_err
    FROM marked GROUP BY source
"""


@register("q168_ht_sample_audit", oracle=_Q168_ORACLE)
def q168_ht_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    in_sample = (
        (F.lit(_Q168_A) * (F.col("doc_id") % _Q168_P) + F.lit(_Q168_B)) % _Q168_P
    ) % 10 == 0
    marked = docs.select("source", in_sample.alias("in_sample"))
    n_s = F.sum(F.when(F.col("in_sample"), 1).otherwise(0))
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        n_s.cast("long").alias("n_sampled"),
        (10 * n_s).cast("long").alias("n_hat"),
        dround(
            (10.0 * n_s - F.count(F.lit(1))) / F.count(F.lit(1)).cast("double"), 6
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# q193 — fastText-shape quality classifier INFERENCE (round 8): the
# filter CCNet/RefinedWeb actually deploy is a linear classifier over
# hashed n-gram features (Joulin et al. 2016), not a rule score — this
# gate runs that inference shape end to end: the q95 featurizer
# (hashed unigram+bigram buckets, 8-byte (doc, bucket) keys, fixed
# B-sized vocabulary) feeds a per-bucket weight, per-doc mean-pooled
# into a logit → sigmoid score → keep decision. Weights here are a
# deterministic CLOSED-FORM pseudo-model (Knuth multiplicative hash of
# the bucket id → [-0.5, 0.5)) so DuckDB recomputes them exactly; a
# real deployment broadcasts a trained B-vector instead — same plan,
# the weight column becomes a broadcast-joined literal array lookup.
# Float discipline: the logit is dround-6'd BEFORE exp() so both
# engines exponentiate the identical value (the q150 rule).
# ---------------------------------------------------------------------------
_Q193_BIAS = 0.001
_KNUTH = 2654435761
_TWO32 = 4294967296


def _q193_oracle() -> str:
    w = f"(CAST(((bucket + 1) * {_KNUTH}) % {_TWO32} AS DOUBLE) / {_TWO32} - 0.5)"
    logit = dround_sql(f"raw / n_features + {_Q193_BIAS}", 6)
    return f"""
    WITH {_bucket_counts_ctes()},
    perdoc AS (SELECT doc_id,
                      CAST(sum(cnt) AS BIGINT) AS n_features,
                      sum(cnt * {w}) AS raw
               FROM counts GROUP BY doc_id),
    scored AS (SELECT doc_id, n_features, {logit} AS logit FROM perdoc)
    SELECT doc_id, n_features,
           {dround_sql("1.0 / (1.0 + exp(-logit))", 6)} AS ft_score,
           logit >= 0.0 AS keep
    FROM scored
    """


@register("q193_fasttext_quality_filter", oracle=_q193_oracle())
def q193_fasttext_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear hashed-ngram classifier inference (the fastText shape).
    Scale: two aggregation shuffles on 8-byte keys — the (doc, bucket)
    partial agg, then the per-doc fold (the q95 profile; PLANS.md
    counts 4 exchanges incl. the scan-side pair); the weight is column
    math on the bucket key, so NOTHING besides the fixed-B model would
    broadcast at 100 TB.
    Generalizes the reference's scalar aesthetic gate (run.py:87-88)
    to the learned text filter a pretraining corpus deploys."""
    from anime_data_pipeline_spark.operators.selection import doc_bucket_counts

    docs = load_table(spark, sf_dir, "documents")
    counts = doc_bucket_counts(docs, "doc_id", "text", buckets=_B)
    wv = (
        ((F.col("bucket") + 1) * F.lit(_KNUTH)) % F.lit(_TWO32)
    ).cast("double") / F.lit(float(_TWO32)) - 0.5
    perdoc = counts.groupBy("doc").agg(
        F.sum("cnt").cast("long").alias("n_features"),
        F.sum(F.col("cnt") * wv).alias("raw"),
    )
    logit = dround(F.col("raw") / F.col("n_features") + F.lit(_Q193_BIAS), 6)
    scored = perdoc.withColumn("logit", logit)
    return scored.select(
        F.col("doc").alias("doc_id"),
        "n_features",
        dround(1.0 / (1.0 + F.exp(-F.col("logit"))), 6).alias("ft_score"),
        (F.col("logit") >= 0.0).alias("keep"),
    )
