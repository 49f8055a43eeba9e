"""Data-selection operators for training-corpus curation.

Two selection families the reference pipeline approximates with a
single aesthetic-score threshold (run.py:87-88,
merge_final_train_metadata.py:14 — scalar filter against a fixed
cutoff), generalized to the forms a 100 TB text pipeline needs:

- **DSIR importance weighting** (Xie et al., "Data Selection for
  Language Models via Importance Resampling", NeurIPS 2023): score
  every raw document by how much more likely its hashed n-gram profile
  is under a target distribution than under the raw-corpus
  distribution.  log w(x) = Σ_b c_b(x) · (log p_target[b] − log
  q_raw[b]) over B fixed hash buckets.
- **Rank-based adaptive quality threshold**: instead of one global
  cutoff, drop the bottom q-fraction *per group* (per language) by a
  deterministic (score, id) rank — a per-group discrete quantile
  filter with no floating-point boundary semantics.

Scale story (100 TB):

- DSIR is two aggregations over (doc, bucket) pairs plus one broadcast
  join. The bucket vocabulary is FIXED (B buckets, default 1024), so
  the distribution tables are B rows regardless of corpus size —
  always broadcastable. Per-doc bucket counts shuffle (doc, bucket,
  cnt) triples whose count is ≤ tokens; map-side combine collapses
  repeated buckets within a partition first. No driver collect; the
  log-ratio table stays a DataFrame.
- The adaptive threshold is one shuffle by group + a per-group window.
  Group cardinality = languages (small); rank is by (score, id) so the
  kept set is deterministic at any parallelism — no percentile
  interpolation, hence no cross-engine IEEE boundary risk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from anime_data_pipeline_spark.functions.hashing import (
    P,
    polyhash_sql,
    shingle_hashes,
    shingle_hashes_sql,
)
from anime_data_pipeline_spark.functions.text import tokens, tokens_sql

DEFAULT_BUCKETS = 1024


def _token_hash(t: Column) -> Column:
    return F.aggregate(
        F.transform(F.split(t, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % F.lit(P),
    )


def doc_bucket_counts(
    df: DataFrame, id_col: str, text_col: str, buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """(doc, bucket, cnt) — per-document hashed n-gram bucket counts.

    The explode→groupBy carries 8-byte (doc, bucket) keys, never text;
    partial aggregation collapses within-partition repeats before the
    exchange.

    The featurizer is the DSIR paper's hashed unigram+bigram n-gram
    profile with the cross-engine polynomial hash. The token-hash array
    is materialized as a column BEFORE the bigram fold — shingle_hashes
    references it per element, and a nested expression would be
    re-evaluated per reference (the expression-tree discipline from
    SCALE.md; measured 8× on this operator).
    """
    th_df = df.select(
        F.col(id_col).alias("doc"),
        F.transform(tokens(F.col(text_col)), _token_hash).alias("_th"),
    )
    grams = F.concat(F.col("_th"), shingle_hashes(F.col("_th"), 2))
    return (
        th_df.select(
            "doc",
            F.explode(F.transform(grams, lambda h: h % F.lit(buckets))).alias("bucket"),
        )
        .groupBy("doc", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def bucket_distribution(counts: DataFrame, buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """(bucket, logp) — add-one-smoothed log probability over B buckets.

    Input is (doc, bucket, cnt); output is at most B rows (buckets with
    zero mass get probability 1/(total+B) implicitly via smoothing on
    the consumer side — see :func:`dsir_logweights`).
    """
    tot = counts.agg(F.sum("cnt").alias("tot"))
    return (
        counts.groupBy("bucket")
        .agg(F.sum("cnt").alias("mass"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.log((F.col("mass") + F.lit(1.0)) / (F.col("tot") + F.lit(float(buckets)))).alias(
                "logp"
            ),
            F.col("tot"),
        )
    )


def dsir_logweights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(doc, dsir_logw) — DSIR importance log-weight per document.

    ``target_pred`` marks the in-domain target subset (the reference's
    analogue: the aesthetic-score-passing subset); the raw distribution
    is the whole input. Buckets absent from a distribution contribute
    their smoothed floor log(1/(total+B)), exactly as in the oracle.

    Plan: one (doc,bucket) agg over the corpus; two B-row distribution
    aggs; a broadcast join of the B-row log-ratio table back onto the
    (doc,bucket) counts; one final per-doc sum. Shuffles carry ids and
    8-byte bucket keys only.
    """
    base = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_t"), target_pred.alias("_is_t"))
    counts = doc_bucket_counts(base, "doc", "_t", buckets)
    target_counts = counts.join(
        base.filter(F.col("_is_t")).select("doc"), "doc", "left_semi"
    )
    raw = bucket_distribution(counts, buckets).select(
        "bucket", F.col("logp").alias("logq"), F.col("tot").alias("tot_q")
    )
    tgt = bucket_distribution(target_counts, buckets).select(
        "bucket", F.col("logp").alias("logp"), F.col("tot").alias("tot_p")
    )
    # Totals are needed for the smoothing floor of buckets missing from
    # one side; carry them on every row of the tiny joined table.
    ratio = raw.join(tgt, "bucket", "full_outer")
    tot_p = ratio.agg(F.max("tot_p").alias("v"))
    tot_q = ratio.agg(F.max("tot_q").alias("v"))
    ratio = (
        ratio.crossJoin(F.broadcast(tot_p.select(F.col("v").alias("_tp"))))
        .crossJoin(F.broadcast(tot_q.select(F.col("v").alias("_tq"))))
        .select(
            "bucket",
            (
                F.coalesce(F.col("logp"), F.log(F.lit(1.0) / (F.col("_tp") + F.lit(float(buckets)))))
                - F.coalesce(F.col("logq"), F.log(F.lit(1.0) / (F.col("_tq") + F.lit(float(buckets)))))
            ).alias("logratio"),
        )
    )
    return (
        counts.join(F.broadcast(ratio), "bucket")
        .groupBy("doc")
        .agg(F.sum(F.col("cnt") * F.col("logratio")).alias("dsir_logw"))
    )


def quantile_filter_by_rank(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    drop_frac: float = 0.25,
) -> DataFrame:
    """Drop the bottom ``drop_frac`` of each group by (score, id) rank.

    The cutoff is *discrete*: each group of n rows loses exactly
    ``floor(drop_frac * n)`` rows — the lowest by (score asc, id asc).
    No interpolated percentile, so membership is bit-deterministic in
    any engine/parallelism. One shuffle on the group key; the window
    partitions by group (language-sized, not corpus-sized).
    """
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    wc = Window.partitionBy(group_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wc))
        .filter(F.col("_rn") > F.floor(F.lit(drop_frac) * F.col("_n")))
        .drop("_rn", "_n")
    )
