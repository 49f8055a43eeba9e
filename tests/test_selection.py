"""Unit tests for the data-selection operators (operators/selection.py):
DSIR importance weighting and the rank-based per-group quantile filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from anime_data_pipeline_spark.operators.selection import (
    doc_bucket_counts,
    dsir_logweights,
    quantile_filter_by_rank,
)


def test_quantile_filter_exact_drop_count(spark):
    rows = [(g, float(s), i) for g in ("a", "b") for i, s in enumerate(range(10))]
    df = spark.createDataFrame(rows, "grp string, score double, id int")
    kept = quantile_filter_by_rank(df, "grp", "score", "id", drop_frac=0.25)
    out = kept.groupBy("grp").count().collect()
    # floor(0.25 * 10) = 2 dropped per group
    assert {r["grp"]: r["count"] for r in out} == {"a": 8, "b": 8}
    # dropped rows are the lowest scores
    mins = kept.groupBy("grp").agg(F.min("score").alias("m")).collect()
    assert all(r["m"] == 2.0 for r in mins)


def test_quantile_filter_ties_break_by_id(spark):
    # all scores equal: rank falls back to id, so exactly ids 0..1 drop
    df = spark.createDataFrame(
        [("g", 1.0, i) for i in range(8)], "grp string, score double, id int"
    )
    kept = quantile_filter_by_rank(df, "grp", "score", "id", drop_frac=0.25)
    assert sorted(r["id"] for r in kept.collect()) == [2, 3, 4, 5, 6, 7]


def test_doc_bucket_counts_multiplicity(spark):
    df = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    out = {
        r["bucket"]: r["cnt"]
        for r in doc_bucket_counts(df, "doc_id", "text", buckets=1 << 20).collect()
    }
    # unigrams: x(×2), y(×1); bigrams: (x,x), (x,y) — 5 grams, 4 buckets
    assert sum(out.values()) == 5
    assert sorted(out.values(), reverse=True)[0] == 2  # 'x' counted twice


def test_dsir_targets_score_higher(spark):
    # target docs share a distinctive vocabulary; raw docs don't.
    target = [(i, "alpha beta gamma delta alpha beta", True) for i in range(8)]
    other = [(100 + i, "zeta eta theta iota kappa mu", False) for i in range(8)]
    probe_t = [(200, "alpha beta gamma alpha beta gamma", False)]
    probe_o = [(201, "zeta eta theta zeta eta theta", False)]
    df = spark.createDataFrame(
        target + other + probe_t + probe_o, "doc_id long, text string, is_t boolean"
    )
    w = {
        r["doc"]: r["dsir_logw"]
        for r in dsir_logweights(
            df, "doc_id", "text", F.col("is_t"), buckets=4096
        ).collect()
    }
    # the target-like probe must outscore the out-of-domain probe
    assert w[200] > w[201]
    # and target members outscore non-members on average
    t_avg = sum(w[i] for i in range(8)) / 8
    o_avg = sum(w[100 + i] for i in range(8)) / 8
    assert t_avg > o_avg


def test_rank_band_filter_keeps_middle(spark):
    from anime_data_pipeline_spark.operators.selection import rank_band_filter

    rows = [("g", float(s), s) for s in range(12)]
    df = spark.createDataFrame(rows, "grp string, score double, id int")
    kept = rank_band_filter(df, "grp", "score", "id", lo=0.25, hi=0.75)
    ids = sorted(r["id"] for r in kept.collect())
    # floor(.25*12)=3 dropped from the head, keep ranks 4..9 → ids 3..8
    assert ids == [3, 4, 5, 6, 7, 8]


def test_bm25_ranking_semantics(spark):
    from anime_data_pipeline_spark.operators.terms import bm25_topk

    rows = [
        (1, "spark hash window spark hash window extra pad pad pad"),
        (2, "spark pad pad pad pad pad pad pad pad pad"),
        (3, "pad pad pad pad pad pad pad pad pad pad"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: r for r in
           bm25_topk(df, "doc_id", "text", ["spark", "hash", "window"], k=10).collect()}
    assert 3 not in out            # no query term → not retrieved
    assert out[1]["rank"] == 1     # matches all terms, twice each
    assert out[2]["rank"] == 2
    assert out[1]["bm25"] > out[2]["bm25"] > 0


def test_gumbel_topk_biases_toward_high_weights(spark):
    from anime_data_pipeline_spark.operators.selection import gumbel_topk

    # two weight classes far apart: softmax mass concentrates on the
    # high class, so the top-20 should be dominated by it
    rows = [(i, 5.0 if i < 50 else -5.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = gumbel_topk(df, "doc_id", "w", n=20).collect()
    assert len(out) == 20
    high = sum(1 for r in out if r["doc_id"] < 50)
    assert high >= 18  # ~softmax: low class essentially never wins
    # deterministic: same call, same result
    again = gumbel_topk(df, "doc_id", "w", n=20).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)
    # ranks are 1..20 by key desc
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, 21))
