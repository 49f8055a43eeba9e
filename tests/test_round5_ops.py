"""Invariant tests for the round-5 second-half operators (q132-q150):
data-driven checks computed independently in Python against the same
parquet tables the queries read."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F


def test_bpe_pair_total_matches_python(spark, sf_dir):
    """Σ pair_count over ALL pairs = Σ_words freq(word)·(len(word)−1)
    for words of length ≥ 2 — computed independently in pandas."""
    from anime_data_pipeline_spark.queries.text_q import (
        q132_bpe_merge_pairs,
        _Q132_TOPK,
    )

    texts = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).df()["text"]
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    expected = Counter()
    for w, n in words.items():
        for i in range(len(w) - 1):
            expected[(w[i], w[i + 1])] += n
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:_Q132_TOPK]
    out = q132_bpe_merge_pairs(spark, str(sf_dir)).collect()
    got = [((r["l"], r["r"]), r["pair_count"]) for r in out]
    assert got == top


def test_doc_stitching_finds_every_planted_continuation(spark, sf_dir):
    from anime_data_pipeline_spark.queries.text_q import (
        q135_doc_stitching,
        _Q135_K,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).df()
    planted = {
        int(r.doc_id)
        for r in docs.itertuples()
        if r.doc_id % 13 == 0 and len([t for t in r.text.split(" ") if t]) >= _Q135_K
    }
    pairs = {
        (r["src_doc"], r["cont_doc"])
        for r in q135_doc_stitching(spark, str(sf_dir)).collect()
    }
    for d in planted:
        assert (d, d + 100000) in pairs, f"missing planted stitch for doc {d}"


def test_attribution_touch_precedes_purchase(spark, sf_dir):
    from anime_data_pipeline_spark.queries.temporal_q import (
        q147_last_touch_attribution,
    )

    out = q147_last_touch_attribution(spark, str(sf_dir)).collect()
    n_purchases = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet' WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert len(out) == n_purchases
    for r in out:
        if r["touch_id"] is not None:
            assert r["latency_us"] >= 0
            assert r["touch_type"] in ("view", "click")


def test_doremi_weights_sum_to_one_and_upweight_lossy(spark, sf_dir):
    from anime_data_pipeline_spark.queries.selection_q import (
        q150_doremi_reweight,
    )

    rows = q150_doremi_reweight(spark, str(sf_dir)).collect()
    total = sum(r["weight"] for r in rows)
    assert abs(total - 1.0) < 1e-4, total
    # a source with excess 0 must not out-weigh an equal-share source
    # with positive excess
    by_excess = sorted(rows, key=lambda r: r["excess"])
    zero = [r for r in by_excess if r["excess"] == 0.0]
    pos = [r for r in by_excess if r["excess"] > 0.0]
    if zero and pos:
        same_share = [
            (z, p)
            for z in zero
            for p in pos
            if z["n_docs"] == p["n_docs"]
        ]
        for z, p in same_share:
            assert p["weight"] > z["weight"]


def test_chi2_contributions_are_nonnegative(spark, sf_dir):
    from anime_data_pipeline_spark.queries.relational import (
        q140_source_lang_chi2,
    )

    rows = q140_source_lang_chi2(spark, str(sf_dir)).collect()
    assert rows
    for r in rows:
        assert r["chi2_contrib"] >= 0.0
        assert r["n_cells"] >= 1


def test_markov_transition_rows_are_probability_distributions(spark, sf_dir):
    """q155: per from_type, probabilities sum to 1 and counts equal the
    number of consecutive per-user pairs (= events - users with ≥1
    event)."""
    from anime_data_pipeline_spark.queries.temporal_q import q155_markov_transitions

    out = q155_markov_transitions(spark, sf_dir).toPandas()
    sums = out.groupby("from_type")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all(), sums
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert out["n"].sum() == n_events - n_users


def test_group_js_divergence_bounds_and_self_zero(spark):
    """JS(p, q) ∈ [0, ln 2]; two groups with identical text have
    divergence 0; disjoint-vocabulary groups approach the bound."""
    import math

    from anime_data_pipeline_spark.operators.selection import group_js_divergence

    rows = [
        ("a", "alpha beta gamma delta"),
        ("b", "alpha beta gamma delta"),
        ("c", "zzzz qqqq xxxx wwww vvvv uuuu tttt ssss"),
    ]
    df = spark.createDataFrame(rows, "grp string, text string")
    out = {
        (r["group_a"], r["group_b"]): r["js_div"]
        for r in group_js_divergence(df, "grp", "text", buckets=64).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    for v in out.values():
        assert -1e-12 <= v <= math.log(2.0) + 1e-12
    assert abs(out[("a", "b")]) < 1e-12
    assert out[("a", "c")] > out[("a", "b")]


def test_readability_hand_computed(spark):
    """'the cat sat. it ran away!' — 6 words, 2 sentences, syllables:
    the=1 cat=1 sat.=1 it=1 ran=1 away!=2 → 7. Flesch = 206.835 −
    1.015·3 − 84.6·(7/6)."""
    from anime_data_pipeline_spark.operators.textstats import readability_columns

    df = spark.createDataFrame(
        [(1, "the cat sat. it ran away!")], "doc_id long, text string"
    )
    r = readability_columns(df, "text").collect()[0]
    assert r["n_words"] == 6
    assert r["n_sentences"] == 2
    assert r["n_syllables"] == 7
    assert abs(r["flesch"] - (206.835 - 1.015 * 3.0 - 84.6 * (7.0 / 6.0))) < 1e-9
    assert abs(r["fk_grade"] - (0.39 * 3.0 + 11.8 * (7.0 / 6.0) - 15.59)) < 1e-9


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A half-length excerpt: containment(excerpt→parent) = 1.0 while
    Jaccard ≈ 0.5 — the pair appears in the containment output at
    threshold 0.9 but NOT in ngram_jaccard_pairs at 0.9."""
    from anime_data_pipeline_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    words = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, words), (2, excerpt), (3, "totally different text here")],
        "doc_id long, text string",
    )
    cont = ngram_containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in cont] == [(1, 2)]
    assert abs(cont[0]["cont_b_in_a"] - 1.0) < 1e-12
    jac = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
    assert jac == []


def test_zipf_slope_exact_on_synthetic_power_law(spark):
    """freq(rank) = round of C·rank^(-0.7) for 10 tokens in one group →
    fitted slope recovers ≈ −0.7 (exact power law, exact OLS)."""
    import math

    from anime_data_pipeline_spark.queries.text_q import _Q159_TOPK  # noqa: F401

    rows = []
    for rnk in range(1, 11):
        freq = int(round(10000 * rnk ** -0.7))
        tok = f"t{rnk:02d}"
        rows.extend([("s", tok)] * freq)
    df = spark.createDataFrame(rows, "source string, t string")
    text = df.groupBy("source").agg(
        F.concat_ws(" ", F.collect_list("t")).alias("text")
    )
    from anime_data_pipeline_spark.queries.text_q import q159_zipf_slope  # noqa: F401
    # Use the operator inline: wordcount → rank → OLS (mirrors q159).
    from pyspark.sql import Window as W

    wc = df.groupBy("source", "t").agg(F.count(F.lit(1)).alias("freq"))
    w = W.partitionBy("source").orderBy(F.desc("freq"), F.asc("t"))
    top = wc.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 100)
    pts = [(math.log(r["rnk"]), math.log(r["freq"])) for r in top.collect()]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(slope + 0.7) < 0.01


def test_daily_concurrency_hand_case(spark, tmp_path):
    """Three overlapping + one disjoint 2-min window on one day →
    peak 3; a second day with one window → peak 1."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 7, "error", 0.0, "{}"),
        (2, base + dt.timedelta(seconds=30), 7, "error", 0.0, "{}"),
        (3, base + dt.timedelta(seconds=60), 7, "error", 0.0, "{}"),
        (4, base + dt.timedelta(minutes=10), 7, "error", 0.0, "{}"),
        (5, base + dt.timedelta(days=1), 7, "error", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    p = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(p)
    from anime_data_pipeline_spark.queries.temporal_q import (
        q164_daily_max_concurrency,
    )

    out = {
        str(r["day"]): (r["n_incidents"], r["max_concurrency"])
        for r in q164_daily_max_concurrency(spark, str(tmp_path)).collect()
    }
    assert out["2024-01-01"] == (4, 3)
    assert out["2024-01-02"] == (1, 1)


def test_time_decay_credits_sum_to_one(spark, sf_dir):
    """q166: per purchase, the touch-type credits sum to 1 (± rounding
    over ≤2 types)."""
    from anime_data_pipeline_spark.queries.temporal_q import (
        q166_time_decay_attribution,
    )

    out = q166_time_decay_attribution(spark, sf_dir).toPandas()
    sums = out.groupby("purchase_id")["credit"].sum()
    assert ((sums - 1.0).abs() < 1e-5).all()
    assert (out["credit"] > 0).all()


def test_rfm_scores_in_band(spark, sf_dir):
    from anime_data_pipeline_spark.queries.temporal_q import q167_rfm_segmentation

    out = q167_rfm_segmentation(spark, sf_dir).toPandas()
    for c in ("r_score", "f_score", "m_score"):
        assert out[c].between(1, 5).all(), c
    assert (out["rfm"] == out["r_score"] * 100 + out["f_score"] * 10 + out["m_score"]).all()
    assert (out["n_purchases"] >= 1).all()
