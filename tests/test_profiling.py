"""Approx-vs-exact parity of the corpus profiler: the sketch path
(q49's operator default) must agree with the exact oracle path (q40)
within the sketches' error bounds at test scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.operators.profiling import corpus_profile


def test_approx_profile_tracks_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {r["source"]: r for r in corpus_profile(docs, approx=False).collect()}
    approx = {r["source"]: r for r in corpus_profile(docs, approx=True).collect()}
    assert set(exact) == set(approx)
    for src, e in exact.items():
        a = approx[src]
        # counts and min/max are not sketched — must be identical
        assert a["n_docs"] == e["n_docs"]
        assert a["min_chars"] == e["min_chars"]
        assert a["max_chars"] == e["max_chars"]
        # HLL++ at rsd=0.05 on tiny cardinalities is near-exact
        assert abs(a["n_langs"] - e["n_langs"]) <= max(1, 0.1 * e["n_langs"])
        # GK at accuracy=10000 with groups << 10000 values is exact
        for q in ("p25_chars", "p50_chars", "p75_chars"):
            assert abs(a[q] - e[q]) <= max(2, 0.02 * e["max_chars"]), (src, q)


def test_approx_profile_plan_has_no_collect_list(spark, sf_dir):
    """The scale guard itself: the default path's physical plan must
    contain the sketch aggregates and no collect_list/sort-based
    quantile (the r1 OOM risk)."""
    docs = load_table(spark, sf_dir, "documents")
    plan = corpus_profile(docs, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    assert "approx_count_distinct" in plan or "HyperLogLog" in plan


def test_approx_profile_tracks_exact_at_sf001(spark):
    """The r3 verdict's gate-strength ask: pin sketch accuracy at the
    driver's own gate scale (sf0.01) with DECLARED error bounds —
    HLL++ rsd=0.05 and GK accuracy=10000 — so q49 (rows-only at the
    driver by design) carries a value check in CI."""
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    exact = {r["source"]: r for r in corpus_profile(docs, approx=False).collect()}
    approx = {r["source"]: r for r in corpus_profile(docs, approx=True).collect()}
    assert set(exact) == set(approx)
    for src, e in exact.items():
        a = approx[src]
        assert a["n_docs"] == e["n_docs"]
        assert a["min_chars"] == e["min_chars"]
        assert a["max_chars"] == e["max_chars"]
        # HLL++ declared rsd 0.05 → 3σ ≈ 15% relative error bound
        assert abs(a["n_langs"] - e["n_langs"]) <= max(1, 0.15 * e["n_langs"]), src
        # GK declared accuracy=10000 → rank error ≤ n/10000; with group
        # sizes ~thousands at sf0.01 that is <1 rank, i.e. exact —
        # allow one discrete step of slack on top.
        n = e["n_docs"]
        for q in ("p25_chars", "p50_chars", "p75_chars"):
            rank_slack = max(1, int(n / 10000) + 1)
            vals = sorted(
                r["n_chars"]
                for r in docs.filter(F.col("source") == src)
                .select("n_chars")
                .collect()
            )
            qq = {"p25_chars": 0.25, "p50_chars": 0.5, "p75_chars": 0.75}[q]
            import math

            idx = max(0, int(math.ceil(qq * n)) - 1)
            lo = vals[max(0, idx - rank_slack)]
            hi = vals[min(n - 1, idx + rank_slack)]
            assert lo <= a[q] <= hi, (src, q, a[q], lo, hi)


def test_histogram_drift_zero_on_identical(spark):
    from pyspark.sql import functions as F

    from anime_data_pipeline_spark.operators.profiling import histogram_drift

    df = spark.createDataFrame(
        [(i, (i % 10) / 10.0) for i in range(100)], "id long, s double"
    )
    out = histogram_drift(df.select("s"), df.select("s"), "s", n_bins=10)
    rows = out.collect()
    assert len(rows) == 10
    assert all(abs(r["psi_contrib"]) < 1e-12 for r in rows)
    # shares sum to ~1 on each side (smoothing included)
    assert abs(sum(r["share_a"] for r in rows) - 1.0) < 1e-9


def test_histogram_drift_detects_shift(spark):
    from anime_data_pipeline_spark.operators.profiling import histogram_drift

    a = spark.createDataFrame([(i, 0.1) for i in range(50)], "id long, s double")
    b = spark.createDataFrame([(i, 0.9) for i in range(50)], "id long, s double")
    out = histogram_drift(a.select("s"), b.select("s"), "s", n_bins=10).collect()
    psi = sum(r["psi_contrib"] for r in out)
    assert psi > 0.2  # total mass moved: far past the alarm threshold


def test_histogram_drift_clamps_out_of_range(spark):
    from anime_data_pipeline_spark.operators.profiling import histogram_drift

    a = spark.createDataFrame([(1, -0.5), (2, 1.5)], "id long, s double")
    out = histogram_drift(a.select("s"), a.select("s"), "s", n_bins=10).collect()
    # -0.5 clamps to bin 0, 1.5 clamps to bin 9 — no lost rows
    occupied = [r["bin"] for r in out if r["share_a"] > r["share_b"] - 1e-12 and r["share_a"] > 0.06]
    assert 0 in occupied and 9 in occupied


def test_sketch_audit_all_true_on_real_data(spark, sf_dir):
    """q49's driver contract locally: every ok-boolean TRUE and the
    exact columns equal to the exact profiler's."""
    from anime_data_pipeline_spark.operators.profiling import sketch_profile_audit

    docs = load_table(spark, sf_dir, "documents")
    rows = {r["source"]: r for r in sketch_profile_audit(docs).collect()}
    exact = {r["source"]: r for r in corpus_profile(docs, approx=False).collect()}
    assert set(rows) == set(exact)
    for src, r in rows.items():
        assert r["n_docs"] == exact[src]["n_docs"]
        assert r["min_chars"] == exact[src]["min_chars"]
        assert r["max_chars"] == exact[src]["max_chars"]
        for c in ("hll_langs_ok", "hll_chars_ok", "gk_p25_ok", "gk_p50_ok", "gk_p75_ok"):
            assert r[c] is True, (src, c)


def test_sketch_audit_flips_on_corrupted_sketch(spark, sf_dir):
    """FALSIFIABILITY: q49's TRUE-literal oracle is only a gate if a
    broken sketch actually flips a boolean. Inject a profile whose
    HLL estimate is far outside the rsd bound and whose 'quantiles'
    are the group minimum (true rank nowhere near 25/50/75%) and
    assert every audited bit goes false."""
    from pyspark.sql import functions as F

    from anime_data_pipeline_spark.operators.profiling import audit_sketch_profile

    docs = load_table(spark, sf_dir, "documents")
    corrupt = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("lang").alias("_exact_dlo"),
        (F.countDistinct("lang") * 10 + 100).alias("_hll_dlo"),
        F.countDistinct("n_chars").alias("_exact_dhi"),
        (F.countDistinct("n_chars") * 10 + 100).alias("_hll_dhi"),
        F.array(F.min("n_chars"), F.min("n_chars"), F.min("n_chars")).alias("_gk"),
    )
    out = audit_sketch_profile(docs, corrupt).collect()
    assert out, "audit produced no rows"
    for r in out:
        assert r["hll_langs_ok"] is False, r
        assert r["hll_chars_ok"] is False, r
        # min's rank interval [1, count(min)] cannot reach the 25/50/75%
        # targets on any group with >~4 distinct values
        assert r["gk_p50_ok"] is False, r
        assert r["gk_p75_ok"] is False, r
