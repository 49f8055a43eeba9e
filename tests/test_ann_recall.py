"""Recall of the approximate ANN variants against the exact brute-force
baseline (q41's operator): Hamming-1 multi-probe must dominate
single-probe — its candidate set is a strict superset — and clear an
empirical recall floor on the real embeddings table."""

from __future__ import annotations

from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    srp_lsh_topk,
)

_K = 5
_PLANES = 8


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _recall(approx: dict, exact: dict) -> float:
    num = den = 0
    for qid, ex in exact.items():
        num += len(approx.get(qid, set()) & ex)
        den += len(ex)
    return num / den


def test_multiprobe_dominates_single_probe(spark, sf_dir):
    corpus = load_table(spark, sf_dir, "embeddings")
    queries = corpus.filter(F.col("vec_id") % 97 == 0)
    exact = _topk_sets(
        brute_force_topk(corpus, queries, "vec_id", "embedding", k=_K)
    )
    single = _topk_sets(
        srp_lsh_topk(corpus, queries, "vec_id", "embedding", k=_K, planes=_PLANES)
    )
    multi = _topk_sets(
        srp_lsh_topk(
            corpus,
            queries,
            "vec_id",
            "embedding",
            k=_K,
            planes=_PLANES,
            hamming_probes=1,
        )
    )
    r_single, r_multi = _recall(single, exact), _recall(multi, exact)
    # multi-probe candidates ⊇ single-probe candidates per query
    assert r_multi >= r_single, (r_single, r_multi)
    # empirical floor on the synthetic embeddings (measured at sf0.001:
    # single 0.20, multi 0.30 — the near-random vectors have weak
    # neighbor structure, so even the exact top-k sits at low cosine and
    # single-probe misses most of it; the multiprobe lift is the point)
    print(f"recall single={r_single:.3f} multi={r_multi:.3f}")
    assert r_multi >= 0.25


def test_kmeans_refine_moves_centroids_to_cluster_means(spark):
    """Two tight 2-D clusters, seeds off-center: one Lloyd iteration
    must land each centroid on its cluster's coordinate mean (6 dp)."""
    from anime_data_pipeline_spark.operators.similarity import kmeans_refine

    rows = [(i, [10.0 + (i % 3) * 0.1, 0.2]) for i in range(9)]
    rows += [(100 + i, [0.2, 20.0 + (i % 3) * 0.1]) for i in range(9)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    seeds = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    refined = kmeans_refine(df, "vec_id", "embedding", seeds, iters=1)
    got = dict(refined)
    assert got[0] == [10.1, 0.2]  # mean of 10.0/10.1/10.2 ×3 each
    assert got[1] == [0.2, 20.1]


def test_seed_centroids_fixed_k_independent_of_corpus_size(spark):
    """The r3 scale-killer fix: the centroid count (and the driver
    collect) is the REQUESTED k at any corpus size — seeding at two
    different scale factors yields exactly k rows each, and the shared
    prefix of ids is deterministic (same seeded-hash ranking)."""
    from anime_data_pipeline_spark.operators.similarity import seed_centroids

    small = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    big = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    cs = seed_centroids(small, "vec_id", "embedding", 8)
    cb = seed_centroids(big, "vec_id", "embedding", 8)
    assert len(cs) == 8 and len(cb) == 8
    # determinism: re-seeding the same corpus gives the identical list
    assert cs == seed_centroids(small, "vec_id", "embedding", 8)


def test_assign_cells_join_path_matches_literal_path(spark, sf_dir):
    """Strategy dispatch must never change a result: forcing the
    broadcast-join assignment (literal_max=0) gives the identical
    (vec_id → cell) map as the literal expression path."""
    from anime_data_pipeline_spark.operators.similarity import (
        assign_cells,
        seed_centroids,
        to_double_array,
    )

    corpus = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    cents = seed_centroids(corpus, "vec_id", "v", 12)
    lit = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(corpus, "vec_id", "v", cents).collect()
    }
    join = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(
            corpus, "vec_id", "v", cents, literal_max=0
        ).collect()
    }
    assert lit == join and len(lit) == corpus.count()


def test_ivf_assign_expr_matches_column_mirror(spark, sf_dir):
    """r13: assign_cells' literal path parses ONE SQL string
    (ivf_assign_expr); the Column-API spelling stays as the readable
    mirror. Both must produce the identical (vec_id → cell) map —
    same fold order, same double literals, same (s, -cid) tiebreak."""
    from anime_data_pipeline_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_expr,
        seed_centroids,
        sq_norm,
        to_double_array,
    )

    corpus = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    cents = seed_centroids(corpus, "vec_id", "v", 16)
    base = corpus.withColumn("_vn", F.sqrt(sq_norm(F.col("v"))))
    mirror = {
        r["vec_id"]: r["cell"]
        for r in base.withColumn(
            "cell", ivf_assign(F.col("v"), cents, vn=F.col("_vn"))
        ).collect()
    }
    parsed = {
        r["vec_id"]: r["cell"]
        for r in base.withColumn(
            "cell", ivf_assign_expr("v", cents, "_vn")
        ).collect()
    }
    assert mirror == parsed and len(parsed) == corpus.count()


def test_probe_cells_join_path_matches_literal_path(spark, sf_dir):
    from anime_data_pipeline_spark.operators.similarity import (
        probe_cells,
        seed_centroids,
        to_double_array,
    )

    corpus = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    cents = seed_centroids(corpus, "vec_id", "v", 12)

    def pairs(literal_max):
        return sorted(
            (r["vec_id"], r["cell"])
            for r in probe_cells(
                corpus, "vec_id", "v", cents, nprobe=2, literal_max=literal_max
            ).collect()
        )

    lit, join = pairs(64), pairs(0)
    assert lit == join and len(lit) == 2 * corpus.count()


def test_assign_cells_join_path_plan_is_broadcast(spark, sf_dir):
    """Above literal_max the assignment must be a BroadcastHashJoin on
    the centroid table (O(1) plan size in k), not an inlined literal
    expression tree."""
    from anime_data_pipeline_spark.operators.similarity import (
        assign_cells,
        seed_centroids,
        to_double_array,
    )

    corpus = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    cents = seed_centroids(corpus, "vec_id", "v", 12)
    plan = (
        assign_cells(corpus, "vec_id", "v", cents, literal_max=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_srp_bucket_literal_planes_match_elementwise_form(spark, sf_dir):
    """The constant-folded literal-plane spelling (the q42 regression
    fix) is bit-identical to the per-element modular form."""
    from anime_data_pipeline_spark.operators.similarity import (
        srp_bucket,
        to_double_array,
    )

    df = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    got = df.select(
        "vec_id",
        srp_bucket(F.col("v"), 8, dim=64).alias("fast"),
        srp_bucket(F.col("v"), 8, dim=None).alias("ref"),
    ).filter(F.col("fast") != F.col("ref"))
    assert got.count() == 0


def test_semantic_dedup_drops_scaled_copies_keeps_originals(spark):
    """A scaled copy (cosine 1.0) must land in the same cell as its
    original, join its component, and lose the keep flag; unrelated
    vectors keep themselves."""
    from anime_data_pipeline_spark.operators.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0]),   # scaled copy of 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(10, [1.0, 0.1, 0.0]), (20, [0.0, 1.0, 0.1]), (30, [0.1, 0.0, 1.0])]
    out = {r["vec_id"]: r for r in semantic_dedup(
        df, "vec_id", "embedding", cents, threshold=0.99).collect()}
    assert out[1]["component"] == 1 and out[1]["keep"]
    assert out[2]["component"] == 1 and not out[2]["keep"]
    assert out[1]["cell"] == out[2]["cell"] == 10
    assert out[3]["keep"] and out[4]["keep"]


def test_knn_graph_mutual_flag_and_recall(spark, sf_dir):
    """Mutual must be true iff the reverse edge is in the edge list;
    the graph's edges must be real near-neighbors (positive recall of
    the exact kNN sets on the bucketed candidates)."""
    from anime_data_pipeline_spark.operators.similarity import knn_graph

    corpus = load_table(spark, sf_dir, "embeddings")
    edges = knn_graph(corpus, "vec_id", "embedding", k=_K, planes=_PLANES)
    rows = edges.collect()
    eset = {(r["src"], r["dst"]) for r in rows}
    for r in rows:
        assert r["mutual"] == ((r["dst"], r["src"]) in eset)
        assert r["src"] != r["dst"]
    # per-source edge count is capped at k and ranks are 1..n contiguous
    by_src: dict[int, list[int]] = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= _K
               for v in by_src.values())


def test_knn_graph_probe_depth2_superset(spark, sf_dir):
    """Depth-2 probing must yield candidate supersets: every depth-1
    edge's (src, dst) pair stays reachable, so per-src top-k cosine at
    depth 2 is >= at depth 1 (more candidates can only improve the
    best-k). Depth outside {1, 2} is rejected."""
    import pytest as _pytest

    from anime_data_pipeline_spark.operators.similarity import knn_graph

    corpus = load_table(spark, sf_dir, "embeddings").limit(120)
    d1 = knn_graph(corpus, "vec_id", "embedding", k=3, planes=6, probe_depth=1)
    d2 = knn_graph(corpus, "vec_id", "embedding", k=3, planes=6, probe_depth=2)
    worst1 = {r["src"]: r["cosine"] for r in d1.collect() if r["rank"] == 3}
    worst2 = {r["src"]: r["cosine"] for r in d2.collect() if r["rank"] == 3}
    assert set(worst1) <= set(worst2)  # depth 2 reaches at least depth 1's srcs
    for src, c1 in worst1.items():
        assert worst2[src] >= c1 - 1e-12, src
    with _pytest.raises(ValueError):
        knn_graph(corpus, "vec_id", "embedding", probe_depth=3)


def test_quantize_int8_bounds_and_zero_vector(spark):
    from anime_data_pipeline_spark.operators.similarity import quantize_int8

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0], 0),
        (2, [0.0, 0.0, 0.0, 0.0], 0),      # zero vector: scale falls back to 1
        (3, [127.0, -127.0, 63.5, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r["vec_id"]: r for r in quantize_int8(df, "vec_id", "embedding").collect()}
    for r in out.values():
        assert all(-127 <= q <= 127 for q in r["qv"])
        # per-element reconstruction error is bounded by scale/2
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12
    assert out[2]["scale"] == 1.0 and out[2]["q_l1"] == 0 and out[2]["mse"] == 0.0
    # extreme elements map exactly to ±127
    assert out[3]["qv"][0] == 127 and out[3]["qv"][1] == -127


def test_density_prune_drops_planted_dense_cluster_first(spark):
    """Semantic check: a corpus of well-spread vectors plus one planted
    tight cluster — the cluster members must occupy the top density
    ranks and be the ones dropped at drop_frac = cluster share."""
    import numpy as np

    from anime_data_pipeline_spark.operators.similarity import density_prune

    rng = np.random.default_rng(11)
    dim = 8
    spread = rng.normal(size=(80, dim))
    base = rng.normal(size=dim)
    cluster = base + rng.normal(scale=0.01, size=(20, dim))
    rows = [
        (i, [float(x) for x in v])
        for i, v in enumerate(np.vstack([spread, cluster]))
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = density_prune(df, "vec_id", "v", k=5, planes=6, drop_frac=0.2)
    dropped = {r["vec_id"] for r in out.filter(~F.col("kept")).collect()}
    cluster_ids = set(range(80, 100))
    # every dropped row is a planted-cluster member (cosines ~1.0 there)
    assert dropped, "nothing dropped"
    assert dropped <= cluster_ids, f"dropped non-cluster rows: {dropped - cluster_ids}"
    # and most of the cluster is caught (some members may miss the
    # bucket if the perturbation flips a plane — allow slack)
    assert len(dropped) >= 10, f"only {len(dropped)} of 20 cluster rows dropped"


def test_pq_self_query_has_zero_adc_distance(spark, sf_dir):
    """A query that IS a codebook seed row reconstructs exactly (its
    own codeword at every subspace), so its ADC distance to itself is
    0.0 — and pq_encode must assign it its own cid per subspace."""
    from anime_data_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_codebook(corpus, "vec_id", "embedding", ks=16)
    seed_ids = [cid for cid, _ in cb][:3]
    codes = (
        pq_encode(corpus, "vec_id", "embedding", cb, m=8)
        .filter(F.col("vec_id").isin(seed_ids))
        .collect()
    )
    for r in codes:
        assert r["code"] == r["vec_id"], (
            f"seed row {r['vec_id']} subspace {r['j']} encoded to {r['code']}"
        )
    queries = corpus.filter(F.col("vec_id").isin(seed_ids))
    out = pq_adc_topk(corpus, queries, "vec_id", "embedding", cb, m=8, k=3)
    selfpairs = {
        r["query_id"]: r["adc_d2"]
        for r in out.collect()
        if r["query_id"] == r["vec_id"]
    }
    assert set(selfpairs) == set(seed_ids)
    assert all(d == 0.0 for d in selfpairs.values()), selfpairs


def test_pq_encode_plan_is_broadcast_join(spark, sf_dir):
    """The encode must broadcast the tiny codebook — never a literal
    CASE tree (plan-size blow-up) and never a shuffled join."""
    from anime_data_pipeline_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
    )

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_codebook(corpus, "vec_id", "embedding", ks=16)
    plan = (
        pq_encode(corpus, "vec_id", "embedding", cb, m=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pq_adc_is_nonnegative_and_complete(spark, sf_dir):
    """Every (query, corpus) pair gets a rank 1..k; ADC distances are
    non-negative and non-decreasing in rank per query."""
    from anime_data_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebook,
    )

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") % 97 == 0)
    cb = pq_codebook(corpus, "vec_id", "embedding", ks=16)
    rows = pq_adc_topk(
        corpus, queries, "vec_id", "embedding", cb, m=8, k=5
    ).collect()
    by_q: dict = {}
    for r in rows:
        assert r["adc_d2"] >= 0.0
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["adc_d2"]))
    for q, pairs in by_q.items():
        pairs.sort()
        assert [p[0] for p in pairs] == list(range(1, len(pairs) + 1))
        ds = [p[1] for p in pairs]
        assert ds == sorted(ds), f"ADC not monotone for query {q}: {ds}"


def test_margin_mining_pairs_beat_their_neighborhood(spark, sf_dir):
    """Margin ≥ 1 means the pair's cosine is at least the mean of each
    side's top-k neighborhood — verify the invariant holds against the
    raw q136 candidate scores."""
    from anime_data_pipeline_spark.queries.similarity_q import (
        q136_margin_bitext_mining,
    )

    out = q136_margin_bitext_mining(spark, str(sf_dir)).collect()
    assert out, "no mined pairs"
    for r in out:
        assert r["margin"] >= 1.0
        assert -1.0 <= r["cosine"] <= 1.0


def test_suggested_planes_sizing_rule():
    """Production planes sizing: constant target occupancy as the
    corpus grows (the knob the round-6 stress tier measured)."""
    from anime_data_pipeline_spark.operators.similarity import suggested_planes

    assert suggested_planes(0) == 4
    assert suggested_planes(200) == 4          # tiny corpus clamps low
    assert suggested_planes(20_000) == 10      # ~16/bucket
    assert suggested_planes(20_000_000) == 20
    assert suggested_planes(10**12) == 24      # clamps high
    # doubling the corpus adds ~1 plane: occupancy stays flat
    assert suggested_planes(40_000) == suggested_planes(20_000) + 1


def test_assign_cells_two_level(spark, sf_dir):
    """Two-level routing: probes >= n_groups must equal the exact flat
    assignment bit-for-bit; probes=2 must agree on nearly all rows of
    a real embedding table (the recall knob's documented tradeoff)."""
    from anime_data_pipeline_spark.operators.similarity import (
        assign_cells,
        assign_cells_two_level,
        seed_centroids,
        to_double_array,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    cents = seed_centroids(emb, "vec_id", "v", 25)
    exact = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(emb, "vec_id", "v", cents).collect()
    }
    full = {
        r["vec_id"]: r["cell"]
        for r in assign_cells_two_level(
            emb, "vec_id", "v", cents, n_groups=5, probes=5
        ).collect()
    }
    assert full == exact  # probing every group == exact
    # on the near-random synthetic table cluster structure is weak, so
    # partial probing is a soft floor + monotone-in-probes property
    agrees = []
    for p in (2, 3):
        two = {
            r["vec_id"]: r["cell"]
            for r in assign_cells_two_level(
                emb, "vec_id", "v", cents, n_groups=5, probes=p
            ).collect()
        }
        assert set(two) == set(exact)
        agrees.append(sum(two[i] == exact[i] for i in exact) / len(exact))
    assert agrees[0] >= 0.6 and agrees[1] >= agrees[0], agrees


def test_assign_cells_two_level_clustered_data(spark):
    """On data with real cluster structure (what embedding spaces look
    like), probes=2 routing agrees with exact assignment on ~all rows:
    each point's nearest centroid lives in its own coarse group."""
    import numpy as np

    from anime_data_pipeline_spark.operators.similarity import (
        assign_cells,
        assign_cells_two_level,
    )

    r = np.random.default_rng(11)
    anchors = r.normal(size=(9, 16))
    anchors /= np.linalg.norm(anchors, axis=1)[:, None]
    rows, cents = [], []
    vid = 0
    for a_i, a in enumerate(anchors):
        for c in range(4):  # 4 centroids per anchor neighborhood
            cv = a + r.normal(scale=0.05, size=16)
            cents.append((a_i * 10 + c, [float(x) for x in cv]))
        for _ in range(40):
            v = a + r.normal(scale=0.05, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    exact = {
        r2["vec_id"]: r2["cell"]
        for r2 in assign_cells(df, "vec_id", "v", cents).collect()
    }
    two = {
        r2["vec_id"]: r2["cell"]
        for r2 in assign_cells_two_level(
            df, "vec_id", "v", cents, n_groups=9, probes=2
        ).collect()
    }
    agree = sum(two[i] == exact[i] for i in exact) / len(exact)
    assert agree >= 0.97, agree
