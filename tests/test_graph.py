"""PageRank (operators/graph.py) unit tests: agreement with an
INDEPENDENT dense numpy power iteration on a hand-made graph
(dangling node included), rank-mass conservation, and damping
behavior. The gate query q154 pins Spark↔DuckDB twin parity; these
pin the math itself against a third implementation."""

from __future__ import annotations

import numpy as np

from anime_data_pipeline_spark.operators.graph import pagerank

_EDGES = [
    (0, 1),
    (0, 2),
    (1, 2),
    (2, 0),
    (3, 2),
    (2, 4),
    # node 4 has no out-edges: dangling
]


def _numpy_pagerank(edges, n_iter=5, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        new = np.full(n, (1.0 - d) / n)
        dang = pr[out == 0].sum()
        new += d * dang / n
        for u, v in edges:
            new[idx[v]] += d * pr[idx[u]] / out[idx[u]]
        pr = new
    return {u: pr[idx[u]] for u in nodes}


def test_pagerank_matches_numpy(spark):
    df = spark.createDataFrame(_EDGES, "src long, dst long")
    got = {r["node"]: r["pr"] for r in pagerank(df, n_iter=5).collect()}
    want = _numpy_pagerank(_EDGES, n_iter=5)
    assert set(got) == set(want)
    for node in want:
        assert abs(got[node] - want[node]) < 1e-12, node


def test_pagerank_mass_conserved(spark):
    df = spark.createDataFrame(_EDGES, "src long, dst long")
    for it in (1, 3, 7):
        total = sum(r["pr"] for r in pagerank(df, n_iter=it).collect())
        assert abs(total - 1.0) < 1e-9, (it, total)


def test_pagerank_sink_accumulates(spark):
    """In 0→1→2 (a chain into a sink), rank must strictly increase
    down the chain."""
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r["node"]: r["pr"] for r in pagerank(df, n_iter=10).collect()}
    assert got[0] < got[1] < got[2]


# ---------------------------------------------------------------------------
# HITS (operators/graph.hits): independent dense numpy iteration twin,
# L1 normalization invariants, and hub/authority asymmetry.
# ---------------------------------------------------------------------------
from anime_data_pipeline_spark.operators.graph import hits  # noqa: E402


def _numpy_hits(edges, n_iter=5):
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    hub = np.full(n, 1.0 / n)
    auth = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        auth = np.zeros(n)
        for u, v in edges:
            auth[idx[v]] += hub[idx[u]]
        auth /= auth.sum()
        hub = np.zeros(n)
        for u, v in edges:
            hub[idx[u]] += auth[idx[v]]
        hub /= hub.sum()
    return {u: (hub[idx[u]], auth[idx[u]]) for u in nodes}


def test_hits_matches_numpy(spark):
    df = spark.createDataFrame(_EDGES, "src long, dst long")
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, n_iter=5).collect()}
    want = _numpy_hits(_EDGES, n_iter=5)
    assert set(got) == set(want)
    for node in want:
        assert abs(got[node][0] - want[node][0]) < 1e-12, ("hub", node)
        assert abs(got[node][1] - want[node][1]) < 1e-12, ("auth", node)


def test_hits_l1_normalized(spark):
    df = spark.createDataFrame(_EDGES, "src long, dst long")
    for it in (1, 3):
        rows = hits(df, n_iter=it).collect()
        assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-9
        assert abs(sum(r["auth"] for r in rows) - 1.0) < 1e-9


def test_hits_star_graph(spark):
    """Star 0→{1,2,3}: node 0 is the only hub (all hub mass), the
    leaves split authority evenly and have zero hub."""
    df = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src long, dst long")
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, n_iter=3).collect()}
    assert abs(got[0][0] - 1.0) < 1e-12 and abs(got[0][1]) < 1e-12
    for leaf in (1, 2, 3):
        assert abs(got[leaf][0]) < 1e-12
        assert abs(got[leaf][1] - 1.0 / 3) < 1e-12


# ---------------------------------------------------------------------------
# pointer_jump_roots: depth/root on a hand-made forest including a
# chain deep enough that resolution REQUIRES multiple doubling rounds.
# ---------------------------------------------------------------------------
from anime_data_pipeline_spark.operators.graph import pointer_jump_roots  # noqa: E402


def test_pointer_jump_deep_chain_and_forest(spark):
    # Chain 0←1←2←...←12 (depth 12 needs ceil(log2(12)) = 4 rounds)
    # plus a separate 2-node tree 100←101.
    rows = [(0, None), (100, None), (101, 100)] + [
        (i, i - 1) for i in range(1, 13)
    ]
    df = spark.createDataFrame(rows, "node long, parent long")
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in pointer_jump_roots(df, "node", "parent", n_rounds=4).collect()
    }
    for i in range(13):
        assert got[i] == (0, i), i
    assert got[100] == (100, 0)
    assert got[101] == (100, 1)


def test_pointer_jump_round_count_is_logarithmic(spark):
    """3 rounds resolve depth ≤ 8 but a depth-9 chain must NOT resolve
    to the root with only 3 rounds — pinning that the operator really
    doubles (2^k) rather than stepping (k)."""
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "node long, parent long")
    got3 = {
        r["node"]: (r["root"], r["depth"])
        for r in pointer_jump_roots(df, "node", "parent", n_rounds=3).collect()
    }
    assert got3[8] == (0, 8)          # depth 8 = 2^3 resolved
    assert got3[9] == (1, 8)          # depth 9: pointer stuck one hop short
    got4 = {
        r["node"]: (r["root"], r["depth"])
        for r in pointer_jump_roots(df, "node", "parent", n_rounds=4).collect()
    }
    assert got4[9] == (0, 9)
