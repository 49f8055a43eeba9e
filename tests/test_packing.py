"""Sequence-packing semantics: the distributed applyInPandas greedy
packer must reproduce the pure-Python spec group by group, and both
packing variants must respect the budget invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.operators.packing import (
    chunk_by_budget,
    pack_greedy,
    pack_greedy_py,
)
from anime_data_pipeline_spark.operators.textstats import ws_token_count

_BUDGET = 256


def _weighted(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", ws_token_count(F.col("text")).alias("n_tokens")
    )


def test_greedy_matches_python_spec(spark, sf_dir):
    docs = _weighted(spark, sf_dir)
    out = pack_greedy(docs, "source", "doc_id", "n_tokens", _BUDGET)
    rows = out.collect()
    by_group: dict[str, list] = {}
    for r in rows:
        by_group.setdefault(r["source"], []).append(r)
    for src, grp in by_group.items():
        grp.sort(key=lambda r: r["doc_id"])
        expect = pack_greedy_py([r["n_tokens"] for r in grp], _BUDGET)
        got = [r["chunk_id"] for r in grp]
        assert got == expect, src


def test_greedy_chunks_respect_budget(spark, sf_dir):
    docs = _weighted(spark, sf_dir)
    out = pack_greedy(docs, "source", "doc_id", "n_tokens", _BUDGET)
    per_chunk = (
        out.groupBy("source", "chunk_id")
        .agg(F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in per_chunk:
        # a chunk only exceeds the budget when a single oversize doc owns it
        assert r["total"] <= _BUDGET or r["n"] == 1, r


def test_chunk_by_budget_offsets_consistent(spark, sf_dir):
    docs = _weighted(spark, sf_dir)
    out = chunk_by_budget(docs, "source", "doc_id", "n_tokens", _BUDGET).collect()
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    for grp in by_group.values():
        grp.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in grp:
            assert r["chunk_id"] == cum // _BUDGET
            assert r["chunk_offset"] == cum % _BUDGET
            cum += r["n_tokens"]


def test_vectorized_chase_matches_spec():
    """pack_greedy_np (searchsorted chunk-chase) is byte-identical to
    the pure-Python spec, including oversize and zero-weight docs."""
    import random

    from anime_data_pipeline_spark.operators.packing import pack_greedy_np

    rng = random.Random(7)
    cases = [
        [],
        [300],            # oversize alone
        [300, 0],         # zero-weight after oversize opens a new chunk
        [0, 0, 0],
        [256, 256, 256],  # exact fits
        [255, 1, 1, 255],
        [rng.randrange(0, 400) for _ in range(5000)],
        [rng.randrange(1, 40) for _ in range(5000)],
    ]
    for ws in cases:
        assert pack_greedy_np(ws, _BUDGET).tolist() == pack_greedy_py(ws, _BUDGET), ws


def test_barriered_packing_fans_out_hot_group(spark):
    """One group holding 90% of rows: barrier mode must split it into
    many independent packing units, and the output must equal
    pack_greedy_py applied per barrier window with exact chunk-id
    stitching (contiguous ids, 0-based, per group)."""
    rows = [("hot", i, 30 + (i * 7) % 50) for i in range(9000)]
    # cold groups stay under one barrier window (120 docs × 25 = 3000
    # tokens < 4096) so their packing must equal the global greedy
    rows += [(f"cold{i % 5}", 100000 + i, 25) for i in range(600)]
    docs = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    barrier = 4096
    out = pack_greedy(
        docs, "source", "doc_id", "n_tokens", _BUDGET, barrier_tokens=barrier
    ).collect()

    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    hot = sorted(by_group["hot"], key=lambda r: r["doc_id"])

    # expected: split at cumulative-token barriers, fresh pack each
    # window, offset by chunks of earlier windows
    cum = 0
    windows: dict[int, list] = {}
    for r in hot:
        windows.setdefault(cum // barrier, []).append(r)
        cum += r["n_tokens"]
    assert len(windows) > 50, "hot group did not fan out"
    offset = 0
    expect = {}
    for b in sorted(windows):
        ids = pack_greedy_py([r["n_tokens"] for r in windows[b]], _BUDGET)
        for r, cid in zip(windows[b], ids):
            expect[r["doc_id"]] = offset + cid
        offset += max(ids) + 1
    got = {r["doc_id"]: r["chunk_id"] for r in hot}
    assert got == expect

    # cold groups small enough to fit one window → identical to global
    for src in (s for s in by_group if s != "hot"):
        grp = sorted(by_group[src], key=lambda r: r["doc_id"])
        assert [r["chunk_id"] for r in grp] == pack_greedy_py(
            [r["n_tokens"] for r in grp], _BUDGET
        )
