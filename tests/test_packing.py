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
