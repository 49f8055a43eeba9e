"""Bloom-prefilter contamination (operators/dedup.py:
bloom_contamination): the exact-hit count must be invariant to the
filter size (FPs are always verified away), and a tiny filter must
actually produce false positives."""

from __future__ import annotations

from pyspark.sql import functions as F

from anime_data_pipeline_spark.operators.dedup import (
    benchmark_contamination,
    bloom_contamination,
)


def _tables(spark):
    bench = spark.createDataFrame(
        [(0, "a b c d e f g h i j")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l"),  # contains bench shingles
            (2, "z y x w v u t s r q p o"),  # clean
        ],
        "doc_id long, text string",
    )
    return corpus, bench


def test_true_hits_invariant_to_filter_size(spark):
    corpus, bench = _tables(spark)
    exact = {
        r["doc"]: r["n_hits"]
        for r in benchmark_contamination(corpus, bench, "doc_id", "text", n=8).collect()
    }
    for m in (1 << 6, 1 << 10, 1 << 16):
        out = {
            r["doc"]: r
            for r in bloom_contamination(
                corpus, bench, "doc_id", "text", n=8, m_bits=m
            ).collect()
        }
        assert {d: r["n_true"] for d, r in out.items()} == exact, m
        # flagged is a superset of true hits, FPs are the difference
        for r in out.values():
            assert r["n_flagged"] >= r["n_true"]
            assert r["n_false_pos"] == r["n_flagged"] - r["n_true"]


def test_rejects_invalid_filter_size(spark):
    corpus, bench = _tables(spark)
    import pytest

    with pytest.raises(ValueError):
        bloom_contamination(corpus, bench, "doc_id", "text", n=8, m_bits=16)


def _py_shingles(text: str, n: int) -> set[int]:
    from anime_data_pipeline_spark.functions.hashing import P, polyhash_py

    th = [polyhash_py(t) for t in text.split(" ") if t]
    out = set()
    for i in range(len(th) - n + 1):
        v = th[i]
        for j in range(1, n):
            v = (v * 31 + th[i + j]) % P
        out.add(v)
    return out


def test_flagged_set_matches_pure_python_mirror(spark):
    """End-to-end check of the bitmap machinery — including any false
    positives — against an independent pure-Python computation with the
    same deterministic hash family, at a deliberately small m."""
    from anime_data_pipeline_spark.functions.hashing import P, perm_constants

    n, m, j = 8, 32, 4
    corpus, bench = _tables(spark)
    consts = perm_constants(20 + j)[20 : 20 + j]
    bench_sh = set().union(
        *[_py_shingles(r["text"], n) for r in bench.collect()]
    )
    bits = {
        ((a * sh + b) % P) % m for sh in bench_sh for (a, b) in consts
    }
    expect = {}
    for r in corpus.collect():
        sh = _py_shingles(r["text"], n)
        flagged = {
            h
            for h in sh
            if all(((a * h + b) % P) % m in bits for (a, b) in consts)
        }
        expect[r["doc_id"]] = (len(sh), len(flagged), len(flagged & bench_sh))
    out = {
        r["doc"]: (r["n_shingles"], r["n_flagged"], r["n_true"])
        for r in bloom_contamination(
            corpus, bench, "doc_id", "text", n=n, m_bits=m, n_hash=j
        ).collect()
    }
    assert out == expect
