"""Behavioral tests for the corpus-hygiene operators: benchmark
contamination (train/eval n-gram overlap), unigram-LM scoring, and
video frame sampling."""

from __future__ import annotations

import math

import pytest

from anime_data_pipeline_spark.functions.hashing import P, polyhash_py
from anime_data_pipeline_spark.operators.dedup import benchmark_contamination
from anime_data_pipeline_spark.operators.multimodal import (
    encode_fvid,
    sample_video_frames,
)
from anime_data_pipeline_spark.operators.terms import unigram_logprob


def test_contamination_flags_overlapping_doc(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # contains the bench trigram "beta gamma delta"
            (1, "intro words then beta gamma delta closing words"),
            # token-disjoint from the benchmark
            (2, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc"]: r
        for r in benchmark_contamination(
            corpus, bench, "doc_id", "text", n=3
        ).collect()
    }
    assert rows[1]["n_hits"] > 0
    assert rows[2]["n_hits"] == 0
    assert rows[2]["overlap_frac"] == 0.0
    # hit shingles are a subset of the doc's shingles
    assert 0 < rows[1]["overlap_frac"] <= 1.0


def test_contamination_min_overlap_filters(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "unrelated words entirely here")],
        "doc_id long, text string",
    )
    out = benchmark_contamination(
        corpus, bench, "doc_id", "text", n=3, min_overlap=0.5
    )
    assert [r["doc"] for r in out.collect()] == [1]


def test_unigram_logprob_hand_computed(spark):
    # corpus: doc1 = "a a b", doc2 = "b" → counts: a=2, b=2, total=4
    # p(a)=0.5, p(b)=0.5 → every token nll = ln 2
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b")], "doc_id long, text string"
    )
    rows = {r["doc"]: r for r in unigram_logprob(df, "doc_id", "text").collect()}
    assert rows[1]["n_tokens"] == 3
    assert rows[2]["n_tokens"] == 1
    assert rows[1]["mean_nll"] == pytest.approx(math.log(2.0))
    assert rows[2]["mean_nll"] == pytest.approx(math.log(2.0))


def test_unigram_logprob_rare_tokens_score_higher(spark):
    df = spark.createDataFrame(
        [(1, "common common common common"), (2, "rareword")],
        "doc_id long, text string",
    )
    rows = {r["doc"]: r for r in unigram_logprob(df, "doc_id", "text").collect()}
    assert rows[2]["mean_nll"] > rows[1]["mean_nll"]


def test_video_frame_sampling_lattice_and_hash(spark):
    payload = b"framepayload"
    df = spark.createDataFrame(
        [
            (1, encode_fvid(10, 24, payload)),  # frames 0..9 → sample 0,4,8
            (2, b"corrupt"),  # no FVID magic → dropped
            (3, encode_fvid(1, 24, b"x")),  # single frame → sample 0
        ],
        "doc_id long, content binary",
    )
    out = sample_video_frames(df, "content", every_k=4).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(r["frame_idx"] for r in by_doc[1]) == [0, 4, 8]
    assert 2 not in by_doc
    assert [r["frame_idx"] for r in by_doc[3]] == [0]
    ph = polyhash_py(payload.decode())
    expect = {i: (ph * 31 + i) % P for i in (0, 4, 8)}
    for r in by_doc[1]:
        assert r["frame_hash"] == expect[r["frame_idx"]]
