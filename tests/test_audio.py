"""Audio multimodal plumbing: FAUD decode + chunking plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anime_data_pipeline_spark.operators.multimodal import (
    audio_chunk_plan,
    decode_audio_meta,
    encode_faud,
)


@pytest.fixture(scope="module")
def audio_df(spark):
    rows = [
        ("a0", encode_faud(16000, 16000 * 95, 1, b"pcm0")),   # 95 s mono
        ("a1", encode_faud(44100, 44100 * 10, 2, b"pcm1")),   # 10 s stereo
        ("a2", encode_faud(8000, 0, 1)),                      # empty clip
        ("bad", b"RIFF-not-faud"),
    ]
    return spark.createDataFrame(rows, "audio_key string, content binary")


def test_decode_audio_meta(audio_df):
    out = {r["audio_key"]: r["audio_meta"] for r in decode_audio_meta(audio_df).collect()}
    assert out["a0"]["sample_rate"] == 16000
    assert out["a0"]["duration_s"] == pytest.approx(95.0)
    assert out["a1"]["channels"] == 2
    assert out["a2"]["n_samples"] == 0
    assert out["bad"] is None


def test_audio_chunk_plan(audio_df):
    decoded = decode_audio_meta(audio_df).filter(F.col("audio_meta").isNotNull())
    chunks = audio_chunk_plan(decoded, chunk_s=30.0)
    by_key = {}
    for r in chunks.collect():
        by_key.setdefault(r["audio_key"], []).append(
            (r["chunk_no"], r["start_sample"], r["end_sample"])
        )
    # 95 s at 30 s chunks → 4 chunks, last one partial
    a0 = sorted(by_key["a0"])
    assert len(a0) == 4
    assert a0[0] == (0, 0, 16000 * 30)
    assert a0[3] == (3, 16000 * 90, 16000 * 95)
    # 10 s clip → single partial chunk
    assert sorted(by_key["a1"]) == [(0, 0, 44100 * 10)]
    # empty clip still yields one empty chunk row (0, 0, 0)
    assert sorted(by_key["a2"]) == [(0, 0, 0)]
