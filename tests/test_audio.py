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


def test_decode_audio_quality_features(spark):
    """Closed-form feature checks on hand-built clips: silence,
    hard-clip, square-wave ZCR, stereo downmix, corrupt → null."""
    import numpy as np

    from anime_data_pipeline_spark.operators.multimodal import decode_audio_quality
    from anime_data_pipeline_spark.operators.wav_codec import encode_wav

    t = np.arange(1000, dtype=np.int64)
    sq = (700 * (1 - 2 * ((t // 4) % 2))).astype(np.int16)[:, None]
    clips = [
        ("silence", encode_wav(np.zeros((500, 1), np.int16), 8000)),
        ("clipped", encode_wav(np.full((400, 1), 32767, np.int16), 8000)),
        ("square", encode_wav(sq, 16000)),
        # anti-phase stereo: the downmix cancels, but energy/clip must
        # be computed per channel sample — this is NOT silence
        ("cancel", encode_wav(np.stack([sq[:, 0], -sq[:, 0]], axis=1), 16000)),
        # one channel hard-pinned, the other quiet: per-channel clip
        # detection must see it even though the downmix never rails
        ("halfclip", encode_wav(
            np.stack([np.full(300, 32767, np.int16), np.zeros(300, np.int16)], axis=1),
            8000)),
        # 24-bit PCM pinned at ±(2^23-1): decoded dtype is int32, but
        # full scale is the CONTAINER's rail
        ("clip24", encode_wav(np.full((256, 1), 8388607, np.int32), 8000,
                              fmt="pcm24")),
        ("corrupt", b"RIFF\x04\x00\x00\x00WAVE"),
    ]
    df = spark.createDataFrame(clips, "name string, content binary")
    rows = {r["name"]: r["audio_quality"] for r in decode_audio_quality(df).collect()}
    assert rows["corrupt"] is None
    s = rows["silence"]
    assert s["is_silence"] and s["rms"] == 0.0 and s["n_zero_cross"] == 0
    c = rows["clipped"]
    assert c["clip_rate"] == 1.0 and c["peak"] == 32767.0 and not c["is_silence"]
    q = rows["square"]
    assert q["rms"] == 700.0 and q["peak"] == 700.0
    assert q["n_zero_cross"] == (1000 - 1) // 4 and q["clip_rate"] == 0.0
    x = rows["cancel"]
    assert x["channels"] == 2 and not x["is_silence"] and x["rms"] == 700.0
    assert x["n_zero_cross"] == 0  # the downmix is flat
    h = rows["halfclip"]
    assert h["clip_rate"] == 0.5 and h["peak"] == 32767.0
    c24 = rows["clip24"]
    assert c24["clip_rate"] == 1.0 and c24["peak"] == 8388607.0


def test_brute_force_topk_exclude_self(spark):
    from anime_data_pipeline_spark.operators.similarity import brute_force_topk

    rows = [(i, [float(i), 1.0]) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 3)
    with_self = brute_force_topk(df, q, "vec_id", "embedding", k=2)
    assert [r["vec_id"] for r in with_self.orderBy("rank").collect()][0] == 3
    without = brute_force_topk(df, q, "vec_id", "embedding", k=4, exclude_self=True)
    got = [r["vec_id"] for r in without.orderBy("rank").collect()]
    assert 3 not in got and len(got) == 4
