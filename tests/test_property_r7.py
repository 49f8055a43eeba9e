"""Hypothesis property tests for the round-7 operators: the SHARED
audio-quality feature core (the same function decode_audio_quality
calls per clip) against integer closed forms on encoded-then-decoded
square waves, and URL host parsing against a URL constructed from its
parts (inverse-function property)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# decode_audio_quality feature math: encode a random square wave, run
# the REAL decode+feature path (no Spark — the numpy core is shared),
# and compare every feature to its closed form.
# ---------------------------------------------------------------------------
@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=8, max_value=3000),
    half=st.integers(min_value=1, max_value=40),
    a=st.integers(min_value=0, max_value=32767),
    ch=st.integers(min_value=1, max_value=2),
)
def test_audio_quality_square_wave_closed_form(n, half, a, ch):
    from anime_data_pipeline_spark.operators.multimodal import audio_quality_features
    from anime_data_pipeline_spark.operators.wav_codec import decode_wav, encode_wav

    t = np.arange(n, dtype=np.int64)
    s = (a * (1 - 2 * ((t // half) % 2))).astype(np.int16)
    samples = np.stack([s] * ch, axis=1)
    decoded, rate = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000 and (decoded == samples).all()
    # the REAL shared feature core (the operator calls this function)
    feat = audio_quality_features(decoded, 32767.0)
    assert feat["rms"] == float(a) and feat["peak"] == float(a)
    assert feat["n_zero_cross"] == (0 if a == 0 else (n - 1) // half)
    assert feat["clip_rate"] == (1.0 if a >= 32767 else 0.0)
    assert feat["is_silence"] == (a == 0)
    assert feat["n_samples"] == n and feat["channels"] == ch


# ---------------------------------------------------------------------------
# url_host inverse property: host parsed back from a URL assembled
# from random (scheme, userinfo?, host, port?, path) parts must be
# exactly the lowercased host. One Spark job for the whole batch.
# ---------------------------------------------------------------------------
def test_url_host_inverse_property(spark):
    from pyspark.sql import functions as F

    from anime_data_pipeline_spark.operators.web import url_host

    import random

    rng = random.Random(11)
    labels = ["site", "a1", "x-y", "Sub", "deep-host", "n0de", "E2E", "qq"]
    cases = []
    for i in range(200):
        host = ".".join(rng.choice(labels) for _ in range(rng.randint(1, 3)))
        scheme = rng.choice(["http", "https", "ftp", "Ws+x"])
        user = rng.choice(["", "bob@", "u:p@", "trusted.com@"])
        port = rng.choice(["", ":8080", ":21"])
        path = rng.choice(["", "/", "/a/b?q=1#f", "/@weird"])
        cases.append((f"{scheme}://{user}{host}{port}{path}", host.lower()))
    df = spark.createDataFrame(cases, "u string, want string")
    bad = df.filter(url_host(F.col("u")) != F.col("want")).collect()
    assert not bad, f"url_host drift: {[(r['u'], r['want']) for r in bad[:5]]}"
