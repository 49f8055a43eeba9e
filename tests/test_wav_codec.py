"""Stdlib WAV codec tests (operators/wav_codec.py): roundtrip across
bit depths/channels, chunk-walk robustness (extra LIST chunks, odd-size
padding), corrupt/unsupported handling, and the multimodal dispatch."""

from __future__ import annotations

import struct

import numpy as np

from anime_data_pipeline_spark.operators.wav_codec import (
    decode_wav,
    encode_wav,
    wav_meta,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


def test_roundtrip_depths_and_channels():
    r = _rng(3)
    for dt, lo, hi in ((np.uint8, 0, 256), (np.int16, -32768, 32768), (np.int32, -2**31, 2**31)):
        for ch in (1, 2, 4):
            a = r.integers(lo, hi, (101, ch)).astype(dt)
            data = encode_wav(a, 22050)
            bits = a.dtype.itemsize * 8
            assert wav_meta(data) == (22050, 101, ch, bits)
            out, rate = decode_wav(data)
            assert rate == 22050 and out.dtype == a.dtype
            assert np.array_equal(out, a)


def test_mono_1d_and_odd_data_padding():
    # odd byte count (uint8, odd n) exercises the RIFF pad byte
    a = _rng(5).integers(0, 256, 33, dtype=np.uint8)
    out, rate = decode_wav(encode_wav(a, 8000))
    assert np.array_equal(out[:, 0], a) and rate == 8000


def test_extra_chunks_skipped():
    """LIST/fact chunks before data must be walked over, per spec."""
    a = _rng(9).integers(-1000, 1000, (10, 2)).astype(np.int16)
    data = encode_wav(a, 16000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = data[:fmt_end] + lst + data[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert wav_meta(spliced) == (16000, 10, 2, 16)
    out, _ = decode_wav(spliced)
    assert np.array_equal(out, a)


def test_corrupt_and_unsupported():
    good = encode_wav(_rng(11).integers(-99, 99, (20, 1)).astype(np.int16), 8000)
    assert decode_wav(b"XIFF" + good[4:]) is None          # wrong magic
    assert decode_wav(good[:8] + b"AVEW" + good[12:]) is None  # not WAVE
    assert decode_wav(good[:30]) is None                   # truncated
    assert decode_wav(b"RIFF\x10\x00\x00\x00WAVEjunk") is None  # q178's corrupt blob
    # IEEE-float flag on a 16-bit body → structurally invalid
    ieee = bytearray(good)
    ieee[20:22] = struct.pack("<H", 3)
    assert decode_wav(bytes(ieee)) is None and wav_meta(bytes(ieee)) is None
    # genuinely unsupported codecs: MS ADPCM (2), extensible (0xFFFE)
    for code in (2, 0xFFFE):
        ms = bytearray(good)
        ms[20:22] = struct.pack("<H", code)
        assert decode_wav(bytes(ms)) is None and wav_meta(bytes(ms)) is None
    # data size not a frame multiple → corrupt
    bad = bytearray(good)
    bad[40:44] = struct.pack("<I", 39)
    assert decode_wav(bytes(bad)) is None


def test_audio_meta_dispatch_and_sample_stats(spark):
    """Real WAV flows through decode_audio_meta next to FAUD stubs, and
    the full-PCM stats path reproduces a known fill."""
    from anime_data_pipeline_spark.operators.multimodal import (
        decode_audio_meta,
        decode_audio_sample_stats,
        encode_faud,
    )

    wav = encode_wav(np.full((500, 2), -7, dtype=np.int16), 16000)
    rows = [
        (1, bytearray(wav)),
        (2, bytearray(encode_faud(8000, 123, 1))),
        (3, bytearray(b"RIFF\x10\x00\x00\x00WAVEjunk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in decode_audio_sample_stats(decode_audio_meta(df)).collect()}
    m1 = out[1]["audio_meta"]
    assert (m1["sample_rate"], m1["n_samples"], m1["channels"]) == (16000, 500, 2)
    s1 = out[1]["sample_stats"]
    assert (s1["s_min"], s1["s_max"], s1["s_mean"]) == (-7, -7, -7.0)
    assert out[2]["audio_meta"]["sample_rate"] == 8000  # FAUD still works
    assert out[2]["sample_stats"] is None  # stub has no PCM body
    assert out[3]["audio_meta"] is None and out[3]["sample_stats"] is None


def test_float32_roundtrip_and_fact():
    r = _rng(17)
    a = (r.integers(-4000, 4000, (333, 2))).astype(np.float32)
    blob = encode_wav(a, 16000, fmt="float32")
    assert wav_meta(blob) == (16000, 333, 2, 32)
    out, rate = decode_wav(blob)
    assert out.dtype == np.float32 and np.array_equal(out, a) and rate == 16000


def test_g711_codebook_values_roundtrip_exactly():
    from anime_data_pipeline_spark.operators.wav_codec import (
        _ALAW_TABLE,
        _ULAW_TABLE,
    )

    # known G.711 extremes pin the closed-form tables to the spec
    assert int(_ULAW_TABLE.max()) == 32124 and int(_ULAW_TABLE.min()) == -32124
    assert int(_ALAW_TABLE.max()) == 32256 and int(_ALAW_TABLE.min()) == -32256
    for fmt, table in (("ulaw", _ULAW_TABLE), ("alaw", _ALAW_TABLE)):
        vals = np.sort(np.unique(table)).astype(np.int16)[:, None]
        blob = encode_wav(vals, 8000, fmt=fmt)
        assert wav_meta(blob) == (8000, len(vals), 1, 8)
        out, _ = decode_wav(blob)
        assert out.dtype == np.int16 and np.array_equal(out, vals)


def test_g711_quantization_error_bounded():
    r = _rng(23)
    x = r.integers(-32000, 32000, (5000, 1)).astype(np.int16)
    for fmt in ("ulaw", "alaw"):
        out, _ = decode_wav(encode_wav(x, 8000, fmt=fmt))
        err = np.abs(out.astype(np.int32) - x.astype(np.int32))
        # half the widest segment's quantization interval
        assert int(err.max()) <= 512


def test_ima_adpcm_constant_is_exact():
    for ch in (1, 2):
        for n in (1, 504, 505, 506, 1200):
            x = np.full((n, ch), -7936, dtype=np.int16)
            blob = encode_wav(x, 16000, fmt="ima_adpcm")
            # fact chunk carries the true count through partial blocks
            assert wav_meta(blob) == (16000, n, ch, 4)
            out, rate = decode_wav(blob)
            assert out.shape == (n, ch) and (out == -7936).all() and rate == 16000


def test_ima_adpcm_tracks_signal():
    t = np.linspace(0, 25, 4000)
    x = (np.sin(t) * 9000).astype(np.int16)[:, None]
    out, _ = decode_wav(encode_wav(x, 16000, fmt="ima_adpcm"))
    err = np.abs(out.astype(np.int32) - x.astype(np.int32)).astype(np.float64)
    assert float(err.mean()) < 50  # ~4-bit quantization noise, no drift
    stereo = np.stack([x[:, 0], -x[:, 0]], axis=1)
    out2, _ = decode_wav(encode_wav(stereo, 16000, fmt="ima_adpcm"))
    err2 = np.abs(out2.astype(np.int32) - stereo.astype(np.int32)).astype(np.float64)
    assert float(err2.mean()) < 50  # channel de-interleave holds


def test_ima_adpcm_corrupt_returns_none():
    x = np.full((1200, 2), 512, dtype=np.int16)
    blob = encode_wav(x, 16000, fmt="ima_adpcm")
    # step index > 88 in a block header
    bad = bytearray(blob)
    data_at = blob.find(b"data") + 8
    bad[data_at + 2] = 200
    assert decode_wav(bytes(bad)) is None
    # fact chunk claiming more samples than the blocks hold
    more = bytearray(blob)
    fact_at = blob.find(b"fact") + 8
    more[fact_at : fact_at + 4] = struct.pack("<I", 10**6)
    assert decode_wav(bytes(more)) is None
    # truncated mid-block
    assert decode_wav(blob[: len(blob) // 2]) is None


def test_pcm24_roundtrip():
    r = _rng(29)
    x = r.integers(-(2**23), 2**23, (1001, 2)).astype(np.int32)
    blob = encode_wav(x, 48000, fmt="pcm24")
    assert wav_meta(blob) == (48000, 1001, 2, 24)
    out, rate = decode_wav(blob)
    assert out.dtype == np.int32 and np.array_equal(out, x) and rate == 48000
    # extremes sign-extend correctly
    edge = np.array([[-(2**23)], [2**23 - 1], [0], [-1]], dtype=np.int32)
    out2, _ = decode_wav(encode_wav(edge, 8000, fmt="pcm24"))
    assert np.array_equal(out2, edge)


def test_float_nan_payload_is_corrupt_clip(spark):
    """A float32 WAV whose payload bytes decode to NaN must surface as
    a null-stats row (dropped-with-count), not a task crash — and
    normal float clips keep a floor/ceil integer envelope."""
    from pyspark.sql import types as T

    from anime_data_pipeline_spark.operators.multimodal import (
        decode_audio_meta,
        decode_audio_sample_stats,
    )

    good = encode_wav(np.array([[0.25], [-0.75]], dtype=np.float32), 8000,
                      fmt="float32")
    nan_blob = bytearray(good)
    data_at = good.find(b"data") + 8
    nan_blob[data_at : data_at + 4] = b"\xff\xff\xff\xff"  # NaN sample
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("content", T.BinaryType())]
    )
    df = spark.createDataFrame([(1, good), (2, bytes(nan_blob))], schema)
    out = {r["doc_id"]: r for r in
           decode_audio_sample_stats(decode_audio_meta(df)).collect()}
    s1 = out[1]["sample_stats"]
    assert (s1["s_min"], s1["s_max"]) == (-1, 1)  # floor(-0.75), ceil(0.25)
    assert abs(s1["s_mean"] - (0.25 - 0.75) / 2) < 1e-12
    assert out[2]["sample_stats"] is None  # NaN payload: corrupt clip


def test_crafted_fact_rejected_at_header_time():
    """wav_meta (the header-only chunk-planning path) must reject a fact
    chunk claiming more samples than the data chunk can decode — before
    the fix, a ~60-byte crafted ADPCM header planned millions of chunk
    rows (r6 advice: wav_codec.py:157)."""
    x = np.full((1200, 2), 512, dtype=np.int16)
    blob = encode_wav(x, 16000, fmt="ima_adpcm")
    fact_at = blob.find(b"fact") + 8
    for claim in (10**6, 2**32 - 1):
        bad = bytearray(blob)
        bad[fact_at:fact_at + 4] = struct.pack("<I", claim)
        assert wav_meta(bytes(bad)) is None
        assert decode_wav(bytes(bad)) is None
    # fact at (or slightly under) true capacity still plans fine
    assert wav_meta(blob) == (16000, 1200, 2, 4)
