"""Stdlib AVI/MJPEG codec tests (operators/avi_codec.py): container
roundtrip, header-only frame offsets, sampling lattice, corrupt and
non-MJPEG handling, and the Spark frame-stats operator."""

from __future__ import annotations

import struct

import numpy as np

from anime_data_pipeline_spark.operators.avi_codec import (
    avi_frame_offsets,
    avi_meta,
    decode_avi_frames,
    encode_avi_mjpeg,
)


def _frames(n, h=24, w=32, base=40, step=5):
    return [np.full((h, w, 3), base + step * i, dtype=np.uint8) for i in range(n)]


def test_meta_and_offsets():
    data = encode_avi_mjpeg(_frames(9), fps=25)
    assert avi_meta(data) == (32, 24, 9, 25)
    offs = avi_frame_offsets(data)
    assert len(offs) == 9
    # every offset points at a JPEG SOI marker
    assert all(data[s : s + 2] == b"\xff\xd8" for s, _z in offs)


def test_sampling_lattice_and_pixels():
    data = encode_avi_mjpeg(_frames(10), fps=24)
    dec = decode_avi_frames(data, every_k=4)
    assert [i for i, _ in dec] == [0, 4, 8]
    for i, arr in dec:
        assert arr.shape == (24, 32, 3)
        # uniform fill at quality 85 decodes uniform within DC error
        assert arr.min() == arr.max()
        assert abs(int(arr.min()) - (40 + 5 * i)) <= 2


def test_grayscale_frames_and_single_frame():
    gray = [np.full((16, 16), 99, dtype=np.uint8)]
    data = encode_avi_mjpeg(gray, fps=12)
    assert avi_meta(data) == (16, 16, 1, 12)
    [(idx, arr)] = decode_avi_frames(data)
    assert idx == 0 and arr.min() == arr.max()


def test_corrupt_and_non_mjpeg():
    good = encode_avi_mjpeg(_frames(3), fps=24)
    assert avi_meta(b"RIFF\x0c\x00\x00\x00AVI LISTjunk") is None
    assert avi_meta(good[:40]) is None
    assert decode_avi_frames(b"not a riff") is None
    # foreign fourcc handler (e.g. H264) → unsupported → None
    h264 = bytearray(good)
    pos = good.find(b"vids") + 4
    h264[pos : pos + 4] = b"H264"
    assert avi_meta(bytes(h264)) is None
    # a frame with broken JPEG bytes is skipped, container still parses
    s, z = avi_frame_offsets(good)[1]
    broken = good[:s] + b"\xff\xd8" + b"\x00" * (z - 2) + good[s + z :]
    dec = decode_avi_frames(broken, every_k=1)
    assert [i for i, _ in dec] == [0, 2]


def test_sample_avi_frame_stats_operator(spark):
    from anime_data_pipeline_spark.operators.multimodal import (
        sample_avi_frame_stats,
    )

    rows = [
        (1, bytearray(encode_avi_mjpeg(_frames(6, base=100, step=10), fps=30))),
        (2, bytearray(b"RIFF\x0c\x00\x00\x00AVI LISTjunk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = sample_avi_frame_stats(df, every_k=4).collect()
    assert sorted((r["doc_id"], r["frame_idx"]) for r in out) == [(1, 0), (1, 4)]
    for r in out:
        assert (r["width"], r["height"], r["n_frames"], r["fps"]) == (32, 24, 6, 30)
        assert r["f_min"] == r["f_max"]
        assert abs(r["f_min"] - (100 + 10 * r["frame_idx"])) <= 2
