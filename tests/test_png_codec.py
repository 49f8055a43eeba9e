"""Stdlib PNG codec tests (operators/png_codec.py): roundtrip through
every filter type, palette expansion, corrupt/unsupported handling,
and the SURVEY S7 e2e — a REAL PNG decoded through decode_image_meta
into bucket assignment (reference bucket_manager.py:180-189), plus
full pixels through the inference preprocessing chain."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from anime_data_pipeline_spark.operators.png_codec import (
    PNG_MAGIC,
    decode_png,
    decode_png_palette,
    encode_png,
    palette_to_rgb,
    png_meta,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


def test_roundtrip_rgb_filter0():
    arr = _rng().integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


def test_roundtrip_gray_la_rgba():
    r = _rng(3)
    for ch in (1, 2, 4):
        arr = r.integers(0, 256, (9, 5, ch), dtype=np.uint8)
        out = decode_png(encode_png(arr))
        assert out.shape == (9, 5, ch)
        assert np.array_equal(out, arr)


def _encode_with_filters(arr: np.ndarray, ftypes: list[int]) -> bytes:
    """Re-encode using explicit per-row filter types (the encoder we
    ship always writes filter 0; decode must handle all five)."""
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        f = ftypes[y % len(ftypes)]
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = cur - left
        elif f == 2:  # Up
            enc = cur - prev
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[ch], 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def test_decode_all_five_filters():
    arr = _rng(11).integers(0, 256, (10, 8, 3), dtype=np.uint8)
    data = _encode_with_filters(arr, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), arr)


def test_palette_png():
    plte = _rng(5).integers(0, 256, (16, 3), dtype=np.uint8)
    idx = _rng(6).integers(0, 16, (6, 7, 1), dtype=np.uint8)
    # hand-build a color-type-3 PNG: encode_png writes type 0 for 1ch,
    # so patch IHDR color type and insert PLTE
    base = encode_png(idx)
    ihdr = struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 0)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # splice: MAGIC + IHDR(type3) + PLTE + rest-after-original-IHDR
    rest = base[8 + 12 + 13 :]  # skip magic + IHDR chunk
    data = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte.tobytes()) + rest
    assert png_meta(data) == (7, 6, "P")
    out = decode_png(data)
    assert np.array_equal(out, idx)
    got = palette_to_rgb(out, decode_png_palette(data))
    assert np.array_equal(got, plte[idx[..., 0]])


def test_corrupt_and_unsupported():
    arr = _rng(9).integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = encode_png(arr)
    assert decode_png(b"NOPE" + good[4:]) is None
    assert decode_png(good[:40]) is None
    # truncated IDAT body → zlib error → None
    assert png_meta(good) == (4, 4, "RGB")
    # spec-invalid bit depth (7) → corrupt → None
    bad_depth = bytearray(good)
    bad_depth[24] = 7
    assert png_meta(bytes(bad_depth)) is None
    # spec-invalid combo: 16-bit palette → corrupt → None
    bad_combo = bytearray(good)
    bad_combo[24], bad_combo[25] = 16, 3
    assert png_meta(bytes(bad_combo)) is None
    # depth patched to 16 on 8-bit data: meta parses (valid combo) but
    # the scanline byte count no longer matches → decode rejects
    lied = bytearray(good)
    lied[24] = 16
    assert png_meta(bytes(lied)) == (4, 4, "RGB")
    assert decode_png(bytes(lied)) is None


def test_16bit_roundtrip_and_preprocess():
    """16-bit gray + RGB roundtrip with TRUE uint16 sample values; the
    inference chain quantizes via integer /257 exactly as it does for
    any other uint16 input (reference dbimutils.py converts via PIL)."""
    from anime_data_pipeline_spark.operators.inference import normalize_pixels

    r = _rng(41)
    for ch in (1, 3):
        arr = r.integers(0, 65536, (11, 7, ch), dtype=np.uint16)
        out = decode_png(encode_png(arr))
        assert out.dtype == np.uint16 and out.shape == (11, 7, ch)
        assert np.array_equal(out, arr)
    full = np.full((2, 2, 3), 65535, dtype=np.uint16)
    assert np.array_equal(
        normalize_pixels(decode_png(encode_png(full))),
        np.full((2, 2, 3), 255, dtype=np.uint8),
    )


def test_sub8_gray_depths():
    """1/2/4-bit grayscale: raw levels rescale to the full 0..255 range
    (255, 85, 17 steps — exact because 2^d−1 divides 255)."""
    r = _rng(43)
    for depth in (1, 2, 4):
        levels = r.integers(0, 1 << depth, (9, 13), dtype=np.uint8)
        out = decode_png(encode_png(levels, bit_depth=depth))
        scale = 255 // ((1 << depth) - 1)
        assert out.shape == (9, 13, 1)
        assert np.array_equal(out[..., 0], levels * scale)


def test_sub8_palette_depths():
    """Palette PNGs at 1/2/4/8-bit index depth keep RAW indices; PLTE
    expansion happens in palette_to_rgb."""
    r = _rng(47)
    for depth in (1, 2, 4, 8):
        ncol = 1 << depth
        plte = r.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = r.integers(0, ncol, (6, 11), dtype=np.uint8)
        data = encode_png(idx, palette=plte, bit_depth=depth)
        assert png_meta(data) == (11, 6, "P")
        out = decode_png(data)
        assert np.array_equal(out[..., 0], idx)
        assert np.array_equal(palette_to_rgb(out, decode_png_palette(data)), plte[idx])


def test_adam7_interlaced_roundtrip():
    """Adam7 deinterlace across channel counts, depths, and the
    degenerate sizes where late passes are empty (w or h < pass
    offset) — the classic off-by-one zone of interlace code."""
    r = _rng(53)
    for h, w, ch in [(16, 16, 3), (13, 9, 1), (5, 3, 4), (1, 1, 1), (2, 10, 2), (8, 1, 3)]:
        arr = r.integers(0, 256, (h, w, ch), dtype=np.uint8)
        out = decode_png(encode_png(arr, interlace=1))
        assert out is not None, (h, w, ch)
        assert np.array_equal(out, arr), (h, w, ch)
    # 16-bit interlaced
    arr16 = r.integers(0, 65536, (10, 6, 3), dtype=np.uint16)
    assert np.array_equal(decode_png(encode_png(arr16, interlace=1)), arr16)
    # 4-bit palette interlaced
    plte = r.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = r.integers(0, 16, (7, 12), dtype=np.uint8)
    out = decode_png(encode_png(idx, palette=plte, bit_depth=4, interlace=1))
    assert np.array_equal(out[..., 0], idx)


def test_decode_image_meta_e2e_png_to_bucket(spark):
    """SURVEY S7 closure: real PNG bytes → decode_image_meta (default
    decoder, no injection) → aspect-ratio bucket assignment — the
    reference's bucket_manager.py:180-189 flow on an actual image."""
    from anime_data_pipeline_spark.operators.bucketing import (
        BucketConfig,
        assign_bucket_columns,
        select_bucket_py,
    )
    from anime_data_pipeline_spark.operators.multimodal import decode_image_meta

    r = _rng(21)
    blobs = [
        ("a.png", encode_png(r.integers(0, 256, (768, 1024, 3), dtype=np.uint8))),
        ("b.png", encode_png(r.integers(0, 256, (1024, 640, 4), dtype=np.uint8))),
        ("c.png", b"\x89PNG\r\n\x1a\nbroken"),
    ]
    df = spark.createDataFrame(blobs, "image_key string, content binary")
    meta = decode_image_meta(df)
    rows = {r["image_key"]: r["image_meta"] for r in meta.collect()}
    assert rows["a.png"]["width"] == 1024 and rows["a.png"]["height"] == 768
    assert rows["a.png"]["mode"] == "RGB"
    assert rows["b.png"]["mode"] == "RGBA"
    assert rows["c.png"] is None

    cfg = BucketConfig()
    imgs = (
        meta.filter(F_col("image_meta").isNotNull())
        .select(
            "image_key",
            F_col("image_meta.width").alias("width"),
            F_col("image_meta.height").alias("height"),
        )
    )
    assigned = {
        r["image_key"]: (r["bucket_w"], r["bucket_h"])
        for r in assign_bucket_columns(imgs, cfg=cfg).collect()
    }
    a_exp = select_bucket_py(1024, 768, cfg)
    b_exp = select_bucket_py(640, 1024, cfg)
    assert assigned["a.png"] == (a_exp["bucket_w"], a_exp["bucket_h"])
    assert assigned["b.png"] == (b_exp["bucket_w"], b_exp["bucket_h"])


def test_png_pixels_through_preprocess_chain():
    """Full pixel decode feeding the inference preprocessing math
    (reference dbimutils.py:6-26: pad-square-on-white → resize → BGR)."""
    from anime_data_pipeline_spark.operators.inference import (
        area_resize,
        make_square_white,
    )
    from anime_data_pipeline_spark.operators.multimodal import (
        png_pixel_decoder_loader,
    )

    decode = png_pixel_decoder_loader()()
    arr = _rng(33).integers(0, 256, (30, 50, 3), dtype=np.uint8)
    px = decode(encode_png(arr))
    assert np.array_equal(px, arr)
    sq = make_square_white(px, 50)
    assert sq.shape == (50, 50, 3)
    small = area_resize(sq, 25)
    assert small.shape == (25, 25, 3)
    assert decode(b"not a png") is None


def F_col(name):
    from pyspark.sql import functions as F

    return F.col(name)


def test_png_roundtrip_property():
    """Property: encode→decode is identity for arbitrary uint8 arrays
    across all channel counts and degenerate sizes (1×1, 1×N, N×1)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        ch=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(h, w, ch, seed):
        arr = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
        out = decode_png(encode_png(arr))
        assert out is not None and out.shape == (h, w, ch)
        assert np.array_equal(out, arr)

    roundtrip()
