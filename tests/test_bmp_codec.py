"""Stdlib BMP codec tests (operators/bmp_codec.py): roundtrip across
bit depths, stride padding, palette expansion, corrupt/unsupported
handling, and dispatch through the multimodal default decoder."""

from __future__ import annotations

import struct

import numpy as np

from anime_data_pipeline_spark.operators.bmp_codec import (
    bmp_meta,
    decode_bmp,
    encode_bmp,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


def test_roundtrip_24_and_32_bit():
    r = _rng(3)
    # widths chosen to hit every stride-padding remainder (w*3 % 4)
    for w in (5, 6, 7, 8):
        arr = r.integers(0, 256, (9, w, 3), dtype=np.uint8)
        assert bmp_meta(encode_bmp(arr)) == (w, 9, "RGB")
        assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)
    rgba = r.integers(0, 256, (4, 5, 4), dtype=np.uint8)
    assert bmp_meta(encode_bmp(rgba)) == (5, 4, "RGBA")
    assert np.array_equal(decode_bmp(encode_bmp(rgba)), rgba)


def test_roundtrip_palette_depths():
    r = _rng(11)
    for depth in (1, 4, 8):
        ncol = 1 << depth
        pal = r.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = r.integers(0, ncol, (6, 11), dtype=np.uint8)
        data = encode_bmp(idx, palette=pal, bit_depth=depth)
        assert bmp_meta(data) == (11, 6, "P")
        assert np.array_equal(decode_bmp(data), pal[idx])


def test_corrupt_and_unsupported():
    good = encode_bmp(_rng(9).integers(0, 256, (4, 4, 3), dtype=np.uint8))
    assert decode_bmp(b"XX" + good[2:]) is None  # wrong magic
    assert decode_bmp(good[:30]) is None  # truncated header
    assert decode_bmp(good[:-8]) is None  # truncated pixel data
    # RLE8 compression flag → unsupported → None
    rle = bytearray(good)
    rle[30:34] = struct.pack("<I", 1)
    assert decode_bmp(bytes(rle)) is None and bmp_meta(bytes(rle)) is None
    # top-down (negative height) → None
    td = bytearray(good)
    td[22:26] = struct.pack("<i", -4)
    assert decode_bmp(bytes(td)) is None
    # 16-bit bpp → unsupported
    b16 = bytearray(good)
    b16[28:30] = struct.pack("<H", 16)
    assert decode_bmp(bytes(b16)) is None


def test_default_decoder_dispatch():
    """BMP flows through the multimodal magic-byte dispatch for both
    header meta and full pixels, like PNG/GIF/JPEG."""
    from anime_data_pipeline_spark.operators.multimodal import (
        _decode_default,
        _decode_real,
        image_pixel_decoder_loader,
    )

    arr = _rng(21).integers(0, 256, (8, 6, 3), dtype=np.uint8)
    data = encode_bmp(arr)
    assert _decode_default(data) == (6, 8, "RGB")
    assert _decode_real(data) == (6, 8, "RGB")
    assert _decode_real(b"BM" + b"\x00" * 60) is None  # corrupt behind magic
    px = image_pixel_decoder_loader()()(data)
    assert np.array_equal(px, arr)


def test_bmp_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 16),
        w=st.integers(1, 16),
        ch=st.sampled_from([3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(h, w, ch, seed):
        arr = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
        out = decode_bmp(encode_bmp(arr))
        assert out is not None and np.array_equal(out, arr)

    roundtrip()


def test_rle_roundtrip_depths():
    """BI_RLE8 and BI_RLE4 encoded-run bodies roundtrip through the
    palette expansion, including single-pixel and >255-px-wide rows."""
    rng = _rng(31)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    for bd in (8, 4):
        for shape in ((9, 13), (3, 300), (1, 1)):
            idx = rng.integers(0, 16, shape, dtype=np.uint8)
            blob = encode_bmp(idx, palette=plte, bit_depth=bd, rle=True)
            meta = bmp_meta(blob)
            assert meta == (shape[1], shape[0], "P")
            out = decode_bmp(blob)
            assert out is not None and np.array_equal(out, plte[idx])


def test_rle_absolute_and_delta_escapes():
    """Hand-built BI_RLE8 stream (not via the encoder) exercising the
    absolute-mode (00 n>=3, word-aligned) and delta (00 02 dx dy)
    escapes; delta-skipped cells stay index 0 per the MS spec."""
    import struct as _s

    plte = np.arange(48, dtype=np.uint8).reshape(16, 3)
    quads = np.zeros((16, 4), dtype=np.uint8)
    quads[:, :3] = plte[:, ::-1]
    w, h = 6, 2
    body = bytes(
        [3, 5]              # bottom line: 3 px of index 5
        + [0, 3, 1, 2, 3, 0]  # absolute: 3 px (1,2,3) + pad byte
        + [0, 0]            # end of line
        + [2, 7]            # top line: 2 px of 7
        + [0, 2, 2, 0]      # delta: skip 2 cells (stay 0)
        + [2, 1]            # 2 px of 1
        + [0, 0]            # end of line
        + [0, 1]            # end of bitmap
    )
    offset = 14 + 40 + 64
    hdr = _s.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    info = _s.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(body), 0, 0, 16, 0)
    blob = hdr + info + quads.tobytes() + body
    out = decode_bmp(blob)
    assert out is not None
    expect_idx = np.array([[7, 7, 0, 0, 1, 1], [5, 5, 5, 1, 2, 3]], dtype=np.uint8)
    assert np.array_equal(out, plte[expect_idx])


def test_rle_corrupt_returns_none():
    rng = _rng(37)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 9), dtype=np.uint8)
    blob = encode_bmp(idx, palette=plte, rle=True)
    assert decode_bmp(blob[: len(blob) // 2]) is None  # truncated stream
    assert decode_bmp(blob[:-2]) is None  # missing end-of-bitmap
    mism = bytearray(blob)
    mism[30:34] = b"\x02\x00\x00\x00"  # RLE4 flag on an 8-bit image
    assert bmp_meta(bytes(mism)) is None and decode_bmp(bytes(mism)) is None


def test_rle_huge_canvas_header_returns_none():
    """A corrupt header claiming a giant canvas must not allocate it
    (the review-confirmed MemoryError escape): RLE path bounds h*w
    before np.zeros."""
    import struct as _s

    plte = _rng(41).integers(0, 256, (16, 3), dtype=np.uint8)
    idx = _rng(42).integers(0, 16, (9, 9), dtype=np.uint8)
    blob = bytearray(encode_bmp(idx, palette=plte, rle=True))
    blob[18:22] = _s.pack("<i", 1 << 30)  # width = 2^30
    assert decode_bmp(bytes(blob)) is None
    blob2 = bytearray(encode_bmp(idx, palette=plte, rle=True))
    blob2[22:26] = _s.pack("<i", 1 << 30)  # height = 2^30
    assert decode_bmp(bytes(blob2)) is None
