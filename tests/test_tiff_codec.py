"""Baseline-TIFF codec (operators/tiff_codec.py): roundtrips across
the full supported matrix (both byte orders × none/LZW/PackBits ×
predictor × strip sizes × gray/RGB/RGBA/palette/WhiteIsZero), a
hand-assembled spec-literal file (external pinning — a decoder bug
mirrored into the encoder can't hide), TIFF-LZW width-bump / early
change / table-reset coverage, and the corrupt/unsupported → None
contract the mapInPandas decode stages rely on."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from anime_data_pipeline_spark.operators.tiff_codec import (
    TIFF_MAGICS,
    _lzw_decode,
    _lzw_encode,
    _unpackbits,
    decode_tiff,
    encode_tiff,
    tiff_meta,
)


@pytest.mark.parametrize("byte_order", ["<", ">"])
@pytest.mark.parametrize(
    "compression,predictor", [(1, 1), (5, 1), (5, 2), (32773, 1), (32773, 2)]
)
@pytest.mark.parametrize("rows_per_strip", [None, 4])
@pytest.mark.parametrize("shape", [(13, 17), (13, 17, 3), (13, 17, 4)])
def test_roundtrip_matrix(byte_order, compression, predictor, rows_per_strip, shape):
    rng = np.random.default_rng(sum(shape) + compression + predictor)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    blob = encode_tiff(
        arr,
        byte_order=byte_order,
        compression=compression,
        predictor=predictor,
        rows_per_strip=rows_per_strip,
    )
    assert blob[:4] in TIFF_MAGICS
    expected = arr if arr.ndim == 3 else arr[:, :, None]
    w, h, mode = tiff_meta(blob)
    assert (w, h) == (17, 13)
    assert mode == {1: "L", 3: "RGB", 4: "RGBA"}[expected.shape[2]]
    out = decode_tiff(blob)
    assert out is not None and out.shape == expected.shape
    assert (out == expected).all()


@pytest.mark.parametrize("compression", [1, 5, 32773])
def test_palette_expands_to_rgb(compression):
    rng = np.random.default_rng(11)
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(9, 11), dtype=np.uint8)
    blob = encode_tiff(idx, palette=plte, compression=compression)
    assert tiff_meta(blob) == (11, 9, "P")
    out = decode_tiff(blob)
    assert out is not None and out.shape == (9, 11, 3)
    assert (out == plte[idx]).all()


def test_whiteiszero_inverts():
    g = np.arange(35, dtype=np.uint8).reshape(5, 7)
    blob = encode_tiff(255 - g, photometric=0)
    assert tiff_meta(blob) == (7, 5, "L")
    assert (decode_tiff(blob)[:, :, 0] == g).all()


def test_handassembled_spec_literal_file():
    """A 3x2 8-bit gray little-endian TIFF written byte-by-byte from
    the TIFF 6.0 spec (not via encode_tiff) must decode — pins the
    decoder to the spec independently of the encoder."""
    pixels = bytes([10, 20, 30, 40, 50, 60])  # rows (10,20,30), (40,50,60)
    ifd_off = 8 + 6  # header + pixel strip

    def entry(tag, typ, count, value):
        return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", value)

    ifd = struct.pack("<H", 9)
    ifd += entry(256, 3, 1, 3)  # ImageWidth
    ifd += entry(257, 3, 1, 2)  # ImageLength
    ifd += entry(258, 3, 1, 8)  # BitsPerSample
    ifd += entry(259, 3, 1, 1)  # Compression: none
    ifd += entry(262, 3, 1, 1)  # Photometric: BlackIsZero
    ifd += entry(273, 4, 1, 8)  # StripOffsets
    ifd += entry(277, 3, 1, 1)  # SamplesPerPixel
    ifd += entry(278, 3, 1, 2)  # RowsPerStrip
    ifd += entry(279, 4, 1, 6)  # StripByteCounts
    ifd += struct.pack("<I", 0)  # next IFD: none
    blob = b"II*\x00" + struct.pack("<I", ifd_off) + pixels + ifd
    assert tiff_meta(blob) == (3, 2, "L")
    out = decode_tiff(blob)
    assert out.shape == (2, 3, 1)
    assert out.reshape(-1).tolist() == [10, 20, 30, 40, 50, 60]


def test_lzw_width_bumps_and_table_reset():
    """>4k distinct LZW entries forces 9→10→11→12-bit widths AND a
    mid-stream table reset; random bytes maximize table growth."""
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(150, 200, 3), dtype=np.uint8)
    blob = encode_tiff(arr, compression=5, rows_per_strip=50)
    out = decode_tiff(blob)
    assert out is not None and (out == arr).all()


def test_lzw_stream_roundtrip_property():
    @settings(max_examples=60, deadline=None)
    @given(data=st.binary(min_size=0, max_size=4000))
    def check(data):
        assert _lzw_decode(_lzw_encode(data), len(data)) == data

    check()


def test_packbits_runs_and_literals():
    row = bytes([7] * 200 + [1, 2, 3] + [9] * 2 + [4])
    from anime_data_pipeline_spark.operators.tiff_codec import _packbits_encode

    enc = _packbits_encode(row)
    assert len(enc) < len(row)
    assert _unpackbits(enc, len(row)) == row


def test_unsupported_structures_return_none():
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    blob = bytearray(encode_tiff(arr))
    # 12-bit samples (unsupported depth): patch BitsPerSample values
    b12 = bytearray(blob)
    pos = b12.find(struct.pack("<HHI", 258, 3, 3))
    assert pos > 0
    # out-of-line bits: patch the pointed-to 3 SHORTs
    (off,) = struct.unpack("<I", b12[pos + 8 : pos + 12])
    b12[off : off + 6] = struct.pack("<HHH", 12, 12, 12)
    assert tiff_meta(bytes(b12)) is None and decode_tiff(bytes(b12)) is None
    # planar separated: add nothing — patch compression to an unsupported one
    bjp = bytearray(blob)
    pos = bjp.find(struct.pack("<HHI", 259, 3, 1))
    bjp[pos + 8 : pos + 10] = struct.pack("<H", 7)  # JPEG-in-TIFF
    assert tiff_meta(bytes(bjp)) is None
    # truncated strip data
    assert decode_tiff(bytes(blob)[:40]) is None
    # empty / wrong magic
    assert tiff_meta(b"") is None
    assert tiff_meta(b"II+\x00" + bytes(blob)[4:]) is None


def test_default_decoder_dispatch():
    """multimodal's magic-byte dispatch routes TIFF to this codec for
    both meta and full pixels."""
    from anime_data_pipeline_spark.operators.multimodal import (
        _decode_default,
        image_pixel_decoder_loader,
    )

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    blob = encode_tiff(arr, byte_order=">", compression=5, predictor=2)
    assert _decode_default(blob) == (12, 10, "RGB")
    px = image_pixel_decoder_loader()()
    assert (px(blob) == arr).all()
    plte = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(5, 6), dtype=np.uint8)
    pblob = encode_tiff(idx, palette=plte, compression=32773)
    assert _decode_default(pblob) == (6, 5, "P")
    assert (px(pblob) == plte[idx]).all()


def test_roundtrip_property():
    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        ch=st.sampled_from([1, 3, 4]),
        comp=st.sampled_from([1, 5, 32773]),
        bo=st.sampled_from(["<", ">"]),
        seed=st.integers(0, 2**16),
    )
    def check(w, h, ch, comp, bo, seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        out = decode_tiff(encode_tiff(arr, byte_order=bo, compression=comp))
        assert out is not None and (out == arr).all()

    check()


@pytest.mark.parametrize("byte_order", ["<", ">"])
@pytest.mark.parametrize("compression", [1, 5, 32773])
@pytest.mark.parametrize("ch", [1, 3])
def test_16bit_roundtrip_true_uint16(byte_order, compression, ch):
    rng = np.random.default_rng(41 + ch)
    shape = (11, 19) if ch == 1 else (11, 19, 3)
    arr = rng.integers(0, 65536, size=shape, dtype=np.uint16)
    blob = encode_tiff(arr, byte_order=byte_order, compression=compression)
    w, h, mode = tiff_meta(blob)
    assert (w, h, mode) == (19, 11, "L" if ch == 1 else "RGB")
    out = decode_tiff(blob)
    expected = arr if arr.ndim == 3 else arr[:, :, None]
    assert out.dtype == np.uint16 and (out == expected).all()


def test_16bit_whiteiszero_inverts_full_range():
    g = np.array([[0, 1, 65534, 65535]], dtype=np.uint16)
    blob = encode_tiff((65535 - g).astype(np.uint16), photometric=0, byte_order=">")
    out = decode_tiff(blob)
    assert out.dtype == np.uint16 and (out[:, :, 0] == g).all()


@pytest.mark.parametrize("tile_size", [(16, 16), (32, 16), (16, 48)])
@pytest.mark.parametrize("compression,predictor", [(1, 1), (5, 2), (32773, 1)])
def test_tiled_roundtrip(tile_size, compression, predictor):
    rng = np.random.default_rng(sum(tile_size))
    # dims NOT multiples of the tile → edge tiles carry padding to trim
    arr = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    blob = encode_tiff(
        arr, compression=compression, predictor=predictor, tile_size=tile_size
    )
    assert tiff_meta(blob) == (53, 37, "RGB")
    out = decode_tiff(blob)
    assert out is not None and (out == arr).all()


def test_tiled_16bit_big_endian():
    rng = np.random.default_rng(77)
    arr = rng.integers(0, 65536, size=(20, 30), dtype=np.uint16)
    blob = encode_tiff(arr, byte_order=">", compression=5, tile_size=(16, 16))
    out = decode_tiff(blob)
    assert out.dtype == np.uint16 and (out[:, :, 0] == arr).all()


@pytest.mark.parametrize("byte_order", ["<", ">"])
@pytest.mark.parametrize("dtype", ["uint8", "uint16"])
def test_deflate_roundtrip(byte_order, dtype):
    rng = np.random.default_rng(83)
    hi = 256 if dtype == "uint8" else 65536
    arr = rng.integers(0, hi, size=(14, 22, 3)).astype(dtype)
    for kw in ({"rows_per_strip": 5}, {"tile_size": (16, 16)}):
        blob = encode_tiff(arr, byte_order=byte_order, compression=8, **kw)
        out = decode_tiff(blob)
        assert out is not None and (out == arr).all()
    # legacy code 32946 decodes through the same path
    blob = bytearray(encode_tiff(arr, byte_order="<", compression=8))
    pos = blob.find(struct.pack("<HHI", 259, 3, 1))
    blob[pos + 8 : pos + 10] = struct.pack("<H", 32946)
    out = decode_tiff(bytes(blob))
    assert out is not None and (out == arr).all()
    # corrupt zlib stream (strip data starts right after the 8-byte
    # header) → None, not an exception
    bad = bytearray(encode_tiff(arr, compression=8))
    bad[10:30] = b"\x00" * 20
    assert decode_tiff(bytes(bad)) is None


def test_crafted_huge_dims_rejected_before_allocation():
    """A ~100-byte blob claiming a 50000x50000 canvas (deflate strip of
    zeros) must be rejected by the bounds-before-allocation cap — not
    decompressed into ~GB of RSS (r6 advice: tiff_codec.py:243)."""

    def entry(tag, typ, count, value):
        return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", value)

    strip = zlib.compress(b"\x00" * 64)
    ifd_off = 8 + len(strip)
    ifd = struct.pack("<H", 9)
    ifd += entry(256, 4, 1, 50000)  # ImageWidth
    ifd += entry(257, 4, 1, 50000)  # ImageLength
    ifd += entry(258, 3, 1, 8)
    ifd += entry(259, 3, 1, 8)  # Deflate
    ifd += entry(262, 3, 1, 1)
    ifd += entry(273, 4, 1, 8)
    ifd += entry(277, 3, 1, 1)
    ifd += entry(278, 4, 1, 50000)
    ifd += entry(279, 4, 1, len(strip))
    ifd += struct.pack("<I", 0)
    blob = b"II*\x00" + struct.pack("<I", ifd_off) + strip + ifd
    assert tiff_meta(blob) is None
    assert decode_tiff(blob) is None


def test_crafted_huge_tile_dims_rejected():
    """Small claimed canvas but a crafted 2^20-square tile grid: the
    single tile passes the offset-count check yet would zero-allocate a
    terabyte padded canvas without the tile-area cap."""

    def entry(tag, typ, count, value):
        return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", value)

    strip = zlib.compress(b"\x00" * 64)
    ifd_off = 8 + len(strip)
    ifd = struct.pack("<H", 11)
    ifd += entry(256, 4, 1, 16)
    ifd += entry(257, 4, 1, 16)
    ifd += entry(258, 3, 1, 8)
    ifd += entry(259, 3, 1, 8)
    ifd += entry(262, 3, 1, 1)
    ifd += entry(277, 3, 1, 1)
    ifd += entry(322, 4, 1, 1 << 20)  # TileWidth
    ifd += entry(323, 4, 1, 1 << 20)  # TileLength
    ifd += entry(324, 4, 1, 8)  # TileOffsets
    ifd += entry(325, 4, 1, len(strip))  # TileByteCounts
    ifd += struct.pack("<I", 0)
    blob = b"II*\x00" + struct.pack("<I", ifd_off) + strip + ifd
    assert decode_tiff(blob) is None


def test_deflate_overlong_stream_still_truncates():
    """A zlib stream longer than the strip's expected bytes keeps the
    pre-cap truncation semantics (decode the first `expect` bytes)."""
    arr = np.arange(48, dtype=np.uint8).reshape(4, 12, 1)
    blob = bytearray(encode_tiff(arr, compression=8))
    strip = zlib.compress(arr.tobytes() + b"\xaa" * 100, 6)
    # encode_tiff writes the strip first (offset 8); splice a longer one
    old = zlib.compress(arr.tobytes(), 6)
    pos = bytes(blob).find(old)
    assert pos == 8
    out = bytes(blob[:pos]) + strip + bytes(blob[pos + len(old):])
    # fix up StripByteCounts (tag 279) and all offsets shifted by the splice
    delta = len(strip) - len(old)
    b = bytearray(out)
    ifd_ptr = struct.unpack("<I", b[4:8])[0] + delta
    b[4:8] = struct.pack("<I", ifd_ptr)
    n = struct.unpack("<H", b[ifd_ptr:ifd_ptr + 2])[0]
    for i in range(n):
        e = ifd_ptr + 2 + 12 * i
        tag = struct.unpack("<H", b[e:e + 2])[0]
        if tag == 279:
            b[e + 8:e + 12] = struct.pack("<I", len(strip))
    res = decode_tiff(bytes(b))
    assert res is not None and (res == arr).all()
