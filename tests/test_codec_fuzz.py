"""Crash-safety fuzz for all eight stdlib codecs: ANY bytes behind a
valid magic must decode to a value or None — never raise. One corrupt
blob crashing a Spark task kills the whole stage at 100 TB scale; the
contract (corrupt → dropped-with-count row) only holds if every
decoder is total. Two attack shapes per codec: random tails behind
the magic, and every-k-byte truncations of a VALID file (the
real-world shape: interrupted uploads / clipped objects)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from anime_data_pipeline_spark.operators.avi_codec import (
    avi_frame_offsets,
    avi_meta,
    decode_avi_frames,
    encode_avi_mjpeg,
)
from anime_data_pipeline_spark.operators.bmp_codec import bmp_meta, decode_bmp, encode_bmp
from anime_data_pipeline_spark.operators.gif_codec import decode_gif, encode_gif, gif_meta
from anime_data_pipeline_spark.operators.jpeg_arith import (
    encode_jpeg_arith,
    encode_jpeg_arith_progressive,
)
from anime_data_pipeline_spark.operators.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
    jpeg_meta,
)
from anime_data_pipeline_spark.operators.png_codec import decode_png, encode_png, png_meta
from anime_data_pipeline_spark.operators.tiff_codec import (
    decode_tiff,
    encode_tiff,
    tiff_meta,
)
from anime_data_pipeline_spark.operators.wav_codec import decode_wav, encode_wav, wav_meta
from anime_data_pipeline_spark.operators.webp_codec import (
    decode_webp,
    encode_webp,
    webp_meta,
)


def _decode_webp_total(b: bytes):
    """Lossy-VP8 bytes raise NotImplementedError by CONTRACT (the PIL
    seam); for crash-safety purposes that is a defined outcome, not a
    crash — everything else must be a value or None."""
    try:
        return decode_webp(b)
    except NotImplementedError:
        return None


def _valid_blobs():
    r = np.random.default_rng(7)
    img = r.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    pal = r.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = r.integers(0, 4, (9, 11), dtype=np.uint8)
    return {
        "png": (encode_png(img), [png_meta, decode_png]),
        "gif": (encode_gif(idx, pal), [gif_meta, decode_gif]),
        "jpeg": (encode_jpeg(img, 85), [jpeg_meta, decode_jpeg]),
        "jpeg_arith": (
            encode_jpeg_arith(img, 85, restart_interval=2),
            [jpeg_meta, decode_jpeg],
        ),
        "jpeg_arith_prog": (
            encode_jpeg_arith_progressive(img, 85),
            [jpeg_meta, decode_jpeg],
        ),
        "bmp": (encode_bmp(img), [bmp_meta, decode_bmp]),
        "bmp_rle": (
            encode_bmp(idx, palette=pal, rle=True),
            [bmp_meta, decode_bmp],
        ),
        "tiff": (
            encode_tiff(img, compression=5, predictor=2, rows_per_strip=3),
            [tiff_meta, decode_tiff],
        ),
        "tiff_be": (
            encode_tiff(img, byte_order=">", compression=32773),
            [tiff_meta, decode_tiff],
        ),
        "tiff_tiled16": (
            encode_tiff(
                img[:, :, 0].astype("uint16") * 257,
                byte_order=">",
                compression=5,
                tile_size=(16, 16),
            ),
            [tiff_meta, decode_tiff],
        ),
        "wav": (
            encode_wav(r.integers(-999, 999, (64, 2)).astype(np.int16), 16000),
            [wav_meta, decode_wav],
        ),
        "wav_ulaw": (
            encode_wav(r.integers(-999, 999, (64, 2)).astype(np.int16), 8000, fmt="ulaw"),
            [wav_meta, decode_wav],
        ),
        "wav_ima": (
            encode_wav(
                r.integers(-999, 999, (600, 2)).astype(np.int16), 16000, fmt="ima_adpcm"
            ),
            [wav_meta, decode_wav],
        ),
        "avi": (
            encode_avi_mjpeg([img, img], fps=24),
            [avi_meta, avi_frame_offsets, decode_avi_frames],
        ),
        "webp": (encode_webp(img), [webp_meta, _decode_webp_total]),
        "webp_pred": (
            encode_webp(img, predictor_mode=12),
            [webp_meta, _decode_webp_total],
        ),
        "webp_pal": (
            encode_webp(idx[:, :, None], palette=pal),
            [webp_meta, _decode_webp_total],
        ),
        "webp_lz": (
            encode_webp(np.repeat(img[:, :4], 3, axis=1), use_lz77=True, cache_bits=3),
            [webp_meta, _decode_webp_total],
        ),
    }


_BLOBS = _valid_blobs()

_MAGICS = {
    "png": b"\x89PNG\r\n\x1a\n",
    "gif": b"GIF89a",
    "jpeg": b"\xff\xd8\xff",
    "jpeg_arith": b"\xff\xd8\xff",
    "jpeg_arith_prog": b"\xff\xd8\xff",
    "bmp": b"BM",
    "bmp_rle": b"BM",
    "tiff": b"II*\x00",
    "tiff_be": b"MM\x00*",
    "tiff_tiled16": b"MM\x00*",
    "wav": b"RIFF\x80\x00\x00\x00WAVE",
    "wav_ulaw": b"RIFF\x80\x00\x00\x00WAVE",
    "wav_ima": b"RIFF\x80\x00\x00\x00WAVE",
    "avi": b"RIFF\x80\x00\x00\x00AVI ",
    "webp": b"RIFF\x80\x00\x00\x00WEBP",
    "webp_pred": b"RIFF\x80\x00\x00\x00WEBPVP8L",
    "webp_pal": b"RIFF\x80\x00\x00\x00WEBP",
    "webp_lz": b"RIFF\x80\x00\x00\x00WEBPVP8L",
}


@pytest.mark.parametrize("name", sorted(_BLOBS))
def test_truncations_never_raise(name):
    """decode(valid[:k]) for every prefix length: None or a value."""
    blob, fns = _BLOBS[name]
    for k in range(0, len(blob) + 1, max(1, len(blob) // 200)):
        cut = blob[:k]
        for fn in fns:
            fn(cut)  # must not raise


@pytest.mark.parametrize("name", sorted(_BLOBS))
def test_random_tails_never_raise(name):
    blob, fns = _BLOBS[name]
    magic = _MAGICS[name]

    @settings(max_examples=120, deadline=None)
    @given(tail=st.binary(max_size=300))
    def fuzz(tail):
        for fn in fns:
            fn(magic + tail)

    fuzz()


@pytest.mark.parametrize("name", sorted(_BLOBS))
def test_single_byte_corruptions_never_raise(name):
    """Flip one byte at a stride through a valid file — header fields,
    length fields, entropy-coded payloads all get hit."""
    blob, fns = _BLOBS[name]
    b = bytearray(blob)
    for pos in range(0, len(b), max(1, len(b) // 150)):
        orig = b[pos]
        b[pos] = orig ^ 0xFF
        for fn in fns:
            fn(bytes(b))  # must not raise
        b[pos] = orig
