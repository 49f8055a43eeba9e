"""Cross-codec consistency: the SAME pixels pushed through every
container format must come back identical through the shared
magic-byte dispatch (image_pixel_decoder_loader), and the same audio
samples through every WAV format must agree up to each format's
documented quantization. A per-codec roundtrip can hide a matched
encoder/decoder convention error; cross-codec agreement can't."""

from __future__ import annotations

import numpy as np

from anime_data_pipeline_spark.operators.bmp_codec import encode_bmp
from anime_data_pipeline_spark.operators.gif_codec import encode_gif
from anime_data_pipeline_spark.operators.multimodal import image_pixel_decoder_loader
from anime_data_pipeline_spark.operators.png_codec import encode_png
from anime_data_pipeline_spark.operators.tiff_codec import encode_tiff
from anime_data_pipeline_spark.operators.webp_codec import encode_webp
from anime_data_pipeline_spark.operators.wav_codec import (
    _ULAW_TABLE,
    decode_wav,
    encode_wav,
)


def test_rgb_pixels_identical_across_containers():
    rng = np.random.default_rng(51)
    arr = rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)
    decode = image_pixel_decoder_loader()()
    blobs = {
        "png": encode_png(arr),
        "bmp": encode_bmp(arr),
        "tiff_lzw": encode_tiff(arr, compression=5, predictor=2),
        "tiff_be_packbits": encode_tiff(arr, byte_order=">", compression=32773),
        "tiff_deflate_tiled": encode_tiff(arr, compression=8, tile_size=(16, 16)),
        "webp": encode_webp(arr),
        "webp_sg": encode_webp(arr, subtract_green=True),
        "webp_pred12": encode_webp(arr, predictor_mode=12),
    }
    for name, blob in blobs.items():
        out = decode(blob)
        assert out is not None and np.array_equal(out, arr), name


def test_palette_pixels_identical_across_containers():
    rng = np.random.default_rng(52)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (14, 19), dtype=np.uint8)
    expected = plte[idx]
    decode = image_pixel_decoder_loader()()
    blobs = {
        "gif": encode_gif(idx, plte),
        "bmp_pal8": encode_bmp(idx, palette=plte),
        "bmp_rle8": encode_bmp(idx, palette=plte, rle=True),
        "tiff_pal": encode_tiff(idx, palette=plte, compression=5),
        "webp_pal": encode_webp(idx[:, :, None], palette=plte),
    }
    for name, blob in blobs.items():
        out = decode(blob)
        assert out is not None and np.array_equal(out, expected), name


def test_audio_samples_agree_across_wav_formats():
    rng = np.random.default_rng(53)
    # values drawn FROM the µ-law codebook are exact in every format
    vals = np.sort(np.unique(_ULAW_TABLE)).astype(np.int16)
    x = rng.choice(vals, size=(400, 2)).astype(np.int16)
    exact = {
        "pcm16": encode_wav(x, 16000),
        "pcm24": encode_wav(x.astype(np.int32), 16000, fmt="pcm24"),
        "pcm32": encode_wav(x.astype(np.int32), 16000),
        "float32": encode_wav(x.astype(np.float32), 16000, fmt="float32"),
        "ulaw": encode_wav(x, 16000, fmt="ulaw"),
    }
    for name, blob in exact.items():
        out, rate = decode_wav(blob)
        assert rate == 16000, name
        assert np.array_equal(out.astype(np.int32), x.astype(np.int32)), name
    # constant signals are exact through ADPCM and A-law codebook values
    const = np.full((600, 2), -7936, dtype=np.int16)
    out, _ = decode_wav(encode_wav(const, 16000, fmt="ima_adpcm"))
    assert np.array_equal(out, const)
