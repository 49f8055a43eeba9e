"""Perceptual dHash (operators/imagehash.py): known-value fingerprints,
container invariance, noise robustness, integer-pooling exactness on
non-aligned dims, and the band-join near-dup detector end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from anime_data_pipeline_spark.operators.imagehash import (
    dhash_from_pixels,
    dhash_near_dup_pairs,
    image_dhash,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


def test_known_fingerprints():
    # strictly increasing columns: every gradient bit set → all-ones
    ramp = np.tile(np.arange(0, 225, 25, dtype=np.uint8), (16, 1))
    assert dhash_from_pixels(ramp) == -1  # 2^64 - 1 wrapped to signed
    # flat image: no gradient anywhere
    assert dhash_from_pixels(np.full((16, 18), 7, np.uint8)) == 0
    # strictly decreasing columns: all comparisons false
    assert dhash_from_pixels(ramp[:, ::-1].copy()) == 0


def test_block_pattern_bits_match_hand_computation():
    blocks = _rng(3).integers(0, 2, (8, 9)).astype(np.uint8) * 200
    img = np.repeat(np.repeat(blocks, 4, axis=0), 5, axis=1)
    expect = 0
    for y in range(8):
        for x in range(8):
            if blocks[y, x + 1] > blocks[y, x]:
                expect |= 1 << (63 - (y * 8 + x))
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert dhash_from_pixels(img) == expect


def test_container_invariance_and_channels():
    from anime_data_pipeline_spark.operators.bmp_codec import encode_bmp
    from anime_data_pipeline_spark.operators.multimodal import (
        image_pixel_decoder_loader,
    )
    from anime_data_pipeline_spark.operators.png_codec import encode_png
    from anime_data_pipeline_spark.operators.tiff_codec import encode_tiff

    img = _rng(9).integers(0, 256, (32, 45, 3), dtype=np.uint8)
    decode = image_pixel_decoder_loader()()
    hashes = {
        dhash_from_pixels(decode(encode_png(img))),
        dhash_from_pixels(decode(encode_bmp(img))),
        dhash_from_pixels(decode(encode_tiff(img, compression=5, predictor=2))),
        dhash_from_pixels(decode(encode_tiff(img, byte_order=">", compression=8))),
    }
    assert len(hashes) == 1


def test_small_noise_stays_near():
    r = _rng(11)
    img = r.integers(0, 256, (40, 54, 3), dtype=np.uint8)
    noisy = np.clip(img.astype(int) + r.integers(-3, 4, img.shape), 0, 255).astype(
        np.uint8
    )
    ham = bin(
        (dhash_from_pixels(img) ^ dhash_from_pixels(noisy)) & (2**64 - 1)
    ).count("1")
    assert ham <= 4


def test_nonaligned_dims_are_deterministic_integers():
    # 10x11 (not multiples of 8/9): floor-edge pooling must still be
    # pure integer math — same hash every call, and stable under a
    # roundtrip through uint16 scaling of a 16-bit source
    img = _rng(13).integers(0, 256, (10, 11), dtype=np.uint8)
    h1 = dhash_from_pixels(img)
    h2 = dhash_from_pixels(img)
    assert h1 == h2
    # uint16 image with the same gradient ORDER gives the same bits
    img16 = (img.astype(np.uint16) * 257).astype(np.uint16)
    assert dhash_from_pixels(img16) == h1


def test_near_dup_pairs_end_to_end(spark):
    from pyspark.sql import types as T

    from anime_data_pipeline_spark.operators.png_codec import encode_png

    blocks = _rng(17).integers(0, 2, (8, 9)).astype(np.uint8) * 200 + 40
    near = blocks.copy()
    near[2, 3] = 240 - near[2, 3]  # flips at most 2 gradient bits
    far = _rng(99).integers(0, 2, (8, 9)).astype(np.uint8) * 200 + 40

    def blob(b):
        return encode_png(np.repeat(np.repeat(b, 3, axis=0), 3, axis=1)[:, :, None])

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("content", T.BinaryType())]
    )
    df = spark.createDataFrame(
        [(1, blob(blocks)), (2, blob(near)), (3, blob(far)),
         (4, b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)],  # corrupt → null hash
        schema,
    )
    hashed = image_dhash(df)
    rows = {r["doc_id"]: r["dhash"] for r in hashed.collect()}
    assert rows[4] is None
    assert rows[1] == dhash_from_pixels(
        np.repeat(np.repeat(blocks, 3, axis=0), 3, axis=1)
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_near_dup_pairs(hashed, max_hamming=4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 2
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_hot_band_cap_drops_degenerate_buckets(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("dhash", T.LongType())]
    )
    # 12 all-zero hashes: every band identical → quadratic candidates;
    # with the cap they produce NO pairs
    df = spark.createDataFrame([(i, 0) for i in range(12)], schema)
    out = dhash_near_dup_pairs(df, max_hamming=4, max_band_freq=8).collect()
    assert out == []
    # below the cap they pair normally
    out2 = dhash_near_dup_pairs(df, max_hamming=4, max_band_freq=100).count()
    assert out2 == 12 * 11 // 2


def test_tiny_images_hash_without_crashing():
    """Images smaller than the 9x8 pooling grid (1x1 tracking pixels)
    must hash, not divide by zero on empty floor-edge blocks."""
    assert dhash_from_pixels(np.full((1, 1, 3), 9, np.uint8)) == 0
    assert dhash_from_pixels(np.full((2, 3), 50, np.uint8)) == 0
    # tiny ramp: upscaled columns keep their gradient order
    t = np.array([[0, 100, 200]], dtype=np.uint8)
    h = dhash_from_pixels(t)
    big = np.repeat(np.repeat(t, 8, axis=0), 3, axis=1)
    assert h == dhash_from_pixels(big)


def test_rgba_and_rgb_encodings_hash_identically():
    """Alpha is excluded from the grayscale fold: an opaque-RGBA
    re-encode must hash exactly like its RGB twin (review finding)."""
    from anime_data_pipeline_spark.operators.multimodal import (
        image_pixel_decoder_loader,
    )
    from anime_data_pipeline_spark.operators.png_codec import encode_png

    rng = _rng(23)
    rgb = rng.integers(0, 256, (27, 36, 3), dtype=np.uint8)
    rgba = np.dstack([rgb, np.full(rgb.shape[:2], 255, np.uint8)])
    decode = image_pixel_decoder_loader()()
    assert dhash_from_pixels(decode(encode_png(rgb))) == dhash_from_pixels(
        decode(encode_png(rgba))
    )


def test_gray_alpha_ignores_alpha_plane():
    """2-channel (luma+alpha, PNG color type 4) must hash like its gray
    twin: averaging the alpha plane in made an opaque LA re-encode a
    dedup miss (r6 advice: imagehash.py:62)."""
    g = _rng(23).integers(0, 256, size=(32, 40), dtype=np.uint8)
    base = dhash_from_pixels(g)
    opaque = np.stack([g, np.full_like(g, 255)], axis=2)
    assert dhash_from_pixels(opaque) == base
    varying = np.stack([g, _rng(5).integers(0, 256, size=g.shape, dtype=np.uint8)], axis=2)
    assert dhash_from_pixels(varying) == base
