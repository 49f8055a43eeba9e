"""Stdlib GIF + baseline JPEG codec tests (operators/gif_codec.py,
operators/jpeg_codec.py): lossless GIF roundtrips through real LZW
(dictionary growth, mid-stream resets, interlace), JPEG roundtrips
bounded by quantization error (4:4:4, 4:2:0, restart markers), decode
of EXTERNAL real-world GIF bytes (guards against mirrored
encoder/decoder bugs), corrupt handling, and the SURVEY S7 e2e —
mixed-format real images through decode_image_meta's default decoder
into bucket assignment (reference bucket_manager.py:180-189)."""

from __future__ import annotations

import base64

import numpy as np

from anime_data_pipeline_spark.operators.gif_codec import (
    decode_gif,
    encode_gif,
    gif_meta,
)
from anime_data_pipeline_spark.operators.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
    jpeg_meta,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def test_gif_roundtrip_random_256_colors():
    """Random indices over a full 256-entry palette force LZW code
    widths through 9→12 bits; roundtrip must be bit-exact."""
    r = _rng()
    pal = r.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = r.integers(0, 256, (73, 100), dtype=np.uint8)
    data = encode_gif(idx, pal)
    assert gif_meta(data) == (100, 73, "P")
    assert np.array_equal(decode_gif(data), pal[idx])


def test_gif_roundtrip_dict_reset():
    """An image large enough that the LZW dictionary fills (4096) and
    the encoder emits a mid-stream CLEAR; decode must resync."""
    r = _rng(3)
    pal = r.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = r.integers(0, 256, (200, 300), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])


def test_gif_roundtrip_interlaced():
    r = _rng(5)
    pal = r.integers(0, 256, (64, 3), dtype=np.uint8)
    idx = r.integers(0, 64, (37, 23), dtype=np.uint8)
    data = encode_gif(idx, pal, interlace=True)
    assert np.array_equal(decode_gif(data), pal[idx])


def test_gif_compressible_runs():
    """Run-heavy data exercises multi-byte dictionary entries (the
    compression path, not just literals)."""
    pal = _rng(9).integers(0, 256, (256, 3), dtype=np.uint8)
    idx = np.tile(np.arange(16, dtype=np.uint8).repeat(50), (40, 1))[:, :512]
    data = encode_gif(idx, pal)
    assert len(data) < idx.size // 4  # actually compressed
    assert np.array_equal(decode_gif(data), pal[idx])


def test_gif_external_fixtures_decode():
    """REAL GIF bytes produced by external encoders (the canonical 1x1
    tracking-pixel GIFs, public bytes): decoding these proves the LZW
    width schedule and block layout match the spec, not merely our own
    encoder (which a mirrored bug would also satisfy)."""
    for b64 in (
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7",
        "R0lGODdhAQABAIAAAAAAAAAAACwAAAAAAQABAAACAkQBADs=",
    ):
        data = base64.b64decode(b64)
        assert gif_meta(data) == (1, 1, "P")
        arr = decode_gif(data)
        assert arr is not None and arr.shape == (1, 1, 3)
        assert arr.tolist() == [[[0, 0, 0]]]


def test_gif_corrupt_and_truncated():
    pal = _rng(11).integers(0, 256, (4, 3), dtype=np.uint8)
    idx = _rng(12).integers(0, 4, (8, 8), dtype=np.uint8)
    good = encode_gif(idx, pal)
    assert decode_gif(b"NOTG" + good[4:]) is None
    assert gif_meta(b"GIF89a") is None  # too short for the LSD
    assert decode_gif(good[:20]) is None  # truncated before image data
    # truncated mid-LZW: missing pixels → None
    assert decode_gif(good[: len(good) - 6]) is None


def test_gif_small_frame_on_larger_screen():
    """A frame smaller than the logical screen lands at its offset on
    a palette-0 background (animation-style first frame)."""
    import struct

    pal = np.array([[9, 9, 9], [255, 0, 0]], dtype=np.uint8)
    idx = np.ones((2, 2), dtype=np.uint8)
    data = bytearray(encode_gif(idx, pal))
    # patch logical screen to 4x4 and the image descriptor offset to (1,1)
    data[6:10] = struct.pack("<HH", 4, 4)
    desc = bytes(data).index(b"\x2c")
    data[desc + 1 : desc + 5] = struct.pack("<HH", 1, 1)
    out = decode_gif(bytes(data))
    assert out.shape == (4, 4, 3)
    assert out[0, 0].tolist() == [9, 9, 9]
    assert out[1, 1].tolist() == [255, 0, 0]
    assert out[2, 2].tolist() == [255, 0, 0]
    assert out[3, 3].tolist() == [9, 9, 9]


def test_gif_roundtrip_property():
    """Property: encode→decode is palette-expansion identity for
    arbitrary sizes/palette widths, interlaced or not."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        ncol=st.sampled_from([2, 5, 16, 100, 256]),
        interlace=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(h, w, ncol, interlace, seed):
        r = np.random.default_rng(seed)
        pal = r.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = r.integers(0, ncol, (h, w), dtype=np.uint8)
        out = decode_gif(encode_gif(idx, pal, interlace=interlace))
        assert out is not None and np.array_equal(out, pal[idx])

    roundtrip()


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------


def test_jpeg_constant_gray_near_exact():
    img = np.full((24, 31), 130, dtype=np.uint8)
    data = encode_jpeg(img, 90)
    assert jpeg_meta(data) == (31, 24, "L")
    out = decode_jpeg(data)
    assert out.shape == (24, 31)
    assert np.abs(out.astype(int) - 130).max() <= 2


def test_jpeg_gradient_rgb_within_quant_error():
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [np.clip(yy * 4, 0, 255), np.clip(xx * 3, 0, 255), np.clip(128 + yy - xx, 0, 255)],
        -1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, 92))
    assert out.shape == (40, 56, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 2.0 and err.max() <= 8


def test_jpeg_420_subsampled():
    """2x2 chroma subsampling: decoder walks interleaved MCUs with
    mixed sampling factors and upsamples; luma stays tight, chroma
    cost shows only at color edges."""
    yy, xx = np.mgrid[0:33, 0:47]  # non-multiple-of-16 dims exercise padding
    img = np.stack(
        [np.clip(yy * 5, 0, 255), np.clip(xx * 4, 0, 255), np.clip(100 + yy, 0, 255)],
        -1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, 92, subsample=True))
    assert out.shape == (33, 47, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4.0 and err.max() <= 24


def test_jpeg_restart_markers():
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [np.clip(yy * 4, 0, 255), np.clip(xx * 3, 0, 255), np.clip(128 + yy - xx, 0, 255)],
        -1,
    ).astype(np.uint8)
    data = encode_jpeg(img, 85, restart_interval=3)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    out = decode_jpeg(data)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() <= 12


def test_jpeg_noise_bounded_by_quality():
    """Worst-case content (uniform noise) still roundtrips within the
    q95 quantization budget — pins the Huffman/zigzag/IDCT agreement
    on every coefficient position."""
    noise = _rng(13).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, 95))
    err = np.abs(out.astype(int) - noise.astype(int))
    assert err.mean() < 6.0 and err.max() <= 32


def test_jpeg_meta_progressive_and_corrupt():
    img = np.full((16, 16), 77, dtype=np.uint8)
    good = encode_jpeg(img, 80)
    # patch SOF0 (FFC0) → SOF2 (FFC2): the baseline scan header
    # (Ss=0, Se=63) is illegal under progressive rules, so pixel
    # decode declines while meta still parses the frame header
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert jpeg_meta(prog) == (16, 16, "L")
    assert decode_jpeg(prog) is None
    assert jpeg_meta(b"\xff\xd8\xffnope") is None
    assert decode_jpeg(good[:40]) is None
    assert decode_jpeg(b"junk") is None


def test_jpeg_malformed_segments_return_none_not_raise():
    """The r5 advisor's crash repros: malformed-but-magic-valid bytes
    must become None (dropped-with-count row), never an exception into
    the Spark task — truncated DQT body (np.frombuffer ValueError),
    1-byte DRI body (struct.error), SOS ns larger than its body
    (IndexError)."""
    import struct

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    good = encode_jpeg(np.full((8, 8), 50, dtype=np.uint8), 80)
    truncated_dqt = b"\xff\xd8" + seg(0xDB, b"\x00" + b"\x01" * 10) + good[2:]
    short_dri = b"\xff\xd8" + seg(0xDD, b"\x05") + good[2:]
    sos_pos = good.index(b"\xff\xda")
    fat_sos = b"\xff\xd8" + good[2:sos_pos] + seg(0xDA, bytes([10, 1, 0]))
    for bad in (truncated_dqt, short_dri, fat_sos, good[: len(good) // 2]):
        assert decode_jpeg(bad) is None  # must not raise
        jpeg_meta(bad)  # must not raise either


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker; padded streams must parse identically, not drop as
    corrupt."""
    img = _rng(3).integers(0, 256, (17, 23, 3), dtype=np.uint8)
    good = encode_jpeg(img, 85)
    base = decode_jpeg(good)
    # pad after SOI and before the SOS marker byte
    padded = good[:2] + b"\xff\xff" + good[2:]
    sos = padded.index(b"\xff\xda")
    padded = padded[:sos] + b"\xff\xff\xff" + padded[sos:]
    assert jpeg_meta(padded) == jpeg_meta(good)
    out = decode_jpeg(padded)
    assert out is not None and np.array_equal(out, base)


def test_jpeg_progressive_extended_ac_tables_valid():
    """The progressive writer's AC tables (Annex K + EOB-run symbols)
    must stay canonically valid: every code fits its length and the
    reserved all-ones length-16 code is unused."""
    from anime_data_pipeline_spark.operators.jpeg_codec import (
        _encode_codes,
        _extended_ac_spec,
        _K_AC_CHROMA,
        _K_AC_LUMA,
    )

    for spec in (_extended_ac_spec(_K_AC_LUMA), _extended_ac_spec(_K_AC_CHROMA)):
        enc = _encode_codes(*spec)
        for sym in (0x00, 0xF0, 0x10, 0x20, 0x30, 0x40):
            assert sym in enc  # EOB runs up to 31 blocks are codable
        for sym, (code, length) in enc.items():
            assert code < (1 << length)
            assert not (length == 16 and code == 0xFFFF)


def test_jpeg_progressive_bit_exact_vs_baseline():
    """Progressive (SOF2) decode must be BIT-EXACT to the sequential
    decode of the same coefficients, across gray/RGB, 4:4:4/4:2:0,
    and spectral-selection-only vs full successive approximation
    (all four scan types: DC first/refine, AC first/refine)."""
    from anime_data_pipeline_spark.operators.jpeg_codec import (
        encode_jpeg_progressive,
        jpeg_meta as meta,
    )

    r = _rng(11)
    cases = [
        ((24, 17, 3), False),
        ((33, 40, 3), True),  # non-multiple-of-16 4:2:0 grid
        ((16, 16), False),
        ((8, 8), False),
        ((21, 19, 3), True),
    ]
    for shape, sub in cases:
        noise = r.integers(0, 256, shape, dtype=np.uint8)
        smooth = (np.indices(shape[:2]).sum(0) % 7 * 3 + 100).astype(np.uint8)
        if len(shape) == 3:
            smooth = np.stack([smooth] * 3, -1)
        for img in (noise, smooth):  # smooth → long EOB runs
            kw = {"subsample": sub} if img.ndim == 3 else {}
            base = decode_jpeg(encode_jpeg(img, 85, **kw))
            for successive in (False, True):
                pb = encode_jpeg_progressive(img, 85, successive=successive, **kw)
                assert meta(pb) == (
                    shape[1], shape[0], "RGB" if img.ndim == 3 else "L"
                )
                prog = decode_jpeg(pb)
                assert prog is not None, (shape, sub, successive)
                assert np.array_equal(base, prog), (shape, sub, successive)


def test_jpeg_progressive_truncated_and_corrupt():
    from anime_data_pipeline_spark.operators.jpeg_codec import (
        encode_jpeg_progressive,
    )

    img = _rng(5).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    pb = encode_jpeg_progressive(img, 85)
    assert decode_jpeg(pb[: len(pb) // 2]) is None
    assert decode_jpeg(pb[:-2]) is None  # EOI stripped → no output
    # flip a byte inside the first scan's entropy data
    sos = pb.index(b"\xff\xda")
    mutated = bytearray(pb)
    mutated[sos + 40] ^= 0x55
    decode_jpeg(bytes(mutated))  # any result is fine; must not raise


def test_jpeg_roundtrip_property():
    """Property: decode(encode(x, q=90)) stays within a loose global
    error budget for arbitrary small images, gray and RGB."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        rgb=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(h, w, rgb, seed):
        r = np.random.default_rng(seed)
        shape = (h, w, 3) if rgb else (h, w)
        img = r.integers(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out is not None and out.shape == shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 64

    roundtrip()


# ---------------------------------------------------------------------------
# Dispatch + e2e
# ---------------------------------------------------------------------------


def test_image_pixel_decoder_dispatch():
    from anime_data_pipeline_spark.operators.multimodal import (
        image_pixel_decoder_loader,
    )
    from anime_data_pipeline_spark.operators.png_codec import encode_png

    decode = image_pixel_decoder_loader()()
    r = _rng(21)
    arr = r.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode(encode_png(arr)), arr)
    pal = r.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = r.integers(0, 256, (7, 11), dtype=np.uint8)
    assert np.array_equal(decode(encode_gif(idx, pal)), pal[idx])
    smooth = np.full((16, 16, 3), 99, dtype=np.uint8)
    out = decode(encode_jpeg(smooth, 95))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - 99).max() <= 3
    gray = np.full((8, 8), 42, dtype=np.uint8)
    gout = decode(encode_jpeg(gray, 95))
    assert gout.shape == (8, 8, 1)  # channel axis normalized for the chain
    assert decode(b"who knows") is None


def test_decode_image_meta_e2e_mixed_formats(spark):
    """SURVEY S7 closed for PNG+GIF+JPEG: one corpus mixing all three
    real formats (plus a corrupt row) through decode_image_meta's
    DEFAULT decoder → bucket assignment, no injection anywhere."""
    from pyspark.sql import functions as F

    from anime_data_pipeline_spark.operators.bucketing import (
        BucketConfig,
        assign_bucket_columns,
        select_bucket_py,
    )
    from anime_data_pipeline_spark.operators.multimodal import decode_image_meta
    from anime_data_pipeline_spark.operators.png_codec import encode_png

    r = _rng(31)
    pal = r.integers(0, 256, (256, 3), dtype=np.uint8)
    blobs = [
        ("a.png", encode_png(r.integers(0, 256, (768, 1024, 3), dtype=np.uint8))),
        ("b.gif", encode_gif(r.integers(0, 256, (512, 640), dtype=np.uint8), pal)),
        ("c.jpg", encode_jpeg(np.full((384, 896, 3), 120, dtype=np.uint8), 85)),
        ("d.bad", b"GIF89a-truncated"),
    ]
    df = spark.createDataFrame(blobs, "image_key string, content binary")
    meta = decode_image_meta(df)
    rows = {row["image_key"]: row["image_meta"] for row in meta.collect()}
    assert (rows["a.png"]["width"], rows["a.png"]["height"]) == (1024, 768)
    assert rows["b.gif"]["mode"] == "P"
    assert (rows["b.gif"]["width"], rows["b.gif"]["height"]) == (640, 512)
    assert rows["c.jpg"]["mode"] == "RGB"
    assert (rows["c.jpg"]["width"], rows["c.jpg"]["height"]) == (896, 384)
    assert rows["d.bad"] is None

    cfg = BucketConfig()
    ok = meta.filter(F.col("image_meta").isNotNull()).select(
        "image_key",
        F.col("image_meta.width").alias("width"),
        F.col("image_meta.height").alias("height"),
    )
    assigned = {
        row["image_key"]: (row["bucket_w"], row["bucket_h"])
        for row in assign_bucket_columns(ok, cfg=cfg).collect()
    }
    for key, (w, h) in [("b.gif", (640, 512)), ("c.jpg", (896, 384))]:
        exp = select_bucket_py(w, h, cfg)
        assert assigned[key] == (exp["bucket_w"], exp["bucket_h"])


def test_gif_jpeg_pixels_through_preprocess_chain():
    """Full GIF/JPEG pixel decode feeding the inference preprocessing
    math (reference dbimutils.py:6-26: pad-square-on-white → resize)."""
    from anime_data_pipeline_spark.operators.inference import (
        area_resize,
        make_square_white,
    )
    from anime_data_pipeline_spark.operators.multimodal import (
        image_pixel_decoder_loader,
    )

    decode = image_pixel_decoder_loader()()
    r = _rng(33)
    pal = r.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = r.integers(0, 256, (30, 50), dtype=np.uint8)
    for blob in (
        encode_gif(idx, pal),
        encode_jpeg(pal[idx], 90),
    ):
        px = decode(blob)
        assert px is not None and px.shape == (30, 50, 3)
        sq = make_square_white(px, 50)
        assert sq.shape == (50, 50, 3)
        small = area_resize(sq, 25)
        assert small.shape == (25, 25, 3)


def test_oversubscribed_dht_returns_none():
    """A crafted DHT whose bits[] violates the Kraft inequality must
    yield None, not a multi-GB LUT allocation (review-confirmed)."""
    import numpy as np

    from anime_data_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        jpeg_meta,
    )

    blob = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), 85))
    i = blob.find(b"\xff\xc4")
    blob[i + 5] = 255  # bits[1] = 255 → 255 one-bit codes
    assert decode_jpeg(bytes(blob)) is None
    assert jpeg_meta(bytes(blob)) is not None  # header meta still parses


def test_gif_animation_compositing():
    """Hand-computed canvases pin the GIF89a compositing rules:
    transparency reveals the prior canvas, disposal 2 restores the
    background, disposal 3 restores the pre-frame canvas."""
    import numpy as np

    from anime_data_pipeline_spark.operators.gif_codec import (
        decode_gif_frames,
        encode_gif_animation,
        gif_frame_count,
    )

    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    base = np.full((4, 6), 10, np.uint8)
    patch = np.full((2, 2), 200, np.uint8)
    last = np.full((4, 6), 30, np.uint8)
    blob = encode_gif_animation(
        [base, patch, last], pal, offsets=[(0, 0), (1, 1), (0, 0)],
        disposals=[1, 1, 0],
    )
    assert gif_frame_count(blob) == 3
    out = decode_gif_frames(blob, [0, 1, 2])
    assert (out[0] == 10).all()
    exp1 = np.full((4, 6), 10, np.uint8)
    exp1[1:3, 1:3] = 200  # patch at (1,1) over the retained canvas
    assert (out[1][:, :, 0] == exp1).all()
    assert (out[2] == 30).all()

    # transparency: frame 1 draws only its opaque pixels
    tr = np.array([[0, 200], [200, 0]], dtype=np.uint8)  # 0 = transparent
    blob_t = encode_gif_animation(
        [base, tr], pal, offsets=[(0, 0), (0, 0)], transparent=0,
        disposals=[1, 0],
    )
    out_t = decode_gif_frames(blob_t, [1])
    exp_t = np.full((4, 6), 10, np.uint8)
    exp_t[0, 1] = 200
    exp_t[1, 0] = 200
    assert (out_t[1][:, :, 0] == exp_t).all()

    # disposal 2 (restore background) between frames 1 and 2
    blob_d2 = encode_gif_animation(
        [base, patch, patch], pal, offsets=[(0, 0), (1, 1), (2, 2)],
        disposals=[1, 2, 0],
    )
    out_d2 = decode_gif_frames(blob_d2, [2])
    exp_d2 = np.full((4, 6), 10, np.uint8)
    exp_d2[1:3, 1:3] = 0  # frame-1 region restored to bg (palette 0)
    exp_d2[2:4, 2:4] = 200
    assert (out_d2[2][:, :, 0] == exp_d2).all()

    # disposal 3 (restore previous) between frames 1 and 2
    blob_d3 = encode_gif_animation(
        [base, patch, patch], pal, offsets=[(0, 0), (1, 1), (2, 2)],
        disposals=[1, 3, 0],
    )
    out_d3 = decode_gif_frames(blob_d3, [2])
    exp_d3 = np.full((4, 6), 10, np.uint8)  # frame-1 region back to 10
    exp_d3[2:4, 2:4] = 200
    assert (out_d3[2][:, :, 0] == exp_d3).all()


def test_gif_frame_sampling_contract():
    import numpy as np

    from anime_data_pipeline_spark.operators.gif_codec import (
        decode_gif_frames,
        encode_gif_animation,
        gif_frame_count,
    )

    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    frames = [np.full((3, 3), 40 + 5 * i, np.uint8) for i in range(9)]
    blob = encode_gif_animation(frames, pal)
    assert gif_frame_count(blob) == 9
    out = decode_gif_frames(blob, [0, 4, 8])
    assert sorted(out) == [0, 4, 8]
    for fi in (0, 4, 8):
        assert (out[fi] == 40 + 5 * fi).all()
    assert decode_gif_frames(blob, [9]) is None  # past the last frame
    assert decode_gif_frames(blob[: len(blob) // 2], [8]) is None  # truncated


def test_gif_crafted_dims_and_background_index():
    """Review-confirmed shapes: (a) a crafted LSD claiming a 65535^2
    canvas must refuse before allocating ~13 GB; (b) the LSD
    background-color-index byte picks the disposal-2 restore color;
    (c) frame-0 GCE transparency is ignored (PIL frame-0 parity)."""
    import struct

    import numpy as np

    from anime_data_pipeline_spark.operators.gif_codec import (
        decode_gif,
        decode_gif_frames,
        decode_gif_lattice,
        encode_gif_animation,
    )

    # (a) huge logical screen, tiny valid frame
    blob = (
        b"GIF89a" + struct.pack("<HH", 0xFFFF, 0xFFFF)
        + bytes([0x80, 0, 0]) + bytes(6)
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + bytes([0, 2])
        + b"\x02\x44\x01\x00\x3b"
    )
    assert decode_gif_frames(blob, [0]) is None
    assert decode_gif(blob) is None
    assert decode_gif_lattice(blob, 4) is None

    # (b) background index 1 (white), disposal 2 restores to it
    pal = np.zeros((4, 3), np.uint8)
    pal[1] = 255
    f0 = np.full((2, 2), 2, np.uint8)
    f1 = np.full((1, 1), 2, np.uint8)
    anim = bytearray(
        encode_gif_animation([f0, f1], pal, offsets=[(0, 0), (0, 0)],
                             disposals=[2, 0], screen=(3, 3))
    )
    anim[11] = 1  # LSD background-color-index
    out = decode_gif_frames(bytes(anim), [0, 1])
    assert out[0][2, 2].tolist() == [255, 255, 255]  # initial canvas
    assert out[1][1, 1].tolist() == [255, 255, 255]  # disposal-2 restore

    # (c) a GCE transparency flag on frame 0 does not blank its pixels
    one = encode_gif_animation(
        [np.full((2, 2), 2, np.uint8)], pal, disposals=[1]
    )
    gce = bytes([0x21, 0xF9, 4, 0x05, 0, 0, 2, 0])  # transparent idx 2
    desc = one.index(b"\x2c")
    patched = one[:desc] + gce + one[desc:]
    arr = decode_gif(patched)
    assert (arr == pal[2]).all()  # palette color kept, not background


def test_gif_compositor_matches_reference_simulator():
    """Property test: random animations (frames, offsets, disposals,
    transparency) must match an INDEPENDENT numpy simulation of the
    GIF89a compositing rules — a convention error shared by encoder
    and decoder cannot also match this third implementation."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from anime_data_pipeline_spark.operators.gif_codec import (
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)

    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 2**16),
        n_frames=st.integers(1, 6),
        sw=st.integers(4, 10),
        sh=st.integers(4, 10),
        use_trans=st.booleans(),
    )
    def check(seed, n_frames, sw, sh, use_trans):
        rng = np.random.default_rng(seed)
        frames, offsets, disposals = [], [], []
        for _ in range(n_frames):
            fw = int(rng.integers(1, sw + 1))
            fh = int(rng.integers(1, sh + 1))
            frames.append(rng.integers(1, 16, (fh, fw), dtype=np.uint8))
            offsets.append(
                (int(rng.integers(0, sw - fw + 1)), int(rng.integers(0, sh - fh + 1)))
            )
            disposals.append(int(rng.integers(0, 4)))
        trans = 3 if use_trans else None
        blob = encode_gif_animation(
            frames, pal, offsets=offsets, transparent=trans,
            disposals=disposals, screen=(sw, sh),
        )
        got = decode_gif_frames(blob, range(n_frames))
        # independent simulation
        canvas = np.zeros((sh, sw), dtype=np.uint8)  # palette idx 0 = bg
        for fi, (f, (lx, ty), disp) in enumerate(zip(frames, offsets, disposals)):
            fh, fw = f.shape
            region = canvas[ty : ty + fh, lx : lx + fw]
            saved = region.copy()
            if trans is not None and fi > 0:
                m = f != trans
                region[m] = f[m]
            else:
                region[:] = f
            expect = pal[canvas]
            assert np.array_equal(got[fi], expect), (fi, disposals, offsets)
            if disp == 2:
                canvas[ty : ty + fh, lx : lx + fw] = 0
            elif disp == 3:
                canvas[ty : ty + fh, lx : lx + fw] = saved

    check()


def test_gif_lattice_total_sampled_bytes_cap():
    """Same guard as the WebP lattice: n retained canvas copies on a
    near-cap logical screen must be refused before compositing."""
    from anime_data_pipeline_spark.operators.gif_codec import (
        decode_gif_lattice,
        encode_gif_animation,
    )

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    frames = [np.zeros((2, 2), dtype=np.uint8)] * 5
    blob = encode_gif_animation(frames, pal, screen=(8192, 8192))
    assert decode_gif_lattice(blob, 1) is None
    res = decode_gif_lattice(blob, 5)
    assert res is not None and res[0] == 5 and set(res[1]) == {0}


def test_jpeg_dac_odd_length_is_corrupt_not_partial():
    """An odd-length DAC body (dangling conditioning byte) must map to
    None like every other malformed segment — the r8 advisor found it
    was silently HALF-applied, leaving the decoder running with a
    partially-updated conditioning table."""
    import struct

    from anime_data_pipeline_spark.operators.jpeg_arith import encode_jpeg_arith

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    img = np.full((8, 8), 77, dtype=np.uint8)
    good = encode_jpeg_arith(img, quality=80)
    assert decode_jpeg(good) is not None
    # a well-formed (even) extra DAC is fine; with a dangling odd byte
    # the whole stream is corrupt
    even_dac = b"\xff\xd8" + seg(0xCC, bytes([0x01, 0x10])) + good[2:]
    assert decode_jpeg(even_dac) is not None
    odd_dac = b"\xff\xd8" + seg(0xCC, bytes([0x01, 0x10, 0x00])) + good[2:]
    assert decode_jpeg(odd_dac) is None
    jpeg_meta(odd_dac)  # must not raise
