"""Cross-validation of the native PNG/GIF/JPEG/BMP/TIFF codecs against
the JVM's ``javax.imageio`` — a second INDEPENDENT implementation that
ships inside the Spark runtime itself (Java 17 bundles readers and
writers for all five formats), reached through py4j on the session
fixture's JVM. Same matched-bug-killer rationale as the libwebp suite
(tests/test_webp_system_crossval.py): an in-repo encoder/decoder pair
can share a spec misreading that every roundtrip test hides, but it
cannot coincidentally agree with a foreign decoder — and a foreign
ENCODER produces streams whose coding choices our fixture writers
never make.

Lossless formats compare bit-exactly both directions. JPEG compares
within tolerance: T.81 does not mandate a bit-exact IDCT, so two
conforming decoders legitimately differ by a few levels per sample —
what the tolerance still catches is channel swaps, stride/orientation
bugs, wrong upsampling geometry, and dequant table mixups (all of
which blow past ±8 immediately).
"""

from __future__ import annotations

import numpy as np
import pytest

from anime_data_pipeline_spark.operators.bmp_codec import decode_bmp, encode_bmp
from anime_data_pipeline_spark.operators.gif_codec import decode_gif, encode_gif
from anime_data_pipeline_spark.operators.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from anime_data_pipeline_spark.operators.png_codec import (
    decode_png,
    decode_png_palette,
    encode_png,
    palette_to_rgb,
)
from anime_data_pipeline_spark.operators.tiff_codec import decode_tiff, encode_tiff


def _rng(seed):
    return np.random.default_rng(seed)


def _jvm_decode(spark, blob: bytes) -> np.ndarray | None:
    """bytes → (h, w, 3|4) uint8 via javax.imageio; None if unreadable.
    getRGB returns ARGB ints; alpha kept only when the color model has
    an alpha channel."""
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(blob))
    img = jvm.javax.imageio.ImageIO.read(bais)
    if img is None:
        return None
    w, h = img.getWidth(), img.getHeight()
    px = np.array(list(img.getRGB(0, 0, w, h, None, 0, w)), dtype=np.int64).reshape(
        h, w
    )
    rgba = np.stack(
        [(px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF, (px >> 24) & 0xFF], axis=2
    ).astype(np.uint8)
    if img.getColorModel().hasAlpha():
        return rgba
    return rgba[:, :, :3].copy()


def _jvm_image(spark, arr: np.ndarray):
    """Shared bridge (operators/imageio_bridge.py): one PNG payload in,
    a BufferedImage carrying exactly ``arr`` out — the per-pixel setRGB
    fill this replaced cost one py4j round trip per pixel."""
    from anime_data_pipeline_spark.operators.imageio_bridge import (
        jvm_image_from_array,
    )

    return jvm_image_from_array(spark._jvm, arr)


def _jvm_encode(spark, arr: np.ndarray, fmt: str) -> bytes | None:
    """(h, w, 3) uint8 → bytes via the JVM's own ``fmt`` writer — a
    foreign encoder whose coding choices our decoders must survive."""
    from anime_data_pipeline_spark.operators.imageio_bridge import jvm_write_image

    return jvm_write_image(spark._jvm, _jvm_image(spark, arr), fmt)


# ---------------------------------------------------------------------------
# PNG — lossless, bit-exact both directions
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "kwargs,shape",
    [
        ({}, (13, 17, 3)),
        ({}, (9, 11, 4)),
        ({"interlace": 1}, (21, 15, 3)),
    ],
    ids=["rgb", "rgba", "adam7"],
)
def test_png_ours_to_imageio(spark, kwargs, shape):
    arr = _rng(sum(shape)).integers(0, 256, shape, np.uint8)
    theirs = _jvm_decode(spark, encode_png(arr, **kwargs))
    assert theirs is not None
    assert theirs.shape == arr.shape and (theirs == arr).all()


def test_png_gray_ours_to_imageio(spark):
    """Grayscale compares at the RASTER level: BufferedImage.getRGB on
    TYPE_BYTE_GRAY applies a gray→sRGB color-space transform that
    shifts values, so the raw sample path is the honest comparison."""
    arr = _rng(26).integers(0, 256, (12, 14), np.uint8)
    blob = encode_png(arr)
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(blob)))
    assert img is not None
    w, h = img.getWidth(), img.getHeight()
    samples = np.array(
        list(img.getRaster().getSamples(0, 0, w, h, 0, None)), dtype=np.int64
    ).reshape(h, w)
    assert (samples == arr).all()


def test_png_palette_ours_to_imageio(spark):
    rng = _rng(5)
    pal = rng.integers(0, 256, (11, 3), np.uint8)
    idx = rng.integers(0, 11, (16, 19), np.uint8)
    theirs = _jvm_decode(spark, encode_png(idx, palette=pal))
    assert (theirs[:, :, :3] == pal[idx]).all()


def test_png_imageio_to_ours(spark):
    """A JVM-written PNG (its own filter heuristics, not our filter-0
    fixtures) must decode bit-exactly in our decoder."""
    arr = _rng(7).integers(0, 256, (24, 31, 3), np.uint8)
    blob = _jvm_encode(spark, arr, "png")
    assert blob is not None
    ours = decode_png(blob)
    assert ours is not None
    if ours.shape[2] == 1:
        plte = decode_png_palette(blob)
        assert plte is not None
        ours = palette_to_rgb(ours, plte)
    assert (ours[:, :, :3] == arr).all()


# ---------------------------------------------------------------------------
# GIF — palette-exact both directions
# ---------------------------------------------------------------------------
def test_gif_ours_to_imageio(spark):
    rng = _rng(11)
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    idx = rng.integers(0, 16, (18, 23), np.uint8)
    theirs = _jvm_decode(spark, encode_gif(idx, pal))
    assert (theirs[:, :, :3] == pal[idx]).all()


def test_gif_interlaced_ours_to_imageio(spark):
    rng = _rng(13)
    pal = rng.integers(0, 256, (8, 3), np.uint8)
    idx = rng.integers(0, 8, (25, 14), np.uint8)
    theirs = _jvm_decode(spark, encode_gif(idx, pal, interlace=True))
    assert (theirs[:, :, :3] == pal[idx]).all()


def test_gif_imageio_to_ours(spark):
    """JVM-written GIF (its own palette quantization + LZW) → our
    decoder. Using few distinct colors keeps the JVM's quantizer
    lossless, so the comparison stays exact."""
    rng = _rng(17)
    base = (rng.integers(0, 6, (20, 27), np.uint8) * 40).astype(np.uint8)
    arr = np.stack([base, 255 - base, base // 2], axis=2)
    blob = _jvm_encode(spark, arr, "gif")
    assert blob is not None
    ours = decode_gif(blob)
    assert ours is not None and (ours == arr).all()


# ---------------------------------------------------------------------------
# BMP — exact both directions
# ---------------------------------------------------------------------------
def test_bmp_ours_to_imageio(spark):
    arr = _rng(19).integers(0, 256, (15, 22, 3), np.uint8)
    theirs = _jvm_decode(spark, encode_bmp(arr))
    assert (theirs[:, :, :3] == arr).all()


def test_bmp_imageio_to_ours(spark):
    arr = _rng(23).integers(0, 256, (17, 13, 3), np.uint8)
    blob = _jvm_encode(spark, arr, "bmp")
    assert blob is not None
    ours = decode_bmp(blob)
    assert ours is not None and (ours[:, :, :3] == arr).all()


# ---------------------------------------------------------------------------
# TIFF — exact both directions (Java 17 bundles the TIFF plugin)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("compression", [1, 5, 8, 32773], ids=["none", "lzw", "deflate", "packbits"])
def test_tiff_ours_to_imageio(spark, compression):
    arr = _rng(29 + compression).integers(0, 256, (14, 19, 3), np.uint8)
    theirs = _jvm_decode(spark, encode_tiff(arr, compression=compression))
    assert theirs is not None, f"ImageIO rejected our compression={compression} TIFF"
    assert (theirs[:, :, :3] == arr).all()


def test_tiff_lzw_predictor_ours_to_imageio(spark):
    arr = _rng(31).integers(0, 256, (12, 16, 3), np.uint8)
    theirs = _jvm_decode(spark, encode_tiff(arr, compression=5, predictor=2))
    assert theirs is not None and (theirs[:, :, :3] == arr).all()


def test_tiff_imageio_to_ours(spark):
    arr = _rng(37).integers(0, 256, (21, 11, 3), np.uint8)
    blob = _jvm_encode(spark, arr, "tiff")
    assert blob is not None
    ours = decode_tiff(blob)
    assert ours is not None and (ours[:, :, :3] == arr).all()


# ---------------------------------------------------------------------------
# JPEG — tolerance both directions (T.81 IDCT variance is conformant)
# ---------------------------------------------------------------------------
def _smooth(seed, h, w):
    y, x = np.mgrid[0:h, 0:w]
    base = 128 + 70 * np.sin(x / 7.0) * np.cos(y / 5.0)
    noise = _rng(seed).normal(0, 4, (h, w))
    g = np.clip(base + noise, 0, 255).astype(np.uint8)
    return np.stack([g, np.clip(g + 20, 0, 255), 255 - g], axis=2)


@pytest.mark.parametrize("subsample", [False, True], ids=["444", "420"])
def test_jpeg_ours_to_imageio(spark, subsample):
    arr = _smooth(41, 40, 48)
    blob = encode_jpeg(arr, quality=92, subsample=subsample)
    theirs = _jvm_decode(spark, blob)[:, :, :3].astype(int)
    ours = decode_jpeg(blob).astype(int)
    assert theirs.shape == ours.shape
    # two conforming decoders of the SAME stream: small per-sample
    # slack (IDCT variance; 4:2:0 additionally differs in chroma
    # upsampling interpolation, hence the looser mean there)
    diff = np.abs(theirs - ours)
    mean_tol = 4.0 if subsample else 2.0
    assert diff.mean() < mean_tol and diff.max() <= 24, (diff.mean(), diff.max())


def test_jpeg_progressive_ours_to_imageio(spark):
    arr = _smooth(43, 32, 40)
    blob = encode_jpeg_progressive(arr, quality=90)
    theirs = _jvm_decode(spark, blob)[:, :, :3].astype(int)
    ours = decode_jpeg(blob).astype(int)
    diff = np.abs(theirs - ours)
    assert diff.mean() < 2.0 and diff.max() <= 16, (diff.mean(), diff.max())


def test_jpeg_imageio_to_ours(spark):
    """A JVM-encoded JPEG (its own quant tables, optimized Huffman,
    4:2:0 choices) must decode in ours close to the source."""
    arr = _smooth(47, 48, 56)
    blob = _jvm_encode(spark, arr, "jpg")
    assert blob is not None
    ours = decode_jpeg(blob)
    assert ours is not None and ours.shape == arr.shape
    diff = np.abs(ours.astype(int) - arr.astype(int))
    assert diff.mean() < 6.0, diff.mean()


def test_tiff_lzw_boundary_crossing_both_ways(spark):
    """A 100x80 random RGB image pushes the LZW table through the
    511/1023/2047 width boundaries AND the 4094 reset — the exact
    range where r8's cross-validation caught a matched encoder/decoder
    early-change off-by-one (both sides switched one code before the
    libtiff convention; every in-repo roundtrip passed while real
    streams would desync at code 511)."""
    arr = _rng(53).integers(0, 256, (100, 80, 3), np.uint8)
    for predictor in (1, 2):
        blob = encode_tiff(arr, compression=5, predictor=predictor)
        theirs = _jvm_decode(spark, blob)
        assert theirs is not None and (theirs[:, :, :3] == arr).all()
        ours = decode_tiff(blob)
        assert (ours[:, :, :3] == arr).all()


def test_tiff_jdk_lzw_writer_to_ours(spark):
    """The JDK's own TIFF writer configured for LZW — a foreign
    encoder's width-change and reset choices — must decode bit-exactly
    in our decoder."""
    from anime_data_pipeline_spark.operators.imageio_bridge import jvm_write_image

    arr = _rng(59).integers(0, 256, (45, 60, 3), np.uint8)
    blob = jvm_write_image(
        spark._jvm, _jvm_image(spark, arr), "tiff", compression="LZW"
    )
    ours = decode_tiff(blob)
    assert ours is not None and (ours[:, :, :3] == arr).all()
# ---------------------------------------------------------------------------
# Width-boundary and bit-depth extensions (post-LZW-fix hardening)
# ---------------------------------------------------------------------------
def test_gif_256color_boundary_ours_to_imageio(spark):
    """A 256-color random frame pushes GIF-LZW through its 511/1023/
    2047 width boundaries — the family of off-by-ones the TIFF fix
    proved our roundtrips cannot see on their own."""
    rng = _rng(61)
    pal = rng.integers(0, 256, (256, 3), np.uint8)
    idx = rng.integers(0, 256, (80, 100), np.uint8)
    theirs = _jvm_decode(spark, encode_gif(idx, pal))
    assert theirs is not None and (theirs[:, :, :3] == pal[idx]).all()


def test_png_16bit_ours_to_imageio(spark):
    arr = _rng(67).integers(0, 65536, (10, 12), np.uint16).astype(np.uint16)
    blob = encode_png(arr)
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(blob))
    )
    assert img is not None
    w, h = img.getWidth(), img.getHeight()
    samples = np.array(
        list(img.getRaster().getSamples(0, 0, w, h, 0, None)), dtype=np.int64
    ).reshape(h, w)
    assert (samples == arr).all()


def test_bmp_rle8_ours_to_imageio(spark):
    rng = _rng(71)
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    # blocky content so RLE emits real runs AND absolute-mode sections
    idx = np.repeat(rng.integers(0, 16, (20, 8), np.uint8), 4, axis=1)
    idx[::5, 3] = 7
    theirs = _jvm_decode(spark, encode_bmp(idx, palette=pal, rle=True))
    assert theirs is not None and (theirs[:, :, :3] == pal[idx]).all()


# ---------------------------------------------------------------------------
# WAV — cross-validated against javax.sound.sampled (an independent
# PCM/G.711 implementation in the same JVM)
# ---------------------------------------------------------------------------
def _jvm_wav_bytes(spark, blob: bytes, to_pcm16: bool = False):
    """(format_name, raw frame bytes) via AudioSystem; optionally
    converted through the JVM's own codec chain to PCM_SIGNED 16."""
    jvm = spark._jvm
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(blob))
    )
    if to_pcm16:
        src = ais.getFormat()
        Enc = jvm.javax.sound.sampled.AudioFormat.Encoding
        tgt = jvm.javax.sound.sampled.AudioFormat(
            Enc.PCM_SIGNED,
            src.getSampleRate(),
            16,
            src.getChannels(),
            2 * src.getChannels(),
            src.getSampleRate(),
            False,
        )
        ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(tgt, ais)
    fmt = ais.getFormat()
    baos = jvm.java.io.ByteArrayOutputStream()
    ais.transferTo(baos)  # byte[] returns convert to Python bytes directly
    return str(fmt.getEncoding()), bytes(baos.toByteArray())


def test_wav_pcm16_ours_to_javasound(spark):
    from anime_data_pipeline_spark.operators.wav_codec import decode_wav, encode_wav

    rng = _rng(73)
    samples = rng.normal(0, 8000, (2000,)).clip(-32768, 32767).astype(np.int16)
    blob = encode_wav(samples, 16000, "pcm")
    enc, raw = _jvm_wav_bytes(spark, blob)
    assert enc == "PCM_SIGNED"
    theirs = np.frombuffer(raw, dtype="<i2")
    ours, rate = decode_wav(blob)
    assert rate == 16000 and (ours.ravel() == theirs).all()
    assert (theirs == samples).all()


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_wav_g711_expansion_matches_javasound(law, spark):
    """G.711 expansion tables are exact integer spec: our decode and
    the JVM's ULAW/ALAW→PCM16 converter must agree bit-for-bit."""
    from anime_data_pipeline_spark.operators.wav_codec import decode_wav, encode_wav

    rng = _rng(79)
    samples = rng.normal(0, 9000, (1500,)).clip(-32768, 32767).astype(np.int16)
    blob = encode_wav(samples, 8000, law)
    enc, raw = _jvm_wav_bytes(spark, blob, to_pcm16=True)
    theirs = np.frombuffer(raw, dtype="<i2")
    ours, rate = decode_wav(blob)
    assert rate == 8000 and ours.dtype == np.int16
    assert (ours.ravel() == theirs).all()


def test_jpeg_jdk_progressive_writer_to_ours(spark):
    """A JVM-written PROGRESSIVE JPEG (SOF2, the JDK's own scan-script
    choices — successive approximation + spectral selection orders our
    fixture writer never emits) must decode in our progressive path
    close to the source."""
    from anime_data_pipeline_spark.operators.imageio_bridge import jvm_write_image

    arr = _smooth(83, 48, 56)
    blob = jvm_write_image(
        spark._jvm, _jvm_image(spark, arr), "jpg", progressive=True
    )
    assert b"\xff\xc2" in blob  # SOF2: genuinely progressive
    ours = decode_jpeg(blob)
    assert ours is not None and ours.shape == arr.shape
    diff = np.abs(ours.astype(int) - arr.astype(int))
    assert diff.mean() < 6.0, diff.mean()

@pytest.mark.parametrize(
    "fmt,dtype",
    [("pcm", np.int32), ("float32", np.float32)],
    ids=["pcm32", "float32"],
)
def test_wav_wide_formats_match_javasound(fmt, dtype, spark):
    """32-bit PCM and IEEE-float WAVs: javax.sound parses both (as
    PCM_SIGNED 32 / PCM_FLOAT) — raw frame bytes must round-trip
    bit-exactly against our decode."""
    from anime_data_pipeline_spark.operators.wav_codec import decode_wav, encode_wav

    rng = _rng(89)
    if dtype is np.int32:
        samples = rng.normal(0, 2e6, 900).clip(-(2**31), 2**31 - 1).astype(np.int32)
    else:
        samples = rng.normal(0, 0.2, 900).astype(np.float32)
    blob = encode_wav(samples, 16000, fmt)
    enc, raw = _jvm_wav_bytes(spark, blob)
    theirs = np.frombuffer(raw, dtype=dtype.__name__ if dtype is np.float32 else "<i4")
    if dtype is np.float32:
        theirs = np.frombuffer(raw, dtype="<f4")
    ours, rate = decode_wav(blob)
    assert rate == 16000
    assert ours.ravel().tobytes() == theirs.tobytes()
    assert (ours.ravel() == samples).all()
