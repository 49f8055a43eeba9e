"""Multimodal (image/audio/video) columns over opaque binary payloads
(SURVEY S7, M1-adjacent; BASELINE.json north_star: "multimodal
columns").

Design: media rides through the engine as ``content: binary`` plus a
TYPED metadata struct; decode / feature-extract / resize / frame-sample
are Arrow-batched ``mapInPandas`` stages with explicit output schemas.
At 100 TB the binary column dominates I/O, so every stage here:

- declares an explicit schema (no inference on the hot path),
- prunes ``content`` as soon as the pixels are consumed (metadata-only
  columns continue downstream),
- is map-only (partition-parallel, no shuffle), with per-batch
  vectorized decode.

Codec status: **every modality decodes for real** — eight pure-stdlib
codecs, no PIL/cv2/soundfile/ffmpeg needed. Images: PNG (full spec
matrix: 1/2/4/8/16-bit, Adam7 — png_codec.py), GIF (LZW + interlace —
gif_codec.py), JPEG (baseline + progressive Huffman — jpeg_codec.py),
BMP (uncompressed 1/4/8/24/32-bit + RLE4/RLE8 — bmp_codec.py),
baseline TIFF (both byte orders, none/LZW/Deflate/PackBits, predictor, 8- and
16-bit samples, strip- AND tile-organized, gray/RGB/RGBA/palette —
tiff_codec.py), and WebP (VP8L lossless full decode: prefix codes,
color cache, LZ77 plane-mapped references, all four transforms —
webp_codec.py; header meta also parses lossy VP8 and VP8X canvases):
header meta AND full pixels for the inference preprocessing chain. Audio: WAV RIFF (wav_codec.py) — PCM
8/16/24/32-bit, IEEE float32, G.711 µ-law/A-law companding, and IMA
ADPCM 4-bit blocks — with a header-only fast path for chunk planning
and a full-sample stats gate. Video: MJPEG-AVI (avi_codec.py) —
header-only frame-offset walk, only sampled frames' byte ranges
JPEG-decode — AND animated GIF (gif_codec.decode_gif_frames, real
GIF89a compositing; frames are deltas so one compositor pass serves a
sampling lattice). Arithmetic-coded JPEG (SOF9/SOF10) decodes
natively since round 8 (jpeg_arith.py, QM-coder cross-validated
against the system libjpeg), lossless JPEG (SOF3, all seven Annex-H
predictors) since round 9 (jpeg_lossless.py), and lossy-VP8 WebP
through the libwebp binding; only the true exotics — hierarchical /
arithmetic-lossless JPEG, 12/16-bit-precision JPEG, MP3-in-WAV,
non-MJPEG/GIF video — still
fall through to the PIL/ffmpeg seams (absent in this container); the
deterministic FIMG/FAUD/FVID fake containers remain for
oracle-checkable synthetic corpora. The Spark plumbing — schemas,
batch iteration, null-for-corrupt, partitioning — is identical across
all of them.

FIMG container: b"FIMG" | width:int32le | height:int32le | mode:1 byte
(R=RGB, A=RGBA, L=gray, P=palette) | payload bytes. The payload stands
in for pixels; features derive from it deterministically.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anime_data_pipeline_spark.functions.hashing import P, hash_chain, polyhash_py

FIMG_MAGIC = b"FIMG"
_MODES = {82: "RGB", 65: "RGBA", 76: "L", 80: "P"}

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


_MODE_BYTES = {"RGB": b"R", "RGBA": b"A", "L": b"L", "P": b"P"}


def encode_fimg(width: int, height: int, mode: str = "RGB", payload: bytes = b"") -> bytes:
    """Build a FIMG blob (test fixtures / synthetic corpora)."""
    return FIMG_MAGIC + struct.pack("<ii", width, height) + _MODE_BYTES[mode] + payload


def _decode_real(content: bytes) -> tuple[int, int, str] | None:
    """Real codec dispatch by magic bytes. PNG (every spec-valid
    depth/color/interlace combination), GIF (87a/89a), JPEG (any SOFn
    for header meta), BMP (uncompressed + RLE4/RLE8, any palette
    depth), baseline TIFF (both byte orders, none/LZW/PackBits), and
    WebP (VP8L lossless; meta-only for lossy VP8/VP8X) decode NATIVELY
    via the stdlib codecs: header meta here, full pixels via
    ``image_pixel_decoder_loader``. Only formats outside
    {PNG,GIF,JPEG,BMP,TIFF,WEBP} still need PIL (reference
    dbimutils.py:6-26) — unavailable in this container, so they
    raise; corrupt bytes behind a valid magic return None
    (dropped-with-count row, reference bucket_manager.py:187-189)."""
    from anime_data_pipeline_spark.operators.bmp_codec import BMP_MAGIC, bmp_meta
    from anime_data_pipeline_spark.operators.gif_codec import GIF_MAGICS, gif_meta
    from anime_data_pipeline_spark.operators.jpeg_codec import JPEG_MAGIC, jpeg_meta
    from anime_data_pipeline_spark.operators.png_codec import PNG_MAGIC, png_meta
    from anime_data_pipeline_spark.operators.tiff_codec import TIFF_MAGICS, tiff_meta
    from anime_data_pipeline_spark.operators.webp_codec import (
        RIFF_MAGIC,
        WEBP_FOURCC,
        webp_meta,
    )

    if content[:8] == PNG_MAGIC:
        return png_meta(content)
    if content[:6] in GIF_MAGICS:
        return gif_meta(content)
    if content[:3] == JPEG_MAGIC:
        return jpeg_meta(content)
    if content[:2] == BMP_MAGIC:
        return bmp_meta(content)
    if content[:4] in TIFF_MAGICS:
        return tiff_meta(content)
    if content[:4] == RIFF_MAGIC and content[8:12] == WEBP_FOURCC:
        return webp_meta(content)  # meta covers VP8L, lossy VP8, and VP8X
    raise NotImplementedError(
        "non-{PNG,GIF,JPEG,BMP,TIFF,WEBP} codecs not available in this environment"
    )


def _decode_default(content: bytes) -> tuple[int, int, str] | None:
    """Default per-blob decode: FIMG stub container OR a real PNG /
    GIF / JPEG / BMP / TIFF / WebP; None for anything else
    (corrupt/foreign bytes)."""
    from anime_data_pipeline_spark.operators.bmp_codec import BMP_MAGIC, bmp_meta
    from anime_data_pipeline_spark.operators.gif_codec import GIF_MAGICS, gif_meta
    from anime_data_pipeline_spark.operators.jpeg_codec import JPEG_MAGIC, jpeg_meta
    from anime_data_pipeline_spark.operators.png_codec import PNG_MAGIC, png_meta
    from anime_data_pipeline_spark.operators.tiff_codec import TIFF_MAGICS, tiff_meta

    if content[:4] == FIMG_MAGIC:
        return _decode_fimg(content)
    if content[:8] == PNG_MAGIC:
        return png_meta(content)
    if content[:6] in GIF_MAGICS:
        return gif_meta(content)
    if content[:3] == JPEG_MAGIC:
        return jpeg_meta(content)
    if content[:2] == BMP_MAGIC:
        return bmp_meta(content)
    if content[:4] in TIFF_MAGICS:
        return tiff_meta(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        from anime_data_pipeline_spark.operators.webp_codec import webp_meta

        return webp_meta(content)
    return None


def png_pixel_decoder_loader() -> "Callable[[], Callable]":
    """Loader yielding the FULL pixel decode (bytes → (h, w, ch) uint8
    numpy array, palette expanded to RGB) — feeds the numpy
    preprocessing chain in operators/inference.py (pad-square → resize
    → BGR) exactly where a PIL decode would."""

    def load() -> "Callable[[bytes], np.ndarray | None]":
        from anime_data_pipeline_spark.operators.png_codec import (
            decode_png,
            decode_png_palette,
            palette_to_rgb,
        )

        def decode(content: bytes) -> "np.ndarray | None":
            arr = decode_png(content)
            if arr is None:
                return None
            if arr.shape[2] == 1:
                plte = decode_png_palette(content)
                if plte is not None:
                    return palette_to_rgb(arr, plte)
            return arr

        return decode

    return load


def image_pixel_decoder_loader() -> "Callable[[], Callable]":
    """Loader yielding the FULL pixel decode for every natively-coded
    format — PNG (palette expanded), GIF (first frame, palette
    expanded), JPEG (baseline + progressive), BMP, baseline TIFF
    (palette expanded) — dispatched by magic bytes; bytes →
    (h, w, ch) uint8 numpy array, None for corrupt/unsupported. Feeds
    the numpy preprocessing chain in operators/inference.py exactly
    where a PIL decode would."""

    def load() -> "Callable[[bytes], np.ndarray | None]":
        from anime_data_pipeline_spark.operators.bmp_codec import (
            BMP_MAGIC,
            decode_bmp,
        )
        from anime_data_pipeline_spark.operators.gif_codec import (
            GIF_MAGICS,
            decode_gif,
        )
        from anime_data_pipeline_spark.operators.jpeg_codec import (
            JPEG_MAGIC,
            decode_jpeg,
        )
        from anime_data_pipeline_spark.operators.png_codec import PNG_MAGIC
        from anime_data_pipeline_spark.operators.tiff_codec import (
            TIFF_MAGICS,
            decode_tiff,
        )
        from anime_data_pipeline_spark.operators.webp_codec import (
            RIFF_MAGIC,
            WEBP_FOURCC,
            decode_webp,
        )

        png_decode = png_pixel_decoder_loader()()

        def decode(content: bytes) -> "np.ndarray | None":
            if content[:8] == PNG_MAGIC:
                return png_decode(content)
            if content[:6] in GIF_MAGICS:
                return decode_gif(content)
            if content[:3] == JPEG_MAGIC:
                arr = decode_jpeg(content)
                if arr is not None and arr.ndim == 2:
                    arr = arr[:, :, None]
                return arr
            if content[:2] == BMP_MAGIC:
                return decode_bmp(content)
            if content[:4] in TIFF_MAGICS:
                return decode_tiff(content)
            if content[:4] == RIFF_MAGIC and content[8:12] == WEBP_FOURCC:
                try:
                    return decode_webp(content)  # VP8L lossless
                except NotImplementedError:
                    return None  # lossy VP8 pixels: the PIL seam
            return None

        return decode

    return load


def pil_decoder_loader() -> "Callable[[], Callable]":
    """Loader for the REAL codec path, mirroring the model-loader
    injection pattern (operators/inference.py): returns a zero-arg
    callable that imports PIL ONCE per Python worker and yields the
    per-blob decode function. Pass it to ``decode_image_meta`` when PIL
    is available; everything else (schema, batching, null-for-corrupt)
    is unchanged — the seam is the function boundary.

    The real decode must reproduce the reference's handling
    (dbimutils.py:6-26): animated GIF → first frame, 16-bit → 8-bit
    scale-down, alpha → composite over white, palette → RGB.
    """

    def load() -> "Callable[[bytes], tuple[int, int, str] | None]":
        import io

        from PIL import Image  # absent in this container; the seam is real

        def decode(content: bytes) -> tuple[int, int, str] | None:
            try:
                img = Image.open(io.BytesIO(content))
                return img.width, img.height, img.mode
            except Exception:
                return None

        return decode

    return load


def _decode_fimg(content: bytes | None) -> tuple[int, int, str] | None:
    """Deterministic stub decode; None for corrupt/foreign payloads
    (the reference maps decode failure to a dropped-with-count row,
    bucket_manager.py:187-189)."""
    if content is None or len(content) < 13 or content[:4] != FIMG_MAGIC:
        return None
    w, h = struct.unpack("<ii", content[4:12])
    mode = _MODES.get(content[12])
    if mode is None or w <= 0 or h <= 0:
        return None
    return w, h, mode


_DECODER_CACHE: dict = {}


def decode_image_meta(
    df: DataFrame,
    content_col: str = "content",
    decoder_loader=None,
) -> DataFrame:
    """mapInPandas decode: binary → typed image_meta struct (null when
    undecodable). Schema = input schema + image_meta; Arrow moves the
    binary column in vectorized batches.

    ``decoder_loader`` injects the codec (``pil_decoder_loader`` for
    real images): a zero-arg callable returning ``bytes -> (w, h, mode)
    | None``, built once per Python worker and memoized — the same
    executor-cache pattern as the inference model loader. Default is
    the deterministic FIMG stub."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("image_meta", IMAGE_META_SCHEMA)])
    cache_key = (
        f"{getattr(decoder_loader, '__module__', 'stub')}."
        f"{getattr(decoder_loader, '__qualname__', 'fimg')}"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder_loader is None:
            dec = _decode_default
        else:
            dec = _DECODER_CACHE.get(cache_key)
            if dec is None:
                dec = decoder_loader()
                _DECODER_CACHE[cache_key] = dec
        for pdf in batches:
            metas = []
            for content in pdf[content_col]:
                d = dec(bytes(content)) if content is not None else None
                metas.append(
                    None
                    if d is None
                    else {
                        "width": d[0],
                        "height": d[1],
                        "mode": d[2],
                        "n_bytes": len(content),
                    }
                )
            pdf = pdf.copy()
            pdf["image_meta"] = metas
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
        T.StructField("px_mean", T.DoubleType()),
    ]
)


def decode_image_pixel_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas FULL pixel decode (PNG/GIF/JPEG incl. progressive
    via the stdlib codecs) → per-image pixel stats struct, null when
    the bytes don't decode. Unlike ``decode_image_meta`` (header-only
    fast path) this inflates every pixel, so a Huffman/IDCT/palette
    bug that leaves the header intact still surfaces — q151 gates on
    it. Same Arrow-batched row-parallel shape as the meta decode;
    stats are O(pixels) numpy reductions per image."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("pixel_stats", PIXEL_STATS_SCHEMA)]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _DECODER_CACHE.get("pixel_stats")
        if dec is None:
            dec = image_pixel_decoder_loader()()
            _DECODER_CACHE["pixel_stats"] = dec
        for pdf in batches:
            stats = []
            for content in pdf[content_col]:
                arr = dec(bytes(content)) if content is not None else None
                if arr is None:
                    stats.append(None)
                    continue
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                stats.append(
                    {
                        "height": int(arr.shape[0]),
                        "width": int(arr.shape[1]),
                        "channels": int(arr.shape[2]),
                        "px_min": int(arr.min()),
                        "px_max": int(arr.max()),
                        "px_mean": float(arr.mean()),
                    }
                )
            pdf = pdf.copy()
            pdf["pixel_stats"] = stats
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


FEATURE_DIM = 16


def payload_text(content: bytes) -> str:
    """The 'pixels' a stub model sees: the FIMG payload decoded as UTF-8
    (for FIMG blobs), else the latin-1 view of the raw bytes. Stub
    models hash THIS via the cross-engine polyhash family so a DuckDB
    oracle can recompute their outputs from the source `documents.text`
    (the corpora synthesize payloads as text[:64])."""
    if content[:4] == FIMG_MAGIC and len(content) >= 13:
        return content[13:].decode("utf-8", errors="replace")
    return content.decode("latin-1")


def extract_features(
    df: DataFrame, content_col: str = "content", dim: int = FEATURE_DIM
) -> DataFrame:
    """mapInPandas feature extraction: binary → float32 embedding.

    Stub model: component j = ((r_j·H + s_j) mod P) / P * 2 - 1 with
    H = polyhash(payload) and r/s from the non-affine hash_chain
    constant family. Any single-string-family spelling
    (polyhash(payload+j) or polyhash(j+payload)) is AFFINE in j under
    a rolling hash — every vector becomes an arithmetic progression
    mod P and unrelated payloads reach cosine ≥ 0.99, which collapsed
    embedding dedup (caught by q106) —
    ``dim`` floats in [-1, 1), recomputable in SQL (see q72's oracle).
    A real vision encoder slots into ``_embed_batch`` (per-executor
    model cache, batched forward pass — same shape as the M1 tagger
    stage in operators/inference.py)."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def _embed_batch(contents: pd.Series) -> list:
        out = []
        rs, ss = hash_chain(1, dim), hash_chain(2, dim)
        for content in contents:
            if content is None:
                out.append(None)
                continue
            h = polyhash_py(payload_text(bytes(content)))
            out.append(
                np.array(
                    [
                        float((rs[j] * h + ss[j]) % P) / float(P) * 2 - 1
                        for j in range(dim)
                    ],
                    dtype=np.float32,
                )
            )
        return out

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = _embed_batch(pdf[content_col])
            yield pdf

    return df.mapInPandas(extract, schema=out_schema)


FAUD_MAGIC = b"FAUD"

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def encode_faud(
    sample_rate: int, n_samples: int, channels: int = 1, payload: bytes = b""
) -> bytes:
    """FAUD container: magic | rate:int32le | samples:int64le |
    channels:1 byte | payload (stands in for PCM)."""
    return (
        FAUD_MAGIC
        + struct.pack("<iq", sample_rate, n_samples)
        + bytes([channels])
        + payload
    )


def _decode_faud(content: bytes | None) -> tuple[int, int, int] | None:
    if content is None or len(content) < 17 or content[:4] != FAUD_MAGIC:
        return None
    rate, n = struct.unpack("<iq", content[4:16])
    ch = content[16]
    if rate <= 0 or n < 0 or ch == 0:
        return None
    return rate, n, ch


def decode_audio_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas audio decode: binary → typed audio_meta struct.
    Dispatch by magic: real RIFF/WAVE PCM decodes natively
    (operators/wav_codec.py, header-only fast path — the data chunk is
    never read for planning), the FAUD stub container covers synthetic
    corpora, anything else (incl. compressed formats a soundfile/
    ffmpeg seam would own) → null."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("audio_meta", AUDIO_META_SCHEMA)]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from anime_data_pipeline_spark.operators.wav_codec import RIFF_MAGIC, wav_meta

        for pdf in batches:
            metas = []
            for content in pdf[content_col]:
                b = bytes(content) if content is not None else None
                d = _decode_faud(b)
                if d is None and b is not None and b[:4] == RIFF_MAGIC:
                    w = wav_meta(b)
                    if w is not None:
                        d = (w[0], w[1], w[2])
                metas.append(
                    None
                    if d is None
                    else {
                        "sample_rate": d[0],
                        "n_samples": d[1],
                        "channels": d[2],
                        "duration_s": d[1] / d[0],
                    }
                )
            pdf = pdf.copy()
            pdf["audio_meta"] = metas
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("n_samples", T.LongType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("s_min", T.LongType()),
        T.StructField("s_max", T.LongType()),
        T.StructField("s_mean", T.DoubleType()),
    ]
)


def decode_audio_sample_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas FULL PCM decode (WAV via the stdlib codec) →
    per-clip sample stats, null when the bytes don't decode. The audio
    twin of decode_image_pixel_stats: inflating every sample means an
    endianness, bit-depth, or interleave bug that leaves the header
    intact still surfaces — q178 gates on it."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("sample_stats", AUDIO_STATS_SCHEMA)]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from anime_data_pipeline_spark.operators.wav_codec import decode_wav

        for pdf in batches:
            stats = []
            for content in pdf[content_col]:
                out = decode_wav(bytes(content)) if content is not None else None
                if out is None:
                    stats.append(None)
                    continue
                samples, _rate = out
                if samples.dtype.kind == "f" and samples.size:
                    if not np.isfinite(samples).all():
                        stats.append(None)  # NaN/inf payload: corrupt clip
                        continue
                    # floor/ceil instead of int() truncation so [-1, 1]
                    # float audio keeps a meaningful integer envelope
                    s_min = int(np.floor(samples.min()))
                    s_max = int(np.ceil(samples.max()))
                elif samples.size:
                    s_min, s_max = int(samples.min()), int(samples.max())
                else:
                    s_min = s_max = 0
                stats.append(
                    {
                        "n_samples": int(samples.shape[0]),
                        "channels": int(samples.shape[1]),
                        "s_min": s_min,
                        "s_max": s_max,
                        # float64 accumulator: float32 clips would
                        # otherwise lose mean exactness past 2^24
                        "s_mean": float(samples.mean(dtype=np.float64))
                        if samples.size
                        else 0.0,
                    }
                )
            pdf = pdf.copy()
            pdf["sample_stats"] = stats
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


AUDIO_QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("n_samples", T.LongType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("n_zero_cross", T.LongType()),
        T.StructField("clip_rate", T.DoubleType()),
        T.StructField("is_silence", T.BooleanType()),
    ]
)

def _wav_full_scale(data: bytes) -> float:
    """|full-scale| of the CONTAINER, not the decoded numpy dtype:
    24-bit PCM decodes to int32 but rails at ±(2^23-1), and the G.711
    codebooks top out at 32256 (A-law) / 32124 (µ-law) — keying on the
    decoded dtype would make a hard-clipped 24-bit or G.711 clip
    invisible to the hygiene filter."""
    from anime_data_pipeline_spark.operators.wav_codec import (
        FMT_ALAW,
        FMT_FLOAT,
        FMT_IMA,
        FMT_ULAW,
        _header,
    )

    hdr = _header(data)
    if hdr is None:
        return float("inf")
    fmt, _rate, _ch, bits, *_ = hdr
    if fmt == FMT_FLOAT:
        return 1.0
    if fmt == FMT_ALAW:
        return 32256.0
    if fmt == FMT_ULAW:
        return 32124.0
    if fmt == FMT_IMA:
        return 32767.0
    return {8: 127.0, 16: 32767.0, 24: 8388607.0, 32: 2147483647.0}.get(
        bits, float("inf")
    )


def audio_quality_features(samples: np.ndarray, full_scale: float) -> dict:
    """The per-clip feature math (shared by the operator and its
    property tests so a regression here can't hide behind a duplicated
    formula): peak/RMS/clip over every channel sample, zero crossings
    on the mono downmix."""
    center = 128.0 if samples.dtype == np.uint8 else 0.0
    centered = samples.astype(np.float64) - center
    amag = np.abs(centered)
    rms = float(np.sqrt(np.mean(np.square(centered))))
    mono = centered.mean(axis=1)
    return {
        "n_samples": int(samples.shape[0]),
        "channels": int(samples.shape[1]),
        "peak": float(amag.max()),
        "rms": rms,
        "n_zero_cross": int(np.sum(mono[1:] * mono[:-1] < 0.0)),
        "clip_rate": float(np.mean(amag >= full_scale)),
        "is_silence": bool(rms < 1e-12),
    }


def decode_audio_quality(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas FULL decode → the audio-hygiene features a speech
    training pipeline filters on BEFORE expensive transcription:
    peak / RMS energy over every channel sample (silence detection that
    anti-phase stereo can't fool), zero crossings on the mono downmix
    (degenerate constant/DC payloads have none; broadband audio has
    many), and clip rate (fraction of channel samples pinned at the
    CONTAINER's full scale — hard-clipped sources poison ASR training,
    and one pinned channel must not hide behind a quiet one).
    Null struct for undecodable bytes, so the corrupt path stays a
    dropped-with-count row (q184 gates the whole chain on a square-wave
    corpus whose features are integer-exact closed forms).

    All arithmetic is float64 numpy over the Arrow batch — the per-clip
    Python loop does O(1) vector ops per clip."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("audio_quality", AUDIO_QUALITY_SCHEMA)]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from anime_data_pipeline_spark.operators.wav_codec import decode_wav

        for pdf in batches:
            rows = []
            for content in pdf[content_col]:
                content_b = bytes(content) if content is not None else None
                out = decode_wav(content_b) if content_b is not None else None
                if out is None or out[0].size == 0:
                    rows.append(None)
                    continue
                samples, _rate = out
                if samples.dtype.kind == "f" and not np.isfinite(samples).all():
                    rows.append(None)
                    continue
                # reuse the one materialized copy — the full-scale lookup
                # only re-reads the header
                rows.append(
                    audio_quality_features(samples, _wav_full_scale(content_b))
                )
            pdf = pdf.copy()
            pdf["audio_quality"] = rows
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def audio_chunk_plan(
    df: DataFrame, chunk_s: float = 30.0, meta_col: str = "audio_meta"
) -> DataFrame:
    """Chunk audio into fixed-duration segments as a plan: one row per
    (key, chunk_no, start_sample, end_sample) — each chunk then decodes
    independently (the whisper-style long-audio pattern)."""
    rate = F.col(f"{meta_col}.sample_rate").cast("long")
    n = F.col(f"{meta_col}.n_samples")
    chunk_len = (rate * F.lit(chunk_s)).cast("long")
    n_chunks = F.ceil(n / chunk_len).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    return (
        df.withColumn("_chunks", idx)
        .select("*", F.explode("_chunks").alias("chunk_no"))
        .drop("_chunks")
        .withColumn("start_sample", F.col("chunk_no") * chunk_len)
        .withColumn("end_sample", F.least(n, (F.col("chunk_no") + 1) * chunk_len))
    )


def resize_plan(
    df: DataFrame, target_w: Column, target_h: Column
) -> DataFrame:
    """Resize as METADATA transformation (scale factors + output dims);
    the pixel resample itself belongs to the stubbed codec layer. Pure
    column math — mirrors bucket_manager.py:111-117's scale-to-fit."""
    w = F.col("image_meta.width").cast("double")
    h = F.col("image_meta.height").cast("double")
    scale = F.when(
        target_w / target_h > w / h, target_h.cast("double") / h
    ).otherwise(target_w.cast("double") / w)
    return (
        df.withColumn("resize_scale", scale)
        .withColumn("resized_w", F.floor(w * scale + 0.5).cast("int"))
        .withColumn("resized_h", F.floor(h * scale + 0.5).cast("int"))
    )


def frame_sample_plan(
    df: DataFrame, n_frames_col: str, every_n: int = 30, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling as a plan: emit one row per sampled frame
    index (stride ``every_n``, capped at ``max_frames``) — the decode
    of each sampled frame is then a batched binary stage like
    decode_image_meta. posexplode keeps (key, frame_no) deterministic."""
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.col(n_frames_col) - 1, F.lit(every_n) * (F.lit(max_frames) - 1)
        ),
        F.lit(every_n),
    )
    return df.withColumn("_frames", idx).select(
        "*", F.posexplode("_frames").alias("sample_pos", "frame_no")
    ).drop("_frames")


# ---------------------------------------------------------------------------
# Video columns (FVID stub container): frame sampling
# ---------------------------------------------------------------------------
FVID_MAGIC = b"FVID"

FRAME_SCHEMA_FIELDS = [
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_hash", T.LongType()),
]


def encode_fvid(n_frames: int, fps: int = 24, payload: bytes = b"") -> bytes:
    """Build an FVID blob (synthetic corpora / fixtures)."""
    return FVID_MAGIC + struct.pack("<ii", n_frames, fps) + payload


def _decode_fvid(content: bytes | None) -> tuple[int, int, bytes] | None:
    """Stub video header decode → (n_frames, fps, payload); None for
    corrupt. A real decoder (pyav/ffmpeg) drops in through the same
    loader-injection seam as decode_image_meta."""
    if content is None or len(content) < 12 or content[:4] != FVID_MAGIC:
        return None
    n_frames, fps = struct.unpack("<ii", content[4:12])
    if n_frames <= 0 or fps <= 0:
        return None
    return n_frames, fps, content[12:]


def sample_video_frames(
    df: DataFrame, content_col: str = "content", every_k: int = 4
) -> DataFrame:
    """Frame sampling over video binary columns: one output row per
    sampled frame (every ``every_k``-th), carrying a deterministic
    frame fingerprint — the Spark-side plumbing (schema, Arrow
    batching, per-row explode inside mapInPandas, corrupt → zero rows)
    for the decode-and-sample stage of a video pipeline.

    The stub "frame" is a polyhash-family function of (payload, index),
    so the whole operator is DuckDB-oracle-checkable; a real decoder
    (frame extraction via pyav) replaces ``_decode_fvid`` through
    loader injection without touching the explode/batch mechanics.

    At scale this is the row-multiplying stage (≥1 row per sampled
    frame): keep it AFTER pushed-down metadata filters, and size
    ``spark.sql.files.maxPartitionBytes`` for the multiplied output,
    not the input."""
    passthrough = [f for f in df.schema.fields if f.name != content_col]
    out_schema = T.StructType(passthrough + FRAME_SCHEMA_FIELDS)
    pass_names = [f.name for f in passthrough]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in pass_names}
            idxs: list[int] = []
            hashes: list[int] = []
            for i in range(len(pdf)):
                content = pdf[content_col].iloc[i]
                d = _decode_fvid(bytes(content) if content is not None else None)
                if d is None:
                    continue
                n_frames, _fps, payload = d
                ph = polyhash_py(payload.decode("utf-8", errors="replace"))
                for fi in range(0, n_frames, every_k):
                    for c in pass_names:
                        out[c].append(pdf[c].iloc[i])
                    idxs.append(fi)
                    hashes.append((ph * 31 + fi) % P)
            out["frame_idx"] = idxs
            out["frame_hash"] = hashes
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(sample, schema=out_schema)


AVI_FRAME_FIELDS = [
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("fps", T.IntegerType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("f_min", T.IntegerType()),
    T.StructField("f_max", T.IntegerType()),
    T.StructField("f_w", T.IntegerType()),
    T.StructField("f_h", T.IntegerType()),
]


def sample_video_frame_stats(
    df: DataFrame, content_col: str = "content", every_k: int = 4
) -> DataFrame:
    """REAL video frame sampling: MJPEG-AVI, animated-GIF, or
    animated-WebP (VP8X/ANMF, VP8L frames — round 7) binary → one row
    per sampled frame with FULL-decode pixel stats —
    the ``sample_video_frames`` plumbing running actual container
    parses (operators/avi_codec.py, gif_codec.py) instead of the FVID
    stub. Corrupt containers → zero rows (dropped, countable upstream
    via the meta stage); q179 gates the stats against a closed-form
    fill per (doc, frame). GIFs report fps 0 (the container stores
    per-frame delays, not a rate).

    Scale shape: both container walks read chunk headers only to lay
    out the lattice. AVI then decodes exactly the sampled frames' byte
    ranges; GIF frames are deltas, so the compositor decodes 0..max
    sampled ONCE for all lattice indices (decode_gif_frames takes the
    whole lattice in one call). Same row-multiplying caveat as
    sample_video_frames — keep it AFTER pushed-down filters."""
    passthrough = [f for f in df.schema.fields if f.name != content_col]
    out_schema = T.StructType(passthrough + AVI_FRAME_FIELDS)
    pass_names = [f.name for f in passthrough]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from anime_data_pipeline_spark.operators.avi_codec import (
            avi_meta,
            decode_avi_frames,
        )
        from anime_data_pipeline_spark.operators.gif_codec import (
            GIF_MAGICS,
            decode_gif_lattice,
            gif_meta,
        )
        from anime_data_pipeline_spark.operators.webp_codec import (
            decode_webp_lattice,
        )

        for pdf in batches:
            out: dict[str, list] = {c: [] for c in pass_names}
            cols: dict[str, list] = {f.name: [] for f in AVI_FRAME_FIELDS}

            def emit(row_i, w, h, n_frames, fps, fi, arr):
                for c in pass_names:
                    out[c].append(pdf[c].iloc[row_i])
                cols["width"].append(w)
                cols["height"].append(h)
                cols["n_frames"].append(n_frames)
                cols["fps"].append(fps)
                cols["frame_idx"].append(fi)
                cols["f_min"].append(int(arr.min()))
                cols["f_max"].append(int(arr.max()))
                cols["f_w"].append(int(arr.shape[1]))
                cols["f_h"].append(int(arr.shape[0]))

            for i in range(len(pdf)):
                content = pdf[content_col].iloc[i]
                b = bytes(content) if content is not None else b""
                if b[:6] in GIF_MAGICS:
                    meta = gif_meta(b)
                    res = decode_gif_lattice(b, every_k)  # one container walk
                    if meta is None or res is None:
                        continue
                    w, h, _mode = meta
                    count, frames = res
                    for fi in sorted(frames):
                        emit(i, w, h, count, 0, fi, frames[fi])
                    continue
                if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
                    try:
                        res = decode_webp_lattice(b, every_k)
                    except NotImplementedError:
                        res = None  # lossy-VP8 frames: the PIL seam → drop clip
                    if res is None:
                        continue
                    count, frames = res
                    first = frames[min(frames)]  # canvas dims ride the frames
                    # per-frame delays like GIF → fps 0
                    for fi in sorted(frames):
                        emit(i, first.shape[1], first.shape[0], count, 0, fi, frames[fi])
                    continue
                meta = avi_meta(b)
                if meta is None:
                    continue
                w, h, n_frames, fps = meta
                for fi, arr in decode_avi_frames(b, every_k=every_k) or []:
                    emit(i, w, h, n_frames, fps, fi, arr)
            out.update(cols)
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(sample, schema=out_schema)


# back-compat name used by earlier round-6 call sites/tests
sample_avi_frame_stats = sample_video_frame_stats
