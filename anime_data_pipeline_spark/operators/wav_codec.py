"""Pure-stdlib WAV codec (struct + numpy) — un-stubs the AUDIO decode
path the way png/gif/jpeg/bmp_codec did for images: real RIFF/WAVE
PCM parsing with no soundfile/ffmpeg dependency.

The reference pipeline is image-centric; the audio family here is the
extension a large-scale multimodal training pipeline needs (SURVEY §6
/ the q87 chunk-plan flow). Supported: canonical RIFF/WAVE with a
PCM ``fmt `` chunk (format 1) at 8-bit unsigned or 16-bit/32-bit
signed little-endian, any channel count, extra chunks (LIST/INFO,
fact, cue) skipped per spec. Compressed formats (IEEE float, ADPCM,
MP3-in-WAV, format 0xFFFE extensible) and malformed/truncated chunks
return None — the dropped-with-count row, identical to the image
codecs' corrupt contract.

Scale note: decode runs inside the same Arrow-batched ``mapInPandas``
workers as the image codecs — row-parallel across clips; the per-clip
work is one numpy frombuffer/reshape, no Python sample loops. The
header-only ``wav_meta`` fast path never touches the data chunk's
bytes, so chunk PLANNING over petabytes of audio reads ~44 bytes per
clip (with parquet lazily materializing only the sliced binary).
"""

from __future__ import annotations

import struct

import numpy as np

RIFF_MAGIC = b"RIFF"

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def _chunks(data: bytes):
    """Yield (fourcc, start, size) for every top-level RIFF sub-chunk;
    chunk bodies are WORD-aligned (odd sizes carry a pad byte)."""
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _header(data: bytes):
    """(sample_rate, channels, bits, data_start, data_size) or None."""
    if len(data) < 44 or data[:4] != RIFF_MAGIC or data[8:12] != b"WAVE":
        return None
    fmt = None
    pcm = None
    for fourcc, start, size in _chunks(data):
        if fourcc == b"fmt " and size >= 16 and start + 16 <= len(data):
            audio_fmt, ch, rate = struct.unpack("<HHI", data[start : start + 8])
            bits = struct.unpack("<H", data[start + 14 : start + 16])[0]
            fmt = (audio_fmt, ch, rate, bits)
        elif fourcc == b"data":
            if start + size > len(data):
                return None  # truncated payload
            pcm = (start, size)
        if fmt and pcm:
            break
    if fmt is None or pcm is None:
        return None
    audio_fmt, ch, rate, bits = fmt
    if audio_fmt != 1 or ch == 0 or rate <= 0 or bits not in _PCM_DTYPES:
        return None  # compressed/extensible formats → unsupported
    frame = ch * bits // 8
    if frame == 0 or pcm[1] % frame != 0:
        return None
    return rate, ch, bits, pcm[0], pcm[1]


def wav_meta(data: bytes) -> tuple[int, int, int, int] | None:
    """Header-only (sample_rate, n_samples, channels, bits) — O(header)
    regardless of clip length: the fast path for chunk planning."""
    hdr = _header(data)
    if hdr is None:
        return None
    rate, ch, bits, _start, size = hdr
    return rate, size // (ch * bits // 8), ch, bits


def decode_wav(data: bytes) -> tuple[np.ndarray, int] | None:
    """WAV bytes → (samples (n, channels), sample_rate). Dtype follows
    the container (uint8 / int16 / int32 little-endian) — feature
    extractors normalize downstream, mirroring how the image chain
    keeps 16-bit PNG samples true. None for corrupt/unsupported."""
    hdr = _header(data)
    if hdr is None:
        return None
    rate, ch, bits, start, size = hdr
    flat = np.frombuffer(data, dtype=_PCM_DTYPES[bits], count=size // (bits // 8), offset=start)
    return flat.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) or (n,) uint8/int16/int32 array → canonical
    RIFF/WAVE PCM bytes (fixture writer; output opens in any player)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    bits = a.dtype.itemsize * 8
    if bits not in _PCM_DTYPES:
        raise ValueError("samples must be uint8, int16, or int32")
    a = a.astype(_PCM_DTYPES[bits])
    n, ch = a.shape
    body = a.tobytes()
    byte_rate = sample_rate * ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * bits // 8, bits)
    out = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    if len(body) & 1:
        out += b"\x00"
    return RIFF_MAGIC + struct.pack("<I", len(out)) + out
