"""Pure-stdlib PNG codec (zlib + struct + numpy) — un-stubs the real
image-decode path (SURVEY S7) for PNG without any codec library.

The reference decodes real images with PIL (bucket_manager.py:180-189;
dbimutils.py:6-26 preprocessing). This container has no PIL/cv2, but
PNG's container format needs only ``zlib`` (inflate) plus the five
scanline filters from the PNG spec — all stdlib/numpy. Supported:
non-interlaced, bit depth 8, color types 0 (gray → "L"), 2 ("RGB"),
3 (palette → "P"), 4 (gray+alpha → "LA"), 6 ("RGBA") — i.e. every PNG
a normal exporter writes except interlaced/16-bit, which fall through
to the PIL seam like JPEG/GIF.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` workers
(operators/multimodal.py) — per-executor, embarrassingly parallel; the
per-row Python cost is the same shape a PIL call would have. The
unfilter loop is per-scanline: Up/None/Average(left-less) vectorize
across the row; Sub/Paeth/Average are sequential in the pixel dimension
by spec (each pixel depends on the reconstructed left neighbour).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_COLOR_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            return
        yield ctype, body
        pos += 12 + length  # len + type + body + crc
        if ctype == b"IEND":
            return


def png_ihdr(data: bytes) -> tuple[int, int, int, int, int] | None:
    """Raw (w, h, bit_depth, color_type, interlace) from IHDR, or None
    when the bytes are not a structurally-valid PNG header."""
    if len(data) < 33 or data[:8] != PNG_MAGIC or data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", data[16:24])
    bit_depth, color_type, _comp, _filt, interlace = data[24:29]
    if w <= 0 or h <= 0:
        return None
    return int(w), int(h), int(bit_depth), int(color_type), int(interlace)


def png_supported(ihdr: tuple[int, int, int, int, int]) -> bool:
    _w, _h, bit_depth, color_type, interlace = ihdr
    return bit_depth == 8 and interlace == 0 and color_type in _COLOR_MODES


def png_meta(data: bytes) -> tuple[int, int, str] | None:
    """Header-only (width, height, mode) from IHDR — no inflate, O(1):
    the metadata fast path for ``decode_image_meta``. None when not a
    decodable-by-us PNG."""
    ihdr = png_ihdr(data)
    if ihdr is None or not png_supported(ihdr):
        return None
    w, h, _bd, color_type, _il = ihdr
    return w, h, _COLOR_MODES[color_type]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray | None:
    """PNG bytes → uint8 array of shape (h, w, channels) (channels per
    the source color type; palette stays 1-channel index — expand with
    :func:`palette_to_rgb` when pixels are consumed). None for corrupt
    or unsupported (16-bit / interlaced) input — the caller maps that
    to the dropped-with-count row like any other decode failure."""
    meta = png_meta(data)
    if meta is None:
        return None
    w, h, mode = meta
    color_type = {v: k for k, v in _COLOR_MODES.items()}[mode]
    ch = _CHANNELS[color_type]
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IDAT":
            idat.extend(body)
    if not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_start + 1)
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up — fully vectorized
            cur = line + prev
        elif ftype == 1:  # Sub — sequential in x by spec
            cur = line.copy()
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                cur[x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            return None
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def decode_png_palette(data: bytes) -> np.ndarray | None:
    """The PLTE table of a palette PNG as (n, 3) uint8, else None."""
    for ctype, body in _chunks(data):
        if ctype == b"PLTE" and len(body) % 3 == 0:
            return np.frombuffer(body, dtype=np.uint8).reshape(-1, 3).copy()
    return None


def palette_to_rgb(idx: np.ndarray, plte: np.ndarray) -> np.ndarray:
    """(h, w, 1) palette indices + PLTE → (h, w, 3) RGB."""
    return plte[idx[..., 0]]


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, {1,2,3,4}) array → non-interlaced 8-bit
    PNG (filter 0 rows, one IDAT). Fixture writer for the e2e tests —
    output is spec-valid PNG (CRCs included) any external viewer opens."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * ch)], axis=1
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + chunk(b"IEND", b"")
    )
