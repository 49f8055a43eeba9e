"""Pure-stdlib PNG codec (zlib + struct + numpy) — un-stubs the real
image-decode path (SURVEY S7) for PNG without any codec library.

The reference decodes real images with PIL (bucket_manager.py:180-189;
dbimutils.py:6-26 preprocessing). This container has no PIL/cv2, but
PNG's container format needs only ``zlib`` (inflate) plus the five
scanline filters from the PNG spec — all stdlib/numpy. Supported: the
FULL spec-valid matrix — bit depths 1/2/4/8/16, color types 0 (gray →
"L"), 2 ("RGB"), 3 (palette → "P"), 4 (gray+alpha → "LA"), 6 ("RGBA"),
non-interlaced AND Adam7-interlaced. 16-bit images decode to true
uint16 sample values (the numpy preprocessing chain in
operators/inference.py quantizes via integer /257, mirroring PIL's
I;16 handling); sub-8-bit grayscale is rescaled to the full 0..255
range (PIL-compatible); sub-8-bit palette keeps raw indices for
``palette_to_rgb``.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` workers
(operators/multimodal.py) — per-executor, embarrassingly parallel; the
per-row Python cost is the same shape a PIL call would have. The
unfilter loop is per-scanline: Up/None vectorize across the row;
Sub/Paeth/Average are sequential in the pixel dimension by spec (each
pixel depends on the reconstructed left neighbour).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_COLOR_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Spec-valid bit depths per color type (PNG spec §11.2.2, table 11.1).
_VALID_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
# Adam7 pass geometry: (x_start, y_start, x_step, y_step) per pass.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


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
    """True for every spec-valid IHDR combination (all of which now
    decode natively); False means a structurally-invalid combination —
    corrupt by definition, mapped to the dropped-with-count row."""
    _w, _h, bit_depth, color_type, interlace = ihdr
    return (
        color_type in _VALID_DEPTHS
        and bit_depth in _VALID_DEPTHS[color_type]
        and interlace in (0, 1)
    )


def png_meta(data: bytes) -> tuple[int, int, str] | None:
    """Header-only (width, height, mode) from IHDR — no inflate, O(1):
    the metadata fast path for ``decode_image_meta``. None when not a
    decodable PNG (invalid depth/color combination = corrupt)."""
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


def _unfilter(raw: bytes, offset: int, h: int, stride: int, bpp: int) -> np.ndarray | None:
    """Reverse the five PNG scanline filters over ``h`` scanlines of
    ``stride`` bytes each (a filter-type byte precedes every line) read
    from ``raw[offset:]``. Filters operate on BYTES at distance ``bpp``
    (= max(1, channels × bit_depth // 8)) regardless of sample layout —
    this is what makes the same loop serve 1/2/4/8/16-bit images.
    Returns (h, stride) uint8 of reconstructed filtered bytes."""
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = offset + y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_start + 1)
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up — fully vectorized
            cur = line + prev
        elif ftype == 1:  # Sub — sequential in x by spec
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            return None
        out[y] = cur
        prev = cur
    return out


def _to_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """(h, stride) reconstructed filter bytes → (h, w*ch) samples.
    depth 8 → uint8 slice; depth 16 → uint16 from big-endian byte
    pairs; depth <8 → bit-unpack (PNG packs samples MSB-first, exactly
    np.unpackbits' order), regroup ``depth`` bits per sample."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * ch]
    if depth == 16:
        b = rows[:, : w * ch * 2].reshape(h, w * ch, 2).astype(np.uint16)
        return (b[:, :, 0] << 8) | b[:, :, 1]
    bits = np.unpackbits(rows, axis=1)
    samples = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (samples * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)[:, : w * ch]


def decode_png(data: bytes) -> np.ndarray | None:
    """PNG bytes → (h, w, channels) array: uint8 for bit depths ≤ 8
    (sub-8 grayscale rescaled to 0..255; palette keeps raw indices —
    expand with :func:`palette_to_rgb`), uint16 with true sample values
    for depth 16 (downstream preprocessing quantizes via /257,
    operators/inference.py). Handles non-interlaced and Adam7. None for
    corrupt input — the caller maps that to the dropped-with-count row."""
    ihdr = png_ihdr(data)
    if ihdr is None or not png_supported(ihdr):
        return None
    w, h, depth, color_type, interlace = ihdr
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
    bpp = max(1, ch * depth // 8)
    # Sub-8 grayscale rescale factor (255/(2^d -1) is exact for d=1,2,4).
    scale = 255 // ((1 << depth) - 1) if color_type == 0 and depth < 8 else 1

    def stride_of(pw: int) -> int:
        return (pw * ch * depth + 7) // 8

    if interlace == 0:
        stride = stride_of(w)
        if len(raw) != h * (stride + 1):
            return None
        rows = _unfilter(raw, 0, h, stride, bpp)
        if rows is None:
            return None
        samp = _to_samples(rows, w, ch, depth)
        if scale != 1:
            samp = samp * np.uint8(scale)
        return samp.reshape(h, w, ch)

    # Adam7: seven independently-filtered sub-images, scattered back
    # onto the full grid by the pass geometry.
    out = np.zeros((h, w, ch), dtype=np.uint16 if depth == 16 else np.uint8)
    off = 0
    for xs, ys, xstep, ystep in _ADAM7:
        pw = (w - xs + xstep - 1) // xstep
        ph = (h - ys + ystep - 1) // ystep
        if pw <= 0 or ph <= 0:
            continue
        stride = stride_of(pw)
        need = ph * (stride + 1)
        if off + need > len(raw):
            return None
        rows = _unfilter(raw, off, ph, stride, bpp)
        off += need
        if rows is None:
            return None
        samp = _to_samples(rows, pw, ch, depth)
        if scale != 1:
            samp = samp * np.uint8(scale)
        out[ys::ystep, xs::xstep] = samp.reshape(ph, pw, ch)
    if off != len(raw):
        return None
    return out


def decode_png_palette(data: bytes) -> np.ndarray | None:
    """The PLTE table of a palette PNG as (n, 3) uint8, else None."""
    for ctype, body in _chunks(data):
        if ctype == b"PLTE" and len(body) % 3 == 0:
            return np.frombuffer(body, dtype=np.uint8).reshape(-1, 3).copy()
    return None


def palette_to_rgb(idx: np.ndarray, plte: np.ndarray) -> np.ndarray:
    """(h, w, 1) palette indices + PLTE → (h, w, 3) RGB."""
    return plte[idx[..., 0]]


def _pack_scanlines(sub: np.ndarray, depth: int) -> bytes:
    """(ph, pw, ch) samples → filter-0 scanline bytes for one pass."""
    ph, pw, ch = sub.shape
    flat = sub.reshape(ph, pw * ch)
    if depth == 8:
        body = flat.astype(np.uint8)
    elif depth == 16:
        body = flat.astype(">u2").view(np.uint8).reshape(ph, pw * ch * 2)
    else:
        shifts = np.arange(depth - 1, -1, -1, dtype=np.uint8)
        bits = ((flat[:, :, None].astype(np.uint8) >> shifts) & 1).reshape(ph, -1)
        body = np.packbits(bits, axis=1)  # MSB-first, zero-padded: PNG's layout
    return np.concatenate(
        [np.zeros((ph, 1), dtype=np.uint8), body], axis=1
    ).tobytes()


def encode_png(
    arr: np.ndarray,
    *,
    interlace: int = 0,
    bit_depth: int | None = None,
    palette: np.ndarray | None = None,
) -> bytes:
    """Array → spec-valid PNG (filter-0 rows, one IDAT, CRCs included —
    any external viewer opens it). Fixture writer for the e2e tests,
    covering the full decode matrix:

    - uint8 (h, w[, ch]) → 8-bit gray/LA/RGB/RGBA
    - uint16 (h, w[, ch]) → 16-bit (big-endian samples)
    - ``bit_depth`` 1/2/4 with a 2-D array of raw levels (< 2^depth) →
      sub-8 grayscale (decode rescales to 0..255)
    - ``palette`` (n, 3) uint8 with a 2-D index array → color type 3
      at ``bit_depth`` (default 8)
    - ``interlace=1`` → Adam7 pass extraction (any of the above)
    """
    a = np.asarray(arr)
    if palette is not None:
        depth = bit_depth or 8
        color_type = 3
        a = a.astype(np.uint8)[:, :, None]
    elif a.dtype == np.uint16:
        depth = 16
        if a.ndim == 2:
            a = a[:, :, None]
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[a.shape[2]]
    elif bit_depth in (1, 2, 4):
        depth = bit_depth
        color_type = 0
        a = a.astype(np.uint8)[:, :, None]
    else:
        depth = 8
        a = a.astype(np.uint8)
        if a.ndim == 2:
            a = a[:, :, None]
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[a.shape[2]]
    h, w, _ch = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    if interlace == 0:
        scan = _pack_scanlines(a, depth)
    else:
        parts = []
        for xs, ys, xstep, ystep in _ADAM7:
            sub = a[ys::ystep, xs::xstep]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_pack_scanlines(sub, depth))
        scan = b"".join(parts)

    out = PNG_MAGIC + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    return out + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")
