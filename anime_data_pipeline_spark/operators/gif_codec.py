"""Pure-stdlib GIF codec (LZW + struct + numpy) — extends the real
image-decode path (SURVEY S7) to GIF without any codec library.

The reference decodes real images with PIL (bucket_manager.py:180-189);
GIF's container needs only bit math: the LZW variant from the GIF89a
spec (variable 3..12-bit codes, LSB-first packing, CLEAR/EOI codes)
plus palette expansion and the 4-pass interlace order. Supported:
GIF87a/GIF89a, global or local color table, interlaced or not, first
frame of animations (same as PIL's default ``Image.open`` frame 0).
Transparency is ignored for pixel decode (mode stays "P"-palette →
RGB expansion), matching how the bucketing pipeline consumes images.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` workers
(operators/multimodal.py) — per-executor, embarrassingly parallel. The
LZW loop is inherently sequential per image (each code extends the
dictionary built by its predecessors) — the same shape a C codec has;
per-image cost is linear in compressed size.

The encoder is a spec-valid GIF89a writer (real LZW compression, not
literal-only codes) used by tests and the q151 fixture corpus; any
external viewer opens its output.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _color_table_size(flags: int) -> int:
    """Size in bytes of a color table whose presence/size bits are in
    ``flags`` (packed field layout shared by the LSD and image
    descriptors): 3 * 2^(N+1) when the high bit is set, else 0."""
    if not flags & 0x80:
        return 0
    return 3 * (2 << (flags & 0x07))


def gif_meta(data: bytes) -> tuple[int, int, str] | None:
    """Header-only (width, height, "P") from the logical screen
    descriptor — O(1), no LZW work: the metadata fast path for
    ``decode_image_meta``. None when the bytes are not a
    structurally-valid GIF header."""
    if len(data) < 13 or data[:6] not in GIF_MAGICS:
        return None
    w, h = struct.unpack("<HH", data[6:10])
    if w <= 0 or h <= 0:
        return None
    # O(1) structural sanity: the byte after the LSD (+GCT when
    # flagged) must introduce an extension, image, or trailer block.
    nxt = 13 + _color_table_size(data[10])
    if nxt >= len(data) or data[nxt] not in (0x21, 0x2C, 0x3B):
        return None
    return int(w), int(h), "P"


class _BitReader:
    """LSB-first bit reader over the concatenated LZW sub-blocks."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int | None:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        val = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return val


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray | None:
    """GIF-variant LZW: CLEAR resets the table, EOI ends the stream,
    code width grows 1 bit whenever the next free code would not fit
    (capped at 12; a full table keeps emitting 12-bit codes with no
    adds until the next CLEAR, per spec's deferred-clear behavior)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _BitReader(data)
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    next_code = eoi + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = reader.read(width)
        if code is None:
            break  # truncated stream: return what we have (caller length-checks)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if not table:  # first code before any CLEAR: implicit init
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
            if code >= len(table):
                return None
            entry = table[code]
        elif code < next_code and code < len(table):
            entry = table[code]
        elif code == next_code and next_code < 4096:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None
        if prev is not None and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        out.extend(entry)
        prev = entry
    return out


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """Rows stored in GIF's 4-pass interlace order → display order."""
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start::step] = idx[src : src + n]
        src += n
    return out


def decode_gif(data: bytes) -> np.ndarray | None:
    """GIF bytes → uint8 (h, w, 3) RGB of the FIRST frame (palette
    expanded, interlace undone). None for corrupt/truncated input —
    the caller maps that to the dropped-with-count row like any other
    decode failure. Frames smaller than the logical screen are placed
    at their (left, top) offset on a background of palette entry 0."""
    meta = gif_meta(data)
    if meta is None:
        return None
    sw, sh, _ = meta
    pos = 10
    lsd_flags = data[pos]
    pos += 3  # flags, background index, aspect
    gct_size = _color_table_size(lsd_flags)
    gct = None
    if gct_size:
        if pos + gct_size > len(data):
            return None
        gct = np.frombuffer(data, dtype=np.uint8, count=gct_size, offset=pos).reshape(
            -1, 3
        )
        pos += gct_size
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return None  # no image descriptor seen
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:  # image descriptor
            return None
        if pos + 9 > len(data):
            return None
        left, top, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        img_flags = data[pos + 8]
        pos += 9
        lct_size = _color_table_size(img_flags)
        palette = gct
        if lct_size:
            if pos + lct_size > len(data):
                return None
            palette = np.frombuffer(
                data, dtype=np.uint8, count=lct_size, offset=pos
            ).reshape(-1, 3)
            pos += lct_size
        if palette is None or fw <= 0 or fh <= 0:
            return None
        if pos >= len(data):
            return None
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            return None
        sub = bytearray()
        while pos < len(data) and data[pos]:
            n = data[pos]
            sub.extend(data[pos + 1 : pos + 1 + n])
            pos += 1 + n
        raw = _lzw_decode(bytes(sub), min_code_size, fw * fh)
        if raw is None or len(raw) < fw * fh:
            return None
        idx = np.frombuffer(bytes(raw[: fw * fh]), dtype=np.uint8).reshape(fh, fw)
        if img_flags & 0x40:
            idx = _deinterlace(idx)
        idx = np.minimum(idx, len(palette) - 1)
        frame = palette[idx]
        if (left, top, fw, fh) == (0, 0, sw, sh):
            return frame
        out = np.broadcast_to(palette[0], (sh, sw, 3)).copy()
        fh_c = min(fh, sh - top) if top < sh else 0
        fw_c = min(fw, sw - left) if left < sw else 0
        if fh_c > 0 and fw_c > 0:
            out[top : top + fh_c, left : left + fw_c] = frame[:fh_c, :fw_c]
        return out
    return None


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real LZW compression mirroring the decoder's width schedule.
    The encoder's table runs one entry ahead of the decoder's (the
    decoder adds each entry one code later), so the width bump fires
    at ``next_code == (1 << width) + 1`` — one step after the
    decoder's ``next_code == (1 << width)`` — keeping both sides
    reading/writing every code at the same width."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()
    width = min_code_size + 1
    bw.write(clear, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        bw.write(table[w], width)
        # mirror the decoder's post-read add so EOI's width matches
        if next_code < 4096:
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
    bw.write(eoi, width)
    return bw.flush()


def encode_gif(
    idx: np.ndarray, palette: np.ndarray, *, interlace: bool = False
) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette →
    spec-valid single-frame GIF89a (global color table, real LZW).
    Fixture writer for the e2e tests and the q151 corpus."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = len(palette)
    if n < 2 or n > 256:
        raise ValueError(f"palette size must be in [2, 256], got {n}")
    bits = max(1, (n - 1).bit_length())
    full = 1 << bits
    table = np.zeros((full, 3), dtype=np.uint8)
    table[:n] = palette
    min_code_size = max(2, bits)
    rows = idx
    img_flags = 0x00
    if interlace:
        parts = [idx[start::step] for start, step in _INTERLACE_PASSES]
        rows = np.concatenate(parts, axis=0)
        img_flags |= 0x40
    compressed = _lzw_encode(rows.tobytes(), min_code_size)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT present/size, bg=0, aspect=0
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([img_flags])
    out += bytes([min_code_size])
    for i in range(0, len(compressed), 255):
        chunk = compressed[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
