"""Pure-stdlib BMP codec (struct + numpy) — extends the native decode
matrix (SURVEY S7) to Windows bitmaps, the simplest real-world format
that previously fell through to the (absent) PIL seam.

The reference decodes every format through PIL (bucket_manager.py:
180-189); BMP needs no entropy coder at all — BITMAPINFOHEADER +
bottom-up 4-byte-aligned scanlines. Supported: uncompressed (BI_RGB)
1/4/8-bit palette, 24-bit BGR, and 32-bit BGRA, plus BI_RLE8/BI_RLE4
run-length bodies (encoded runs, absolute mode, end-of-line/bitmap
and delta escapes) and the modern BITMAPV4/V5 headers (same leading
fields); bitfields compression and top-down negative heights return
None like any other corrupt/unsupported input (dropped-with-count
row).

Scale note: decode runs inside the same Arrow-batched ``mapInPandas``
workers as PNG/GIF/JPEG (operators/multimodal.py) — row-parallel
across images; the per-image work is one numpy reshape/slice, no
Python pixel loops.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"

_SUPPORTED_BPP = (1, 4, 8, 24, 32)


def _header(data: bytes):
    """(w, h, bpp, data_offset, palette: (n,3) RGB | None, compression)
    or None. Compression 0 = BI_RGB, 1 = BI_RLE8 (8-bit only),
    2 = BI_RLE4 (4-bit only)."""
    if len(data) < 54 or data[:2] != BMP_MAGIC:
        return None
    (offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:  # BITMAPCOREHEADER (12) not emitted by anything modern
        return None
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if w <= 0 or h <= 0 or planes != 1:  # top-down (h<0) unsupported
        return None
    if bpp not in _SUPPORTED_BPP:
        return None
    if compression not in (0, 1, 2):
        return None
    if (compression == 1 and bpp != 8) or (compression == 2 and bpp != 4):
        return None
    palette = None
    if bpp <= 8:
        (clr_used,) = struct.unpack("<I", data[46:50])
        ncol = clr_used or (1 << bpp)
        pal_off = 14 + hdr_size
        raw = data[pal_off : pal_off + ncol * 4]
        if len(raw) < ncol * 4:
            return None
        # BGRX quads → RGB
        quads = np.frombuffer(raw, dtype=np.uint8).reshape(ncol, 4)
        palette = quads[:, [2, 1, 0]].copy()
    return int(w), int(h), int(bpp), int(offset), palette, int(compression)


def bmp_meta(data: bytes) -> tuple[int, int, str] | None:
    """Header-only (width, height, mode) — O(1), no pixel read. Mode
    mirrors PIL: palette → "P", 24-bit → "RGB", 32-bit → "RGBA"."""
    hdr = _header(data)
    if hdr is None:
        return None
    w, h, bpp, _off, _pal, _comp = hdr
    return w, h, {24: "RGB", 32: "RGBA"}.get(bpp, "P")


def decode_bmp(data: bytes) -> np.ndarray | None:
    """BMP bytes → uint8 (h, w, ch) RGB/RGBA (palette rows expanded to
    RGB — BMP's palette is part of the header, unlike PNG's optional
    PLTE, so expansion here keeps the decoder contract uniform). None
    for corrupt/unsupported input."""
    try:
        return _decode_bmp_inner(data)
    except (ValueError, struct.error, IndexError, OverflowError, MemoryError):
        return None


def _decode_bmp_inner(data: bytes) -> np.ndarray | None:
    hdr = _header(data)
    if hdr is None:
        return None
    w, h, bpp, offset, palette, compression = hdr
    if compression:  # BI_RLE8 / BI_RLE4
        # bound the output canvas BEFORE allocating: the uncompressed
        # path is naturally size-checked (need = offset + stride*h),
        # but RLE delta escapes can legally skip cells, so a corrupt
        # header claiming a huge canvas would otherwise allocate
        # h*w(*3) from ~60 bytes of data. 2^26 px (64 MP) is far past
        # any real RLE bitmap.
        if h * w > 1 << 26:
            return None
        idx = _decode_rle(data[offset:], w, h, bpp)
        if idx is None or palette is None or idx.max(initial=0) >= len(palette):
            return None
        return palette[idx]
    stride = ((w * bpp + 31) // 32) * 4  # rows pad to 4-byte boundaries
    need = offset + stride * h
    if len(data) < need:
        return None
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[::-1]  # bottom-up → top-down
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)
        return px[:, :, ::-1].copy()  # BGR → RGB
    if bpp == 32:
        px = rows[:, : w * 4].reshape(h, w, 4)
        return px[:, :, [2, 1, 0, 3]].copy()  # BGRA → RGBA
    if bpp == 8:
        idx = rows[:, :w]
    else:  # 1- or 4-bit: MSB-first packed indices
        bits = np.unpackbits(rows, axis=1)
        samples = bits.reshape(h, -1, bpp)
        weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
        idx = (samples * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)[:, :w]
    if palette is None or idx.max(initial=0) >= len(palette):
        return None
    return palette[idx]


def _decode_rle(src: bytes, w: int, h: int, bpp: int) -> np.ndarray | None:
    """BI_RLE8/BI_RLE4 (MS BMP spec) → (h, w) palette indices, or None
    on malformed streams. Escapes: 00 00 end-of-line, 00 01
    end-of-bitmap, 00 02 delta (dx, dy — skipped cells stay index 0),
    00 n≥3 absolute run (word-aligned). Lines are bottom-up like
    uncompressed BMP."""
    idx = np.zeros((h, w), dtype=np.uint8)
    x, y = 0, 0  # y counts bottom-up lines
    pos, n = 0, len(src)
    while pos + 1 < n:
        cnt, val = src[pos], src[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            if y >= h:
                return None
            if bpp == 8:
                run = np.full(cnt, val, dtype=np.uint8)
            else:
                pair = np.array([val >> 4, val & 0x0F], dtype=np.uint8)
                run = np.tile(pair, (cnt + 1) // 2)[:cnt]
            end = min(x + cnt, w)  # clip spec-illegal overruns
            idx[h - 1 - y, x:end] = run[: end - x]
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return idx
        elif val == 2:  # delta
            if pos + 1 >= n:
                return None
            x = min(x + src[pos], w)
            y += src[pos + 1]
            pos += 2
        else:  # absolute mode: val literal pixels, word-aligned
            if y >= h:
                return None
            nbytes = val if bpp == 8 else (val + 1) // 2
            if pos + nbytes > n:
                return None
            raw = np.frombuffer(src, dtype=np.uint8, count=nbytes, offset=pos)
            if bpp == 8:
                run = raw
            else:
                run = np.stack([raw >> 4, raw & 0x0F], axis=1).reshape(-1)[:val]
            pos += nbytes + (nbytes & 1)  # pad to 2-byte boundary
            end = min(x + val, w)
            idx[h - 1 - y, x:end] = run[: end - x]
            x = end
    return None  # ran off the end without 00 01


def encode_bmp(arr: np.ndarray, *, palette: np.ndarray | None = None, bit_depth: int | None = None, rle: bool = False) -> bytes:
    """Array → spec-valid BMP (BITMAPINFOHEADER, bottom-up).
    Fixture writer for the e2e tests: uint8 (h, w, 3) → 24-bit,
    (h, w, 4) → 32-bit, 2-D indices + ``palette`` (n, 3) RGB →
    1/4/8-bit palette at ``bit_depth`` (default 8); ``rle=True``
    emits BI_RLE8/BI_RLE4 run-length bodies (palette 4/8-bit only)."""
    a = np.asarray(arr, dtype=np.uint8)
    if rle:
        if palette is None or (bit_depth or 8) not in (4, 8):
            raise ValueError("rle requires a 4- or 8-bit palette image")
        bpp = bit_depth or 8
        h, w = a.shape
        pal = np.asarray(palette, dtype=np.uint8)
        quads = np.zeros((len(pal), 4), dtype=np.uint8)
        quads[:, :3] = pal[:, ::-1]
        pal_bytes = quads.tobytes()
        body = bytearray()
        for row in a[::-1]:  # bottom-up line order
            x = 0
            while x < w:
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 255:
                    run += 1
                v = int(row[x]) if bpp == 8 else (int(row[x]) << 4) | int(row[x])
                body += bytes([run, v])
                x += run
            body += b"\x00\x00"  # end of line
        body += b"\x00\x01"  # end of bitmap
        body = bytes(body)
        offset = 14 + 40 + len(pal_bytes)
        file_hdr = struct.pack("<2sIHHI", BMP_MAGIC, offset + len(body), 0, 0, offset)
        info_hdr = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, 1 if bpp == 8 else 2,
            len(body), 2835, 2835, len(pal_bytes) // 4, 0,
        )
        return file_hdr + info_hdr + pal_bytes + body
    if palette is not None:
        bpp = bit_depth or 8
        h, w = a.shape
        pal = np.asarray(palette, dtype=np.uint8)
        quads = np.zeros((len(pal), 4), dtype=np.uint8)
        quads[:, :3] = pal[:, ::-1]  # RGB → BGRX
        pal_bytes = quads.tobytes()
        if bpp == 8:
            packed = a
        else:
            shifts = np.arange(bpp - 1, -1, -1, dtype=np.uint8)
            bits = ((a[:, :, None] >> shifts) & 1).reshape(h, -1)
            packed = np.packbits(bits, axis=1)
    else:
        h, w, ch = a.shape
        bpp = ch * 8
        pal_bytes = b""
        packed = a[:, :, ::-1] if ch == 3 else a[:, :, [2, 1, 0, 3]]
        packed = packed.reshape(h, -1)
    stride = ((w * bpp + 31) // 32) * 4
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : packed.shape[1]] = packed
    body = body[::-1].tobytes()  # top-down array → bottom-up file
    offset = 14 + 40 + len(pal_bytes)
    file_hdr = struct.pack("<2sIHHI", BMP_MAGIC, offset + len(body), 0, 0, offset)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body), 2835, 2835,
        len(pal_bytes) // 4, 0,
    )
    return file_hdr + info_hdr + pal_bytes + body
