"""Pure-stdlib baseline JPEG codec (ITU T.81 sequential DCT, Huffman)
— extends the real image-decode path (SURVEY S7) to JPEG without any
codec library.

The reference decodes real images with PIL (bucket_manager.py:180-189;
dbimutils.py preprocessing). This container has no PIL/cv2/libjpeg,
but baseline JFIF needs only the public T.81 spec machinery: marker
parse, canonical Huffman decode, dequantize, 8x8 inverse DCT (one
numpy matrix product pair per block), chroma upsample, YCbCr→RGB.
Supported: baseline + extended-sequential Huffman (SOF0/SOF1), 1- or
3-component, any sampling factors (4:4:4 / 4:2:2 / 4:2:0 / ...),
restart markers. Progressive (SOF2) and arithmetic-coded JPEGs return
header meta (dims are in the frame header) but fall through to the
PIL seam for pixels, like 16-bit PNG.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` workers
(operators/multimodal.py). The Huffman bit loop is sequential per scan
by construction (same shape as libjpeg's); the IDCT and color math are
vectorized over all blocks of a component at once.

The encoder is a spec-valid baseline writer (Annex K tables, optional
2x2 chroma subsampling, optional restart intervals) used by tests and
the q151 fixture corpus; any external viewer opens its output.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# Zigzag: _ZIGZAG[i] = natural-order index of the i-th zigzag coefficient.
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)  # fmt: skip

# Annex K quantization tables (luminance, chrominance), natural order.
_K1_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)  # fmt: skip
_K2_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)  # fmt: skip

# Annex K Huffman specs: (bits[1..16], huffval) per (class, id).
_K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)  # fmt: skip
_K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)  # fmt: skip

# Orthonormal 8-point DCT-II matrix: spatial = C.T @ coef @ C.
_C = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def jpeg_meta(data: bytes) -> tuple[int, int, str] | None:
    """Header-only (width, height, mode) from the first SOFn marker —
    no entropy decode, O(header): the metadata fast path for
    ``decode_image_meta``. Works for progressive too (dims live in
    the frame header). None when not structurally a JPEG."""
    if len(data) < 4 or data[:3] != JPEG_MAGIC:
        return None
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            return None
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if seglen < 2 or pos + seglen > n:
            return None
        if marker in _SOF_MARKERS:
            if seglen < 8:
                return None
            h, w = struct.unpack(">HH", data[pos + 3 : pos + 7])
            ncomp = data[pos + 7]
            if w <= 0 or h <= 0:
                return None
            mode = {1: "L", 3: "RGB", 4: "CMYK"}.get(ncomp)
            return (int(w), int(h), mode) if mode else None
        if marker == 0xDA:
            return None  # scan before frame header: corrupt
        pos += seglen
    return None


def _build_huffman(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """Canonical (T.81 Annex C) Huffman table → {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _ScanReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any real marker (restart handling is the
    caller's job via :meth:`at_marker` / :meth:`skip_marker`)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                return False  # a real marker: stop
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            bit = self.read_bit()
            if bit is None:
                return None
            v = (v << 1) | bit
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int | None:
        code = 0
        for length in range(1, 17):
            bit = self.read_bit()
            if bit is None:
                return None
            code = (code << 1) | bit
            sym = table.get((length, code))
            if sym is not None:
                return sym
        return None

    def at_marker(self) -> int | None:
        if self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                return nxt
        return None

    def skip_marker(self) -> None:
        self.pos += 2
        self.acc = 0
        self.nbits = 0


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray | None:
    """Baseline/extended-sequential JPEG bytes → uint8 (h, w) for
    grayscale or (h, w, 3) RGB. None for corrupt, progressive, or
    arithmetic-coded input — the caller maps those to the
    dropped-with-count row or the PIL seam."""
    if len(data) < 4 or data[:3] != JPEG_MAGIC:
        return None
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq), ...])
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            return None  # EOI before any scan
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if seglen < 2 or pos + seglen > n:
            return None
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                if prec == 0:
                    vals = np.frombuffer(body, np.uint8, 64, i).astype(np.float64)
                    i += 64
                else:
                    vals = (
                        np.frombuffer(body, ">u2", 64, i).astype(np.float64)
                    )
                    i += 128
                nat = np.empty(64)
                nat[_ZIGZAG] = vals
                qtabs[tid] = nat
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                huffval = list(body[i + 17 : i + 17 + cnt])
                if len(huffval) < cnt:
                    return None
                htabs[(tc, th)] = _build_huffman(bits, huffval)
                i += 17 + cnt
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
            if len(body) < 6:
                return None
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                off = 6 + 3 * c
                comps.append((body[off], body[off + 1] >> 4, body[off + 1] & 0x0F, body[off + 2]))
            frame = (int(h), int(w), comps)
        elif marker in _SOF_MARKERS:  # progressive / arithmetic / lossless
            return None
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None or len(body) < 1:
                return None
            ns = body[0]
            scan_tables = {}
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan_tables[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                data, pos + seglen, frame, scan_tables, qtabs, htabs, restart_interval
            )
        pos += seglen
    return None


def _decode_scan(data, pos, frame, scan_tables, qtabs, htabs, restart_interval):
    h, w, comps = frame
    if h <= 0 or w <= 0 or not comps:
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []  # per component: coefficient array (blocks_y*8, blocks_x*8)
    meta = []
    for cid, hi, vi, tq in comps:
        if cid not in scan_tables or tq not in qtabs:
            return None
        td, ta = scan_tables[cid]
        if (0, td) not in htabs or (1, ta) not in htabs:
            return None
        planes.append(
            np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.float64)
        )
        meta.append((hi, vi, qtabs[tq], htabs[(0, td)], htabs[(1, ta)]))
    reader = _ScanReader(data, pos)
    preds = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            mk = reader.at_marker()
            if mk is None or not 0xD0 <= mk <= 0xD7:
                return None
            reader.skip_marker()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (hi, vi, qt, dct, act) in enumerate(meta):
            for by in range(vi):
                for bx in range(hi):
                    coef = _decode_block(reader, dct, act, preds, ci)
                    if coef is None:
                        return None
                    planes[ci][my * vi + by, mx * hi + bx] = coef * qt
    out_planes = []
    for ci, (hi, vi, _qt, _d, _a) in enumerate(meta):
        blocks = planes[ci]  # (by, bx, 64)
        byc, bxc, _ = blocks.shape
        spat = np.einsum(
            "ki,yxkl,lj->yxij", _C, blocks.reshape(byc, bxc, 8, 8), _C
        )
        plane = spat.transpose(0, 2, 1, 3).reshape(byc * 8, bxc * 8) + 128.0
        # upsample to full-resolution grid (box/nearest, per JFIF practice)
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) != 3:
        return None  # CMYK pixels not supported (meta still works)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader, dct, act, preds, ci):
    t = reader.decode_symbol(dct)
    if t is None or t > 15:
        return None
    if t:
        v = reader.receive(t)
        if v is None:
            return None
        preds[ci] += _extend(v, t)
    coef = np.zeros(64)
    coef[0] = preds[ci]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(act)
        if rs is None:
            return None
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            return None
        k += r
        if k > 63:
            return None
        v = reader.receive(s)
        if v is None:
            return None
        coef[_ZIGZAG[k]] = _extend(v, s)
        k += 1
    return coef


# ---------------------------------------------------------------------------
# Encoder (test fixtures + q151 corpus)
# ---------------------------------------------------------------------------


def _scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → Annex K verbatim, 100 → all-ones."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


class _BitWriterMSB:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | (code & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush_scan(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _encode_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    enc: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


def _magnitude(v: int) -> tuple[int, int]:
    """(category, magnitude-bits) per T.81 F.1.2.1 / F.1.2.2."""
    t = abs(int(v)).bit_length()
    bitsv = int(v) if v >= 0 else int(v) + (1 << t) - 1
    return t, bitsv


def _fdct_quant(plane: np.ndarray, qt_nat: np.ndarray) -> np.ndarray:
    """(h8, w8) float plane → (by, bx, 64) quantized coefficients."""
    h8, w8 = plane.shape
    blocks = plane.reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ik,yxkl,jl->yxij", _C, blocks - 128.0, _C)
    q = qt_nat.reshape(8, 8)
    return np.round(coef / q).astype(np.int64).reshape(
        h8 // 8, w8 // 8, 64
    )


def _encode_block(bw, coef64, pred, dc_enc, ac_enc) -> int:
    zz = coef64[_ZIGZAG]
    dc = int(zz[0])
    t, bitsv = _magnitude(dc - pred)
    code, length = dc_enc[t]
    bw.write(code, length)
    if t:
        bw.write(bitsv, t)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]
            bw.write(code, length)
            run -= 16
        s, bitsv = _magnitude(v)
        code, length = ac_enc[(run << 4) | s]
        bw.write(code, length)
        bw.write(bitsv, s)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]
        bw.write(code, length)
    return dc


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // mult_y) * mult_y - h
    pw = -(-w // mult_x) * mult_x - w
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    *,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → spec-valid baseline JFIF
    JPEG (Annex K Huffman/quant tables; 4:2:0 when ``subsample``).
    Fixture writer for the e2e tests and the q151 corpus."""
    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    ql = _scale_qtable(_K1_LUMA, quality)
    qc = _scale_qtable(_K2_CHROMA, quality)
    dc_l = _encode_codes(*_K_DC_LUMA)
    ac_l = _encode_codes(*_K_AC_LUMA)
    dc_c = _encode_codes(*_K_DC_CHROMA)
    ac_c = _encode_codes(*_K_AC_CHROMA)
    if gray:
        comps = [(1, 1, 1, 0)]
        planes = [_pad_to(a, 8, 8)]
    else:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            y = _pad_to(y, 16, 16)
            cb = _pad_to(cb, 16, 16)
            cr = _pad_to(cr, 16, 16)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
        else:
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            y, cb, cr = (_pad_to(p, 8, 8) for p in (y, cb, cr))
        planes = [y, cb, cr]
    coefs = [
        _fdct_quant(p, ql if c[3] == 0 else qc) for p, c in zip(planes, comps)
    ]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def qt_seg(tid: int, nat: np.ndarray) -> bytes:
        zz = nat[_ZIGZAG]  # natural → zigzag order
        return (
            b"\xff\xdb"
            + struct.pack(">H", 67)
            + bytes([tid])
            + bytes(int(v) for v in zz)
        )

    out += qt_seg(0, ql)
    if not gray:
        out += qt_seg(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht_seg(tc: int, th: int, spec) -> bytes:
        bits, huffval = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht_seg(0, 0, _K_DC_LUMA) + dht_seg(1, 0, _K_AC_LUMA)
    if not gray:
        out += dht_seg(0, 1, _K_DC_CHROMA) + dht_seg(1, 1, _K_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for cid, _hi, _vi, tq in comps:
        sos += bytes([cid, 0x00 if tq == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriterMSB()
    preds = [0] * len(comps)
    n_rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush_scan()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            bw = _BitWriterMSB()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (cid, hi, vi, tq) in enumerate(comps):
            dce = dc_l if tq == 0 else dc_c
            ace = ac_l if tq == 0 else ac_c
            for by in range(vi):
                for bx in range(hi):
                    coef = coefs[ci][my * vi + by, mx * hi + bx]
                    preds[ci] = _encode_block(bw, coef, preds[ci], dce, ace)
    bw.flush_scan()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
