"""Pure-stdlib baseline JPEG codec (ITU T.81 sequential DCT, Huffman)
— extends the real image-decode path (SURVEY S7) to JPEG without any
codec library.

The reference decodes real images with PIL (bucket_manager.py:180-189;
dbimutils.py preprocessing). This container has no PIL/cv2/libjpeg,
but baseline JFIF needs only the public T.81 spec machinery: marker
parse, canonical Huffman decode, dequantize, 8x8 inverse DCT (one
numpy matrix product pair per block), chroma upsample, YCbCr→RGB.
Supported: baseline + extended-sequential Huffman (SOF0/SOF1) AND
progressive Huffman (SOF2, spectral selection + successive
approximation per T.81 Annex G), 1- or 3-component, any sampling
factors (4:4:4 / 4:2:2 / 4:2:0 / ...), restart markers, 0xFF fill
bytes before markers (B.1.1.2). Arithmetic-coded DCT JPEGs (SOF9/
SOF10) decode via ``jpeg_arith.py`` (QM-coder, T.81 Annex D/G, since
r8) and lossless JPEGs (SOF3) via ``jpeg_lossless.py`` (all seven
Annex-H predictors, since r9) — dispatch in
``operators/multimodal.py``; only the hierarchical (SOF5-7/13-15) and
arithmetic-lossless (SOF11) exotics still return header meta only and
fall through to the PIL seam. Malformed-but-magic-valid bytes always
return None (dropped-with-count), never raise into the Spark task.

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


def _read_marker(data: bytes, pos: int) -> tuple[int, int] | None:
    """Marker walk step: require a 0xFF at ``pos``, skip any number of
    additional 0xFF fill bytes (T.81 B.1.1.2 allows arbitrary fill
    before a marker), return (marker_code, pos_after_marker). None on
    structure violation or truncation."""
    n = len(data)
    if pos >= n or data[pos] != 0xFF:
        return None
    pos += 1
    while pos < n and data[pos] == 0xFF:
        pos += 1
    if pos >= n:
        return None
    return data[pos], pos + 1


def jpeg_meta(data: bytes) -> tuple[int, int, str] | None:
    """Header-only (width, height, mode) from the first SOFn marker —
    no entropy decode, O(header): the metadata fast path for
    ``decode_image_meta``. Works for progressive too (dims live in
    the frame header). None when not structurally a JPEG."""
    try:
        return _jpeg_meta(data)
    except (ValueError, struct.error, IndexError):
        return None  # malformed-but-magic-valid: corrupt, not a crash


def _jpeg_meta(data: bytes) -> tuple[int, int, str] | None:
    if len(data) < 4 or data[:3] != JPEG_MAGIC:
        return None
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        step = _read_marker(data, pos)
        if step is None:
            return None
        marker, pos = step
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            return None
        if pos + 2 > n:
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


class _HuffTable:
    """Canonical (T.81 Annex C) Huffman table compiled to a flat
    16-bit-peek LUT: ``lut_len[p]`` is the code length whose codeword
    prefixes the 16-bit window ``p`` (0 = invalid prefix) and
    ``lut_sym[p]`` its symbol — one list probe per symbol instead of a
    dict probe per BIT."""

    __slots__ = ("lut_len", "lut_sym")

    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        lut_len = bytearray(1 << 16)
        lut_sym = bytearray(1 << 16)
        code = 0
        k = 0
        for length in range(1, 17):
            span = 1 << (16 - length)
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                if lo + span > 1 << 16:
                    # over-subscribed bits[] (Kraft violation): a
                    # crafted DHT would otherwise grow the bytearray
                    # past 64 KB via slice-append — corrupt table
                    raise ValueError("over-subscribed Huffman table")
                sym = huffval[k]
                lut_len[lo : lo + span] = bytes([length]) * span
                lut_sym[lo : lo + span] = bytes([sym]) * span
                code += 1
                k += 1
            code <<= 1
        self.lut_len = bytes(lut_len)
        self.lut_sym = bytes(lut_sym)


def _build_huffman(bits: list[int], huffval: list[int]) -> _HuffTable:
    """Canonical Huffman table → LUT-compiled decoder table."""
    return _HuffTable(bits, huffval)


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
        # mask consumed high bits so acc stays a machine-word int
        # instead of accreting the whole scan into a bignum
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int | None:
        while self.nbits < n:
            if not self._fill():
                return None
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def decode_symbol(self, table: _HuffTable) -> int | None:
        while self.nbits < 16 and self._fill():
            pass
        nb = self.nbits
        if nb == 0:
            return None
        if nb >= 16:
            window = (self.acc >> (nb - 16)) & 0xFFFF
        else:  # stream tail: zero-pad the peek; only real bits consume
            window = (self.acc << (16 - nb)) & 0xFFFF
        length = table.lut_len[window]
        if length == 0 or length > nb:
            return None  # invalid prefix, or code truncated by stream end
        self.nbits = nb - length
        return table.lut_sym[window]

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


def _next_marker_pos(data: bytes, pos: int) -> int | None:
    """First position ≥ pos of a real marker (0xFF followed by
    anything but the 0x00 stuffing escape); None when the stream ends
    without one. Used to resume the marker walk after a progressive
    scan's entropy-coded data."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            return pos
        pos += 1
    return None


def _prog_scan_units(state, idx):
    """Block visit order for a progressive DC scan: interleaved MCU
    walk when the scan covers multiple components, per-component
    raster otherwise — shared by the Huffman (_ProgressiveState) and
    arithmetic (jpeg_arith.decode_prog_scan_arith) paths."""
    if len(idx) > 1:
        for m in range(state.mcux * state.mcuy):
            my, mx = divmod(m, state.mcux)
            blocks = []
            for s, (ci, _td, _ta) in enumerate(idx):
                _cid, hi, vi, _tq = state.comps[ci]
                for by in range(vi):
                    for bx in range(hi):
                        blocks.append((s, ci, my * vi + by, mx * hi + bx))
            yield blocks
    else:
        ci0 = idx[0][0]
        byc, bxc = state.nblocks[ci0]
        for b in range(byc * bxc):
            by, bx = divmod(b, bxc)
            yield [(0, ci0, by, bx)]


class _ProgressiveState:
    """Coefficient accumulator for progressive (SOF2) Huffman decoding
    — T.81 Annex G spectral selection + successive approximation (the
    control flow mirrors the spec's G.1.2.2/G.1.2.3 decision trees,
    the same shape libjpeg's jdphuff uses). Each SOS updates the
    per-component coefficient arrays in place; :meth:`finish`
    dequantizes and reuses the sequential path's IDCT/output stage, so
    a progressive file decodes bit-exact to its sequential twin."""

    def __init__(self, frame) -> None:
        h, w, comps = frame
        if h <= 0 or w <= 0 or not comps or len(comps) > 4:
            raise ValueError("bad progressive frame header")
        self.h, self.w, self.comps = h, w, comps
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        if self.hmax < 1 or self.vmax < 1:
            raise ValueError("bad sampling factors")
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.coefs = []
        self.nblocks = []  # per comp: block grid covering its sample area
        for _cid, hi, vi, _tq in comps:
            self.coefs.append(
                np.zeros((self.mcuy * vi, self.mcux * hi, 64), dtype=np.int32)
            )
            cw = -(-(w * hi) // self.hmax)
            ch = -(-(h * vi) // self.vmax)
            self.nblocks.append((-(-ch // 8), -(-cw // 8)))
        self.any_scan = False

    def decode_scan(
        self, data, pos, scan_comps, ss, se, ah, al, htabs, restart_interval
    ) -> int | None:
        """Decode one SOS's entropy data; returns the position of the
        next marker (its 0xFF byte) or None on corruption."""
        cid_to_i = {c[0]: i for i, c in enumerate(self.comps)}
        idx = []
        for cs, td, ta in scan_comps:
            if cs not in cid_to_i:
                return None
            idx.append((cid_to_i[cs], td, ta))
        reader = _ScanReader(data, pos)
        if ss == 0:
            if se != 0 or al > 13:
                return None
            ok = self._dc_scan(reader, idx, ah, al, htabs, restart_interval)
        else:
            if len(idx) != 1 or se > 63 or ss > se or al > 13:
                return None
            ok = self._ac_scan(
                reader, idx[0], ss, se, ah, al, htabs, restart_interval
            )
        if not ok:
            return None
        self.any_scan = True
        return _next_marker_pos(data, reader.pos)

    def _dc_scan(self, reader, idx, ah, al, htabs, restart_interval) -> bool:
        tables = []
        for _ci, td, _ta in idx:
            if ah == 0:
                t = htabs.get((0, td))
                if t is None:
                    return False
                tables.append(t)
            else:
                tables.append(None)  # refinement reads raw bits only
        # interleaved MCU order (subset interleave unsupported — no
        # mainstream encoder emits it)
        if len(idx) > 1 and len(idx) != len(self.comps):
            return False
        preds = [0] * len(idx)
        for m, blocks in enumerate(_prog_scan_units(self, idx)):
            if restart_interval and m and m % restart_interval == 0:
                mk = reader.at_marker()
                if mk is None or not 0xD0 <= mk <= 0xD7:
                    return False
                reader.skip_marker()
                preds = [0] * len(idx)
            for s, ci, by, bx in blocks:
                block = self.coefs[ci][by, bx]
                if ah == 0:  # first DC scan: diff-coded magnitude << al
                    t = reader.decode_symbol(tables[s])
                    if t is None or t > 15:
                        return False
                    diff = 0
                    if t:
                        v = reader.receive(t)
                        if v is None:
                            return False
                        diff = _extend(v, t)
                    preds[s] += diff
                    block[0] = preds[s] << al
                else:  # refinement: one correction bit per block
                    bit = reader.read_bit()
                    if bit is None:
                        return False
                    if bit:
                        block[0] = int(block[0]) | (1 << al)
        return True

    def _ac_scan(self, reader, one, ss, se, ah, al, htabs, restart_interval) -> bool:
        ci, _td, ta = one
        act = htabs.get((1, ta))
        if act is None:
            return False
        byc, bxc = self.nblocks[ci]
        coefs = self.coefs[ci]
        eobrun = 0
        p1, m1 = 1 << al, -(1 << al)
        for b in range(byc * bxc):
            if restart_interval and b and b % restart_interval == 0:
                mk = reader.at_marker()
                if mk is None or not 0xD0 <= mk <= 0xD7:
                    return False
                reader.skip_marker()
                eobrun = 0
            by, bx = divmod(b, bxc)
            block = coefs[by, bx]
            if ah == 0:  # first scan for this band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode_symbol(act)
                    if rs is None:
                        return False
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL: 16 zeros
                            k += 16
                            continue
                        eobrun = (1 << r) - 1  # this block is a member
                        if r:
                            v = reader.receive(r)
                            if v is None:
                                return False
                            eobrun += v
                        break
                    k += r
                    if k > se:
                        return False
                    v = reader.receive(s)
                    if v is None:
                        return False
                    block[_ZIGZAG[k]] = _extend(v, s) << al
                    k += 1
            else:  # refinement scan (G.1.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode_symbol(act)
                        if rs is None:
                            return False
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    v = reader.receive(r)
                                    if v is None:
                                        return False
                                    eobrun += v
                                break
                            # r == 15: ZRL — skip 16 zero-history coefs
                        else:
                            if s != 1:
                                return False
                            bit = reader.read_bit()
                            if bit is None:
                                return False
                            newval = p1 if bit else m1
                        # advance past r zero-history coefficients,
                        # emitting correction bits for nonzero history
                        while k <= se:
                            zi = _ZIGZAG[k]
                            cur = int(block[zi])
                            if cur != 0:
                                bit = reader.read_bit()
                                if bit is None:
                                    return False
                                if bit and (cur & p1) == 0:
                                    block[zi] = cur + (p1 if cur >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval:
                            if k > se:
                                return False
                            block[_ZIGZAG[k]] = newval
                        k += 1
                if eobrun > 0:
                    # EOB run covers this block: correction bits only
                    while k <= se:
                        zi = _ZIGZAG[k]
                        cur = int(block[zi])
                        if cur != 0:
                            bit = reader.read_bit()
                            if bit is None:
                                return False
                            if bit and (cur & p1) == 0:
                                block[zi] = cur + (p1 if cur >= 0 else m1)
                        k += 1
                    eobrun -= 1
        return True

    def finish(self, qtabs) -> np.ndarray | None:
        dequant = []
        meta = []
        for (cid, hi, vi, tq), coef in zip(self.comps, self.coefs):
            qt = qtabs.get(tq)
            if qt is None:
                return None
            dequant.append(coef.astype(np.float64) * qt)
            meta.append((hi, vi))
        out = _idct_planes(dequant, meta, self.h, self.w, self.hmax, self.vmax)
        return _planes_to_pixels(out)


def decode_jpeg(data: bytes) -> np.ndarray | None:
    """Baseline/extended-sequential (SOF0/SOF1), progressive (SOF2),
    arithmetic-coded (SOF9/SOF10, via operators/jpeg_arith), or
    lossless (SOF3, via operators/jpeg_lossless) JPEG bytes → uint8
    (h, w) for grayscale or (h, w, 3) RGB (component planes verbatim
    for lossless — Annex H specifies no color transform). None for
    corrupt or arithmetic-lossless/hierarchical-coded input — the
    caller maps those to the dropped-with-count row. A blanket
    guard converts every malformed-but-magic-valid structure
    (truncated segment bodies, bad counts, over-long SOS headers) into
    None rather than a crashed Spark task."""
    try:
        return _decode_jpeg(data)
    except (ValueError, struct.error, IndexError, OverflowError, MemoryError):
        return None


def _decode_jpeg(data: bytes) -> np.ndarray | None:
    if len(data) < 4 or data[:3] != JPEG_MAGIC:
        return None
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq), ...])
    progressive = False
    arith = False  # SOF9/SOF10: QM-coded entropy (operators/jpeg_arith)
    lossless = False  # SOF3: predictive coding (operators/jpeg_lossless)
    dac_dc: dict[int, tuple[int, int]] = {}  # DC table id -> (L, U)
    dac_ac: dict[int, int] = {}  # AC table id -> Kx
    restart_interval = 0
    prog: _ProgressiveState | None = None
    pos = 2
    n = len(data)
    while pos + 2 <= n:
        step = _read_marker(data, pos)
        if step is None:
            return None
        marker, pos = step
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            if prog is not None and prog.any_scan:
                return prog.finish(qtabs)
            return None  # EOI before any decoded scan
        if pos + 2 > n:
            return None
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if seglen < 2 or pos + seglen > n:
            return None
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                width = 64 if prec == 0 else 128
                if i + width > len(body):
                    return None
                if prec == 0:
                    vals = np.frombuffer(body, np.uint8, 64, i).astype(np.float64)
                else:
                    vals = np.frombuffer(body, ">u2", 64, i).astype(np.float64)
                i += width
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
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):  # SOF0/1/2/3/9/10
            if frame is not None or len(body) < 6:
                return None
            if body[0] != 8:
                # 12-bit precision is legal in SOF1/2/9/10 (and 2–16
                # in SOF3) but this decoder's pixel domain is 8-bit:
                # None, not silently saturated pixels
                return None
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if len(body) < 6 + 3 * ncomp:
                return None
            comps = []
            for c in range(ncomp):
                off = 6 + 3 * c
                comps.append(
                    (body[off], body[off + 1] >> 4, body[off + 1] & 0x0F, body[off + 2])
                )
            frame = (int(h), int(w), comps)
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            lossless = marker == 0xC3
        elif marker in _SOF_MARKERS:  # arithmetic-lossless / hierarchical
            return None
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            if len(body) % 2 != 0:
                # dangling odd byte: malformed conditioning segment —
                # null-for-corrupt like DQT/DHT/SOF, not partial apply
                return None
            i = 0
            while i + 2 <= len(body):
                tc, tb = body[i] >> 4, body[i] & 0x0F
                val = body[i + 1]
                i += 2
                if tb > 3:
                    return None
                if tc == 0:
                    lval, uval = val & 0x0F, val >> 4
                    if lval > uval:
                        return None
                    dac_dc[tb] = (lval, uval)
                elif tc == 1:
                    if not 1 <= val <= 63:
                        return None
                    dac_ac[tb] = val
                else:
                    return None
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                return None
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None or len(body) < 1:
                return None
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                return None
            scan_comps = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if lossless:
                # SOF3: Ss = predictor selector, Al = point transform
                from anime_data_pipeline_spark.operators.jpeg_lossless import (
                    decode_scan_lossless,
                )

                if se != 0 or ah != 0 or ns != len(frame[2]):
                    return None
                scan_tables = {cs: (td, ta) for cs, td, ta in scan_comps}
                return decode_scan_lossless(
                    data, pos + seglen, frame, scan_tables, htabs,
                    restart_interval, ss, al,
                )
            if arith:
                # QM-coded scans (operators/jpeg_arith) — lazy import
                # keeps the module dependency one-directional
                from anime_data_pipeline_spark.operators.jpeg_arith import (
                    decode_prog_scan_arith,
                    decode_scan_arith,
                )

                if not progressive:
                    scan_tables = {cs: (td, ta) for cs, td, ta in scan_comps}
                    if ss != 0 or se != 63 or ah != 0 or al != 0:
                        return None
                    return decode_scan_arith(
                        data, pos + seglen, frame, scan_tables, qtabs,
                        dac_dc, dac_ac, restart_interval,
                    )
                if prog is None:
                    prog = _ProgressiveState(frame)
                pos = decode_prog_scan_arith(
                    prog, data, pos + seglen, scan_comps, ss, se, ah, al,
                    dac_dc, dac_ac, restart_interval,
                )
                if pos is None:
                    return None
                continue
            if not progressive:
                scan_tables = {cs: (td, ta) for cs, td, ta in scan_comps}
                return _decode_scan(
                    data, pos + seglen, frame, scan_tables, qtabs, htabs,
                    restart_interval,
                )
            if prog is None:
                prog = _ProgressiveState(frame)
            pos = prog.decode_scan(
                data, pos + seglen, scan_comps, ss, se, ah, al, htabs,
                restart_interval,
            )
            if pos is None:
                return None
            continue  # marker walk resumes right at the next marker
        pos += seglen
    return None


def _idct_planes(dequant, meta, h, w, hmax, vmax):
    """Per-component dequantized (by, bx, 64) coefficient arrays →
    full-resolution float planes cropped to (h, w). Shared by the
    sequential and progressive paths."""
    out_planes = []
    for blocks, (hi, vi) in zip(dequant, meta):
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
    return out_planes


def _planes_to_pixels(out_planes):
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
    meta = []
    for cid, hi, vi, tq in comps:
        if cid not in scan_tables or tq not in qtabs:
            return None
        td, ta = scan_tables[cid]
        if (0, td) not in htabs or (1, ta) not in htabs:
            return None
        meta.append((hi, vi, qtabs[tq], htabs[(0, td)], htabs[(1, ta)]))
    reader = _ScanReader(data, pos)
    preds = [0] * len(comps)
    n_mcu = mcux * mcuy
    # blocks arrive in MCU raster order; collect plain lists and place
    # them on the grid with one vectorized scatter per component at the
    # end — no per-block numpy allocations in the hot loop
    blocks: list[list[list[float]]] = [[] for _ in comps]
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            mk = reader.at_marker()
            if mk is None or not 0xD0 <= mk <= 0xD7:
                return None
            reader.skip_marker()
            preds = [0] * len(comps)
        for ci, (hi, vi, _qt, dct, act) in enumerate(meta):
            sink = blocks[ci]
            for _ in range(vi * hi):
                coef = _decode_block(reader, dct, act, preds, ci)
                if coef is None:
                    return None
                sink.append(coef)
    return _mcu_blocks_to_pixels(
        blocks,
        [(hi, vi, qt) for hi, vi, qt, _d, _a in meta],
        h, w, hmax, vmax, mcux, mcuy,
    )


def _mcu_blocks_to_pixels(blocks, meta_hvq, h, w, hmax, vmax, mcux, mcuy):
    """Scatter per-component MCU-raster block lists onto the sample
    grid, dequantize, IDCT, and assemble pixels — shared by the
    sequential Huffman and arithmetic scan decoders."""
    planes = []  # per component: dequantized coefficients (by, bx, 64)
    for ci, (hi, vi, qt) in enumerate(meta_hvq):
        a = np.asarray(blocks[ci], dtype=np.float64) * qt
        j = np.arange(a.shape[0])
        m_i, r = j // (vi * hi), j % (vi * hi)
        rows = (m_i // mcux) * vi + r // hi
        cols = (m_i % mcux) * hi + r % hi
        plane = np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.float64)
        plane[rows, cols] = a
        planes.append(plane)
    out_planes = _idct_planes(
        planes, [(hi, vi) for hi, vi, _q in meta_hvq], h, w, hmax, vmax
    )
    return _planes_to_pixels(out_planes)


_ZIGZAG_T = tuple(int(z) for z in _ZIGZAG)


def _decode_block(reader, dct, act, preds, ci, _zz=_ZIGZAG_T):
    """One 8x8 block's Huffman decode (T.81 F.2.2) as a tight loop over
    LOCAL reader state — attribute access, method calls, and per-block
    numpy allocations all hoisted out of the per-coefficient path; the
    state syncs back to the reader at block end (restart-marker checks
    happen between blocks). Semantics identical to the _ScanReader
    methods, pinned by the roundtrip/progressive-equivalence tests."""
    data = reader.data
    n = len(data)
    pos, acc, nbits = reader.pos, reader.acc, reader.nbits
    dlen, dsym = dct.lut_len, dct.lut_sym
    alen, asym = act.lut_len, act.lut_sym
    coef = [0.0] * 64
    k = 0  # 0 = DC stage, 1..63 = AC
    pred = preds[ci]
    while True:
        # refill: up to 31 buffered bits covers one symbol (<=16) plus
        # its extra-bits field (<=15) without a second fill check
        while nbits < 31:
            if pos >= n:
                break
            b = data[pos]
            if b == 0xFF:
                if pos + 1 < n and data[pos + 1] == 0x00:
                    pos += 2
                else:
                    break  # a real marker: stop
            else:
                pos += 1
            acc = ((acc & ((1 << nbits) - 1)) << 8) | b
            nbits += 8
        if nbits <= 0:
            return None
        if nbits >= 16:
            window = (acc >> (nbits - 16)) & 0xFFFF
        else:
            window = (acc << (16 - nbits)) & 0xFFFF
        if k == 0:
            length = dlen[window]
            if length == 0 or length > nbits:
                return None
            nbits -= length
            t = dsym[window]
            if t > 15:
                return None
            if t:
                if nbits < t:
                    return None
                nbits -= t
                v = (acc >> nbits) & ((1 << t) - 1)
                pred += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
            coef[0] = float(pred)
            preds[ci] = pred
            k = 1
            continue
        length = alen[window]
        if length == 0 or length > nbits:
            return None
        nbits -= length
        rs = asym[window]
        s = rs & 0x0F
        if s == 0:
            if rs == 0x00:  # EOB
                break
            if rs != 0xF0:
                return None
            k += 16  # ZRL
            if k >= 64:
                break
            continue
        k += rs >> 4
        if k > 63:
            return None
        if nbits < s:
            return None
        nbits -= s
        v = (acc >> nbits) & ((1 << s) - 1)
        coef[_zz[k]] = float(v if v >= (1 << (s - 1)) else v - (1 << s) + 1)
        k += 1
        if k >= 64:
            break
    reader.pos, reader.acc, reader.nbits = pos, acc, nbits
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
        # drop emitted high bits: without this the accumulator grows
        # into a bignum and every write costs O(bytes written so far)
        self.acc &= (1 << self.nbits) - 1

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


def _frame_prep(arr, quality: int, subsample: bool):
    """Shared fixture-encoder frame pipeline: RGB→YCbCr, padding,
    optional 4:2:0 subsampling, fDCT + quantization. ONE copy keeps
    the three entropy backends (baseline Huffman, progressive,
    arithmetic — jpeg_arith) coefficient-identical by construction.
    Returns (gray, h, w, comps, coefs, ql, qc, hmax, vmax, mcux, mcuy)."""
    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    ql = _scale_qtable(_K1_LUMA, quality)
    qc = _scale_qtable(_K2_CHROMA, quality)
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
    return gray, h, w, comps, coefs, ql, qc, hmax, vmax, mcux, mcuy


def _frame_header_segments(gray, h, w, comps, ql, qc, sof_marker: int) -> bytearray:
    """SOI + JFIF APP0 + DQT(s) + SOFn — the header prefix shared by
    all three fixture encoders (only the SOF marker byte differs)."""
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )

    def qt_seg(tid: int, nat: np.ndarray) -> bytes:
        zz = nat[_ZIGZAG]  # natural -> zigzag order
        return (
            b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            + bytes(int(v) for v in zz)
        )

    out += qt_seg(0, ql)
    if not gray:
        out += qt_seg(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(sof)) + sof
    return out


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
    (gray, h, w, comps, coefs, ql, qc,
     hmax, vmax, mcux, mcuy) = _frame_prep(arr, quality, subsample)
    dc_l = _encode_codes(*_K_DC_LUMA)
    ac_l = _encode_codes(*_K_AC_LUMA)
    dc_c = _encode_codes(*_K_DC_CHROMA)
    ac_c = _encode_codes(*_K_AC_CHROMA)

    out = _frame_header_segments(gray, h, w, comps, ql, qc, 0xC0)

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


# ---------------------------------------------------------------------------
# Progressive encoder (q151 fixture corpus + roundtrip tests)
# ---------------------------------------------------------------------------


def _extended_ac_spec(spec) -> tuple[list[int], list[int]]:
    """Annex K AC table + EOB-run symbols (r<<4 for r=1..4) appended
    at code length 16 — Annex K carries only EOB0/ZRL among the s=0
    codes, but progressive scans code multi-block EOB runs. The K
    tables have exactly ONE free length-16 slot (the reserved
    all-ones code), so first demote one length-2 symbol to length 3
    (frees 2^-3 of Kraft mass), then append; the table stays
    canonically valid with the all-ones code unused (asserted by
    tests). Decoders read the table from the DHT segment, so only
    internal consistency matters."""
    bits, huffval = spec
    bits = list(bits)
    bits[1] -= 1  # one fewer length-2 code...
    bits[2] += 1  # ...becomes a length-3 code: frees 2^-3 Kraft mass
    extra = [0x10, 0x20, 0x30, 0x40]
    bits[15] += len(extra)
    return bits, list(huffval) + extra


_EOBRUN_CAP = 31  # (1 << 5) - 1: largest run codable with r <= 4


class _ProgScanWriter:
    """Per-scan entropy writer handling EOB-run accumulation and the
    refinement correction-bit buffer (mirror of the decoder's state)."""

    def __init__(self, ac_enc) -> None:
        self.bw = _BitWriterMSB()
        self.ac_enc = ac_enc
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, length = self.ac_enc[r << 4]
            self.bw.write(code, length)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        self.emit_pending()

    def emit_pending(self) -> None:
        for b in self.pending_bits:
            self.bw.write(b, 1)
        self.pending_bits = []

    def end_scan(self) -> bytes:
        self.flush_eobrun()
        self.bw.flush_scan()
        return bytes(self.bw.out)


def _tz_shift(v: int, al: int) -> int:
    """AC point transform: divide by 2^al rounding TOWARD ZERO
    (T.81 G.1.2.2 — distinct from the DC arithmetic shift)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _encode_ac_first(sw: _ProgScanWriter, zz_band, al: int) -> None:
    band = [_tz_shift(int(v), al) for v in zz_band]
    if not any(band):
        sw.eobrun += 1
        if sw.eobrun >= _EOBRUN_CAP:
            sw.flush_eobrun()
        return
    sw.flush_eobrun()
    run = 0
    last_nz = max(i for i, v in enumerate(band) if v)
    for i in range(last_nz + 1):
        v = band[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = sw.ac_enc[0xF0]
            sw.bw.write(code, length)
            run -= 16
        s, bitsv = _magnitude(v)
        code, length = sw.ac_enc[(run << 4) | s]
        sw.bw.write(code, length)
        sw.bw.write(bitsv, s)
        run = 0
    if last_nz < len(band) - 1:
        sw.eobrun = 1  # trailing zeros: open an EOB run at this block


def _encode_ac_refine(sw: _ProgScanWriter, zz_band, al: int) -> None:
    absvals = [abs(int(v)) >> al for v in zz_band]
    eob = -1
    for i, t in enumerate(absvals):
        if t == 1:
            eob = i
    run = 0
    bits: list[int] = []
    for i, t in enumerate(absvals):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            sw.flush_eobrun()
            code, length = sw.ac_enc[0xF0]
            sw.bw.write(code, length)
            run -= 16
            for b in bits:
                sw.bw.write(b, 1)
            bits = []
        if t > 1:  # history-nonzero: correction bit rides along
            bits.append(t & 1)
            continue
        sw.flush_eobrun()
        code, length = sw.ac_enc[(run << 4) | 1]
        sw.bw.write(code, length)
        sw.bw.write(1 if int(zz_band[i]) >= 0 else 0, 1)
        for b in bits:
            sw.bw.write(b, 1)
        bits = []
        run = 0
    if run > 0 or bits:
        sw.eobrun += 1
        sw.pending_bits.extend(bits)
        if sw.eobrun >= _EOBRUN_CAP:
            sw.flush_eobrun()


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 85,
    *,
    subsample: bool = False,
    successive: bool = True,
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → spec-valid progressive
    (SOF2) JFIF JPEG. Scan script: interleaved DC first scan, one AC
    first scan per component over the full 1..63 band; with
    ``successive`` the first scans drop the lowest bit (Al=1) and a DC
    + per-component AC refinement pass restores it, exercising all
    four progressive scan types. Coefficients are identical to
    :func:`encode_jpeg`'s, so decode output is bit-exact to the
    baseline twin."""
    (gray, h, w, comps, coefs, ql, qc,
     hmax, vmax, mcux, mcuy) = _frame_prep(arr, quality, subsample)
    ac_l_spec = _extended_ac_spec(_K_AC_LUMA)
    ac_c_spec = _extended_ac_spec(_K_AC_CHROMA)
    dc_l = _encode_codes(*_K_DC_LUMA)
    dc_c = _encode_codes(*_K_DC_CHROMA)
    ac_l = _encode_codes(*ac_l_spec)
    ac_c = _encode_codes(*ac_c_spec)
    # per-comp non-interleaved block grid (covers the sample area
    # only — same formula as the decoder's _ProgressiveState.nblocks)
    nblocks = []
    for _cid, hi, vi, _tq in comps:
        ch = -(-(h * vi) // vmax)
        cw = -(-(w * hi) // hmax)
        nblocks.append((-(-ch // 8), -(-cw // 8)))

    out = _frame_header_segments(gray, h, w, comps, ql, qc, 0xC2)

    def dht_seg(tc: int, th: int, spec) -> bytes:
        bits, huffval = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht_seg(0, 0, _K_DC_LUMA) + dht_seg(1, 0, ac_l_spec)
    if not gray:
        out += dht_seg(0, 1, _K_DC_CHROMA) + dht_seg(1, 1, ac_c_spec)

    def sos_header(scan_comps, ss, se, ah, al) -> bytes:
        body = bytes([len(scan_comps)])
        for cid, td, ta in scan_comps:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    al1 = 1 if successive else 0

    # --- DC first scan: interleaved, diff of (dc >> al1) ---
    out += sos_header([(c[0], 0 if c[3] == 0 else 1, 0) for c in comps], 0, 0, 0, al1)
    bw = _BitWriterMSB()
    preds = [0] * len(comps)
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, (cid, hi, vi, tq) in enumerate(comps):
            dce = dc_l if tq == 0 else dc_c
            for by in range(vi):
                for bx in range(hi):
                    dc = int(coefs[ci][my * vi + by, mx * hi + bx][0]) >> al1
                    t, bitsv = _magnitude(dc - preds[ci])
                    code, length = dce[t]
                    bw.write(code, length)
                    if t:
                        bw.write(bitsv, t)
                    preds[ci] = dc
    bw.flush_scan()
    out += bw.out

    # --- AC first scans: one per component, band 1..63 ---
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        out += sos_header([(cid, 0, 0 if tq == 0 else 1)], 1, 63, 0, al1)
        sw = _ProgScanWriter(ac_l if tq == 0 else ac_c)
        byc, bxc = nblocks[ci]
        for b in range(byc * bxc):
            by, bx = divmod(b, bxc)
            zz = coefs[ci][by, bx][_ZIGZAG]
            _encode_ac_first(sw, zz[1:64], al1)
        out += sw.end_scan()

    if successive:
        # --- DC refinement: one bit per block, interleaved ---
        out += sos_header([(c[0], 0, 0) for c in comps], 0, 0, 1, 0)
        bw = _BitWriterMSB()
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(coefs[ci][my * vi + by, mx * hi + bx][0])
                        bw.write(dc & 1, 1)
        bw.flush_scan()
        out += bw.out
        # --- AC refinement scans ---
        for ci, (cid, hi, vi, tq) in enumerate(comps):
            out += sos_header([(cid, 0, 0 if tq == 0 else 1)], 1, 63, 1, 0)
            sw = _ProgScanWriter(ac_l if tq == 0 else ac_c)
            byc, bxc = nblocks[ci]
            for b in range(byc * bxc):
                by, bx = divmod(b, bxc)
                zz = coefs[ci][by, bx][_ZIGZAG]
                _encode_ac_refine(sw, zz[1:64], 0)
            out += sw.end_scan()

    out += b"\xff\xd9"
    return bytes(out)
