"""Arithmetic-coded JPEG (ITU-T T.81 Annexes D and F): QM-coder
entropy decode for SOF9 (extended sequential) and SOF10 (progressive)
frames, plus a sequential fixture encoder — closing the last
documented JPEG seam natively (``operators/multimodal.py`` previously
mapped arithmetic streams to the absent-PIL seam; the reference
decodes them via PIL/cv2, ``dataruu/tagger/dbimutils.py:6-26``).

Everything here derives from the public spec:

- ``ARITH_TAB`` is T.81 Table D.3 (the Qe probability-estimation state
  machine, 113 adaptive states + the fixed 0x5A1D bin used for sign
  and refinement decisions). The table is additionally pinned against
  the system libjpeg's ``jpeg_aritab`` by
  ``tests/test_jpeg_arith_crossval.py`` when the library is present.
- The register discipline is the standard lazy-renormalization QM
  variant (C accumulates raw bytes; the interval comparison shifts by
  the outstanding renorm count instead of shifting C), which is
  bitstream-identical to the spec's Figures D.17-D.21. Byte feed per
  D.2: a 0x00 after 0xFF is a stuffed byte (deliver 0xFF), any other
  value is a marker — from then on the decoder consumes 0x00 filler.
- Conditioning models per Annex F: DC difference classification by the
  DAC (L, U) parameters into five context zones, AC end-of-block /
  run / magnitude decisions at 3·(k−1) with the Kx low/high-spectrum
  split at bins 189/217, magnitude-category X bins and mantissa bins
  offset +14 — the statistics layout every interoperable
  implementation shares (verified against libjpeg-encoded streams at
  the DCT-coefficient level, both directions).

Scale shape: identical to the Huffman path — a per-symbol sequential
Python loop inside the Arrow-batched decode workers, row-parallel
across images, zero shuffle (the accepted profile of every codec gate
in this repo; see SCALE.md).
"""

from __future__ import annotations

import struct

import numpy as np

from anime_data_pipeline_spark.operators.jpeg_codec import _ZIGZAG_T

# T.81 Table D.3: (Qe, NMPS, NLPS, SWITCH). Index 113 is the
# non-adapting "fixed" bin (self-loops, switch 0) for equiprobable
# decisions (AC sign, refinement bits).
ARITH_TAB: tuple[tuple[int, int, int, int], ...] = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

_FIXED = 113  # index of the non-adapting bin

# Default conditioning when no DAC segment appears (T.81 F.1.4.4.1.4 /
# F.1.4.4.2: DC (L, U) = (0, 1); AC Kx = 5).
DEFAULT_DC_COND = (0, 1)
DEFAULT_AC_KX = 5


class ArithDecoder:
    """QM decoder over one entropy-coded segment (T.81 D.2). A state
    is one byte in a caller-owned bytearray: bit 7 = current MPS,
    bits 0-6 = Table D.3 index. On hitting a marker the decoder feeds
    0x00 filler and records the marker position for the scan driver."""

    __slots__ = ("data", "pos", "end", "c", "a", "ct", "marker_pos")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.end = len(data)
        self.restart_at(pos)

    def restart_at(self, pos: int) -> None:
        self.pos = pos
        self.c = 0
        self.a = 0
        self.ct = -16  # forces the two-byte startup fill
        self.marker_pos: int | None = None

    def decode(self, st: bytearray, idx: int) -> int:
        a, c, ct = self.a, self.c, self.ct
        # Renormalize + byte feed (lazy register discipline: C
        # accumulates raw bytes; the interval comparison below shifts
        # by the outstanding count ct instead of shifting C — stream-
        # identical to Figures D.17-D.21).
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                # one byte with the D.2 stuffing rule
                if self.marker_pos is not None or self.pos >= self.end:
                    b = 0  # at/past the marker: 0x00 filler
                else:
                    b = self.data[self.pos]
                    self.pos += 1
                    if b == 0xFF:
                        while self.pos < self.end and self.data[self.pos] == 0xFF:
                            self.pos += 1
                        if self.pos < self.end and self.data[self.pos] == 0:
                            self.pos += 1  # stuffed zero: deliver 0xFF
                        else:
                            # a real marker: rewind to its 0xFF byte
                            self.marker_pos = self.pos - 1
                            b = 0
                c = (c << 8) | b
                if ct + 8 < 0:  # startup (ct began at -16): the two-
                    ct += 9  # byte fill counts 9 per round, no a-shift
                    if ct == 0:
                        a = 0x10000
                        break
                    continue
                ct += 8
            a <<= 1
        sv = st[idx]
        qe, nmps, nlps, switch = ARITH_TAB[sv & 0x7F]
        a -= qe  # a = A - Qe: the bottom (MPS-estimate) subinterval
        if c < (a << ct):
            if a >= 0x8000:  # fast path: MPS, no renorm, no adaptation
                self.a, self.c, self.ct = a, c, ct
                return sv >> 7
            # renorm pending -> adapt (MPS exchange, Figure D.18)
            if a < qe:
                bit = (sv >> 7) ^ 1
                st[idx] = ((sv ^ (switch << 7)) & 0x80) | nlps
            else:
                bit = sv >> 7
                st[idx] = (sv & 0x80) | nmps
        else:
            c -= a << ct
            # top subinterval, size Qe (LPS exchange, Figure D.19)
            if qe <= a:
                bit = (sv >> 7) ^ 1
                st[idx] = ((sv ^ (switch << 7)) & 0x80) | nlps
            else:
                bit = sv >> 7
                st[idx] = (sv & 0x80) | nmps
            a = qe
        self.a, self.c, self.ct = a, c, ct
        return bit


def _dc_decode(dec, dc_st, ctx, last, ci, lval, uval):
    """One DC difference (T.81 F.2.4.1 decision tree): zero/sign
    decisions in the ctx-conditioned zone, magnitude-category walk in
    the shared X bins, mantissa bins +14 from where the walk ended.
    Returns the new DC value, or None on a malformed magnitude run."""
    base = ctx[ci]
    if dec.decode(dc_st, base) == 0:
        ctx[ci] = 0
        return last[ci]
    sign = dec.decode(dc_st, base + 1)
    s_bin = base + 2 + sign
    m = dec.decode(dc_st, s_bin)
    st_mag = s_bin  # mantissa bins ride +14 from the LAST category bin
    if m:
        st_mag = 20  # X1
        while dec.decode(dc_st, st_mag):
            m <<= 1
            if m == 0x8000:
                return None
            st_mag += 1
    # conditioning zone for this component's NEXT block (F.1.4.4.1.2)
    if m < (1 << lval) >> 1:
        ctx[ci] = 0
    elif m > (1 << uval) >> 1:
        ctx[ci] = 12 + sign * 4
    else:
        ctx[ci] = 4 + sign * 4
    v = m
    st_mag += 14
    while m > 1:
        m >>= 1
        if dec.decode(dc_st, st_mag):
            v |= m
    v += 1
    if sign:
        v = -v
    nv = last[ci] + v
    if nv < -0x8000 or nv > 0x7FFF:
        return None
    last[ci] = nv
    return nv


def _ac_decode_block(
    dec, ac_st, fixed, block, kx, k_lo=1, k_hi=63, shift=0, _zz=_ZIGZAG_T
):
    """AC coefficients k_lo..k_hi into ``block`` (64 ints, natural
    order via the zigzag map) — T.81 F.2.4.2. Returns False on
    malformed runs."""
    k = k_lo
    while k <= k_hi:
        st = 3 * (k - 1)
        if dec.decode(ac_st, st):
            return True  # EOB
        while dec.decode(ac_st, st + 1) == 0:
            st += 3
            k += 1
            if k > k_hi:
                return False
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(ac_st, st)
        if m:
            if dec.decode(ac_st, st):
                m <<= 1
                st = 189 if k <= kx else 217
                while dec.decode(ac_st, st):
                    m <<= 1
                    if m == 0x8000:
                        return False
                    st += 1
        v = m
        st += 14
        mm = m
        while mm > 1:
            mm >>= 1
            if dec.decode(ac_st, st):
                v |= mm
        v += 1
        if sign:
            v = -v
        block[_zz[k]] = v << shift
        k += 1
    return True


def _find_restart(dec, expect: int) -> int | None:
    """Position just past the next restart marker from the decoder's
    byte cursor (the marker it already hit, or the next real marker in
    the unconsumed tail). None unless it is the expected RSTn."""
    from anime_data_pipeline_spark.operators.jpeg_codec import _next_marker_pos

    mp = dec.marker_pos
    if mp is None:
        mp = _next_marker_pos(dec.data, dec.pos)
        if mp is None:
            return None
    # tolerate fill bytes: the marker code is the last 0xFF's successor
    p = mp
    while p + 1 < dec.end and dec.data[p + 1] == 0xFF:
        p += 1
    if p + 1 >= dec.end or dec.data[p + 1] != 0xD0 + (expect & 7):
        return None
    return p + 2


def decode_scan_arith(
    data, pos, frame, scan_tables, qtabs, dc_cond, ac_kx, restart_interval
):
    """Full-frame sequential arithmetic scan (SOF9's single SOS) →
    pixels; mirrors ``jpeg_codec._decode_scan`` with the QM entropy
    layer swapped in. Returns None on any malformed structure."""
    from anime_data_pipeline_spark.operators.jpeg_codec import (
        _mcu_blocks_to_pixels,
    )

    h, w, comps = frame
    if h <= 0 or w <= 0 or not comps or len(comps) > 4:
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
        if not (0 <= td <= 3 and 0 <= ta <= 3):
            return None
        meta.append((hi, vi, qtabs[tq], td, ta))

    def fresh_stats():
        return (
            {td: bytearray(64) for _h, _v, _q, td, _a in meta},
            {ta: bytearray(256) for _h, _v, _q, _t, ta in meta},
        )

    dc_stats, ac_stats = fresh_stats()
    fixed = bytearray([_FIXED])
    dec = ArithDecoder(data, pos)
    ctx = [0] * len(comps)
    last = [0] * len(comps)
    blocks: list[list[list[int]]] = [[] for _ in comps]
    n_rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            nxt = _find_restart(dec, n_rst)
            if nxt is None:
                return None
            n_rst += 1
            dec.restart_at(nxt)
            dc_stats, ac_stats = fresh_stats()
            fixed = bytearray([_FIXED])
            ctx = [0] * len(comps)
            last = [0] * len(comps)
        for ci, (hi, vi, _qt, td, ta) in enumerate(meta):
            sink = blocks[ci]
            dct, act = dc_stats[td], ac_stats[ta]
            lval, uval = dc_cond.get(td, DEFAULT_DC_COND)
            kx = ac_kx.get(ta, DEFAULT_AC_KX)
            for _ in range(vi * hi):
                block = [0] * 64
                dc = _dc_decode(dec, dct, ctx, last, ci, lval, uval)
                if dc is None:
                    return None
                block[0] = dc
                if not _ac_decode_block(dec, act, fixed, block, kx):
                    return None
                sink.append(block)
    return _mcu_blocks_to_pixels(
        blocks,
        [(hi, vi, qt) for hi, vi, qt, _t, _a in meta],
        h, w, hmax, vmax, mcux, mcuy,
    )


def decode_prog_scan_arith(
    state, data, pos, scan_comps, ss, se, ah, al, dc_cond, ac_kx,
    restart_interval,
):
    """One progressive arithmetic SOS (SOF10) into a
    ``jpeg_codec._ProgressiveState``'s coefficient store — the four
    scan shapes of T.81 F.2.4.3 (DC first/refine, AC first/refine).
    Statistics areas and the QM registers are per-scan (and reset at
    restarts), exactly as in the sequential case. Returns the next
    marker position or None."""
    from anime_data_pipeline_spark.operators.jpeg_codec import (
        _ZIGZAG_T,
        _next_marker_pos,
        _prog_scan_units,
    )

    cid_to_i = {c[0]: i for i, c in enumerate(state.comps)}
    idx = []
    for cs, td, ta in scan_comps:
        if cs not in cid_to_i or not (0 <= td <= 3 and 0 <= ta <= 3):
            return None
        idx.append((cid_to_i[cs], td, ta))
    dec = ArithDecoder(data, pos)
    fixed = bytearray([_FIXED])
    if ss == 0:
        if se != 0 or al > 13:
            return None
        # ------------------------------ DC scans (interleaved MCUs)
        if len(idx) > 1 and len(idx) != len(state.comps):
            return None
        dc_stats = {td: bytearray(64) for _ci, td, _ta in idx}
        ctx = [0] * len(idx)
        last = [0] * len(idx)
        n_rst = 0
        for m, unit in enumerate(_prog_scan_units(state, idx)):
            if restart_interval and m and m % restart_interval == 0:
                nxt = _find_restart(dec, n_rst)
                if nxt is None:
                    return None
                n_rst += 1
                dec.restart_at(nxt)
                dc_stats = {td: bytearray(64) for _ci, td, _ta in idx}
                fixed = bytearray([_FIXED])
                ctx = [0] * len(idx)
                last = [0] * len(idx)
            for s, ci, by, bx in unit:
                block = state.coefs[ci][by, bx]
                if ah == 0:  # first scan: diff-coded value << al
                    td = idx[s][1]
                    lval, uval = dc_cond.get(td, DEFAULT_DC_COND)
                    dc = _dc_decode(
                        dec, dc_stats[td], ctx, last, s, lval, uval
                    )
                    if dc is None:
                        return None
                    block[0] = dc << al
                else:  # refinement: one bit via the fixed bin
                    if dec.decode(fixed, 0):
                        block[0] = int(block[0]) | (1 << al)
    else:
        # ------------------------------ AC scans (single component)
        if len(idx) != 1 or se > 63 or ss > se or al > 13:
            return None
        ci0, _td, ta = idx[0]
        kx = ac_kx.get(ta, DEFAULT_AC_KX)
        byc, bxc = state.nblocks[ci0]
        ac_stats = bytearray(256)
        n_rst = 0
        for b in range(byc * bxc):
            if restart_interval and b and b % restart_interval == 0:
                nxt = _find_restart(dec, n_rst)
                if nxt is None:
                    return None
                n_rst += 1
                dec.restart_at(nxt)
                ac_stats = bytearray(256)
                fixed = bytearray([_FIXED])
            by, bx = divmod(b, bxc)
            block = state.coefs[ci0][by, bx]
            if ah == 0:  # first scan for this band
                tmp = [0] * 64
                if not _ac_decode_block(
                    dec, ac_stats, fixed, tmp, kx, ss, se, al
                ):
                    return None
                for k in range(ss, se + 1):
                    z = _ZIGZAG_T[k]
                    if tmp[z]:
                        block[z] = tmp[z]
            else:  # refinement (F.2.4.3.2)
                p1 = 1 << al
                m1 = -1 << al
                kex = se
                while kex >= 1:
                    if block[_ZIGZAG_T[kex]]:
                        break
                    kex -= 1
                k = ss
                while k <= se:
                    st = 3 * (k - 1)
                    if k > kex and dec.decode(ac_stats, st):
                        break  # EOB
                    while True:
                        z = _ZIGZAG_T[k]
                        cur = int(block[z])
                        if cur:
                            if dec.decode(ac_stats, st + 2):
                                block[z] = cur + (m1 if cur < 0 else p1)
                            break
                        if dec.decode(ac_stats, st + 1):
                            block[z] = m1 if dec.decode(fixed, 0) else p1
                            break
                        st += 3
                        k += 1
                        if k > se:
                            return None
                    k += 1
    state.any_scan = True
    nxt = dec.marker_pos
    if nxt is None:
        nxt = _next_marker_pos(data, dec.pos)
    return nxt


# ---------------------------------------------------------------------------
# Encoder (fixture writer): QM encode per T.81 D.1 with the standard
# byte-out discipline (carry propagation, stacked-0xFF stuffing,
# deferred trailing zeros), mirroring the decoder's models bin-for-bin.
# ---------------------------------------------------------------------------
class ArithEncoder:
    __slots__ = ("a", "c", "ct", "buffer", "sc", "zc", "out")

    def __init__(self) -> None:
        self.out = bytearray()
        self.reset()

    def reset(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # empty
        self.sc = 0  # stacked 0xFF bytes
        self.zc = 0  # deferred 0x00 bytes

    def _byteout(self, temp: int) -> None:
        out = self.out
        if temp > 0xFF:  # carry: ripples into the buffer and stacked FFs
            if self.buffer >= 0:
                if self.zc:
                    out += b"\x00" * self.zc
                    self.zc = 0
                out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    out.append(0)
            self.zc += self.sc
            self.sc = 0
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1  # stack: emitted as FF 00 once resolved
        else:
            if self.buffer == 0:
                self.zc += 1  # defer zeros (dropped if trailing)
            elif self.buffer >= 0:
                if self.zc:
                    out += b"\x00" * self.zc
                    self.zc = 0
                out.append(self.buffer)
            if self.sc:
                if self.zc:
                    out += b"\x00" * self.zc
                    self.zc = 0
                out += b"\xff\x00" * self.sc
                self.sc = 0
            self.buffer = temp

    def encode(self, st: bytearray, idx: int, bit: int) -> None:
        sv = st[idx]
        qe, nmps, nlps, switch = ARITH_TAB[sv & 0x7F]
        a = self.a - qe  # bottom (MPS-estimate) subinterval
        if bit == sv >> 7:
            if a >= 0x8000:
                self.a = a
                return
            if a < qe:  # conditional exchange: MPS takes the top
                self.c += a
                a = qe
            st[idx] = (sv & 0x80) | nmps
        else:
            if a >= qe:  # genuine LPS: top subinterval
                self.c += a
                a = qe
            # else exchange: LPS coded in the (smaller) bottom interval
            st[idx] = ((sv ^ (switch << 7)) & 0x80) | nlps
        c, ct = self.c, self.ct
        while True:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                self.c = c
                self._byteout(c >> 19)
                c = self.c = c & 0x7FFFF
                ct = 8
            if a >= 0x8000:
                break
        self.a, self.c, self.ct = a, c, ct

    def flush(self) -> None:
        """D.1.8 termination: pick the in-interval codepoint with the
        most trailing zeros, push out the remaining significant bytes,
        drop deferred trailing zeros."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        out = self.out
        if self.c & 0xF8000000:  # final carry
            if self.buffer >= 0:
                if self.zc:
                    out += b"\x00" * self.zc
                    self.zc = 0
                out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    out.append(0)
            self.zc += self.sc
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                if self.zc:
                    out += b"\x00" * self.zc
                    self.zc = 0
                out.append(self.buffer)
            if self.sc:
                if self.zc:
                    out += b"\x00" * self.zc
                    self.zc = 0
                out += b"\xff\x00" * self.sc
        self.sc = 0
        self.buffer = -1
        if self.c & 0x7FFF800:
            if self.zc:
                out += b"\x00" * self.zc
            b1 = (self.c >> 19) & 0xFF
            out.append(b1)
            if b1 == 0xFF:
                out.append(0)
            if self.c & 0x7F800:
                b2 = (self.c >> 11) & 0xFF
                out.append(b2)
                if b2 == 0xFF:
                    out.append(0)
        self.zc = 0


def _enc_magnitude(enc, st_area, bins, mag1):
    """Category walk + mantissa, mirroring the decoders: a decision per
    doubling along ``bins`` (an iterator of bin indices — the first is
    the S bin, the rest the X bins), a 0 at the stopping bin, then the
    mantissa bits at stop+14."""
    it = iter(bins)
    stop = next(it)
    if mag1 == 0:
        enc.encode(st_area, stop, 0)
        return
    enc.encode(st_area, stop, 1)
    m = 1
    stop = next(it)
    while mag1 >= (m << 1):
        enc.encode(st_area, stop, 1)
        m <<= 1
        stop = next(it)
    enc.encode(st_area, stop, 0)
    while m > 1:
        m >>= 1
        enc.encode(st_area, stop + 14, 1 if (mag1 & m) else 0)


def _dc_encode(enc, dc_st, ctx, last, ci, lval, uval, dc):
    base = ctx[ci]
    v = dc - last[ci]
    last[ci] = dc
    if v == 0:
        enc.encode(dc_st, base, 0)
        ctx[ci] = 0
        return
    enc.encode(dc_st, base, 1)
    sign = 1 if v < 0 else 0
    enc.encode(dc_st, base + 1, sign)
    mag1 = (-v if sign else v) - 1
    s_bin = base + 2 + sign

    def bins():
        yield s_bin
        b = 20
        while True:
            yield b
            b += 1

    # first decision at the sign-conditioned S bin, walk in X1..;
    # category m for the context classification mirrors the decoder
    m = 0
    if mag1:
        m = 1 << (mag1.bit_length() - 1)
    _enc_magnitude(enc, dc_st, bins(), mag1)
    if m < (1 << lval) >> 1:
        ctx[ci] = 0
    elif m > (1 << uval) >> 1:
        ctx[ci] = 12 + sign * 4
    else:
        ctx[ci] = 4 + sign * 4


def _ac_encode_block(enc, ac_st, fixed, coef_zz, kx, k_lo=1, k_hi=63, shift=0):
    """AC encode of one block's band k_lo..k_hi given zigzag-ordered
    ints; ``shift`` applies the T.81 G.1.2.2 point transform (divide
    by 2^shift toward zero) — the sequential scan is the k=1..63,
    shift=0 case and the progressive AC-first scan the general one.
    Decision-for-decision mirror of ``_ac_decode_block``."""
    if shift:
        from anime_data_pipeline_spark.operators.jpeg_codec import _tz_shift

        coef_zz = [
            _tz_shift(int(v), shift) if k_lo <= i <= k_hi else int(v)
            for i, v in enumerate(coef_zz)
        ]
    ke = k_hi
    while ke >= k_lo and coef_zz[ke] == 0:
        ke -= 1
    k = k_lo
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(ac_st, st, 0)  # not EOB
        while coef_zz[k] == 0:
            enc.encode(ac_st, st + 1, 0)
            st += 3
            k += 1
        enc.encode(ac_st, st + 1, 1)
        v = coef_zz[k]
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        mag1 = (-v if sign else v) - 1
        base = st + 2

        def bins(base=base, k=k):
            yield base
            yield base
            b = 189 if k <= kx else 217
            while True:
                yield b
                b += 1

        _enc_magnitude(enc, ac_st, bins(), mag1)
        k += 1
    if ke < k_hi:
        enc.encode(ac_st, 3 * (ke + 1 - 1), 1)  # EOB


def encode_jpeg_arith(
    arr: np.ndarray,
    quality: int = 85,
    *,
    subsample: bool = False,
    restart_interval: int = 0,
    emit_dac: bool = True,
    dc_cond: tuple[int, int] = DEFAULT_DC_COND,
    ac_kx: int = DEFAULT_AC_KX,
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → spec-valid SOF9
    arithmetic-coded JPEG; fixture writer mirroring
    ``jpeg_codec.encode_jpeg``'s frame pipeline with QM entropy
    coding. Cross-validated against the system libjpeg decoder."""
    from anime_data_pipeline_spark.operators.jpeg_codec import (
        _ZIGZAG,
        _frame_header_segments,
        _frame_prep,
    )

    # the SHARED frame pipeline (jpeg_codec._frame_prep) keeps this
    # encoder coefficient-identical to the Huffman/progressive twins
    (gray, h, w, comps, coefs, ql, qc,
     hmax, vmax, mcux, mcuy) = _frame_prep(arr, quality, subsample)
    out = _frame_header_segments(gray, h, w, comps, ql, qc, 0xC9)  # SOF9
    if emit_dac:
        lval, uval = dc_cond
        body = bytes([0x00, (uval << 4) | lval, 0x10, ac_kx])
        if not gray:
            body += bytes([0x01, (uval << 4) | lval, 0x11, ac_kx])
        out += b"\xff\xcc" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for cid, _hi, _vi, tq in comps:
        sos += bytes([cid, 0x00 if tq == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    lval, uval = dc_cond
    enc = ArithEncoder()
    dc_stats = {0: bytearray(64)}
    ac_stats = {0: bytearray(256)}
    if not gray:
        dc_stats[1] = bytearray(64)
        ac_stats[1] = bytearray(256)
    fixed = bytearray([_FIXED])
    ctx = [0] * len(comps)
    last = [0] * len(comps)
    zz = [int(z) for z in _ZIGZAG]
    n_rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            enc.flush()
            out += enc.out
            out += bytes([0xFF, 0xD0 + (n_rst & 7)])
            n_rst += 1
            enc = ArithEncoder()
            dc_stats = {t: bytearray(64) for t in dc_stats}
            ac_stats = {t: bytearray(256) for t in ac_stats}
            fixed = bytearray([_FIXED])
            ctx = [0] * len(comps)
            last = [0] * len(comps)
        for ci, (cid, hi, vi, tq) in enumerate(comps):
            tid = 0 if tq == 0 else 1
            grid = coefs[ci]
            my, mx = divmod(m, mcux)
            for by in range(vi):
                for bx in range(hi):
                    blk = grid[my * vi + by, mx * hi + bx]
                    coef_zz = [int(blk[z]) for z in zz]
                    _dc_encode(
                        enc, dc_stats[tid], ctx, last, ci, lval, uval,
                        coef_zz[0],
                    )
                    _ac_encode_block(
                        enc, ac_stats[tid], fixed, coef_zz, ac_kx
                    )
    enc.flush()
    out += enc.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_arith_progressive(
    arr: np.ndarray,
    quality: int = 85,
    *,
    subsample: bool = False,
    successive: bool = True,
) -> bytes:
    """uint8 gray/RGB → spec-valid SOF10 progressive ARITHMETIC JPEG.
    Same scan script as ``jpeg_codec.encode_jpeg_progressive`` (DC
    first interleaved, one full-band AC first scan per component; with
    ``successive`` the first scans drop the lowest bit and DC + AC
    refinement passes restore it — all four F.2.4.3 scan shapes), with
    the QM entropy layer. Each scan is its own arithmetic codeword
    with fresh statistics, mirroring the decoder. Coefficients come
    from the shared ``_frame_prep``, so output decodes bit-identical
    to every other twin."""
    from anime_data_pipeline_spark.operators.jpeg_codec import (
        _ZIGZAG,
        _frame_header_segments,
        _frame_prep,
        _tz_shift,
    )

    (gray, h, w, comps, coefs, ql, qc,
     hmax, vmax, mcux, mcuy) = _frame_prep(arr, quality, subsample)
    nblocks = []
    for _cid, hi, vi, _tq in comps:
        ch = -(-(h * vi) // vmax)
        cw = -(-(w * hi) // hmax)
        nblocks.append((-(-ch // 8), -(-cw // 8)))
    out = _frame_header_segments(gray, h, w, comps, ql, qc, 0xCA)  # SOF10
    lval, uval = DEFAULT_DC_COND
    kx = DEFAULT_AC_KX
    body = bytes([0x00, (uval << 4) | lval, 0x10, kx])
    if not gray:
        body += bytes([0x01, (uval << 4) | lval, 0x11, kx])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(body)) + body

    def sos_header(scan_comps, ss, se, ah, al) -> bytes:
        b = bytes([len(scan_comps)])
        for cid, td, ta in scan_comps:
            b += bytes([cid, (td << 4) | ta])
        b += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(b)) + b

    al1 = 1 if successive else 0
    zz = [int(z) for z in _ZIGZAG]
    tids = [0 if c[3] == 0 else 1 for c in comps]

    # --- DC first scan: interleaved, diff of (dc >> al1) ---
    out += sos_header(
        [(c[0], tids[ci], 0) for ci, c in enumerate(comps)], 0, 0, 0, al1
    )
    enc = ArithEncoder()
    dc_stats = {t: bytearray(64) for t in set(tids)}
    ctx = [0] * len(comps)
    last = [0] * len(comps)
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, (cid, hi, vi, _tq) in enumerate(comps):
            for by in range(vi):
                for bx in range(hi):
                    dc = int(coefs[ci][my * vi + by, mx * hi + bx][0]) >> al1
                    _dc_encode(
                        enc, dc_stats[tids[ci]], ctx, last, ci, lval, uval, dc
                    )
    enc.flush()
    out += enc.out

    # --- AC first scans: one per component, band 1..63 ---
    for ci, (cid, hi, vi, _tq) in enumerate(comps):
        out += sos_header([(cid, 0, tids[ci])], 1, 63, 0, al1)
        enc = ArithEncoder()
        ac_st = bytearray(256)
        fixed = bytearray([_FIXED])
        byc, bxc = nblocks[ci]
        for b in range(byc * bxc):
            by, bx = divmod(b, bxc)
            blk = coefs[ci][by, bx]
            coef_zz = [int(blk[z]) for z in zz]
            _ac_encode_block(
                enc, ac_st, fixed, coef_zz, kx, 1, 63, al1
            )
        enc.flush()
        out += enc.out

    if successive:
        # --- DC refinement: one fixed-bin bit per block, interleaved
        out += sos_header(
            [(c[0], 0, 0) for c in comps], 0, 0, 1, 0
        )
        enc = ArithEncoder()
        fixed = bytearray([_FIXED])
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci, (cid, hi, vi, _tq) in enumerate(comps):
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(coefs[ci][my * vi + by, mx * hi + bx][0])
                        enc.encode(fixed, 0, dc & 1)
        enc.flush()
        out += enc.out
        # --- AC refinement scans (mirror of the decoder's F.2.4.3.2)
        for ci, (cid, hi, vi, _tq) in enumerate(comps):
            out += sos_header([(cid, 0, tids[ci])], 1, 63, 1, 0)
            enc = ArithEncoder()
            ac_st = bytearray(256)
            fixed = bytearray([_FIXED])
            byc, bxc = nblocks[ci]
            for b in range(byc * bxc):
                by, bx = divmod(b, bxc)
                blk = coefs[ci][by, bx]
                _ac_refine_encode_block(enc, ac_st, fixed, blk, zz, 0)
            enc.flush()
            out += enc.out
    out += b"\xff\xd9"
    return bytes(out)


def _ac_refine_encode_block(enc, ac_st, fixed, blk, zz, al, ss=1, se=63):
    """One block's AC refinement scan — decision-for-decision mirror
    of the refine branch in :func:`decode_prog_scan_arith`: history
    (previous-scan state) interrupts zero runs with a correction bit;
    the EOB decision appears only past the last history coefficient
    and fires when no newly-significant coefficient remains."""
    # history = the block state the decoder holds BEFORE this scan:
    # values truncated to (al+1) precision
    hist = [0] * 64
    newbit = [0] * 64
    signs = [0] * 64
    for k in range(ss, se + 1):
        v = int(blk[zz[k]])
        a = abs(v)
        hist[k] = (a >> (al + 1)) != 0
        newbit[k] = (a >> al) == 1
        signs[k] = 1 if v < 0 else 0
    kex = se
    while kex >= 1 and not hist[kex]:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            more = any(newbit[j] for j in range(k, se + 1))
            enc.encode(ac_st, st, 0 if more else 1)
            if not more:
                return
        while True:
            if hist[k]:
                # correction bit for a previously-significant coef
                enc.encode(ac_st, st + 2, (abs(int(blk[zz[k]])) >> al) & 1)
                break
            if newbit[k]:
                enc.encode(ac_st, st + 1, 1)
                enc.encode(fixed, 0, signs[k])
                break
            enc.encode(ac_st, st + 1, 0)
            st += 3
            k += 1
        k += 1
