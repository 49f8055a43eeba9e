"""Lossless JPEG (T.81 Annex H, SOF3) — predictive Huffman coding.

The last pixel seam of the S7 decode matrix (r8 verdict "What's
missing" #1): the reference decodes any PIL-supported stream
(/root/reference/dataruu/tagger/dbimutils.py:6-26); everything else
was already native. SOF3 codes each SAMPLE as a DC-style Huffman
category + magnitude bits giving the difference from one of seven
spatial predictors (T.81 H.1.2.1):

    1: Ra        2: Rb        3: Rc        4: Ra + Rb − Rc
    5: Ra + ((Rb − Rc) >> 1)  6: Rb + ((Ra − Rc) >> 1)  7: (Ra+Rb) >> 1

with Ra = left, Rb = above, Rc = above-left, all arithmetic mod 2^16
(H.1.2.3: reconstruction Rx = (Px + diff) & 0xFFFF). The first scan
sample (and the first after every restart) is predicted with
2^(P − Pt − 1); the remainder of that line falls back to predictor 1
(Ra), and every later line starts from Rb — the same start-of-scan /
restart convention libjpeg's lossless codec deploys (jdlossls.c's
first-row undifferencer). SSSS = 16 carries no magnitude bits and
means diff = 32768 (H.2: +32768 ≡ −32768 mod 2^16). The point
transform Pt shifts decoded samples left on output (H.1).

Scope gates (null-for-corrupt, like every other codec seam):
precision 8 only (the pipeline's pixel domain — 12/16-bit lossless
is the DICOM/DNG regime, carried by the PIL seam), all sampling
factors 1×1 (subsampled lossless is spec-legal but absent in
practice: libjpeg's writer never emits it), one interleaved scan
covering every frame component. SOF11 (arithmetic lossless) and the
hierarchical SOFs stay None.

No external SOF3 implementation exists in this container in EITHER
direction (verified round 9: JDK ImageIO raises "Unsupported JPEG
process: SOF type 0xc3" on read and has no lossless writer; the
system libjpeg-turbo is 2.1.5, predating the 3.0 lossless support —
no jpeg_enable_lossless symbol), so cross-validation is the
encoder/decoder pair below + hand-assembled bit-exact fixtures in
tests/test_jpeg_lossless.py — the matched-pair risk the foreign-
encoder gate (q192) exists for is mitigated by the hand decodes.

Entropy plumbing (_ScanReader, Huffman build, magnitude coding,
MSB-first writer) is shared with operators/jpeg_codec.
"""

from __future__ import annotations

import struct

import numpy as np

from anime_data_pipeline_spark.operators.jpeg_codec import (
    _BitWriterMSB,
    _HuffTable,
    _K_DC_LUMA,
    _ScanReader,
    _encode_codes,
    _extend,
    _magnitude,
)

__all__ = ["decode_scan_lossless", "encode_jpeg_lossless"]


def _predict(ra: int, rb: int, rc: int, sel: int) -> int:
    """T.81 H.1.2.1 predictor ``sel`` ∈ 1..7 (full-precision ints;
    the mod-2^16 wrap happens at reconstruction)."""
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # sel == 7


def decode_scan_lossless(
    data: bytes,
    pos: int,
    frame,
    scan_tables: dict[int, tuple[int, int]],
    htabs: dict[tuple[int, int], _HuffTable],
    restart_interval: int,
    predictor: int,
    pt: int,
) -> np.ndarray | None:
    """Entropy-coded SOF3 scan at ``data[pos:]`` → uint8 (h, w) or
    (h, w, nc) sample array (component planes verbatim — lossless
    JPEG specifies NO color transform), or None for any structural
    violation."""
    h, w, comps = frame
    if h <= 0 or w <= 0 or not comps:
        return None
    if not 1 <= predictor <= 7:
        return None
    if not 0 <= pt <= 7:
        return None
    if any(hi != 1 or vi != 1 for _cid, hi, vi, _tq in comps):
        return None  # subsampled lossless: out of scope (see module doc)
    tabs = []
    for cid, _hi, _vi, _tq in comps:
        sel = scan_tables.get(cid)
        if sel is None or (0, sel[0]) not in htabs:
            return None
        tabs.append(htabs[(0, sel[0])])
    nc = len(comps)
    default_pred = 1 << (8 - pt - 1)
    reader = _ScanReader(data, pos)
    # hot loop: one Huffman symbol PER SAMPLE, so everything it
    # touches is a plain Python list / hoisted local — numpy scalar
    # load/store here measured 2.5× the whole decode (the same
    # flat-local-state discipline as the r8 VP8L entropy rework)
    decode_symbol = reader.decode_symbol
    receive = reader.receive
    prev_r = [[0] * w for _ in range(nc)]
    cur_r = [[0] * w for _ in range(nc)]
    flat: list[int] = []  # h*w*nc interleaved samples, shifted by Pt
    append = flat.append
    # fresh: start-of-scan / just-past-restart → next sample takes the
    # default prediction and the rest of ITS line predictor 1 (Ra)
    fresh = True
    first_row_until_eol = True  # line 0 is always Ra-mode
    m = 0  # samples (MCUs) decoded since the last restart
    n_rst = 0
    sel = predictor
    for y in range(h):
        for ci in range(nc):
            prev_r[ci], cur_r[ci] = cur_r[ci], prev_r[ci]
        if not fresh:
            first_row_until_eol = y == 0
        for x in range(w):
            if restart_interval and m == restart_interval:
                mk = reader.at_marker()
                if mk != 0xD0 + (n_rst % 8):
                    return None
                reader.skip_marker()
                n_rst += 1
                m = 0
                fresh = True
                first_row_until_eol = True
            for ci in range(nc):
                t = decode_symbol(tabs[ci])
                if t is None or t > 16:
                    return None
                if t == 16:
                    diff = 32768
                elif t == 0:
                    diff = 0
                else:
                    v = receive(t)
                    if v is None:
                        return None
                    diff = _extend(v, t)
                cur = cur_r[ci]
                if fresh:
                    px = default_pred
                elif first_row_until_eol:
                    px = cur[x - 1] if x > 0 else default_pred
                elif x == 0:
                    px = prev_r[ci][0]
                else:
                    prev = prev_r[ci]
                    if sel == 1:
                        px = cur[x - 1]
                    elif sel == 2:
                        px = prev[x]
                    elif sel == 3:
                        px = prev[x - 1]
                    elif sel == 4:
                        px = cur[x - 1] + prev[x] - prev[x - 1]
                    elif sel == 5:
                        px = cur[x - 1] + ((prev[x] - prev[x - 1]) >> 1)
                    elif sel == 6:
                        px = prev[x] + ((cur[x - 1] - prev[x - 1]) >> 1)
                    else:  # 7
                        px = (cur[x - 1] + prev[x]) >> 1
                rx = (px + diff) & 0xFFFF
                cur[x] = rx
                append(rx)
            fresh = False
            m += 1
    out = np.asarray(flat, dtype=np.int64).reshape(h, w, nc)
    if pt:
        out = (out << pt) & 0xFFFF
    # Entropy-domain corruption check (ADVICE r9): in a valid 8-bit
    # stream the mod-2^16 reconstruction (H.1.2.3) lands exactly on
    # the encoder's sample, which is <= 255 after the point-transform
    # upshift — any larger value means the diff stream itself is
    # corrupt, so honor the module's null-for-corrupt contract instead
    # of silently clamping pixels.
    if int(out.max(initial=0)) > 255:
        return None
    out = out.astype(np.uint8)
    return out[:, :, 0] if nc == 1 else out


def encode_jpeg_lossless(
    arr: np.ndarray,
    predictor: int = 1,
    pt: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) gray or (h, w, nc≤4) → spec-valid SOF3 stream
    (Annex K DC luminance Huffman table for every component; 8-bit
    diffs never exceed its category range). Fixture writer for the
    roundtrip/fuzz tests and the q151 corpus slice."""
    if arr.dtype != np.uint8:
        raise ValueError("lossless fixture encoder is 8-bit only")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if not 1 <= nc <= 4:
        raise ValueError(f"1..4 components, got {nc}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"predictor 1..7, got {predictor}")
    samples = (arr.astype(np.int64) >> pt) if pt else arr.astype(np.int64)
    enc = _encode_codes(*_K_DC_LUMA)

    out = bytearray(b"\xff\xd8")
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])  # 1×1 sampling; Tq ignored in SOF3
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    bits, huffval = _K_DC_LUMA
    dht = bytes([0x00]) + bytes(bits) + bytes(huffval)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, pt])  # Ss=predictor, Se=0, Ah=0, Al=Pt
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriterMSB()
    default_pred = 1 << (8 - pt - 1)
    prev_r = [np.zeros(w, dtype=np.int64) for _ in range(nc)]
    cur_r = [np.zeros(w, dtype=np.int64) for _ in range(nc)]
    fresh = True
    first_row_until_eol = True
    m = 0
    n_rst = 0
    for y in range(h):
        for ci in range(nc):
            prev_r[ci], cur_r[ci] = cur_r[ci], prev_r[ci]
        if not fresh:
            first_row_until_eol = y == 0
        for x in range(w):
            if restart_interval and m == restart_interval:
                bw.flush_scan()
                out += bw.out
                out += bytes([0xFF, 0xD0 + (n_rst % 8)])
                n_rst += 1
                bw = _BitWriterMSB()
                m = 0
                fresh = True
                first_row_until_eol = True
            for ci in range(nc):
                cur, prev = cur_r[ci], prev_r[ci]
                if fresh:
                    px = default_pred
                elif first_row_until_eol:
                    px = int(cur[x - 1]) if x > 0 else default_pred
                elif x == 0:
                    px = int(prev[0])
                else:
                    px = _predict(
                        int(cur[x - 1]), int(prev[x]), int(prev[x - 1]), predictor
                    )
                sample = int(samples[y, x, ci])
                cur[x] = sample
                d = (sample - px) & 0xFFFF
                if d == 32768:
                    code, length = enc[16]
                    bw.write(code, length)
                else:
                    v = d if d < 32768 else d - 65536
                    t, bitsv = _magnitude(v)
                    code, length = enc[t]
                    bw.write(code, length)
                    if t:
                        bw.write(bitsv, t)
            fresh = False
            m += 1
    bw.flush_scan()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
