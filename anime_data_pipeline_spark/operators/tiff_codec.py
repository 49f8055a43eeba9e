"""Pure-stdlib baseline-TIFF codec (struct + numpy) — extends the
native decode matrix (SURVEY S7) to TIFF, the archival/scan format that
previously fell through to the (absent) PIL seam.

The reference decodes every format through PIL (bucket_manager.py:
180-189). Baseline TIFF 6.0 is an IFD tag walk plus segment
decompression: both byte orders (``II`` little / ``MM`` big),
Compression 1 (none), 5 (TIFF-variant LZW, with horizontal-differencing
Predictor 2), 8/32946 (Deflate via stdlib zlib), and 32773 (PackBits);
PhotometricInterpretation 0/1 (gray, WhiteIsZero inverted), 2 (RGB,
incl. an alpha ExtraSample → RGBA), and 3 (palette via the 16-bit
ColorMap, expanded to RGB at decode like the BMP path); 8-bit AND
16-bit samples (byte-order-true, decoded to real uint16 like the
16-bit PNG path), chunky planar layout, BOTH strip- and tile-organized
files (TIFF §15). Planar-separated layout and the JPEG-in-TIFF
compression return None like any other corrupt/unsupported input
(dropped-with-count row).

TIFF LZW (spec §13) differs from GIF LZW: codes are packed MSB-first,
the table starts at 9 bits with Clear=256/EOI=257, and the code width
bumps one code EARLY (when the next entry would make the table size
2^bits - 1) — both the encoder (fixtures) and decoder here implement
the early-change variant every real writer uses.

Scale note: decode runs inside the same Arrow-batched ``mapInPandas``
workers as PNG/GIF/JPEG/BMP (operators/multimodal.py) — row-parallel
across images; per-image work is strip-wise numpy reshape plus (for
LZW) a sequential code loop bounded by the strip byte count, the same
shape the GIF decoder has.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_COLORMAP = 320
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_EXTRA_SAMPLES = 338

_MAX_CANVAS_PX = 1 << 26  # 64 MP: same bounds-before-allocation cap as BMP/GIF

# TIFF type code → (struct letter, byte size). Only the types a
# baseline writer emits for the tags above.
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}


def _read_ifd(data: bytes) -> dict[int, list[int]] | None:
    """First-IFD tag map {tag: [values...]}, or None when the bytes are
    not a structurally-valid TIFF header/IFD."""
    if len(data) < 8 or data[:4] not in TIFF_MAGICS:
        return None
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        return None
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    if n_entries == 0 or ifd_off + 2 + n_entries * 12 > len(data):
        return None
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        e = ifd_off + 2 + i * 12
        tag, typ = struct.unpack(bo + "HH", data[e : e + 4])
        (count,) = struct.unpack(bo + "I", data[e + 4 : e + 8])
        if typ not in _TYPES or count == 0:
            continue  # unknown-type tags are skippable by spec
        letter, size = _TYPES[typ]
        total = size * count
        if total <= 4:
            raw = data[e + 8 : e + 8 + total]
        else:
            (off,) = struct.unpack(bo + "I", data[e + 8 : e + 12])
            if off + total > len(data):
                return None
            raw = data[off : off + total]
        tags[tag] = list(struct.unpack(bo + letter * count, raw))
    return tags


def _unpackbits(src: bytes, expect: int) -> bytes | None:
    """PackBits (TIFF §9) decompression to exactly ``expect`` bytes."""
    out = bytearray()
    pos, n = 0, len(src)
    while pos < n and len(out) < expect:
        b = src[pos]
        pos += 1
        if b < 128:  # literal run of b+1 bytes
            if pos + b + 1 > n:
                return None
            out += src[pos : pos + b + 1]
            pos += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if pos >= n:
                return None
            out += src[pos : pos + 1] * (257 - b)
            pos += 1
        # b == 128: no-op by spec
    return bytes(out[:expect]) if len(out) >= expect else None


def _lzw_decode(src: bytes, expect: int) -> bytes | None:
    """TIFF-variant LZW (§13): MSB-first bit packing, 9-bit start,
    Clear=256 / EOI=257, EARLY code-width change."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bits, acc, nbits, pos, n = 9, 0, 0, 0, len(src)
    prev: bytes | None = None
    while len(out) < expect:
        while nbits < bits:
            if pos >= n:
                return bytes(out[:expect]) if len(out) >= expect else None
            # mask consumed high bits — otherwise acc grows into a
            # bignum and every shift costs O(stream length)
            acc = ((acc & ((1 << nbits) - 1)) << 8) | src[pos]
            pos += 1
            nbits += 8
        nbits -= bits
        code = (acc >> nbits) & ((1 << bits) - 1)
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            bits, prev = 9, None
            continue
        if prev is None:
            if code >= 256:
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        # early change (spec §13, the libtiff convention every real
        # writer follows): the encoder bumps once ITS next free code
        # reaches 2^bits; this decoder's table lags the encoder's by
        # one entry, so the equivalent condition is len == 2^bits - 1.
        # (r8: both sides here switched one code earlier than libtiff —
        # a matched pair that every in-repo roundtrip hid until the
        # JDK-ImageIO cross-validation desynced at the 511 boundary.)
        if len(table) >= (1 << bits) - 1 and bits < 12:
            bits += 1
    return bytes(out[:expect]) if len(out) >= expect else None


def _scalar(tags: dict[int, list[int]], tag: int, default: int | None = None) -> int | None:
    v = tags.get(tag)
    return v[0] if v else default


def tiff_meta(data: bytes) -> tuple[int, int, str] | None:
    """(width, height, mode) from the first IFD — "L" gray, "RGB",
    "RGBA" (alpha ExtraSample), "P" palette — or None for corrupt /
    unsupported-by-this-codec structure (same contract as the other
    five codecs: the caller counts it as a dropped row)."""
    tags = _read_ifd(data)
    if tags is None:
        return None
    return _meta_from_tags(tags)


def _meta_from_tags(tags: dict[int, list[int]]) -> tuple[int, int, str] | None:
    """tiff_meta's validation over an already-parsed tag map — lets
    decode share one IFD walk with the meta check."""
    w = _scalar(tags, _TAG_WIDTH)
    h = _scalar(tags, _TAG_HEIGHT)
    photo = _scalar(tags, _TAG_PHOTOMETRIC)
    if not w or not h or photo is None or w <= 0 or h <= 0:
        return None
    if w * h > _MAX_CANVAS_PX:  # bounds BEFORE allocation: the IFD is untrusted
        return None
    samples = _scalar(tags, _TAG_SAMPLES, 1)
    bits = tags.get(_TAG_BITS)  # spec default is 1 (bilevel) — unsupported
    comp = _scalar(tags, _TAG_COMPRESSION, 1)
    planar = _scalar(tags, _TAG_PLANAR, 1)
    if bits is None or len(set(bits)) != 1 or bits[0] not in (8, 16):
        return None
    if planar != 1 or comp not in (1, 5, 8, 32946, 32773):
        return None
    if bits[0] == 16 and photo == 3:
        return None  # 16-bit palette indices not in the wild
    if photo in (0, 1):
        mode = "L" if samples == 1 else None
    elif photo == 2:
        mode = {3: "RGB", 4: "RGBA"}.get(samples)
    elif photo == 3:
        mode = "P" if samples == 1 and _TAG_COLORMAP in tags else None
    else:
        mode = None
    if mode is None:
        return None
    return int(w), int(h), mode


def decode_tiff(data: bytes) -> np.ndarray | None:
    """Full pixel decode → (h, w, ch) uint8 — or uint16 for 16-bit
    samples, kept true like the 16-bit PNG path (palette expanded to
    RGB, WhiteIsZero inverted); None for corrupt/unsupported input."""
    try:
        return _decode_tiff_inner(data)
    except (ValueError, struct.error, IndexError, OverflowError, MemoryError):
        return None


def _decompress(raw: bytes, comp: int, expect: int) -> bytes | None:
    if comp == 1:
        return raw[:expect] if len(raw) >= expect else None
    if comp == 5:
        return _lzw_decode(raw, expect)
    if comp in (8, 32946):  # Deflate (Adobe 8 / legacy 32946): zlib stream
        try:
            # max_length bounds the inflate: a crafted strip can't expand
            # past what this segment is allowed to hold
            out = zlib.decompressobj().decompress(raw, expect)
        except zlib.error:
            return None
        return out if len(out) == expect else None
    return _unpackbits(raw, expect)


def _undiff(seg: np.ndarray) -> np.ndarray:
    """Predictor 2 reconstruction: cumulative sum mod 2^bits along
    each row of one strip/tile segment."""
    wrap = np.uint64(1 << (seg.dtype.itemsize * 8))
    return (np.cumsum(seg.astype(np.uint64), axis=1) % wrap).astype(seg.dtype)


def _decode_tiff_inner(data: bytes) -> np.ndarray | None:
    tags = _read_ifd(data)
    if tags is None:
        return None
    meta = _meta_from_tags(tags)  # one IFD walk shared with validation
    if meta is None:
        return None
    w, h, mode = meta
    bo = "<" if data[:2] == b"II" else ">"
    samples = _scalar(tags, _TAG_SAMPLES, 1)
    bits = tags[_TAG_BITS][0]
    dtype = np.dtype(bo + ("u2" if bits == 16 else "u1"))
    comp = _scalar(tags, _TAG_COMPRESSION, 1)
    predictor = _scalar(tags, _TAG_PREDICTOR, 1)
    if predictor not in (1, 2):
        return None
    if _TAG_TILE_OFFSETS in tags:  # tiled organization (TIFF §15)
        tw = _scalar(tags, _TAG_TILE_WIDTH)
        tl = _scalar(tags, _TAG_TILE_LENGTH)
        offsets = tags.get(_TAG_TILE_OFFSETS)
        counts = tags.get(_TAG_TILE_COUNTS)
        if not tw or not tl or tw % 16 or tl % 16 or not counts:
            return None
        tiles_x, tiles_y = -(-w // tw), -(-h // tl)
        if len(offsets) != tiles_x * tiles_y or len(counts) != len(offsets):
            return None
        # tile dims are independently untrusted: tw=2^30 with w=16 still
        # passes the w*h cap but would allocate a giant padded canvas
        if tiles_x * tw * tiles_y * tl > _MAX_CANVAS_PX:
            return None
        full = np.zeros((tiles_y * tl, tiles_x * tw, samples), dtype=dtype)
        expect = tl * tw * samples * dtype.itemsize
        for t, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                return None
            seg = _decompress(data[off : off + cnt], comp, expect)
            if seg is None:
                return None
            tile = np.frombuffer(seg, dtype=dtype).reshape(tl, tw, samples)
            if predictor == 2:
                tile = _undiff(tile)
            ty, tx = divmod(t, tiles_x)
            full[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = tile
        arr = full[:h, :w].copy()
    else:  # strip organization
        offsets = tags.get(_TAG_STRIP_OFFSETS)
        counts = tags.get(_TAG_STRIP_COUNTS)
        if not offsets or not counts or len(offsets) != len(counts):
            return None
        rps = _scalar(tags, _TAG_ROWS_PER_STRIP, h) or h
        rps = min(rps, h)
        row_bytes = w * samples * dtype.itemsize
        segs: list[np.ndarray] = []
        row_start = 0
        for off, cnt in zip(offsets, counts):
            if off + cnt > len(data):
                return None
            nrows = min(rps, h - row_start)
            if nrows <= 0:
                return None
            seg = _decompress(data[off : off + cnt], comp, nrows * row_bytes)
            if seg is None:
                return None
            strip = np.frombuffer(seg, dtype=dtype).reshape(nrows, w, samples)
            segs.append(_undiff(strip) if predictor == 2 else strip)
            row_start += nrows
        if row_start < h:
            return None
        arr = np.concatenate(segs, axis=0) if len(segs) > 1 else segs[0].copy()
    arr = np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("=")))
    photo = _scalar(tags, _TAG_PHOTOMETRIC)
    if photo == 0:  # WhiteIsZero
        arr = (((1 << bits) - 1) - arr).astype(arr.dtype)
    elif photo == 3:  # palette → RGB (ColorMap: 3 planes of 16-bit)
        cmap = tags.get(_TAG_COLORMAP)
        if cmap is None or len(cmap) % 3 != 0:
            return None
        ncol = len(cmap) // 3
        plte = (np.asarray(cmap, dtype=np.uint32).reshape(3, ncol).T >> 8).astype(
            np.uint8
        )
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= ncol:
            return None
        arr = plte[idx]
    return arr


# ---------------------------------------------------------------------------
# Encoder (test fixtures / synthetic corpora only)
# ---------------------------------------------------------------------------


def _packbits_encode(row: bytes) -> bytes:
    """PackBits per-row encode (spec recommends row-boundary flushes)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i
        while j + 1 < n and row[j + 1] == row[j] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1 identical bytes
            out += bytes([257 - (j - i + 1), row[i]])
            i = j + 1
        else:  # literal run up to the next 2-byte repeat
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (j + 1 < n and row[j + 1] == row[j])
            ):
                j += 1
            out += bytes([j - i - 1]) + row[i:j]
            i = j
    return bytes(out)


def _lzw_encode(src: bytes) -> bytes:
    """TIFF-variant LZW encode (early change), mirror of _lzw_decode."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc, nbits = 0, 0

    def emit(code: int, bits: int) -> None:
        nonlocal acc, nbits
        acc = (acc << bits) | code
        nbits += bits
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1  # drop emitted bits (bignum guard)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, bits = 258, 9
    emit(CLEAR, bits)
    run = b""
    for byte in src:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], bits)
        table[cand] = next_code
        next_code += 1
        # early change, encoder side (libtiff convention): bump when
        # the next free code reaches 2^bits — the last 9-bit emission
        # can still only carry values ≤ 510, and the lagging decoder
        # switches at table length 2^bits - 1 (see _lzw_decode)
        if next_code == (1 << bits) and bits < 12:
            bits += 1
        if next_code >= 4094:  # table nearly full → reset
            emit(CLEAR, bits)
            table = {bytes([i]): i for i in range(256)}
            next_code, bits = 258, 9
        run = bytes([byte])
    if run:
        emit(table[run], bits)
    emit(EOI, bits)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    arr: np.ndarray,
    *,
    byte_order: str = "<",
    compression: int = 1,
    palette: np.ndarray | None = None,
    rows_per_strip: int | None = None,
    photometric: int | None = None,
    predictor: int = 1,
    tile_size: tuple[int, int] | None = None,
) -> bytes:
    """Minimal spec-conformant writer: (h, w) or (h, w, ch) uint8 or
    uint16 → strip-organized (or, with ``tile_size=(tw, tl)``, both
    multiples of 16, tile-organized) baseline TIFF. ``palette``
    ((n, 3) uint8) switches to photometric 3 with a 16-bit ColorMap.
    compression ∈ {1, 5, 8 (Deflate), 32773}; ``predictor=2`` applies horizontal
    differencing before compression (the usual LZW pairing)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    bits = arr.dtype.itemsize * 8
    if bits not in (8, 16):
        raise ValueError("samples must be uint8 or uint16")
    if palette is not None:
        photo, samples = 3, 1
    elif photometric is not None:
        photo, samples = photometric, ch
    else:
        photo, samples = (1 if ch == 1 else 2), ch
    bo = byte_order
    sample_dtype = np.dtype(bo + ("u2" if bits == 16 else "u1"))

    def prep(seg: np.ndarray) -> bytes:
        if predictor == 2:
            diff = seg.astype(np.int32)
            diff[:, 1:, :] -= seg[:, :-1, :].astype(np.int32)
            seg = (diff % (1 << bits)).astype(sample_dtype)
        else:
            seg = seg.astype(sample_dtype)
        raw = seg.tobytes()
        if compression == 5:
            return _lzw_encode(raw)
        if compression == 8:
            return zlib.compress(raw, 6)
        if compression == 32773:
            rb = seg.shape[1] * samples * sample_dtype.itemsize
            return b"".join(
                _packbits_encode(raw[i : i + rb]) for i in range(0, len(raw), rb)
            )
        return raw

    segments: list[bytes] = []
    if tile_size is not None:
        tw, tl = tile_size
        if tw % 16 or tl % 16:
            raise ValueError("tile dimensions must be multiples of 16")
        tiles_x, tiles_y = -(-w // tw), -(-h // tl)
        full = np.zeros((tiles_y * tl, tiles_x * tw, samples), dtype=arr.dtype)
        full[:h, :w] = arr
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                segments.append(
                    prep(full[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw])
                )
        rps = None
    else:
        rps = rows_per_strip or h
        for r0 in range(0, h, rps):
            segments.append(prep(arr[r0 : r0 + rps]))

    body = bytearray(b"II*\x00" if bo == "<" else b"MM\x00*")
    body += b"\x00\x00\x00\x00"  # IFD offset patched below
    seg_offsets = []
    for s in segments:
        seg_offsets.append(len(body))
        body += s
        if len(body) % 2:
            body += b"\x00"

    entries: list[tuple[int, int, int, list[int]]] = [
        (_TAG_WIDTH, 3, 1, [w]),
        (_TAG_HEIGHT, 3, 1, [h]),
        (_TAG_BITS, 3, samples, [bits] * samples),
        (_TAG_COMPRESSION, 3, 1, [compression]),
        (_TAG_PHOTOMETRIC, 3, 1, [photo]),
        (_TAG_SAMPLES, 3, 1, [samples]),
    ]
    if tile_size is not None:
        entries += [
            (_TAG_TILE_WIDTH, 3, 1, [tile_size[0]]),
            (_TAG_TILE_LENGTH, 3, 1, [tile_size[1]]),
            (_TAG_TILE_OFFSETS, 4, len(segments), seg_offsets),
            (_TAG_TILE_COUNTS, 4, len(segments), [len(s) for s in segments]),
        ]
    else:
        entries += [
            (_TAG_STRIP_OFFSETS, 4, len(segments), seg_offsets),
            (_TAG_ROWS_PER_STRIP, 3, 1, [rps]),
            (_TAG_STRIP_COUNTS, 4, len(segments), [len(s) for s in segments]),
        ]
    if photo == 2 and samples == 4:
        entries.append((_TAG_EXTRA_SAMPLES, 3, 1, [2]))  # unassociated alpha
    if predictor != 1:
        entries.append((_TAG_PREDICTOR, 3, 1, [predictor]))
    if palette is not None:
        ncol = palette.shape[0]
        cmap = (palette.astype(np.uint32) * 257).T.reshape(-1).tolist()
        entries.append((_TAG_COLORMAP, 3, 3 * ncol, cmap))
    entries.sort(key=lambda e: e[0])

    def build(ifd_off: int) -> bytes:
        ov = bytearray()
        ifd = bytearray(struct.pack(bo + "H", len(entries)))
        ov_base = ifd_off + 2 + len(entries) * 12 + 4
        for tag, typ, count, values in entries:
            letter, size = _TYPES[typ]
            packed = struct.pack(bo + letter * count, *values)
            ifd += struct.pack(bo + "HHI", tag, typ, count)
            if len(packed) <= 4:
                ifd += packed.ljust(4, b"\x00")
            else:
                ifd += struct.pack(bo + "I", ov_base + len(ov))
                ov += packed
                if len(ov) % 2:
                    ov += b"\x00"
        ifd += struct.pack(bo + "I", 0)  # next-IFD: none
        return bytes(ifd) + bytes(ov)

    ifd_off = len(body)
    blob = bytearray(body) + build(ifd_off)
    blob[4:8] = struct.pack(bo + "I", ifd_off)
    return bytes(blob)
