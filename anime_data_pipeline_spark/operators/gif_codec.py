"""Pure-stdlib GIF codec (LZW + struct + numpy) — extends the real
image-decode path (SURVEY S7) to GIF without any codec library.

The reference decodes real images with PIL (bucket_manager.py:180-189);
GIF's container needs only bit math: the LZW variant from the GIF89a
spec (variable 3..12-bit codes, LSB-first packing, CLEAR/EOI codes)
plus palette expansion and the 4-pass interlace order. Supported:
GIF87a/GIF89a, global or local color table, interlaced or not, and
FULL animations: ``gif_frame_count`` walks chunk headers only (the
planning path), ``decode_gif_frames`` samples requested frames with
real GIF89a compositing (GCE transparency reveals the prior canvas;
disposal 2 restores background, 3 restores the pre-frame canvas), and
``decode_gif`` keeps PIL's default frame-0 behavior. GIF frames are
deltas, so sampling frame k decodes 0..k — the sampler passes all its
lattice indices in one call (unlike MJPEG-AVI's independent frames).

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


def _parse_gct(data: bytes):
    """(global color table | None, pos after LSD+GCT), or None when the
    table is truncated. Assumes gif_meta already validated the LSD."""
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
    return gct, pos


def _parse_frames(data: bytes, upto: int | None = None, decode_pixels: bool = True):
    """Walk the block stream collecting frames as
    (left, top, fw, fh, idx | None, palette, transparent_idx, disposal)
    tuples; Graphic Control Extensions (89a) attach transparency and
    disposal to the FOLLOWING image. ``decode_pixels=False`` skips the
    LZW work (the O(container) frame-count path); ``upto`` stops after
    frame index ``upto``. None on structural corruption."""
    meta = gif_meta(data)
    if meta is None:
        return None
    g = _parse_gct(data)
    if g is None:
        return None
    gct, pos = g
    n = len(data)
    frames = []
    pend_trans: int | None = None
    pend_disposal = 0
    while pos < n:
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                return None
            label = data[pos]
            pos += 1
            if (
                label == 0xF9
                and pos < n
                and data[pos] >= 4
                and pos + 1 + data[pos] <= n
            ):
                sub = data[pos + 1 : pos + 1 + data[pos]]
                pend_disposal = (sub[0] >> 2) & 0x7
                pend_trans = sub[3] if sub[0] & 1 else None
            while pos < n and data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:  # image descriptor
            return None
        if pos + 9 > n:
            return None
        left, top, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        img_flags = data[pos + 8]
        pos += 9
        lct_size = _color_table_size(img_flags)
        palette = gct
        if lct_size:
            if pos + lct_size > n:
                return None
            palette = np.frombuffer(
                data, dtype=np.uint8, count=lct_size, offset=pos
            ).reshape(-1, 3)
            pos += lct_size
        if palette is None or fw <= 0 or fh <= 0:
            return None
        if fw * fh > _MAX_CANVAS_PX:
            return None  # crafted descriptor dims: LZW-bomb guard
        if pos >= n:
            return None
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            return None
        sub_data = bytearray()
        while pos < n and data[pos]:
            k = data[pos]
            sub_data.extend(data[pos + 1 : pos + 1 + k])
            pos += 1 + k
        pos += 1  # sub-block terminator
        idx = None
        if decode_pixels:
            raw = _lzw_decode(bytes(sub_data), min_code_size, fw * fh)
            if raw is None or len(raw) < fw * fh:
                return None
            idx = np.frombuffer(bytes(raw[: fw * fh]), dtype=np.uint8).reshape(fh, fw)
            if img_flags & 0x40:
                idx = _deinterlace(idx)
        frames.append((left, top, fw, fh, idx, palette, pend_trans, pend_disposal))
        pend_trans, pend_disposal = None, 0
        if upto is not None and len(frames) > upto:
            break
    return frames


def gif_frame_count(data: bytes) -> int | None:
    """Number of frames, walking chunk headers ONLY (no LZW decode) —
    the O(container-bytes) planning path, mirroring avi_frame_offsets:
    a sampling lattice is laid out before any pixel work happens."""
    frames = _parse_frames(data, decode_pixels=False)
    return None if frames is None else len(frames)


_MAX_CANVAS_PX = 1 << 26  # 64 MP: same bounds-before-allocation cap as BMP
_MAX_SAMPLED_PX = 1 << 28  # 256 MP across ALL retained lattice canvases (≤768 MB RGB):
# wide enough for a real 4K clip sampled at ~30 frames, still refusing a
# crafted thousands-of-tiny-frames animation on a max-size canvas


def _background_rgb(data: bytes, gct, frames) -> np.ndarray:
    """Background color per the LSD background-color-index byte
    (data[11]) into the global color table; falls back to entry 0 /
    the first frame's palette when absent or out of range."""
    pal = gct if gct is not None else frames[0][5]
    bg_idx = data[11] if gct is not None else 0
    return pal[bg_idx if bg_idx < len(pal) else 0]


def _composite(data: bytes, frames, want_set: set[int]):
    """Shared GIF89a compositor: run frames 0..max(want) over the
    logical-screen canvas, returning {frame_idx: canvas copy} for the
    requested indices. Frame 0 draws ALL its pixels (PIL's frame-0
    behavior — there is no prior canvas for transparency to reveal);
    later frames skip GCE-transparent pixels. Disposal 2 restores the
    frame region to the LSD background color, 3 restores the pre-frame
    canvas."""
    sw, sh, _ = gif_meta(data)
    if sw * sh > _MAX_CANVAS_PX:
        return None  # crafted LSD dims: refuse before allocating
    # total retained set bounded too: thousands of tiny frames on a
    # max-size canvas would otherwise copy len(want) full canvases —
    # the OOM kill lands before MemoryError raises (same guard as the
    # WebP lattice).
    if len(want_set) * sw * sh > _MAX_SAMPLED_PX:
        return None
    gct, _ = _parse_gct(data)
    bg = _background_rgb(data, gct, frames)
    canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()
    last = max(want_set)
    out: dict[int, np.ndarray] = {}
    for fi, (left, top, fw, fh, idx, palette, trans, disposal) in enumerate(frames):
        idx = np.minimum(idx, len(palette) - 1)
        fh_c = min(fh, sh - top) if top < sh else 0
        fw_c = min(fw, sw - left) if left < sw else 0
        prev_region = None
        if disposal == 3 and fh_c > 0 and fw_c > 0:
            prev_region = canvas[top : top + fh_c, left : left + fw_c].copy()
        if fh_c > 0 and fw_c > 0:
            region_idx = idx[:fh_c, :fw_c]
            px = palette[region_idx]
            tgt = canvas[top : top + fh_c, left : left + fw_c]
            if trans is not None and fi > 0:
                mask = region_idx != trans
                tgt[mask] = px[mask]
            else:
                tgt[:] = px
        if fi in want_set:
            out[fi] = canvas.copy()
            if fi == last:
                break
        if disposal == 2 and fh_c > 0 and fw_c > 0:
            canvas[top : top + fh_c, left : left + fw_c] = bg
        elif disposal == 3 and prev_region is not None:
            canvas[top : top + fh_c, left : left + fw_c] = prev_region
    return out


def decode_gif_frames(data: bytes, indices) -> dict[int, np.ndarray] | None:
    """Animated-GIF frame sampling: {frame_idx: (sh, sw, 3) uint8} for
    the requested indices, compositing per GIF89a (see _composite).
    GIF frames are DELTAS, so sampling frame k costs decoding frames
    0..k (unlike MJPEG-AVI, where each sampled frame's byte range
    decodes independently); the lattice sampler amortizes this by
    requesting all its indices in ONE call. None for corrupt input or
    an index past the last frame."""
    want = sorted({int(i) for i in indices})
    if not want or want[0] < 0:
        return None
    frames = _parse_frames(data, upto=want[-1])
    if frames is None or len(frames) <= want[-1]:
        return None
    return _composite(data, frames, set(want))


def decode_gif_lattice(
    data: bytes, every_k: int
) -> tuple[int, dict[int, np.ndarray]] | None:
    """(frame_count, {frame_idx: canvas}) for the every-k sampling
    lattice in ONE container walk — the sampler's path (a separate
    gif_frame_count + decode_gif_frames pair would walk the sub-block
    chain twice per document)."""
    frames = _parse_frames(data)
    if frames is None or not frames:
        return None
    want = set(range(0, len(frames), max(1, every_k)))
    out = _composite(data, frames, want)
    if out is None:
        return None
    return len(frames), out


def decode_gif(data: bytes) -> np.ndarray | None:
    """GIF bytes → uint8 (h, w, 3) RGB of the FIRST frame (palette
    expanded, interlace undone, composited on the logical screen at
    the frame's (left, top) offset over the LSD background color;
    frame-0 GCE transparency is IGNORED — transparent pixels render
    their palette color, matching PIL's frame-0 RGB conversion and the
    pre-animation contract). None for corrupt/truncated input — the
    caller maps that to the dropped-with-count row like any other
    decode failure."""
    out = decode_gif_frames(data, (0,))
    return None if out is None else out.get(0)


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


def encode_gif_animation(
    frames,
    palette: np.ndarray,
    *,
    offsets=None,
    transparent: int | None = None,
    disposals=None,
    screen: tuple[int, int] | None = None,
) -> bytes:
    """Multi-frame GIF89a fixture writer: ``frames`` is a list of
    (h, w) uint8 index arrays sharing one global ``palette``;
    ``offsets`` gives each frame's (left, top) on the logical screen
    (default (0, 0)); ``transparent`` emits a GCE transparency index
    on every frame after the first; ``disposals`` is a per-frame
    disposal method list (0 none / 1 leave / 2 restore-bg /
    3 restore-prev). Mirrors the layout real encoders produce so
    decode_gif_frames' compositing rules are exercised for real."""
    palette = np.asarray(palette, dtype=np.uint8)
    n = len(palette)
    if n < 2 or n > 256:
        raise ValueError(f"palette size must be in [2, 256], got {n}")
    if not frames:
        raise ValueError("need at least one frame")
    offsets = offsets or [(0, 0)] * len(frames)
    disposals = disposals or [0] * len(frames)
    if screen is None:
        sw = max(o[0] + f.shape[1] for f, o in zip(frames, offsets))
        sh = max(o[1] + f.shape[0] for f, o in zip(frames, offsets))
    else:
        sw, sh = screen
    bits = max(1, (n - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:n] = palette
    min_code_size = max(2, bits)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (bits - 1), 0, 0])
    out += table.tobytes()
    for fi, (frame, (left, top)) in enumerate(zip(frames, offsets)):
        frame = np.asarray(frame, dtype=np.uint8)
        fh, fw = frame.shape
        disp = disposals[fi] & 0x7
        trans = transparent if (transparent is not None and fi > 0) else None
        if disp or trans is not None:
            packed = (disp << 2) | (1 if trans is not None else 0)
            out += bytes([0x21, 0xF9, 4, packed, 0, 0, trans or 0, 0])
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh) + bytes([0])
        out += bytes([min_code_size])
        compressed = _lzw_encode(frame.tobytes(), min_code_size)
        for i in range(0, len(compressed), 255):
            chunk = compressed[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
