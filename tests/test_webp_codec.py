"""VP8L WebP codec tests: encoder↔decoder roundtrips across every
fixture variant, a hand-assembled spec-literal bitstream (pins the
decoder's bit order / canonical-code conventions independently of the
encoder — the matched-bug trap), plane-map spot checks against the
spec's documented entries, and hostile-input behavior."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from anime_data_pipeline_spark.operators.webp_codec import (
    _PLANE_MAP,
    _BitWriter,
    decode_webp,
    encode_webp,
    webp_meta,
)


def _rng(seed=3):
    return np.random.default_rng(seed)


# RFC 9649 §4.2.2's literal code→plane table: entry i is the byte
# (dy << 4) | (8 - dx) for 1-based distance code i+1. Transcribed from
# the spec so the generated map is pinned against ALL 120 entries —
# the r7 generator admitted dx = -8 (unrepresentable: 8-(-8) overflows
# the nibble) and silently corrupted codes ~97-120.
_SPEC_CODE_TO_PLANE = [
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
]


def test_plane_map_spec_entries():
    """The generated 120-entry map must reproduce the spec's literal
    table (RFC 9649 §4.2.2) byte for byte — all 120 entries, not just
    a prefix (the r6 test pinned only the first 24 and missed the
    dx=-8 tail corruption)."""
    assert len(_PLANE_MAP) == 120
    spec = [(8 - (b & 0xF), b >> 4) for b in _SPEC_CODE_TO_PLANE]
    assert _PLANE_MAP == spec
    # packing invariants: every entry fits (dy<<4)|(8-dx), backward-only
    assert len(set(_PLANE_MAP)) == 120
    for dx, dy in _PLANE_MAP:
        assert 0 <= dy <= 7 and -7 <= dx <= 8
        assert dy > 0 or dx > 0


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_literal_roundtrip(ch):
    arr = _rng(ch).integers(0, 256, size=(13, 17, ch), dtype=np.uint8)
    if ch == 4:
        arr[0, 0, 3] = 200  # force the alpha-used path
    blob = encode_webp(arr)
    w, h, mode = webp_meta(blob)
    assert (w, h) == (17, 13)
    out = decode_webp(blob)
    if ch == 1:
        assert mode == "RGB" and (out[:, :, 0] == arr[:, :, 0]).all()
        assert (out[:, :, 1] == out[:, :, 0]).all()
    elif ch == 3:
        assert mode == "RGB" and (out == arr).all()
    else:
        assert mode == "RGBA" and (out == arr).all()


def test_subtract_green_roundtrip():
    arr = _rng(9).integers(0, 256, size=(9, 21, 3), dtype=np.uint8)
    out = decode_webp(encode_webp(arr, subtract_green=True))
    assert (out == arr).all()


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_roundtrip(mode):
    """All 14 modes: the forward (numpy row-vector) and inverse
    (scalar-int) implementations are structurally independent, so a
    matched spec misreading is unlikely to survive this."""
    y, x = np.mgrid[0:14, 0:19]
    smooth = np.stack(
        [(y * 11 + x * 7) % 256, (y * 3) % 256, (x * 5 + 100) % 256], axis=2
    ).astype(np.uint8)
    noise = _rng(mode).integers(0, 256, size=(10, 13, 4), dtype=np.uint8)
    for arr in (smooth, noise):
        out = decode_webp(encode_webp(arr, predictor_mode=mode))
        assert out is not None and (out == arr).all(), f"mode {mode}"


@pytest.mark.parametrize("n_colors", [2, 4, 13, 16, 17, 200])
def test_palette_roundtrip(n_colors):
    """Covers all three bundling widths (8/4/2 px per byte) and the
    unbundled path."""
    rng = _rng(n_colors)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(11, 23, 1), dtype=np.uint8)
    out = decode_webp(encode_webp(idx, palette=pal))
    assert (out == pal[idx[:, :, 0]]).all()


def test_palette_alpha_roundtrip():
    pal = np.array([[255, 0, 0, 255], [0, 255, 0, 128], [0, 0, 255, 0]], dtype=np.uint8)
    idx = (_rng(5).integers(0, 3, size=(7, 9))).astype(np.uint8)[:, :, None]
    blob = encode_webp(idx, palette=pal)
    assert webp_meta(blob)[2] == "RGBA"
    out = decode_webp(blob)
    assert out.shape == (7, 9, 4) and (out == pal[idx[:, :, 0]]).all()


@pytest.mark.parametrize("cache_bits", [0, 3, 8])
def test_lz77_and_cache_roundtrip(cache_bits):
    """Run-heavy content: backward references (plane-mapped distance 1)
    plus color-cache hits on revisited colors."""
    rng = _rng(31 + cache_bits)
    arr = np.repeat(
        rng.integers(0, 8, size=(12, 6, 3), dtype=np.uint8) * 32, 5, axis=1
    )  # (12, 30): long horizontal runs from 8 distinct colors
    out = decode_webp(encode_webp(arr, cache_bits=cache_bits, use_lz77=True))
    assert (out == arr).all()


def test_handassembled_spec_literal_stream():
    """A 2x1 RGB image written bit-by-bit from the spec (not via
    encode_webp): simple 2-symbol green code, simple 1-symbol
    red/blue/alpha/distance codes. Pins LSB-first field packing, the
    simple-code layout, and 0-bit single-symbol codes."""
    bw = _BitWriter()
    bw.write(0x2F, 8)  # signature
    bw.write(1, 14)  # width - 1
    bw.write(0, 14)  # height - 1
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    # green: simple, 2 symbols (40, 200) → codes 0 and 1 (1 bit each)
    bw.write(1, 1)
    bw.write(1, 1)  # num_symbols - 1
    bw.write(1, 1)  # first symbol is 8 bits
    bw.write(40, 8)
    bw.write(200, 8)
    # red: simple, 1 symbol = 10 (8-bit form); 0-bit code
    for sym in (10, 20, 255):  # red, blue, alpha
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    # distance: simple, 1 symbol = 0 (1-bit short form)
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # pixels: green symbols 40 (code 0) then 200 (code 1)
    bw.write(0, 1)
    bw.write(1, 1)
    payload = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert webp_meta(blob) == (2, 1, "RGB")
    out = decode_webp(blob)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == [10, 40, 20]
    assert out[0, 1].tolist() == [10, 200, 20]


def test_vp8_lossy_meta_and_seam():
    """Hand-built minimal lossy header: meta parses dims natively.
    Pixel decode goes through the system libwebp binding since r8 —
    a truncated body is corrupt (None), and the seam contract
    (NotImplementedError) survives only where the .so is absent."""
    import anime_data_pipeline_spark.operators.webp_system as ws

    hdr = bytes([0x00, 0x00, 0x00]) + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240)
    chunk = b"VP8 " + struct.pack("<I", len(hdr)) + hdr
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert webp_meta(blob) == (320, 240, "RGB")
    if ws.load_libwebp() is not None:
        assert decode_webp(blob) is None  # header-only stub = corrupt body
    orig = ws.load_libwebp
    try:
        ws.load_libwebp = lambda: None  # simulate the lib-absent environment
        with pytest.raises(NotImplementedError):
            decode_webp(blob)
    finally:
        ws.load_libwebp = orig


def test_vp8x_canvas_meta():
    payload = bytes([0x10, 0, 0, 0]) + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
    chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert webp_meta(blob) == (640, 480, "RGBA")


def test_corrupt_and_hostile_inputs():
    good = encode_webp(_rng(1).integers(0, 256, size=(6, 6, 3), dtype=np.uint8))
    assert decode_webp(b"RIFF\x00\x00\x00\x00WEBP") is None
    assert webp_meta(b"not a webp at all") is None
    # truncated payload → None, not an exception
    assert decode_webp(good[:24]) is None
    # bit-flip inside the entropy stream → None or a wrong-but-bounded image
    bad = bytearray(good)
    bad[-3] ^= 0xFF
    decode_webp(bytes(bad))  # must not raise
    # crafted huge dims: 16383x16383 > 64MP cap → rejected pre-allocation
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(16382, 14)
    bw.write(16382, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    payload = bw.done() + b"\x00" * 8
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert decode_webp(blob) is None
    assert webp_meta(blob) == (16383, 16383, "RGB")  # meta is header-only


def test_single_color_image():
    arr = np.full((5, 4, 3), 77, dtype=np.uint8)
    out = decode_webp(encode_webp(arr))
    assert (out == arr).all()
    out2 = decode_webp(encode_webp(arr, use_lz77=True, cache_bits=2))
    assert (out2 == arr).all()


def test_predictor13_truncates_toward_zero():
    """ClampAddSubtractHalf uses C division (toward zero): with
    L=T=10, TL=13 the prediction is 10 + trunc(-3/2) = 9 — a floor
    shift would give 8. Hand-built residuals, no encoder involved."""
    import numpy as np

    from anime_data_pipeline_spark.operators.webp_codec import _inv_predictor

    res = np.zeros((2, 2, 4), dtype=np.uint8)
    res[0, 0] = (13, 13, 13, (13 - 255) % 256)
    res[0, 1] = ((10 - 13) % 256,) * 4
    res[1, 0] = ((10 - 13) % 256,) * 4
    res[1, 1] = (0, 0, 0, 0)
    modes = np.zeros((1, 1, 4), dtype=np.uint8)
    modes[0, 0, 1] = 13
    out = _inv_predictor(res, size_bits=9, modes=modes)
    assert out[1, 1].tolist() == [9, 9, 9, 9]


def test_color_transform_roundtrip():
    """Cross-color inverse: negative and positive int8 multipliers,
    incl. the red→blue chained term that must use the RESTORED red."""
    rng = _rng(41)
    arr = rng.integers(0, 256, size=(15, 22, 3), dtype=np.uint8)
    for cte in ((38, 250, 7), (255, 1, 128), (0, 0, 0), (127, 129, 200)):
        out = decode_webp(encode_webp(arr, color_transform=cte))
        assert out is not None and (out == arr).all(), f"cte {cte}"


def test_meta_prefix_groups_roundtrip():
    """Two entropy-image groups (left/right on a 4-px block lattice):
    the decoder must switch code groups mid-row."""
    rng = _rng(43)
    # left half low values, right half high — group-specific codes differ
    arr = np.concatenate(
        [
            rng.integers(0, 32, size=(17, 13, 3), dtype=np.uint8),
            rng.integers(224, 256, size=(17, 13, 3), dtype=np.uint8),
        ],
        axis=1,
    )
    out = decode_webp(encode_webp(arr, meta_groups=2))
    assert out is not None and (out == arr).all()


def test_animated_webp_lattice_and_compositing():
    from anime_data_pipeline_spark.operators.webp_codec import (
        decode_webp_lattice,
        encode_webp_anim,
        webp_anim_meta,
    )

    f0 = np.full((20, 30, 3), 60, np.uint8)
    sub = _rng(8).integers(0, 256, (10, 12, 3), dtype=np.uint8)
    f2 = np.full((20, 30, 3), 200, np.uint8)
    blob = encode_webp_anim([(f0, 0, 0, 40), (sub, 4, 6, 40), (f2, 0, 0, 40)], (30, 20))
    assert webp_anim_meta(blob) == (30, 20, 3)
    n, frames = decode_webp_lattice(blob, 1)
    assert n == 3 and sorted(frames) == [0, 1, 2]
    assert (frames[0][:, :, :3] == 60).all()
    exp1 = frames[0].copy()
    exp1[6:16, 4:16, :3] = sub
    exp1[6:16, 4:16, 3] = 255
    assert (frames[1] == exp1).all()
    assert (frames[2][:, :, :3] == 200).all()
    # every-2 sampling still composites through frame 1
    n2, f2s = decode_webp_lattice(blob, 2)
    assert sorted(f2s) == [0, 2] and (f2s[2] == frames[2]).all()
    # dispose-to-background: frame 1's rect reverts before frame 2
    blob_d = encode_webp_anim(
        [(f0, 0, 0, 40), (sub, 4, 6, 40), (sub, 0, 0, 40)],
        (30, 20),
        bg=(9, 9, 9, 255),
        dispose_bg=True,
    )
    _, fd = decode_webp_lattice(blob_d, 1)
    assert (fd[1][6:16, 4:16, :3] == sub).all()
    assert (fd[2][0:10, 0:12, :3] == sub).all()
    assert (fd[2][12:, 20:, :3] == 9).all()  # disposed area back to bg


def test_animated_webp_alpha_blend():
    """A 50%-alpha red frame over an opaque green canvas: src-over with
    integer rounding (no-blend flag OFF)."""
    import struct as _struct

    from anime_data_pipeline_spark.operators.webp_codec import (
        decode_webp_lattice,
        encode_webp_anim,
    )

    base = np.zeros((8, 8, 4), np.uint8)
    base[:, :] = (0, 200, 0, 255)
    overlay = np.zeros((8, 8, 4), np.uint8)
    overlay[:, :] = (100, 0, 0, 128)
    blob = bytearray(encode_webp_anim([(base, 0, 0, 10), (overlay, 0, 0, 10)], (8, 8)))
    # clear the no-blend bit on the SECOND ANMF frame header
    second = blob.index(b"ANMF", blob.index(b"ANMF") + 4)
    flag_at = second + 8 + 15
    blob[flag_at] = blob[flag_at] & ~0x02
    _, frames = decode_webp_lattice(bytes(blob), 1)
    out = frames[1][0, 0]
    # over: a = 128 + 255*(127)/255 = 255; rgb = (src*128 + dst*127)/255
    assert out[3] == 255
    assert out[0] == round((100 * 128 * 255 + 0) / (255 * 255))
    assert out[1] == round((0 + 200 * 255 * 127) / (255 * 255))


def test_animated_webp_corrupt_and_nonanim():
    from anime_data_pipeline_spark.operators.webp_codec import (
        decode_webp_lattice,
        webp_anim_meta,
    )

    still = encode_webp(np.full((4, 4, 3), 7, np.uint8))
    assert webp_anim_meta(still) is None  # no VP8X/ANMF
    assert decode_webp_lattice(still, 1) is None
    assert decode_webp_lattice(b"RIFF\x04\x00\x00\x00WEBP", 1) is None


def test_lossy_anim_frames_drop_not_crash(spark):
    """An animated WebP whose ANMF frames carry lossy 'VP8 ' data must
    DROP the clip in sample_video_frame_stats (zero rows), never kill
    the Spark task with NotImplementedError."""
    import struct as _struct

    from anime_data_pipeline_spark.operators.multimodal import (
        sample_video_frame_stats,
    )

    vp8 = b"VP8 " + _struct.pack("<I", 10) + b"\x00\x00\x00\x9d\x01\x2a\x08\x00\x08\x00"
    hdr = (
        (0).to_bytes(3, "little") * 2
        + (7).to_bytes(3, "little")
        + (7).to_bytes(3, "little")
        + (40).to_bytes(3, "little")
        + bytes([0x02])
    )
    anmf = b"ANMF" + _struct.pack("<I", len(hdr) + len(vp8)) + hdr + vp8
    vp8x = b"VP8X" + _struct.pack("<I", 10) + bytes([0x02, 0, 0, 0]) + (7).to_bytes(
        3, "little"
    ) + (7).to_bytes(3, "little")
    body = vp8x + anmf
    blob = b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    good = encode_webp_anim_ok()
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(good))], "doc_id long, content binary"
    )
    rows = sample_video_frame_stats(df, every_k=1).collect()
    assert {r["doc_id"] for r in rows} == {2}  # lossy clip dropped, good one kept


def encode_webp_anim_ok():
    from anime_data_pipeline_spark.operators.webp_codec import encode_webp_anim

    f = np.full((6, 6, 3), 50, np.uint8)
    return encode_webp_anim([(f, 0, 0, 10)], (6, 6))


def test_odd_anim_offsets_rejected():
    from anime_data_pipeline_spark.operators.webp_codec import encode_webp_anim

    f = np.full((4, 4, 3), 9, np.uint8)
    with pytest.raises(ValueError):
        encode_webp_anim([(f, 3, 0, 10)], (10, 10))


def test_still_decode_of_animation_returns_first_frame():
    """decode_webp on an animated container composites frame 0 — the
    same first-frame contract decode_gif gives animated GIFs."""
    from anime_data_pipeline_spark.operators.webp_codec import encode_webp_anim

    f0 = np.full((12, 10, 3), 80, np.uint8)
    f1 = np.full((12, 10, 3), 160, np.uint8)
    blob = encode_webp_anim([(f0, 0, 0, 10), (f1, 0, 0, 10)], (10, 12))
    assert webp_meta(blob) == (10, 12, "RGB")
    out = decode_webp(blob)
    # RGB frames → VP8X alpha flag unset → 3 channels, agreeing with
    # webp_meta's mode (the r7 path always returned the RGBA canvas)
    assert out is not None and out.shape == (12, 10, 3)
    assert (out == 80).all()  # frame 0, not frame 1
    # and the alpha animation keeps its 4th channel
    fa = np.full((12, 10, 4), 80, np.uint8)
    fa[:, :, 3] = 200
    blob_a = encode_webp_anim([(fa, 0, 0, 10), (f1, 0, 0, 10)], (10, 12))
    assert webp_meta(blob_a) == (10, 12, "RGBA")
    out_a = decode_webp(blob_a)
    assert out_a is not None and out_a.shape == (12, 10, 4)
    assert (out_a[:, :, 3] == 200).all()


def test_handassembled_anmf_layout():
    """A 2-frame animation written byte-by-byte from the ANMF spec (not
    via encode_webp_anim): pins the 3-byte little-endian field order
    (x/2, y/2, w-1, h-1, duration) and the flag bits independently of
    the fixture writer — the matched-bug trap for the animation path."""
    from anime_data_pipeline_spark.operators.webp_codec import (
        decode_webp_lattice,
        webp_anim_meta,
    )

    def u24(v):
        return int(v).to_bytes(3, "little")

    def vp8l_chunk(fill, w, h):
        still = encode_webp(np.full((h, w, 3), fill, np.uint8))
        at = still.index(b"VP8L")
        (sz,) = struct.unpack("<I", still[at + 4 : at + 8])
        return still[at : at + 8 + sz + (sz & 1)]

    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x02, 0, 0, 0]) + u24(11) + u24(9)
    anim = b"ANIM" + struct.pack("<I", 6) + bytes([5, 6, 7, 255]) + struct.pack("<H", 0)
    # frame 0: full canvas 12x10 at (0,0), no-blend (bit1), keep (bit0=0)
    f0 = vp8l_chunk(100, 12, 10)
    h0 = u24(0) + u24(0) + u24(11) + u24(9) + u24(40) + bytes([0x02])
    anmf0 = b"ANMF" + struct.pack("<I", len(h0) + len(f0)) + h0 + f0
    # frame 1: 4x6 sub-rect at (6, 2) → stored as x/2=3, y/2=1
    f1 = vp8l_chunk(220, 4, 6)
    h1 = u24(3) + u24(1) + u24(3) + u24(5) + u24(40) + bytes([0x02])
    anmf1 = b"ANMF" + struct.pack("<I", len(h1) + len(f1)) + h1 + f1
    body = vp8x + anim + anmf0 + anmf1
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    assert webp_anim_meta(blob) == (12, 10, 2)
    n, frames = decode_webp_lattice(blob, 1)
    assert n == 2
    assert (frames[0][:, :, :3] == 100).all()
    c1 = frames[1]
    assert (c1[2:8, 6:10, :3] == 220).all()  # sub-rect at (x=6, y=2)
    assert (c1[0:2, :, :3] == 100).all()  # rest keeps frame 0


def test_lattice_total_sampled_bytes_cap():
    """A crafted animation of tiny frames on a near-cap canvas must be
    refused BEFORE compositing: per-canvas 64MP is fine for one copy,
    but retaining n copies multiplies it (an OOM kill lands before
    MemoryError raises) — total retained pixels cap at 256MP."""
    from anime_data_pipeline_spark.operators.webp_codec import (
        decode_webp_lattice,
        encode_webp_anim,
    )

    tiny = np.full((2, 2, 3), 9, np.uint8)
    # 8192x8192 = 64MP canvas (per-canvas cap allows ONE); 5 retained
    # canvases = 320MP > the 256MP total cap
    blob = encode_webp_anim(
        [(tiny, 0, 0, 10)] * 5, (8192, 8192)
    )
    assert decode_webp_lattice(blob, 1) is None
    # sampling every 5th keeps one canvas → within budget, decodes
    res = decode_webp_lattice(blob, 5)
    assert res is not None and res[0] == 5 and set(res[1]) == {0}
