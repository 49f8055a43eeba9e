"""System-libwebp binding (ctypes, stdlib-only) — the lossy-VP8 pixel
path and the native codec's cross-validation oracle.

The reference decodes every image through PIL (dataruu/tagger/
dbimutils.py:6-26), whose WebP support is libwebp underneath. PIL is
absent in this environment but **libwebp.so itself is present** (the
simple decode/encode API, no demux), so lossy VP8 — previously the
documented NotImplementedError seam, and the majority of real crawl
WebP — decodes natively through the same C library PIL would use:

- ``decode_rgba(data)``: bytes → (h, w, 4) uint8 via WebPDecodeRGBA
  (handles VP8 lossy, VP8L, and VP8X-wrapped stills incl. ALPH).
- ``encode_lossy(rgb, quality)`` / ``encode_lossless(rgba)``: fixture
  writers emitting REAL libwebp streams — the cross-validation feed
  for the from-scratch VP8L decoder (tests decode libwebp-encoded
  bitstreams, which exercise backward-reference plane codes, color
  cache, and meta prefix codes as the real encoder chooses them, not
  as our fixture writer does).

Seam contract: ``load_libwebp()`` returns None when the .so is absent
(non-default environments); callers keep the prior NotImplementedError
behavior in that case, so the dispatch degrades to exactly the round-7
contract. All untrusted dims are bounds-checked via WebPGetInfo BEFORE
the C decode allocates (same 64 MP cap as the native codecs).

Scale note: same worker-side profile as the native codecs — the
binding is loaded once per executor (module-level memo), decode cost
is per-image C time inside the Arrow-batched ``mapInPandas`` workers,
zero shuffle.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_MAX_CANVAS_PX = 1 << 26  # 64 MP: shared bounds-before-allocation cap

_LIB: ctypes.CDLL | None | bool = False  # False = not probed yet


def load_libwebp() -> ctypes.CDLL | None:
    """Locate and configure libwebp once per process; None if absent."""
    global _LIB
    if _LIB is not False:
        return _LIB  # type: ignore[return-value]
    path = ctypes.util.find_library("webp")
    candidates = [path] if path else []
    candidates += [
        "libwebp.so.7",
        "libwebp.so",
        "libwebp.7.dylib",
        "libwebp.dylib",
    ]
    lib = None
    for cand in candidates:
        if not cand:
            continue
        try:
            lib = ctypes.CDLL(cand)
            break
        except OSError:
            continue
    if lib is None:
        _LIB = None
        return None
    try:
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGB.argtypes = lib.WebPEncodeLosslessRGBA.argtypes
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        lib.WebPGetDecoderVersion.restype = ctypes.c_int
    except AttributeError:
        _LIB = None
        return None
    _LIB = lib
    return lib


def libwebp_version() -> str | None:
    lib = load_libwebp()
    if lib is None:
        return None
    v = lib.WebPGetDecoderVersion()
    return f"{(v >> 16) & 0xFF}.{(v >> 8) & 0xFF}.{v & 0xFF}"


def decode_rgba(data: bytes) -> np.ndarray | None:
    """bytes → (h, w, 4) RGBA uint8 via the system decoder; None when
    the lib is absent, the blob is corrupt, or dims exceed the cap."""
    lib = load_libwebp()
    if lib is None or not data:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    # dims first: refuse crafted headers BEFORE the C side allocates
    if not lib.WebPGetInfo(data, len(data), ctypes.byref(w), ctypes.byref(h)):
        return None
    if w.value <= 0 or h.value <= 0 or w.value * h.value > _MAX_CANVAS_PX:
        return None
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        return None
    try:
        n = w.value * h.value * 4
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).reshape(h.value, w.value, 4)
        return arr.copy()  # own the buffer before freeing the C side
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))


def _encode(fn, arr: np.ndarray, channels: int, *extra) -> bytes | None:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != channels:
        raise ValueError(f"expected (h, w, {channels}) uint8")
    h, w = arr.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = fn(
        arr.tobytes(), w, h, w * channels, *extra, ctypes.byref(out)
    )
    if not size or not out:
        return None
    try:
        return ctypes.string_at(out, size)
    finally:
        lib = load_libwebp()
        assert lib is not None
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


def encode_lossy(rgb: np.ndarray, quality: float = 75.0) -> bytes | None:
    """(h, w, 3) RGB → real lossy-VP8 WebP bytes; None if lib absent."""
    lib = load_libwebp()
    if lib is None:
        return None
    return _encode(lib.WebPEncodeRGB, rgb, 3, ctypes.c_float(quality))


def encode_lossless(rgba: np.ndarray) -> bytes | None:
    """(h, w, 3|4) → real libwebp VP8L bytes — the cross-validation
    feed for the from-scratch VP8L decoder; None if lib absent."""
    lib = load_libwebp()
    if lib is None:
        return None
    if rgba.shape[2] == 3:
        return _encode(lib.WebPEncodeLosslessRGB, rgba, 3)
    return _encode(lib.WebPEncodeLosslessRGBA, rgba, 4)
