"""Pure-stdlib AVI (MJPEG) codec — un-stubs the VIDEO decode path:
real RIFF/AVI container parsing with per-frame JPEG decode through
the existing stdlib JPEG codec (operators/jpeg_codec.py).

Motion-JPEG-in-AVI is the one mainstream video format whose frames
are independently decodable stills, which makes it exactly the
decode-sample-decode shape the frame-sampling pipeline plans for
(q80's every-kth-frame lattice): no inter-frame state, any frame
decodes alone, shard- and row-parallel. Supported: single 'vids'
stream, MJPG/mjpg (or raw 'dib '-less) handler, '00dc'/'00db' frame
chunks inside the 'movi' LIST (direct or nested 'rec ' lists);
anything else — compressed non-MJPEG codecs (H.264 etc.), missing
headers, truncated chunks — returns None, the dropped-with-count row
(the ffmpeg seam would own those formats, mirroring the PIL seam for
WEBP/TIFF).

Scale note: ``avi_meta``/``avi_frame_offsets`` read only chunk
headers — sampling every kth frame of a petabyte video corpus plans
from headers and decodes ONLY the sampled frames' byte ranges.
"""

from __future__ import annotations

import struct

import numpy as np

from anime_data_pipeline_spark.operators.jpeg_codec import decode_jpeg

RIFF_MAGIC = b"RIFF"


def _subchunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, size) across [start, end), honoring
    RIFF word alignment."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            return
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == RIFF_MAGIC and data[8:12] == b"AVI "


def avi_meta(data: bytes) -> tuple[int, int, int, int] | None:
    """(width, height, n_frames, fps) from avih + the vids strh, or
    None when not a decodable-by-us MJPEG AVI."""
    if not _is_avi(data):
        return None
    avih = None
    fps = None
    mjpg = False
    for fourcc, start, size in _subchunks(data, 12, len(data)):
        if fourcc != b"LIST" or data[start : start + 4] != b"hdrl":
            continue
        for f2, s2, z2 in _subchunks(data, start + 4, start + size):
            if f2 == b"avih" and z2 >= 40:
                us_pf, _mbps, _pad, _flags, total = struct.unpack(
                    "<IIIII", data[s2 : s2 + 20]
                )
                w, h = struct.unpack("<II", data[s2 + 32 : s2 + 40])
                avih = (int(w), int(h), int(total), us_pf)
            elif f2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                for f3, s3, z3 in _subchunks(data, s2 + 4, s2 + z2):
                    if f3 == b"strh" and z3 >= 32:
                        if data[s3 : s3 + 4] != b"vids":
                            continue
                        handler = data[s3 + 4 : s3 + 8]
                        mjpg = handler.lower() in (b"mjpg", b"\x00\x00\x00\x00")
                        scale, rate = struct.unpack("<II", data[s3 + 20 : s3 + 28])
                        if scale > 0 and rate > 0:
                            fps = rate // scale
    if avih is None or not mjpg:
        return None
    w, h, total, us_pf = avih
    if w <= 0 or h <= 0 or total <= 0:
        return None
    if fps is None:
        fps = round(1_000_000 / us_pf) if us_pf else 0
    return w, h, total, int(fps)


def avi_frame_offsets(data: bytes) -> list[tuple[int, int]] | None:
    """Byte ranges [(start, size)] of every video frame chunk
    ('00dc'/'00db', direct or inside 'rec ' lists) in stream order —
    header-only walk, no frame bytes touched."""
    if not _is_avi(data):
        return None
    frames: list[tuple[int, int]] = []

    def walk(start: int, end: int) -> None:
        for fourcc, s, z in _subchunks(data, start, end):
            if fourcc in (b"00dc", b"00db"):
                frames.append((s, z))
            elif fourcc == b"LIST" and data[s : s + 4] == b"rec ":
                walk(s + 4, s + z)

    for fourcc, start, size in _subchunks(data, 12, len(data)):
        if fourcc == b"LIST" and data[start : start + 4] == b"movi":
            walk(start + 4, start + size)
    return frames or None


def decode_avi_frames(
    data: bytes, every_k: int = 1
) -> list[tuple[int, np.ndarray]] | None:
    """Decode every ``every_k``-th frame: [(frame_idx, (h, w[, ch])
    uint8)]. Only sampled frames' bytes are read/decoded; a frame that
    fails JPEG decode is skipped (dropped-with-count at the operator
    layer). None when the container itself doesn't parse."""
    offsets = avi_frame_offsets(data)
    if offsets is None:
        return None
    out = []
    for idx in range(0, len(offsets), every_k):
        s, z = offsets[idx]
        arr = decode_jpeg(data[s : s + z])
        if arr is not None:
            out.append((idx, arr))
    return out


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 24, quality: int = 85) -> bytes:
    """Frames → spec-valid MJPEG AVI (fixture writer; plays in any
    player). Each frame is encoded with the stdlib JPEG encoder."""
    from anime_data_pipeline_spark.operators.jpeg_codec import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    blobs = [encode_jpeg(f, quality) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0)
    hdrl = list_chunk(
        b"hdrl", chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", b) for b in blobs))
    body = b"AVI " + hdrl + movi
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body
