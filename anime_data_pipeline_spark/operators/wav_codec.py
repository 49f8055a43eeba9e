"""Pure-stdlib WAV codec (struct + numpy) — un-stubs the AUDIO decode
path the way png/gif/jpeg/bmp/tiff_codec did for images: real
RIFF/WAVE parsing with no soundfile/ffmpeg dependency.

The reference pipeline is image-centric; the audio family here is the
extension a large-scale multimodal training pipeline needs (SURVEY §6
/ the q87 chunk-plan flow). Supported formats (the ``fmt `` chunk's
wFormatTag):

- 1 (PCM): 8-bit unsigned, 16/24/32-bit signed little-endian (24-bit
  packed triplets sign-extend to int32)
- 3 (IEEE float): 32-bit little-endian
- 6 (A-law) / 7 (µ-law): ITU-T G.711 8-bit companding, expanded to
  int16 via the closed-form segment/mantissa decode (the public
  G.711 algorithm — no table files)
- 0x11 (IMA/DVI ADPCM): 4-bit block-coded, per-block per-channel
  predictor+index headers, the 89-step table and nibble state machine
  from the IMA spec; sample count from the (mandatory-for-compressed)
  ``fact`` chunk

Anything else (MP3-in-WAV, 0xFFFE extensible) and any
malformed/truncated chunk returns None — the dropped-with-count row,
identical to the image codecs' corrupt contract. Extra chunks
(LIST/INFO, cue) are skipped per spec.

Scale note: decode runs inside the same Arrow-batched ``mapInPandas``
workers as the image codecs — row-parallel across clips. PCM/float
and G.711 are one numpy frombuffer/lookup, no Python sample loops;
ADPCM is a sequential per-nibble state machine by spec (each sample
depends on the previous predictor), bounded by the clip's byte count —
the same shape the JPEG Huffman loop has. The header-only ``wav_meta``
fast path never touches the data chunk's bytes, so chunk PLANNING over
petabytes of audio reads ~60 bytes per clip (with parquet lazily
materializing only the sliced binary).
"""

from __future__ import annotations

import struct

import numpy as np

RIFF_MAGIC = b"RIFF"

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}

FMT_PCM = 1
FMT_FLOAT = 3
FMT_ALAW = 6
FMT_ULAW = 7
FMT_IMA = 0x11
_SUPPORTED_FMTS = (FMT_PCM, FMT_FLOAT, FMT_ALAW, FMT_ULAW, FMT_IMA)


def _build_ulaw_table() -> np.ndarray:
    """256-entry µ-law code → int16, from the G.711 closed form
    (bias 0x84, 3-bit segment, 4-bit mantissa, inverted code)."""
    codes = np.arange(256, dtype=np.uint16)
    u = (~codes) & 0xFF
    t = (((u & 0x0F).astype(np.int32)) << 3) + 0x84
    t = t << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    """256-entry A-law code → int16 (even-bit inversion 0x55, segment
    0 linear, segments 1-7 exponential)."""
    codes = np.arange(256, dtype=np.uint16)
    a = codes ^ 0x55
    t = ((a & 0x0F).astype(np.int32)) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


_ULAW_TABLE = _build_ulaw_table()
_ALAW_TABLE = _build_alaw_table()

# IMA/DVI ADPCM step table (89 entries) and index adjustments.
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635,
    13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)


def _chunks(data: bytes):
    """Yield (fourcc, start, size) for every top-level RIFF sub-chunk;
    chunk bodies are WORD-aligned (odd sizes carry a pad byte)."""
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _header(data: bytes):
    """(fmt_code, sample_rate, channels, bits, block_align, data_start,
    data_size, fact_samples | None) or None."""
    if len(data) < 44 or data[:4] != RIFF_MAGIC or data[8:12] != b"WAVE":
        return None
    fmt = None
    pcm = None
    fact = None
    for fourcc, start, size in _chunks(data):
        if fourcc == b"fmt " and size >= 16 and start + 16 <= len(data):
            audio_fmt, ch, rate, _brate, balign = struct.unpack(
                "<HHIIH", data[start : start + 14]
            )
            bits = struct.unpack("<H", data[start + 14 : start + 16])[0]
            fmt = (audio_fmt, ch, rate, bits, balign)
        elif fourcc == b"fact" and size >= 4 and start + 4 <= len(data):
            (fact,) = struct.unpack("<I", data[start : start + 4])
        elif fourcc == b"data":
            if start + size > len(data):
                return None  # truncated payload
            pcm = (start, size)
        if fmt and pcm and fact is not None:
            break
    if fmt is None or pcm is None:
        return None
    audio_fmt, ch, rate, bits, balign = fmt
    if audio_fmt not in _SUPPORTED_FMTS or ch == 0 or rate <= 0:
        return None
    if audio_fmt == FMT_PCM and bits != 24 and bits not in _PCM_DTYPES:
        return None
    if audio_fmt == FMT_FLOAT and bits != 32:
        return None
    if audio_fmt in (FMT_ALAW, FMT_ULAW) and bits != 8:
        return None
    if audio_fmt == FMT_IMA:
        # per-block per-channel 4-byte headers; need the block size and
        # the fact chunk's true sample count (mandatory for compressed)
        if bits != 4 or balign <= 4 * ch or fact is None:
            return None
        # fact is an untrusted header field: cap it at what the data
        # chunk can actually decode (header sample + 8 per nibble word
        # per channel, times ceil(data/block) blocks), else a ~60-byte
        # crafted clip claims 2^32 samples and the chunk planner
        # explodes it into millions of rows
        spb = 1 + ((balign - 4 * ch) // 4 // ch) * 8
        max_n = -(-pcm[1] // balign) * spb
        if fact > max_n:
            return None
    elif pcm[1] % (ch * bits // 8) != 0:
        return None
    return audio_fmt, rate, ch, bits, balign, pcm[0], pcm[1], fact


def wav_meta(data: bytes) -> tuple[int, int, int, int] | None:
    """Header-only (sample_rate, n_samples, channels, bits) — O(header)
    regardless of clip length: the fast path for chunk planning. Bits
    reports the CONTAINER width (8 for G.711, 4 for ADPCM)."""
    hdr = _header(data)
    if hdr is None:
        return None
    fmt, rate, ch, bits, _balign, _start, size, fact = hdr
    if fmt == FMT_IMA:
        n = fact
    elif fmt in (FMT_ALAW, FMT_ULAW):
        n = size // ch
    else:
        n = size // (ch * bits // 8)
    return rate, n, ch, bits


_IMA_STEPS_NP = np.asarray(_IMA_STEPS, dtype=np.int32)
_IMA_INDEX_NP = np.asarray(_IMA_INDEX, dtype=np.int32)


def _decode_ima(body: bytes, ch: int, balign: int, n_samples: int) -> np.ndarray | None:
    """IMA ADPCM blocks → (n_samples, ch) int16. Per block: ch 4-byte
    headers (predictor int16, step index uint8, reserved), then 4-byte
    nibble words round-robining channels, low nibble first.

    Blocks are state-independent (each header restarts the predictor
    and step index), so the nibble state machine runs VECTORIZED
    across all (block, channel) lanes at once — the Python loop is
    O(samples_per_block) regardless of clip length, the same
    clip-length-independence the image codecs' row loops have."""
    if not body:
        return None
    nb_full, rem = divmod(len(body), balign)
    nb = nb_full + (1 if rem else 0)
    if nb == 0 or rem and rem <= 4 * ch:
        return None  # dangling tail too short to hold block headers
    padded = np.zeros(nb * balign, dtype=np.uint8)
    padded[: len(body)] = np.frombuffer(body, dtype=np.uint8)
    blocks = padded.reshape(nb, balign)
    hdr = blocks[:, : 4 * ch].reshape(nb, ch, 4)
    pred = (
        hdr[:, :, 0].astype(np.uint16) | (hdr[:, :, 1].astype(np.uint16) << 8)
    ).astype(np.int16).astype(np.int32)
    idx = hdr[:, :, 2].astype(np.int32)
    if (idx > 88).any():
        return None
    data = blocks[:, 4 * ch :]
    words = data.reshape(nb, -1, 4)  # word g → channel g % ch
    per_ch_words = words.shape[1] // ch
    if per_ch_words == 0:
        return None
    # (nb, ch, per_ch_words*8) nibble lanes, low nibble first
    by_ch = (
        words[:, : per_ch_words * ch, :]
        .reshape(nb, per_ch_words, ch, 4)
        .transpose(0, 2, 1, 3)
        .reshape(nb, ch, -1)
    )
    nibs = np.empty((nb, ch, by_ch.shape[2] * 2), dtype=np.uint8)
    nibs[:, :, 0::2] = by_ch & 0x0F
    nibs[:, :, 1::2] = by_ch >> 4
    t_len = nibs.shape[2]
    out = np.empty((nb, ch, 1 + t_len), dtype=np.int16)
    out[:, :, 0] = pred  # the header predictor IS the block's first sample
    for t in range(t_len):
        nib = nibs[:, :, t].astype(np.int32)
        step = _IMA_STEPS_NP[idx]
        diff = (
            (step >> 3)
            + (nib & 1) * (step >> 2)
            + ((nib >> 1) & 1) * (step >> 1)
            + ((nib >> 2) & 1) * step
        )
        pred = np.clip(np.where(nib & 8, pred - diff, pred + diff), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX_NP[nib & 7], 0, 88)
        out[:, :, t + 1] = pred
    flat = out.transpose(0, 2, 1).reshape(-1, ch)  # block-major sample order
    if flat.shape[0] < n_samples:
        return None
    return flat[:n_samples].copy()


def decode_wav(data: bytes) -> tuple[np.ndarray, int] | None:
    """WAV bytes → (samples (n, channels), sample_rate). Dtype follows
    the container for PCM/float (uint8 / int16 / int32 / float32 LE —
    feature extractors normalize downstream, mirroring how the image
    chain keeps 16-bit PNG samples true); G.711 and ADPCM expand to
    int16. None for corrupt/unsupported."""
    hdr = _header(data)
    if hdr is None:
        return None
    fmt, rate, ch, bits, balign, start, size, fact = hdr
    if fmt == FMT_IMA:
        try:
            samples = _decode_ima(data[start : start + size], ch, balign, fact)
        except (struct.error, IndexError, ValueError):
            return None
        if samples is None:
            return None
        return samples, rate
    if fmt in (FMT_ALAW, FMT_ULAW):
        codes = np.frombuffer(data, dtype=np.uint8, count=size, offset=start)
        table = _ALAW_TABLE if fmt == FMT_ALAW else _ULAW_TABLE
        return table[codes].reshape(-1, ch), rate
    if bits == 24:  # packed 3-byte little-endian → sign-extended int32
        raw = np.frombuffer(data, dtype=np.uint8, count=size, offset=start)
        trip = raw.reshape(-1, 3).astype(np.int32)
        x = trip[:, 0] | (trip[:, 1] << 8) | (trip[:, 2] << 16)
        x = (x ^ 0x800000) - 0x800000
        return x.reshape(-1, ch), rate
    dtype = np.dtype("<f4") if fmt == FMT_FLOAT else np.dtype(_PCM_DTYPES[bits])
    flat = np.frombuffer(data, dtype=dtype, count=size // dtype.itemsize, offset=start)
    return flat.reshape(-1, ch), rate


# ---------------------------------------------------------------------------
# Encoders (test fixtures / synthetic corpora only)
# ---------------------------------------------------------------------------


def _encode_g711(x: np.ndarray, table: np.ndarray) -> np.ndarray:
    """int16 → nearest G.711 code under the given decode table (exact
    for values in the codebook; nearest-neighbour otherwise)."""
    order = np.argsort(table, kind="stable")
    svals = table[order].astype(np.int32)
    pos = np.searchsorted(svals, x.astype(np.int32))
    pos = np.clip(pos, 1, len(svals) - 1)
    left, right = svals[pos - 1], svals[pos]
    pick = np.where(np.abs(x - left) <= np.abs(right - x), pos - 1, pos)
    return order[pick].astype(np.uint8)


def _encode_ima(a: np.ndarray, balign: int) -> tuple[bytes, int]:
    """(n, ch) int16 → IMA ADPCM block stream at the given block align;
    returns (body, samples_per_block). Each block starts at step
    index 0 (declared in its header, so any decoder agrees), which
    keeps blocks state-independent and lets the nibble search run
    vectorized across all (block, channel) lanes — O(samples_per_block)
    Python iterations regardless of clip length, mirroring
    ``_decode_ima``."""
    n, ch = a.shape
    spb = (balign - 4 * ch) * 2 // ch + 1
    if n == 0:
        return b"", spb
    nb = (n + spb - 1) // spb
    # (nb, ch, spb) sample lanes, short tail padded by repeating the
    # last sample (decoder trims via the fact count)
    lanes = np.empty((nb * spb, ch), dtype=np.int32)
    lanes[:n] = a
    lanes[n:] = a[-1]
    lanes = lanes.reshape(nb, spb, ch).transpose(0, 2, 1)
    pred = lanes[:, :, 0].copy()
    idx = np.zeros((nb, ch), dtype=np.int32)
    t_len = spb - 1
    nibs = np.empty((nb, ch, t_len), dtype=np.uint8)
    for t in range(t_len):
        step = _IMA_STEPS_NP[idx]
        diff = lanes[:, :, t + 1] - pred
        sign = (diff < 0).astype(np.int32) << 3
        mag = np.abs(diff)
        b4 = (mag >= step).astype(np.int32)
        mag = mag - b4 * step
        half = step >> 1
        b2 = (mag >= half).astype(np.int32)
        mag = mag - b2 * half
        b1 = (mag >= (step >> 2)).astype(np.int32)
        nib = sign | (b4 << 2) | (b2 << 1) | b1
        # decoder-mirror state update
        vp = (step >> 3) + b1 * (step >> 2) + b2 * (step >> 1) + b4 * step
        pred = np.clip(np.where(sign, pred - vp, pred + vp), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX_NP[nib & 7], 0, 88)
        nibs[:, :, t] = nib
    # pack: per-channel nibble lanes (padded to 8-nibble words) →
    # 4-byte words round-robining channels
    per_ch = (balign - 4 * ch) * 2 // ch
    padded = np.zeros((nb, ch, per_ch), dtype=np.uint8)
    padded[:, :, :t_len] = nibs
    pairs = padded.reshape(nb, ch, per_ch // 2, 2)
    packed = (pairs[:, :, :, 0] | (pairs[:, :, :, 1] << 4)).reshape(
        nb, ch, per_ch // 8, 4
    )
    words = packed.transpose(0, 2, 1, 3).reshape(nb, -1)  # round-robin
    hdr = np.zeros((nb, ch, 4), dtype=np.uint8)  # index byte stays 0
    first = lanes[:, :, 0].astype(np.int16)  # header IS the first sample
    hdr[:, :, 0] = (first.view(np.uint16) & 0xFF).astype(np.uint8)
    hdr[:, :, 1] = (first.view(np.uint16) >> 8).astype(np.uint8)
    body = np.concatenate([hdr.reshape(nb, -1), words], axis=1)
    return body.tobytes(), spb


def encode_wav(samples: np.ndarray, sample_rate: int, fmt: str = "pcm") -> bytes:
    """(n, channels) or (n,) array → canonical RIFF/WAVE bytes
    (fixture writer; output opens in any player). fmt: "pcm"
    (uint8/int16/int32 input), "float32", "ulaw" / "alaw" (int16
    input, companded to 8-bit), "ima_adpcm" (int16 input, 4-bit
    blocks + fact chunk)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    fact_body = b""
    if fmt == "pcm":
        bits = a.dtype.itemsize * 8
        if bits not in _PCM_DTYPES:
            raise ValueError("pcm samples must be uint8, int16, or int32")
        code, body = FMT_PCM, a.astype(_PCM_DTYPES[bits]).tobytes()
        balign = ch * bits // 8
        extra = b""
    elif fmt == "pcm24":  # int32 input in [-2^23, 2^23): low 3 bytes LE
        code, bits = FMT_PCM, 24
        le = a.astype("<i4").reshape(-1).view(np.uint8).reshape(-1, 4)
        body = np.ascontiguousarray(le[:, :3]).tobytes()
        balign = ch * 3
        extra = b""
    elif fmt == "float32":
        code, bits = FMT_FLOAT, 32
        body = a.astype("<f4").tobytes()
        balign = ch * 4
        extra = struct.pack("<H", 0)  # cbSize = 0
        fact_body = struct.pack("<I", n)
    elif fmt in ("ulaw", "alaw"):
        code = FMT_ULAW if fmt == "ulaw" else FMT_ALAW
        bits = 8
        table = _ULAW_TABLE if fmt == "ulaw" else _ALAW_TABLE
        body = _encode_g711(a.astype(np.int16).reshape(-1), table).tobytes()
        balign = ch
        extra = struct.pack("<H", 0)
        fact_body = struct.pack("<I", n)
    elif fmt == "ima_adpcm":
        code, bits = FMT_IMA, 4
        balign = 256 * ch
        body, spb = _encode_ima(a.astype(np.int16), balign)
        extra = struct.pack("<HH", 2, spb)  # cbSize = 2, samplesPerBlock
        fact_body = struct.pack("<I", n)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    byte_rate = sample_rate * balign  # nominal for block formats
    fmt_chunk = struct.pack("<HHIIHH", code, ch, sample_rate, byte_rate, balign, bits) + extra
    out = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
    if fact_body:
        out += b"fact" + struct.pack("<I", len(fact_body)) + fact_body
    out += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return RIFF_MAGIC + struct.pack("<I", len(out)) + out
