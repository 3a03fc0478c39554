"""Pure-stdlib lossless media codecs: PNG (DEFLATE via zlib) and WAV (PCM).

This container has no PIL/libjpeg/libsndfile, so lossy formats (JPEG, MP3)
stay honestly stubbed in multimodal.py — but PNG's only compression is
DEFLATE (stdlib ``zlib``) and WAV PCM is plain struct layout, so the LOSSLESS
half of the decode boundary is implementable clean-room from the published
format specs (PNG: RFC 2083 / ISO 15948; WAV: RIFF WAVE). That upgrades the
multimodal family's decode step from "deterministic fake" to a real codec for
the formats a training-data pipeline controls end-to-end (synthetic renders,
screenshots, TTS output are typically archived lossless).

Scope (rejections are loud, never silent garbage):

- PNG decode: bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); all five scanline filters (None/Sub/Up/Average/
  Paeth); no interlacing (Adam7 raises), no 1/2/4/16-bit depths (raise).
- PNG encode: gray/RGB/RGBA uint8, any of the five filters (fixed per image)
  — exercising encode at every filter type round-trips the decoder's whole
  unfilter surface.
- WAV decode: PCM 8/16/32-bit int and 32-bit IEEE float, any channel count →
  float32 in [-1, 1), channel-interleaved frames averaged to mono.
- WAV encode: mono PCM16.

Per-row unfiltering is numpy-vectorized where the filter allows (Up is a
row-add; Sub is a per-channel-offset cumulative sum — prefix sums mod 256)
and a per-pixel loop only where the spec forces serial dependence through
the reconstructed left neighbour (Average, Paeth).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples/pixel (pre-palette)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (height, width, channels) uint8 (palette expanded to RGB)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if pos + 8 + length > len(data):
            raise ValueError("truncated PNG: chunk length exceeds buffer")
        chunk = data[pos + 8 : pos + 8 + length]
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG: missing chunk CRC")
        (stored_crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + chunk) & 0xFFFFFFFF != stored_crc:
            # the module contract is "rejections are loud, never silent
            # garbage": a bit-flipped PLTE/IDAT can stay zlib-valid and
            # decode to wrong pixels without this check
            raise ValueError(f"corrupt PNG: CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("truncated PNG: bad IHDR length")
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} unsupported (only 8)")
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG unsupported")
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color_type} unsupported")
    nch = _CHANNELS[color_type]
    stride = width * nch
    expected = height * (stride + 1)
    # bounded decompression: never materialize more than the IHDR-declared
    # size + 1 probe byte, so a crafted high-ratio IDAT can't act as a
    # decompression bomb before the size check runs
    dobj = zlib.decompressobj()
    try:
        raw = dobj.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT: {e}") from e
    if len(raw) != expected or dobj.unconsumed_tail or not dobj.eof:
        raise ValueError("PNG IDAT size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    # reconstruct row-by-row into uint8; only the two live rows are widened
    # (peak extra memory = O(stride), not O(height*stride) int32 copies)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = nch  # bytes per pixel (bit depth 8)
    zero_row = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = int(filters[y])
        cur = raw[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y > 0 else zero_row
        if f == 0:  # None
            rec = cur
        elif f == 1:  # Sub: prefix sums per channel offset (int64: no overflow)
            rec = cur.copy()
            for j in range(bpp):
                rec[j::bpp] = np.cumsum(rec[j::bpp]) % 256
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average — serial through reconstructed left; the spec
            # forces a scan, so run it as a plain-Python list loop (several
            # times faster than numpy scalar indexing for serial recurrences)
            rec_l = cur.tolist()
            prev_l = prev.tolist()
            for i in range(stride):
                left = rec_l[i - bpp] if i >= bpp else 0
                rec_l[i] = (rec_l[i] + ((left + prev_l[i]) >> 1)) & 255
            rec = np.asarray(rec_l, dtype=np.int64)
        elif f == 4:  # Paeth — serial scan with the predictor inlined
            rec_l = cur.tolist()
            prev_l = prev.tolist()
            for i in range(stride):
                a = rec_l[i - bpp] if i >= bpp else 0
                b = prev_l[i]
                c = prev_l[i - bpp] if i >= bpp else 0
                pa = b - c
                pb = a - c
                pc = pa + pb
                if pa < 0:
                    pa = -pa
                if pb < 0:
                    pb = -pb
                if pc < 0:
                    pc = -pc
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rec_l[i] = (rec_l[i] + pred) & 255
            rec = np.asarray(rec_l, dtype=np.int64)
        else:
            raise ValueError(f"PNG filter type {f} invalid")
        out[y] = rec % 256
    img = out.reshape(height, width, nch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


def _filter_row(cur: np.ndarray, prev: np.ndarray, bpp: int, f: int) -> np.ndarray:
    """Forward filter (encoder side) — exact inverse of the decoder's unfilter."""
    cur = cur.astype(np.int32)
    prev = prev.astype(np.int32)
    n = len(cur)
    left = np.zeros(n, dtype=np.int32)
    left[bpp:] = cur[:-bpp]
    upleft = np.zeros(n, dtype=np.int32)
    upleft[bpp:] = prev[:-bpp]
    if f == 0:
        out = cur
    elif f == 1:
        out = cur - left
    elif f == 2:
        out = cur - prev
    elif f == 3:
        out = cur - (left + prev) // 2
    elif f == 4:
        pa = np.abs(prev - upleft)  # |p - a| where p = left + prev - upleft
        pb = np.abs(left - upleft)
        pc = np.abs(left + prev - 2 * upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
        out = cur - pred
    else:
        raise ValueError(f"filter type {f} invalid")
    return (out % 256).astype(np.uint8)


def encode_png(img: np.ndarray, *, filter_type: int = 0, compress_level: int = 6) -> bytes:
    """(h, w) or (h, w, c) uint8 (c ∈ {1, 2, 3, 4}) → PNG bytes."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise TypeError("encode_png requires uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"unsupported channel count {c}")
    flat = img.reshape(h, w * c)
    rows = []
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        rows.append(bytes([filter_type]) + _filter_row(flat[y], prev, c, filter_type).tobytes())
        prev = flat[y]
    compressed = zlib.compress(b"".join(rows), compress_level)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", compressed)
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float32 samples in [-1, 1), sample_rate).

    Multi-channel frames are averaged to mono (the standard feature-extraction
    front end); PCM 8-bit is unsigned per the spec, 16/32-bit signed,
    format 3 = IEEE float32.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + length > len(data):
            raise ValueError("truncated WAV: chunk length exceeds buffer")
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if length < 16:
                raise ValueError("truncated WAV: fmt chunk too short")
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", chunk[:16])
            fmt = (audio_fmt, n_ch, rate, bits)
        elif cid == b"data":
            if samples is not None:
                # one data chunk per spec; concatenating or keeping either one
                # silently would both be guesses — reject loudly instead
                raise ValueError("corrupt WAV: multiple data chunks")
            samples = chunk
    if fmt is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, bits = fmt
    if bits >= 8 and bits % 8 == 0 and len(samples) % (bits // 8) != 0:
        raise ValueError(
            f"truncated WAV: data length {len(samples)} is not a multiple of "
            f"the {bits // 8}-byte sample size"
        )
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(samples, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(samples, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(samples, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(samples, dtype="<f4").astype(np.float32)
    else:
        raise NotImplementedError(f"WAV format {audio_fmt}/{bits}-bit unsupported")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1).astype(np.float32)
    return x, rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono float samples in [-1, 1] → PCM16 WAV bytes (values clipped).

    NaN samples are rejected loudly (np.clip passes NaN through and the
    float→int16 cast would be undefined — silent garbage otherwise)."""
    x = np.asarray(samples, dtype=np.float64)
    if np.isnan(x).any():
        raise ValueError("encode_wav: NaN sample(s) in input")
    x = np.clip(x, -1.0, 32767.0 / 32768.0)
    pcm = np.round(x * 32768.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
