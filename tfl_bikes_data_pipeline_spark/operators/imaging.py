"""Real in-container media codecs: PNG and WAV, stdlib only.

The round-1..3 posture stubbed pixel/sample decode behind
``NotImplementedError`` because PIL/cv2/soundfile are absent. But PNG
is zlib (stdlib) plus five documented row filters, and WAV PCM is the
stdlib ``wave`` module — so both decode paths can be REAL here:

- :func:`decode_png` / :func:`encode_png` — 8-bit gray/RGB/RGBA,
  non-interlaced (the overwhelming majority of stored corpus images);
  full filter support (None/Sub/Up/Average/Paeth) on decode, exact
  CRC-checked chunk structure on encode.
- :func:`decode_wav` / :func:`encode_wav` — PCM 16-bit via ``wave``.

``multimodal.decode_image`` / ``decode_audio`` route PNG/WAV payloads
here and fall back to the PIL/soundfile gates only for other formats.
The declared queries (``q_image_stats``, ``q_audio_stats``) write
deterministic integer-valued media, decode through these codecs inside
``mapInPandas``, and reduce to exact integer statistics the DuckDB
oracle re-derives arithmetically — the binary codec layer sits inside
the correctness gate exactly like the XLSX and NetCDF edges.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype → samples per pixel


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 → PNG bytes (filter 0 rows)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y].astype("uint8").tobytes() for y in range(h)
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8. 8-bit depth, non-interlaced,
    gray/gray+alpha/RGB/RGBA; all five row filters."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, colortype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or colortype not in _CHANNELS:
        raise NotImplementedError(
            f"unsupported PNG shape (depth={depth}, colortype={colortype}, "
            f"interlace={interlace})"
        )
    c = _CHANNELS[colortype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    out = np.zeros((h, stride), dtype=np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(
            np.int32
        )
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub
            acc = row.copy()
            for i in range(c, stride):
                acc[i] = (acc[i] + acc[i - c]) & 0xFF
            out[y] = acc
        elif f == 2:  # Up
            out[y] = (row + prev) & 0xFF
        elif f == 3:  # Average
            acc = row.copy()
            for i in range(stride):
                left = acc[i - c] if i >= c else 0
                acc[i] = (acc[i] + ((left + prev[i]) >> 1)) & 0xFF
            out[y] = acc
        elif f == 4:  # Paeth
            acc = row.copy()
            for i in range(stride):
                left = acc[i - c] if i >= c else 0
                ul = prev[i - c] if i >= c else 0
                acc[i] = (acc[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
            out[y] = acc
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, c)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples [n, channels], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM supported")
        frames = wf.readframes(wf.getnframes())
    arr = np.frombuffer(frames, dtype="<i2").reshape(-1, nch)
    return arr, rate
