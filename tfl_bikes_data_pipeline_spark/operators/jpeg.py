"""Baseline JPEG codec — stdlib + numpy, no PIL.

Scope (the baseline-sequential subset that covers the overwhelming
majority of stored corpus JPEGs): 8-bit, Huffman-coded, non-progressive,
no restart intervals; 1-component grayscale or 3-component YCbCr with
sampling factors 1 or 2 (4:4:4, 4:2:2, 4:2:0). The encoder emits
4:4:4 with the Annex-K example quantization/Huffman tables; the decoder
parses arbitrary DQT/DHT/SOF0/SOS streams within the scope above.

JPEG is lossy, so unlike the PNG/GIF/WAV codecs there is no bit-exact
round-trip to pin: tests assert the decode of an encode stays within
the quantization error bound, and cross-checks the decoder against
hand-built streams. ``multimodal.decode_image`` routes JPEG here and
falls back to its PIL gate only for streams outside this subset
(progressive, arithmetic-coded, 12-bit).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# ITU-T T.81 Annex K example tables
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K Huffman specs: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis: D @ block @ D.T transforms."""
    d = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            d[k, n] = np.cos(np.pi * (2 * n + 1) * k / 16)
    d *= 0.5
    d[0, :] *= 1 / np.sqrt(2)
    return d


_DCT = _dct_matrix()


def _build_huffman(bits: list[int], vals: list[int]):
    """(encode map value→(code,len), decode map (len,code)→value)."""
    enc, dec = {}, {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            dec[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return enc, dec


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            # a real marker mid-entropy ends the scan; treat as padding
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, t: int) -> int:
    """JPEG sign extension: t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoder (4:4:4 / grayscale, Annex-K tables)
# ---------------------------------------------------------------------------

def _encode_block(
    bw: _BitWriter, block: np.ndarray, quant: np.ndarray, dc_enc, ac_enc, pred: int
) -> int:
    coef = _DCT @ (block.astype(np.float64) - 128.0) @ _DCT.T
    q = np.round(coef.reshape(-1)[ZIGZAG] / quant[ZIGZAG].astype(np.float64)).astype(
        np.int32
    )
    diff = int(q[0]) - pred
    t = _category(diff)
    code, ln = dc_enc[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_enc[(run << 4) | t]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << t) - 1, t)
        run = 0
    if run:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return int(q[0])


def _dqt_segment(tid: int, table: np.ndarray) -> bytes:
    return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
        int(table[z]) for z in ZIGZAG
    )


def _dht_segment(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def encode_jpeg(pixels: np.ndarray, subsample: bool = False) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → baseline JFIF bytes
    (Annex-K tables). ``subsample=True`` emits 4:2:0 (2×2-averaged
    chroma, interleaved 4Y+Cb+Cr MCUs) — the dominant wild-JPEG
    sampling, exercising the decoder's multi-block MCU path."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        comps = [pixels.astype(np.float64)]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [yy, cb, cr]
    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt_segment(0, QUANT_LUMA)
    if not gray:
        out += _dqt_segment(1, QUANT_CHROMA)
    nc = 1 if gray else 3
    luma_hv = 0x22 if (subsample and not gray) else 0x11
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, luma_hv if i == 0 else 0x11, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l, _ = _build_huffman(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l, _ = _build_huffman(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c, _ = _build_huffman(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c, _ = _build_huffman(AC_CHROMA_BITS, AC_CHROMA_VALS)
    bw = _BitWriter()
    preds = [0] * nc

    def pad_to(comp: np.ndarray, bh: int, bwid: int) -> np.ndarray:
        ch, cw = comp.shape
        p = np.empty((bh * 8, bwid * 8))
        p[:ch, :cw] = comp
        p[ch:, :cw] = comp[ch - 1 : ch, :]  # edge replicate
        p[:, cw:] = p[:, cw - 1 : cw]
        return p

    if subsample and not gray:
        # 4:2:0 — MCU = 16×16 luma (4 blocks) + one 8×8 block per
        # 2×2-averaged chroma plane
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16
        ypad = pad_to(comps[0], mcuy * 2, mcux * 2)
        # 2×2 chroma average with edge replication to even dims
        sub = []
        for c in comps[1:]:
            ce = np.empty(((h + 1) // 2 * 2, (w + 1) // 2 * 2))
            ce[:h, :w] = c
            if h % 2:
                ce[h, :w] = c[h - 1, :]
            if w % 2:
                ce[:, w:] = ce[:, w - 1 : w]
            cs = (ce[0::2, 0::2] + ce[0::2, 1::2] + ce[1::2, 0::2] + ce[1::2, 1::2]) / 4.0
            sub.append(pad_to(cs, mcuy, mcux))
        for my in range(mcuy):
            for mx in range(mcux):
                for v in range(2):
                    for hh in range(2):
                        block = ypad[
                            (my * 2 + v) * 8 : (my * 2 + v) * 8 + 8,
                            (mx * 2 + hh) * 8 : (mx * 2 + hh) * 8 + 8,
                        ]
                        preds[0] = _encode_block(
                            bw, block, QUANT_LUMA, dc_l, ac_l, preds[0]
                        )
                for i in (1, 2):
                    block = sub[i - 1][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    preds[i] = _encode_block(
                        bw, block, QUANT_CHROMA, dc_c, ac_c, preds[i]
                    )
    else:
        bh, bwid = (h + 7) // 8, (w + 7) // 8
        padded = [pad_to(c, bh, bwid) for c in comps]
        for by in range(bh):
            for bx in range(bwid):
                for i in range(nc):
                    block = padded[i][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    quant = QUANT_LUMA if i == 0 else QUANT_CHROMA
                    preds[i] = _encode_block(
                        bw,
                        block,
                        quant,
                        dc_l if i == 0 else dc_c,
                        ac_l if i == 0 else ac_c,
                        preds[i],
                    )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (baseline sequential)
# ---------------------------------------------------------------------------

def _decode_block(br: _BitReader, dec_dc, dec_ac, quant, pred: int):
    q = np.zeros(64, dtype=np.int32)
    t = _read_huff(br, dec_dc)
    diff = _extend(br.bits(t), t) if t else 0
    dc = pred + diff
    q[0] = dc
    k = 1
    while k < 64:
        rs = _read_huff(br, dec_ac)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        t = rs & 0x0F
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        q[k] = _extend(br.bits(t), t)
        k += 1
    deq = np.zeros(64, dtype=np.float64)
    deq[ZIGZAG] = q * quant[ZIGZAG]
    block = _DCT.T @ deq.reshape(8, 8) @ _DCT + 128.0
    return block, dc


def _read_huff(br: _BitReader, dec) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        if (length, code) in dec:
            return dec[(length, code)]
    raise ValueError("invalid Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w) or (h, w, 3) uint8 RGB.

    Error contract: malformed/truncated input raises ``ValueError``;
    legal-but-out-of-scope streams (progressive, 12-bit, restart
    intervals, non-interleaved multi-scan) raise
    ``NotImplementedError`` so callers can route to a fuller codec."""
    try:
        return _decode_jpeg_inner(payload)
    except (IndexError, struct.error, TypeError) as e:
        # unguarded reads off the end / length fields missing: the
        # uniform input-error contract for half-fetched corpus files
        raise ValueError(f"truncated or malformed JPEG ({type(e).__name__})") from e


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI carries no length field
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(body, np.uint8, 64, i + 1)
                quant[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                _, dec = _build_huffman(bits, vals)
                (huff_ac if cls else huff_dc)[tid] = dec
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = body[0]
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG (progressive etc.)")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tabs >> 4, tabs & 0x0F))
            if {c for c, *_ in scan} != {c[0] for c in frame[2]}:
                # legal baseline non-interleaved (one component per
                # scan) is out of this codec's scope — not malformed
                raise NotImplementedError(
                    "non-interleaved multi-scan JPEG unsupported"
                )
            entropy = payload[pos:]
            return _decode_scan(frame, scan, quant, huff_dc, huff_ac, entropy)
        # APPn/COM and others: skipped via seglen
    raise ValueError("JPEG contained no scan")


def _decode_scan(frame, scan, quant, huff_dc, huff_ac, entropy: bytes) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for cid, ch, cv, tq in comps:
        planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8))
    scan_tabs = {cid: (dct, act) for cid, dct, act in scan}
    br = _BitReader(entropy)
    preds = {cid: 0 for cid, *_ in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, ch, cv, tq in comps:
                dct, act = scan_tabs[cid]
                for v in range(cv):
                    for hh in range(ch):
                        block, preds[cid] = _decode_block(
                            br, huff_dc[dct], huff_ac[act], quant[tq], preds[cid]
                        )
                        y0 = (my * cv + v) * 8
                        x0 = (mx * ch + hh) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample to full resolution and crop
    full = []
    for cid, ch, cv, tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    yy, cb, cr = full
    r = yy + 1.402 * (cr - 128.0)
    g = yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = yy + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
