"""Baseline JPEG (ITU-T T.81) encoder/decoder — pure numpy + stdlib.

The reference engine hands binary documents to external format-filter
processes (gb.conf filter lines; reference JobScheduler.h:34 converts
pdf/doc/xls to text before indexing).  This module is the in-process
analogue for ``image/jpeg`` so the multimodal decode stage
(pipelines/multimodal.py) can treat JPEG as a REAL decodable format
instead of a gated stub: actual entropy decode, dequantization and
IDCT, no codec library.

Scope (asserted loudly, mirrored by the encoder):

- **encoder**: baseline sequential DCT (SOF0), 8-bit, grayscale /
  4:4:4 / 4:2:0 YCbCr, Annex-K quantization + Huffman tables,
  IJG-style quality scaling, optional restart intervals (DRI + RSTn),
  configurable SOS scan order, JFIF container;
- **decoder**: baseline sequential, 8-bit, 4:4:4 / grayscale / 4:2:0
  sampling, restart intervals, fill bytes, any SOS scan order — the
  common real-world baseline profile.  Progressive (SOF2), arithmetic
  coding, lossless and exotic sampling layouts raise
  ``NotImplementedError`` with a message naming the gap.

All tables below are the public ITU-T T.81 Annex-K example tables.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables (public ITU-T T.81 examples) -----------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Huffman spec pairs: (BITS counts for code lengths 1..16, HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix M: forward D = M @ B @ M.T,
    inverse B = M.T @ D @ M."""
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * 0.5
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled Annex-K table, clamped to
    [1, 255] (8-bit precision tables)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 Annex C."""
    out: dict[int, tuple[int, int]] = {}
    code, vi = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[vi]] = (code, ln)
            code += 1
            vi += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int],
                        vals: list[int]) -> dict[tuple[int, int], int]:
    """(BITS, HUFFVAL) → {(length, code): symbol} for the decoder."""
    return {(ln, code): sym
            for sym, (code, ln) in _build_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:               # byte stuffing (T.81 §B.1.1.5)
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        pad = (-self.n) % 8
        if pad:
            self.write((1 << pad) - 1, pad)   # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """v → (category, appended bits) per T.81 table F.1/F.2."""
    if v == 0:
        return 0, 0
    cat = int(abs(v)).bit_length()
    return cat, (v if v > 0 else v + (1 << cat) - 1)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) float64, H/W multiples of 8 → (H//8, W//8, 8, 8)."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3))


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")


def _rgb_to_ycbcr(img: np.ndarray) -> list[np.ndarray]:
    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [y, cb, cr]


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray,
                  cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _encode_block(bw: _BitWriter, zz: np.ndarray, prev: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-encode one zigzagged quantized block; returns its DC for
    the caller's per-component predictor chain."""
    cat, bits = _magnitude(int(zz[0]) - prev)
    code, ln = dc_codes[cat]
    bw.write(code, ln)
    bw.write(bits, cat)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]                 # ZRL
            bw.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(bits, cat)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]                     # EOB
        bw.write(code, ln)
    return int(zz[0])


def _box2(plane: np.ndarray) -> np.ndarray:
    """2×2 box-mean downsample (dims must be even)."""
    h, w = plane.shape
    return plane.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def encode_jpeg(img: np.ndarray, quality: int = 85,
                scan_order: tuple[int, ...] | None = None,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → baseline JFIF bytes
    (Annex-K tables, IJG quality scaling).

    ``subsampling``: ``"444"`` (every component full-resolution) or
    ``"420"`` (chroma box-downsampled 2×2 — the dominant real-world
    layout; Y sampling 2×2, chroma 1×1).  ``restart_interval`` emits a
    DRI segment and an RSTn marker every N MCUs (T.81 §B.2.4.4).
    ``scan_order`` permutes the SOS component order (spec-legal degree
    of freedom, T.81 §B.2.3) — the MCU data is interleaved to match;
    used to prove the decoder follows scan order, not frame order."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError(f"bad image dims {h}x{w}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub420 = subsampling == "420" and not gray
    planes = [img.astype(np.float64)] if gray else _rgb_to_ycbcr(img)
    if sub420:
        # Y padded to multiples of 16 so the chroma planes (half-res)
        # land on exact 8-pixel block multiples
        y = np.pad(planes[0], ((0, (-h) % 16), (0, (-w) % 16)),
                   mode="edge")
        planes = [y, _box2(np.pad(planes[1],
                                  ((0, (-h) % 16), (0, (-w) % 16)),
                                  mode="edge")),
                  _box2(np.pad(planes[2],
                               ((0, (-h) % 16), (0, (-w) % 16)),
                               mode="edge"))]
    samp = [(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * len(planes)

    qts = [_scale_qt(QT_LUM, quality)]
    if not gray:
        qts.append(_scale_qt(QT_CHROM, quality))

    # forward DCT + quantize + zigzag, all blocks at once per plane
    # (qts are natural-order; the DQT segment below emits them in
    # zigzag order per T.81 §B.2.4.1, which is what the decoder reads)
    zz_planes = []
    for ci, plane in enumerate(planes):
        blocks = _blockify(_pad8(plane) - 128.0)
        coef = np.einsum("ij,abjk,lk->abil", _DCT_M, blocks, _DCT_M)
        q = np.rint(coef / qts[min(ci, 1)].reshape(8, 8)).astype(np.int64)
        zz_planes.append(q.reshape(q.shape[0], q.shape[1], 64)[:, :, ZIGZAG])

    # entropy encode: MCU = (h_i × v_i) blocks per component,
    # components in scan order, raster over the MCU grid
    enc_dc = [_build_codes(DC_LUM_BITS, DC_LUM_VALS)]
    enc_ac = [_build_codes(AC_LUM_BITS, AC_LUM_VALS)]
    if not gray:
        enc_dc.append(_build_codes(DC_CHROM_BITS, DC_CHROM_VALS))
        enc_ac.append(_build_codes(AC_CHROM_BITS, AC_CHROM_VALS))
    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    order = (tuple(range(len(planes))) if scan_order is None
             else tuple(scan_order))
    if sorted(order) != list(range(len(planes))):
        raise ValueError(f"scan_order must permute 0..{len(planes) - 1}")
    nmcu_y = zz_planes[0].shape[0] // samp[0][1]
    nmcu_x = zz_planes[0].shape[1] // samp[0][0]
    mcu = 0
    for mby in range(nmcu_y):
        for mbx in range(nmcu_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0
                                 + (mcu // restart_interval - 1) % 8])
                prev_dc = [0] * len(planes)
            for ci in order:
                hi, vi = samp[ci]
                ti = min(ci, 1)
                for v in range(vi):
                    for h_ in range(hi):
                        prev_dc[ci] = _encode_block(
                            bw, zz_planes[ci][mby * vi + v,
                                              mbx * hi + h_],
                            prev_dc[ci], enc_dc[ti], enc_ac[ti])
            mcu += 1
    bw.flush()

    # container
    out = bytearray(b"\xff\xd8")                      # SOI
    out += _seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0])  # APP0
                + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    for i, qt in enumerate(qts):
        out += _seg(0xDB, bytes([i]) + bytes(int(v) for v in qt[ZIGZAG]))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, min(ci, 1)])
    out += _seg(0xC0, sof)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    huffs = [(0x00, DC_LUM_BITS, DC_LUM_VALS),
             (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if not gray:
        huffs += [(0x01, DC_CHROM_BITS, DC_CHROM_VALS),
                  (0x11, AC_CHROM_BITS, AC_CHROM_VALS)]
    for tid, bits, vals in huffs:
        out += _seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in order:
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.buf
    out += b"\xff\xd9"                                # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG scan")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_huffman(br: _BitReader,
                    table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, ch) uint8 (ch = 1 gray / 3 RGB).

    Profile: baseline sequential (SOF0), 8-bit, sampling 1×1 (4:4:4 /
    grayscale) or Y 2×2 + chroma 1×1 (4:2:0, the dominant real-world
    layout; chroma upsampled by pixel replication), restart intervals
    honored (predictor reset + byte realignment at each RSTn).
    Progressive (SOF2), arithmetic coding and other sampling layouts
    raise ``NotImplementedError`` naming the unsupported feature."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    sof = None
    segments = None
    sos_comps = None
    dri = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # skip 0xFF fill bytes before the marker code (T.81 §B.1.1.2:
        # any marker may be preceded by any number of fill bytes)
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                            # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        ln = struct.unpack(">H", payload[pos:pos + 2])[0]
        data = payload[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:                            # DQT
            dpos = 0
            while dpos < len(data):
                pq, tq = data[dpos] >> 4, data[dpos] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qts[tq] = np.frombuffer(
                    data[dpos + 1:dpos + 65], np.uint8).astype(np.int64)
                dpos += 65
        elif marker == 0xC4:                          # DHT
            dpos = 0
            while dpos < len(data):
                tc, th = data[dpos] >> 4, data[dpos] & 0x0F
                bits = list(data[dpos + 1:dpos + 17])
                nv = sum(bits)
                vals = list(data[dpos + 17:dpos + 17 + nv])
                tab = _build_decode_table(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                dpos += 17 + nv
        elif marker == 0xC0:                          # SOF0 baseline
            prec, ih, iw, ncomp = struct.unpack(">BHHB", data[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = data[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            samps = [(hi, vi) for _, hi, vi, _ in comps]
            if not (all(s == (1, 1) for s in samps)
                    or (len(samps) == 3 and samps[0] == (2, 2)
                        and samps[1] == samps[2] == (1, 1))):
                raise NotImplementedError(
                    f"sampling layout {samps}: only 4:4:4 (all 1x1) and "
                    "4:2:0 (Y 2x2 + chroma 1x1) are implemented")
            sof = (ih, iw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}: "
                "progressive/arithmetic/lossless)")
        elif marker == 0xDD:                          # DRI
            dri = struct.unpack(">H", data[:2])[0]
        elif marker == 0xDA:                          # SOS
            ns = data[0]
            sos_comps = [(data[1 + 2 * i], data[2 + 2 * i] >> 4,
                          data[2 + 2 * i] & 0x0F) for i in range(ns)]
            # entropy-coded scan runs to the next real marker; RSTn
            # markers split it into restart segments (each byte-aligned
            # with fresh DC predictors, T.81 §B.2.4.4)
            spos = pos
            chunks: list[bytes] = []
            segments = []
            while spos < n:
                nf = payload.find(b"\xff", spos)
                if nf < 0:
                    chunks.append(payload[spos:])
                    spos = n
                    break
                chunks.append(payload[spos:nf])
                nxt = payload[nf + 1] if nf + 1 < n else 0xD9
                if nxt == 0x00:                       # stuffed 0xFF
                    chunks.append(b"\xff")
                    spos = nf + 2
                elif 0xD0 <= nxt <= 0xD7:             # RSTn
                    segments.append(b"".join(chunks))
                    chunks = []
                    spos = nf + 2
                else:
                    spos = nf
                    break
            segments.append(b"".join(chunks))
            break
        # APPn / COM / others: skipped
    if sof is None or segments is None or sos_comps is None:
        raise ValueError("truncated JPEG (no SOF/SOS)")

    ih, iw, comps = sof
    ncomp = len(comps)
    if len(sos_comps) != ncomp:
        raise NotImplementedError(
            "multi-scan JPEG (SOS component count != frame components)")
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    nmcu_y = (ih + 8 * vmax - 1) // (8 * vmax)
    nmcu_x = (iw + 8 * hmax - 1) // (8 * hmax)
    zz_planes = [np.zeros((nmcu_y * vi, nmcu_x * hi, 64), np.int64)
                 for _, hi, vi, _ in comps]
    prev_dc = [0] * ncomp
    # MCU data is interleaved in SOS SCAN order (T.81 §B.2.3), which may
    # differ from SOF frame order — map each scan slot to its frame plane
    comp_idx = {cid: i for i, (cid, _hi, _vi, _tq) in enumerate(comps)}
    scan_order = [(comp_idx[cid], td, ta) for cid, td, ta in sos_comps]
    br = _BitReader(segments[0])
    mcu = 0
    for mby in range(nmcu_y):
        for mbx in range(nmcu_x):
            if dri and mcu and mcu % dri == 0:
                seg = mcu // dri
                if seg >= len(segments):
                    raise ValueError("missing JPEG restart segment")
                br = _BitReader(segments[seg])
                prev_dc = [0] * ncomp
            for ci, td, ta in scan_order:
                _cid, hi, vi, _tq = comps[ci]
                dct, act = dc_tabs[td], ac_tabs[ta]
                for v in range(vi):
                    for h_ in range(hi):
                        zz = zz_planes[ci][mby * vi + v, mbx * hi + h_]
                        cat = _decode_huffman(br, dct)
                        prev_dc[ci] += _extend(br.read_bits(cat), cat)
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k <= 63:
                            rs = _decode_huffman(br, act)
                            run, cat = rs >> 4, rs & 0x0F
                            if cat == 0:
                                if run == 15:         # ZRL
                                    k += 16
                                    continue
                                break                 # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC coefficient overrun")
                            zz[k] = _extend(br.read_bits(cat), cat)
                            k += 1
            mcu += 1

    # dequantize + unzigzag + IDCT, vectorized per component; chroma
    # upsampled back to full resolution by pixel replication
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        zz = zz_planes[ci] * qts[tq][None, None, :]
        nby, nbx = zz.shape[:2]
        nat = zz[:, :, UNZIGZAG].reshape(nby, nbx, 8, 8).astype(np.float64)
        blocks = np.einsum("ji,abjk,kl->abil", _DCT_M, nat, _DCT_M) + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        if hi < hmax or vi < vmax:
            plane = np.repeat(np.repeat(plane, vmax // vi, axis=0),
                              hmax // hi, axis=1)
        planes.append(plane[:ih, :iw])
    if ncomp == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    if ncomp == 3:
        return _ycbcr_to_rgb(*planes)
    raise NotImplementedError(f"{ncomp}-component JPEG")
