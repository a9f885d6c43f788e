"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

New-engine scope: the multimodal pipeline treats media as opaque binary
columns decoded inside ``mapInPandas`` workers (multimodal.py). The
container has no PIL/libjpeg, so this module implements the baseline
sequential DCT process from the spec directly — enough to make the
JPEG path REAL end-to-end instead of a marked fake:

- ``encode_jpeg``: 8-bit greyscale or RGB→YCbCr (JFIF), 4:4:4 (no
  chroma subsampling), libjpeg-convention quality scaling of the Annex
  K quantization tables, orthonormal 8×8 DCT via one matrix product per
  block batch, Annex K Huffman tables, byte-stuffed entropy stream
  (SOI/APP0/DQT/SOF0/DHT/SOS/EOI).
- ``decode_jpeg``: marker parse (skips APPn/COM), Huffman + DC-
  differential + run-length AC decode, dequantize, inverse zigzag,
  IDCT, YCbCr→RGB. Supports baseline Huffman scans with (1,1) sampling
  factors per component (what this encoder — and any 4:4:4 baseline
  file — emits); progressive JPEG, chroma subsampling, 12-bit
  precision, arithmetic coding, and restart intervals raise
  ``NotImplementedError`` loudly (multimodal falls back to the marked
  fake, never silently).

The DCT is the exact orthonormal transform (encode rounds once at
quantization, as the spec does), so ``decode(encode(img))`` differs
from ``img`` only by quantization error — bounded by the q-table step
sizes; tests pin a PSNR floor and bit-exact marker structure.

Everything here is driven from Arrow-batched pandas workers on blobs
of ~10^4-10^6 bytes; per-block numpy matmuls keep the hot loop
vectorized (the only per-symbol python is the entropy coder, which is
bounded by the compressed size).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
UNZIGZAG = np.argsort(ZIGZAG)

Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (BITS counts for code lengths 1..16, HUFFVAL) — Annex K.3
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    d = c * np.sqrt(2 / 8)
    d[0] *= np.sqrt(0.5)
    return d


_D = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical Huffman (T.81 C.2)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for the bit-at-a-time decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _amp_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _encode_block(
    zz: np.ndarray, prev_dc: int, dc_codes: dict, ac_codes: dict, w: _BitWriter
) -> int:
    dc = int(zz[0])
    diff = dc - prev_dc
    s = _category(diff)
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        w.write(_amp_bits(diff, s), s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        w.write(_amp_bits(v, s), s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return dc


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = plane.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks, bh, bw


def encode_jpeg(pixels: np.ndarray, quality: int = 75) -> bytes:
    """uint8 (H, W) greyscale or (H, W, 3) RGB → baseline JFIF bytes
    (4:4:4, Annex K Huffman tables)."""
    if pixels.dtype != np.uint8:
        raise ValueError("pixels must be uint8")
    grey = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if grey:
        planes = [pixels.astype(np.float64)]
    else:
        r = pixels[..., 0].astype(np.float64)
        g = pixels[..., 1].astype(np.float64)
        b = pixels[..., 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    qs = [_scaled_q(Q_LUM, quality), _scaled_q(Q_CHROM, quality)]
    dc_codes = [_canonical_codes(*DC_LUM), _canonical_codes(*DC_CHROM)]
    ac_codes = [_canonical_codes(*AC_LUM), _canonical_codes(*AC_CHROM)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(qs[: 1 if grey else 2]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(q[z]) for z in ZIGZAG
        )
    ncomp = 1 if grey else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    for tc_th, tbl in (
        ((0, 0), DC_LUM), ((1, 0), AC_LUM), ((0, 1), DC_CHROM), ((1, 1), AC_CHROM)
    )[: 2 if grey else 4]:
        tc, th = tc_th
        bits, vals = tbl
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        td_ta = 0 if ci == 0 else 1
        out += struct.pack("BB", ci + 1, (td_ta << 4) | td_ta)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    comp_blocks = []
    for ci, plane in enumerate(planes):
        blocks, bh, bw = _to_blocks(plane)
        coef = np.einsum("ij,bjk,lk->bil", _D, blocks - 128.0, _D)
        tq = qs[0 if ci == 0 else 1].reshape(8, 8)
        qz = np.round(coef / tq).astype(np.int64)
        comp_blocks.append(qz.reshape(-1, 64)[:, ZIGZAG])
    wtr = _BitWriter()
    prev = [0] * ncomp
    nblocks = comp_blocks[0].shape[0]
    for bi in range(nblocks):  # 4:4:4 MCU = one block per component
        for ci in range(ncomp):
            t = 0 if ci == 0 else 1
            prev[ci] = _encode_block(
                comp_blocks[ci][bi], prev[ci], dc_codes[t], ac_codes[t], wtr
            )
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Lazy byte-at-a-time reader: 0xFF00 unstuffs, any real marker
    ends the entropy stream (restart intervals are rejected at DRI
    parse, so a mid-stream marker can only be the terminator); bits
    requested past the end read as 1s — the spec's padding fill."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.ended = False

    def bit(self) -> int:
        if self.nbits == 0:
            if self.ended or self.pos >= len(self.data):
                self.ended = True
                self.acc, self.nbits = 0xFF, 8
            else:
                b = self.data[self.pos]
                self.pos += 1
                if b == 0xFF:
                    nxt = (
                        self.data[self.pos] if self.pos < len(self.data) else 0xD9
                    )
                    if nxt == 0x00:
                        self.pos += 1  # stuffed 0xFF data byte
                    else:  # a marker: the scan is over
                        self.ended = True
                        b = 0xFF
                self.acc, self.nbits = b, 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 (H, W, 3) RGB (greyscale replicated).
    Raises NotImplementedError for progressive/subsampled/12-bit/
    arithmetic/restart-interval streams (see module docstring)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    scan = None
    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        m = content[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue
        seglen = struct.unpack(">H", content[pos : pos + 2])[0]
        seg = content[pos + 2 : pos + seglen]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                qtabs[tq] = tbl
                p += 65
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                htabs[(tc, th)] = _decode_table(bits, vals)
                p += 17 + nv
        elif m == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling (only 4:4:4 supported)"
                    )
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"SOF{m - 0xC0} process unsupported")
        elif m == 0xDD:  # DRI
            if struct.unpack(">H", seg[:2])[0] != 0:
                raise NotImplementedError("restart intervals")
        elif m == 0xDA:  # SOS
            ns = seg[0]
            smap = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si : 3 + 2 * si]
                smap.append((cs, tdta >> 4, tdta & 0xF))
            scan = (smap, content[pos + seglen :])
            break
        pos += seglen
    if sof is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = sof
    smap, entropy = scan
    if len(smap) != len(comps):
        raise NotImplementedError("multi-scan files")
    bh, bw = (h + 7) // 8, (w + 7) // 8
    r = _BitReader(entropy)
    coefs = [np.zeros((bh * bw, 64), dtype=np.int64) for _ in comps]
    prev = [0] * len(comps)
    for bi in range(bh * bw):
        for ci, (cid, tq) in enumerate(comps):
            _, td, ta = smap[ci]
            dc_tab, ac_tab = htabs[(0, td)], htabs[(1, ta)]
            s = _read_symbol(r, dc_tab)
            diff = _extend(r.bits(s), s) if s else 0
            prev[ci] += diff
            zz = coefs[ci][bi]
            zz[0] = prev[ci]
            k = 1
            while k < 64:
                rs = _read_symbol(r, ac_tab)
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC run overflow")
                zz[k] = _extend(r.bits(size), size)
                k += 1
    planes = []
    for ci, (cid, tq) in enumerate(comps):
        deq = (coefs[ci] * qtabs[tq][ZIGZAG]).astype(np.float64)
        blocks = deq[:, UNZIGZAG].reshape(-1, 8, 8)
        px = np.einsum("ji,bjk,kl->bil", _D, blocks, _D) + 128.0
        full = (
            px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        planes.append(full[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return np.repeat(y[..., None], 3, axis=2).astype(np.uint8)
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
