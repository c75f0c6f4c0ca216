"""Pure-stdlib baseline JPEG codec (numpy + struct only — no PIL).

Closes the last codec gap of the codec-less container: ``media_codecs``
previously raised NotImplementedError for JPEG without PIL. This module
implements the baseline sequential DCT process of ITU-T T.81 (ISO/IEC
10918-1):

- **Decoder**: SOI/APP*/DQT/SOF0/DHT/DRI/SOS parsing, canonical huffman
  tables, 0xFF00 byte-unstuffing, restart markers, DC prediction, AC
  run-length, dequantize + inverse zigzag + IDCT (orthonormal DCT-III via
  one numpy matmul per block batch), chroma upsampling for any (h,v)
  sampling factors, JFIF YCbCr->RGB. Progressive (SOF2) and arithmetic
  coding raise NotImplementedError — they are different processes, not a
  missing dependency.
- **Encoder**: grayscale / RGB 4:4:4 / RGB 4:2:0, quality-scaled Annex K
  quantization tables, the standard Annex K huffman tables, optional
  restart intervals — enough to synthesize valid fixtures and to
  re-encode pipeline outputs.

Like the PNG fallback in ``media_codecs``, the implementation is built
from the public spec; the per-blob functions run worker-side inside
Arrow-batched mapInPandas kernels (numpy ships with PySpark workers).
Reference parity note: the reference repo has no media surface at all —
this is part of the beyond-reference multimodal toolkit (SURVEY
"documents/embeddings" extension scope).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Shared tables (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)

_STD_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_STD_CHROMA_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
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
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
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

# orthonormal 8-point DCT-II matrix: forward = C @ B @ C.T, inverse = C.T @ D @ C
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical ordering."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_map(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (ln, code): sym for sym, (code, ln) in _canonical_codes(bits, huffval).items()
    }


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base quantization table."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) of a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    bw: _BitWriter,
    coeffs: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = coeffs[_ZIGZAG]
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(h,w) float plane -> (n_blocks_y, n_blocks_x, 8, 8), edge-padded."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def jpeg_encode(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h,w) grayscale or (h,w,3) RGB uint8 as baseline JPEG."""
    px = np.asarray(pixels)
    if px.ndim == 3 and px.shape[2] == 4:
        px = px[:, :, :3]
    gray = px.ndim == 2 or (px.ndim == 3 and px.shape[2] == 1)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    h, w = px.shape[:2]
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub = (2, 2) if (subsampling == "4:2:0" and not gray) else (1, 1)

    lq = _quality_scale(_STD_LUMA_Q, quality)
    cq = _quality_scale(_STD_CHROMA_Q, quality)

    f = px.astype(np.float64)
    if gray:
        planes = [f]
    else:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if sub == (2, 2):
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]

    # forward DCT + quantize every 8x8 block of every plane; planes are
    # edge-padded to the full MCU grid so the MCU loop never clamps
    hmax0, vmax0 = (sub if not gray else (1, 1))
    mcus_x0 = -(-w // (8 * hmax0))
    mcus_y0 = -(-h // (8 * vmax0))
    qtabs = [lq] + [cq] * (len(planes) - 1)
    comp_blocks = []
    for ci, (plane, q) in enumerate(zip(planes, qtabs)):
        ch, cv = (hmax0, vmax0) if ci == 0 else (1, 1)
        want_h, want_w = mcus_y0 * cv * 8, mcus_x0 * ch * 8
        ph, pw = want_h - plane.shape[0], want_w - plane.shape[1]
        if ph or pw:
            plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
        blocks = _blocks_of(plane - 128.0)
        b2 = blocks.reshape(-1, 8, 8)
        coef = _C @ b2 @ _C.T
        qz = np.round(coef / q.reshape(8, 8)).astype(np.int64)
        comp_blocks.append(
            qz.reshape(blocks.shape[0], blocks.shape[1], 64)
        )

    dc_l = _canonical_codes(*_DC_LUMA_SPEC)
    ac_l = _canonical_codes(*_AC_LUMA_SPEC)
    dc_c = _canonical_codes(*_DC_CHROMA_SPEC)
    ac_c = _canonical_codes(*_AC_CHROMA_SPEC)

    bw = _BitWriter()
    hmax, vmax = (sub if not gray else (1, 1))
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    preds = [0] * len(planes)
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for ci, blocks in enumerate(comp_blocks):
                ch, cv = (hmax, vmax) if ci == 0 else (1, 1)
                dc_t, ac_t = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(cv):
                    for bx in range(ch):
                        flat = blocks[my * cv + by, mx * ch + bx]
                        # _encode_block expects raster-order coefficients
                        preds[ci] = _encode_block(
                            bw, flat, preds[ci], dc_t, ac_t
                        )
            mcu_index += 1
    bw.flush()

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return _marker(0xDB, bytes([tid]) + bytes(int(x) for x in q[_ZIGZAG]))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return _marker(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    ncomp = 1 if gray else 3
    sof_comps = b""
    for ci in range(ncomp):
        hv = (hmax << 4) | vmax if ci == 0 else 0x11
        sof_comps += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    sos_comps = b""
    for ci in range(ncomp):
        tids = 0x00 if ci == 0 else 0x11
        sos_comps += bytes([ci + 1, tids])

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, lq)
    if not gray:
        out += dqt(1, cq)
    out += _marker(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    out += dht(0, 0, _DC_LUMA_SPEC) + dht(1, 0, _AC_LUMA_SPEC)
    if not gray:
        out += dht(0, 1, _DC_CHROMA_SPEC) + dht(1, 1, _AC_CHROMA_SPEC)
    if restart_interval:
        out += _marker(0xDD, struct.pack(">H", restart_interval))
    out += _marker(0xDA, bytes([ncomp]) + sos_comps + b"\x00\x3f\x00")
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Entropy-coded-segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad past end (spec allows)
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # a real marker: stop feeding, pad with ones
                    self.acc = ((self.acc << 8) | 0xFF) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | byte) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop buffered bits and skip to just after the next RST marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy stream")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG blob to (h, w) or (h, w, 3) uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        tag = data[pos + 1]
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        if tag == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if tag == 0xDB:  # DQT (may hold several tables)
            b = 0
            while b < len(body):
                prec_id = body[b]
                if prec_id >> 4:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qtables[prec_id & 0xF] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int64)[_UNZIGZAG]
                b += 65
        elif tag == 0xC4:  # DHT (may hold several tables)
            b = 0
            while b < len(body):
                cls_id = body[b]
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                tbl = _decode_map(bits, vals)
                if cls_id >> 4:
                    ac_tables[cls_id & 0xF] = tbl
                else:
                    dc_tables[cls_id & 0xF] = tbl
                b += 17 + n
        elif tag == 0xC0 or tag == 0xC1:  # baseline / extended sequential
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{tag - 0xC0} (progressive/arithmetic/"
                f"lossless) is not baseline sequential"
            )
        elif tag == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif tag == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si : 3 + 2 * si]
                scan.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0xF})
            pos = pos + 2 + seglen
            return _decode_scan(
                data, pos, frame, scan, qtables, dc_tables, ac_tables,
                restart_interval,
            )
        pos += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(
    data, pos, frame, scan, qtables, dc_tables, ac_tables, restart_interval
):
    if frame is None:
        raise ValueError("SOS before SOF")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan]
    for c, s in zip(order, scan):
        c["td"], c["ta"] = s["td"], s["ta"]
        ch = -(-w * c["h"] // hmax)
        cv = -(-h * c["v"] // vmax)
        c["coef"] = np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
        c["pred"] = 0
        c["size"] = (cv, ch)

    br = _BitReader(data, pos)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                br.align_to_marker()
                for c in order:
                    c["pred"] = 0
            for c in order:
                q = qtables[c["tq"]]
                dct_t = dc_tables[c["td"]]
                act = ac_tables[c["ta"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _huff_decode(br, dct_t)
                        diff = _extend(br.read_bits(size), size)
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run exceeds block")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        block = (zz * q)[_UNZIGZAG].reshape(8, 8).astype(np.float64)
                        pix = _C.T @ block @ _C
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["coef"][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_index += 1

    planes = []
    for c in comps:
        cv, ch = c["size"]
        plane = c["coef"][:cv, :ch] + 128.0
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
