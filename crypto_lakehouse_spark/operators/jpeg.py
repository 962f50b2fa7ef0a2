"""Pure-stdlib/numpy baseline JPEG codec (ITU-T T.81 sequential DCT,
Huffman, 8-bit), closing the last multimodal codec seam (VERDICT r9
item 7): `decode_image` previously gated every non-PNG format behind
PIL; JPEG — the other dominant real format — now decodes natively.

Reference parity: the reference engine treats image payloads as
opaque bytes plus typed metadata (SURVEY §2 multimodal mapping); this
codec exists so the engine's decode path is REAL for the two formats
that dominate web corpora, with the Spark plumbing (Arrow batches in
mapInPandas) identical for every format.

Scope — baseline sequential only, the profile every JPEG decoder must
support (T.81 Annex F):
- encode: greyscale (1 component) or RGB (YCbCr, JFIF terms), 4:4:4
  or 4:2:0 subsampling, standard Annex K quantization (quality knob)
  and Huffman tables, interleaved single scan;
- decode: any component count 1/3, sampling factors h,v in {1,2}
  (covers 4:4:4, 4:2:2, 4:2:0), multiple DQT/DHT per segment,
  restart-interval-free streams (DRI is rejected with a clear error,
  as are progressive SOF markers — baseline profile only).

Determinism notes (the properties the differential oracle leans on):
- The 8x8 DCT-II / IDCT are exact float matrix products (C X C^T with
  the orthonormal cosine matrix) — no fast-DCT approximations.
- A FLAT 8x8 block has DC = 8*(value-128) and analytically-zero ACs;
  with a quant step dividing 8 the roundtrip is bit-exact (the
  multimodal_jpeg_roundtrip query's oracle recomputes decoded pixels
  from first principles on exactly this class). The general lossy
  path is pytest-anchored with an error bound instead
  (tests/test_jpeg.py).
"""

from __future__ import annotations

import struct

import numpy as np

# --- tables (ITU-T T.81 Annex K) --------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# (BITS[1..16], HUFFVAL) per T.81 K.3.1/K.3.2.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
    0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
    0xF9, 0xFA,
]


def _zigzag_order() -> list[int]:
    order = []
    for s in range(15):
        idx = [
            (i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)
        ]
        if s % 2 == 0:
            idx.reverse()
        order.extend(8 * i + j for i, j in idx)
    return order


ZIGZAG = _zigzag_order()  # flat index (8i+j) at each zigzag position
UNZIGZAG = [0] * 64
for _pos, _flat in enumerate(ZIGZAG):
    UNZIGZAG[_flat] = _pos

# Orthonormal DCT-II matrix: exact-definition floats, applied as
# matrix products (no fast-DCT butterfly approximations).
_C = np.zeros((8, 8))
for _u in range(8):
    a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def dct2d(block: np.ndarray) -> np.ndarray:
    """8x8 forward DCT-II (orthonormal)."""
    return _C @ block @ _C.T


def idct2d(coef: np.ndarray) -> np.ndarray:
    """8x8 inverse DCT (orthonormal)."""
    return _C.T @ coef @ _C


def _build_huffman(bits: list[int], vals: list[int]):
    """Canonical T.81 code assignment. Returns
    (encode: {symbol: (code, length)}, decode: {(length, code): symbol})."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    if sum(bits) > len(vals):
        raise ValueError("JPEG Huffman table truncated")
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            enc[sym] = (code, length)
            dec[(length, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


_DC_L_ENC, _DC_L_DEC = _build_huffman(DC_LUMA_BITS, DC_LUMA_VALS)
_DC_C_ENC, _DC_C_DEC = _build_huffman(DC_CHROMA_BITS, DC_CHROMA_VALS)
_AC_L_ENC, _AC_L_DEC = _build_huffman(AC_LUMA_BITS, AC_LUMA_VALS)
_AC_C_ENC, _AC_C_DEC = _build_huffman(AC_CHROMA_BITS, AC_CHROMA_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self._pos >= len(self._data):
                raise ValueError("JPEG entropy stream truncated")
            byte = self._data[self._pos]
            self._pos += 1
            if byte == 0xFF:
                if (
                    self._pos >= len(self._data)
                    or self._data[self._pos] != 0x00
                ):
                    raise ValueError(
                        "unexpected marker inside entropy stream "
                        "(restart intervals are not supported)"
                    )
                self._pos += 1  # skip the stuffed 0x00
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC value (F.1.2.1)."""
    if v == 0:
        return 0, 0
    cat = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    """Inverse of _magnitude (T.81 EXTEND)."""
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def _encode_block(
    writer: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_enc: dict,
    ac_enc: dict,
) -> int:
    """Huffman-encode one zigzagged quantized block; returns new DC
    predictor."""
    dc = int(zz[0])
    cat, bits = _magnitude(dc - pred)
    code, length = dc_enc[cat]
    writer.write(code, length)
    if cat:
        writer.write(bits, cat)
    run = 0
    last_nz = 0
    for pos in range(63, 0, -1):
        if zz[pos] != 0:
            last_nz = pos
            break
    for pos in range(1, last_nz + 1):
        v = int(zz[pos])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        cat, bits = _magnitude(v)
        code, length = ac_enc[(run << 4) | cat]
        writer.write(code, length)
        writer.write(bits, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]  # EOB
        writer.write(code, length)
    return dc


def _decode_block(
    reader: _BitReader, pred: int, dc_dec: dict, ac_dec: dict
) -> tuple[np.ndarray, int]:
    """Huffman-decode one block; returns (zigzagged coefs, new DC
    predictor)."""
    zz = np.zeros(64, dtype=np.int64)
    cat = reader.read_huffman(dc_dec)
    diff = _extend(reader.read_bits(cat), cat) if cat else 0
    dc = pred + diff
    zz[0] = dc
    pos = 1
    while pos < 64:
        sym = reader.read_huffman(ac_dec)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            pos += 16
            continue
        run, cat = sym >> 4, sym & 0xF
        pos += run
        if pos > 63:
            raise ValueError("JPEG AC run past end of block")
        zz[pos] = _extend(reader.read_bits(cat), cat)
        pos += 1
    return zz, dc


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (bh, bw)."""
    h, w = plane.shape
    ph = (bh - h % bh) % bh
    pw = (bw - w % bw) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base quant table."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (table * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_encode(
    img: np.ndarray,
    quality: int = 75,
    qtable: np.ndarray | None = None,
    subsample: bool = False,
) -> bytes:
    """Encode a uint8 array as baseline JFIF JPEG: (h, w) -> greyscale,
    (h, w, 3) -> RGB via YCbCr. `qtable` (8x8 int) overrides the
    quality-scaled Annex K luma table FOR ALL components (the
    roundtrip oracle uses np.full((8,8), 8), under which flat blocks
    are bit-exact). `subsample` selects 4:2:0 (2x2-averaged chroma)
    instead of 4:4:4."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("jpeg_encode expects uint8 pixels")
    grey = img.ndim == 2
    if not grey and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("jpeg_encode expects (h,w) or (h,w,3)")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    if qtable is not None:
        qt_l = np.asarray(qtable, dtype=np.int64).reshape(8, 8)
        qt_c = qt_l
    else:
        qt_l = _quality_scale(QUANT_LUMA, quality)
        qt_c = _quality_scale(QUANT_CHROMA, quality)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        body = bytes([tid]) + bytes(
            int(tab.reshape(-1)[ZIGZAG[i]]) for i in range(64)
        )
        return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body

    out += dqt(0, qt_l)
    if not grey:
        out += dqt(1, qt_c)

    # SOF0
    if grey:
        comps = [(1, 1, 1, 0)]
    elif subsample:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not grey:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    # SOS
    sos = bytes([len(comps)])
    for cid, _, _, tq in comps:
        td_ta = 0 if tq == 0 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # planes
    if grey:
        planes = [img.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(img)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            cbp = _pad_to_blocks(cb, 2, 2)
            crp = _pad_to_blocks(cr, 2, 2)
            cb = (
                cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )
            cr = (
                crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )
        planes = [y, cb, cr]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    shifted_planes = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        # pad exactly to this component's MCU grid, then level-shift
        p = np.clip(np.round(plane), 0, 255)
        target_h = mcuy * cv * 8
        target_w = mcux * ch * 8
        p = np.pad(
            p,
            ((0, target_h - p.shape[0]), (0, target_w - p.shape[1])),
            mode="edge",
        )
        shifted_planes.append(p - 128.0)

    writer = _BitWriter()
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                qt = qt_l if tq == 0 else qt_c
                dc_enc = _DC_L_ENC if tq == 0 else _DC_C_ENC
                ac_enc = _AC_L_ENC if tq == 0 else _AC_C_ENC
                shifted = shifted_planes[ci]
                for v in range(cv):
                    for u in range(ch):
                        y0 = (my * cv + v) * 8
                        x0 = (mx * ch + u) * 8
                        block = shifted[y0 : y0 + 8, x0 : x0 + 8]
                        coef = dct2d(block)
                        zz = (
                            np.round(coef / qt)
                            .astype(np.int64)
                            .reshape(-1)[ZIGZAG]
                        )
                        preds[ci] = _encode_block(
                            writer, zz, preds[ci], dc_enc, ac_enc
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_decode(blob: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to uint8 ((h, w) for 1
    component, (h, w, 3) RGB for 3). Rejects progressive/extended
    SOF markers, arithmetic coding, DRI, and sampling factors
    outside {1, 2} with explicit errors."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte string")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[tuple[int, int, int, int]] = []
    h = w = 0
    scan: bytes | None = None
    scan_comps: list[tuple[int, int, int]] = []

    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seglen = struct.unpack(">H", blob[pos : pos + 2])[0]
        body = blob[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                i += 1
                if prec == 0:
                    vals = list(body[i : i + 64])
                    i += 64
                else:
                    vals = [
                        struct.unpack(">H", body[i + 2 * k : i + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    i += 128
                tab = np.zeros(64, dtype=np.int64)
                for zpos, v in enumerate(vals):
                    tab[ZIGZAG[zpos]] = v
                qtabs[tid] = tab.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _build_huffman(bits, vals)[1]
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for k in range(nc):
                cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                ch, cv = hv >> 4, hv & 0xF
                if ch not in (1, 2) or cv not in (1, 2):
                    raise ValueError(
                        f"sampling factors {ch}x{cv} unsupported "
                        "(baseline decoder handles 1 and 2)"
                    )
                comps.append((cid, ch, cv, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "progressive/extended JPEG not supported (baseline only)"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) not supported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan_comps = []
            for k in range(ns):
                cid, tdta = body[1 + 2 * k : 3 + 2 * k]
                scan_comps.append((cid, tdta >> 4, tdta & 0xF))
            # entropy stream runs to the next non-RST/stuffed marker
            end = pos
            while end < len(blob) - 1:
                if blob[end] == 0xFF and blob[end + 1] not in (
                    0x00,
                ) and not (0xD0 <= blob[end + 1] <= 0xD7):
                    break
                end += 1
            scan = blob[pos:end]
            pos = end
        # other markers (APPn, COM) are skipped

    if not comps or scan is None:
        raise ValueError("JPEG missing SOF or SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = []
    for cid, ch, cv, tq in comps:
        planes.append(
            np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
        )

    scan_map = {cid: (td, ta) for cid, td, ta in scan_comps}
    reader = _BitReader(scan)
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                td, ta = scan_map[cid]
                dc_dec = huff[(0, td)]
                ac_dec = huff[(1, ta)]
                qt = qtabs[tq].astype(np.float64)
                for v in range(cv):
                    for u in range(ch):
                        zz, preds[ci] = _decode_block(
                            reader, preds[ci], dc_dec, ac_dec
                        )
                        coef = zz[UNZIGZAG].reshape(8, 8) * qt
                        block = idct2d(coef) + 128.0
                        y0 = (my * cv + v) * 8
                        x0 = (mx * ch + u) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    if len(comps) == 1:
        plane = np.clip(np.round(planes[0][:h, :w]), 0, 255)
        return plane.astype(np.uint8)
    if len(comps) != 3:
        raise ValueError(f"{len(comps)}-component JPEG unsupported")
    full = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        if ch < hmax or cv < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
            )
        full.append(plane[:h, :w])
    return _ycbcr_to_rgb(full[0], full[1], full[2])
