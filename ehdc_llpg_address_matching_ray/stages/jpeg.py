"""JPEG codec, pure numpy + stdlib — no image libraries.

Implements what a web corpus overwhelmingly consists of (task brief
"multimodal columns"): BASELINE sequential DCT (SOF0/1) and — since
round 5 — PROGRESSIVE (SOF2) decode, 8-bit samples, Huffman entropy
coding, grayscale / YCbCr with 4:4:4 or 4:2:0 chroma subsampling,
restart markers (DRI/RSTn), multi-scan streams with spectral selection
and successive approximation (DC + AC refinement passes, EOB runs).
Arithmetic coding, hierarchical/lossless processes and 12-bit precision
raise ValueError — the strict path in MultimodalFeaturizer surfaces
those as a real gap rather than a silent stub.

Two encoders exist so decoder tests roundtrip real byte streams
produced independently of the decoder's own table handling: the
baseline 4:4:4/4:2:0 JFIF writer (Annex K tables, libjpeg quality
curve) and a progressive (SOF2) writer whose scan script exercises
spectral selection and the successive-approximation refinement paths;
progressive output is pixel-identical to baseline by construction
(same quantized coefficients), which the tests pin.

References (public): ITU-T T.81 (the JPEG standard) §§ A/B/C/F/G and
Annex K example tables; JFIF 1.02 spec for the colorspace convention
(full-range BT.601 YCbCr).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1/K.2 example quantization tables (luminance, chrominance)
QUANT_LUMA = np.array(
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
).reshape(8, 8)
QUANT_CHROMA = np.array(
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
).reshape(8, 8)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
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

# orthonormal 8x8 DCT-II matrix: IDCT(X) = D.T @ X @ D, DCT(x) = D @ x @ D.T
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for the sequential bit reader."""
    return {(ln, code): sym for sym, (code, ln) in _huff_codes(bits, vals).items()}


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality curve: 50 -> table as-is, 100 -> all ones."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255)


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
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) per T.81 F.1.2.1 (negatives one's-comp)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = int(a).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_component(
    w: _BitWriter, blocks: np.ndarray, qt: np.ndarray, dc_tab, ac_tab, pred: int
) -> int:
    """Huffman-encode one component's 8x8 blocks (already level-shifted
    pixels); returns the updated DC predictor."""
    for blk in blocks:
        coef = _D @ (blk - 128.0) @ _D.T
        q = np.round(coef / qt).astype(np.int64)
        zz = q.reshape(-1)[ZIGZAG]
        s, bits = _magnitude(int(zz[0]) - pred)
        pred = int(zz[0])
        code, ln = dc_tab[s]
        w.write(code, ln)
        if s:
            w.write(bits, s)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]  # ZRL
                w.write(code, ln)
                run -= 16
            s, bits = _magnitude(v)
            code, ln = ac_tab[(run << 4) | s]
            w.write(code, ln)
            w.write(bits, s)
            run = 0
        if last < 63:
            code, ln = ac_tab[0x00]  # EOB
            w.write(code, ln)
    return pred


def _tile_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane (multiple-of-8 padded) -> (n, 8, 8) blocks in
    raster MCU order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _pad_to(img: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (mh, mw)."""
    h, w = img.shape[:2]
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        img = np.pad(img, [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2), mode="edge")
    return img


def encode_jpeg(img: np.ndarray, quality: int = 90, subsampling: str = "444") -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) uint8 gray -> baseline JFIF bytes.

    ``subsampling``: '444' (no chroma subsampling) or '420'.
    """
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects (h, w[, 3]) uint8")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if gray:
        y_plane = img.astype(np.float64)
        comps = [(1, 1, 1, 0)]  # (id, hsamp, vsamp, qtab)
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y_plane = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        elif subsampling == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    def marker(m: int, payload: bytes) -> bytes:
        return bytes([0xFF, m]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += marker(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += marker(0xDB, bytes([0]) + bytes(ql.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += marker(0xDB, bytes([1]) + bytes(qc.reshape(-1)[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for cid, hs, vs, qi in comps:
        sof += bytes([cid, (hs << 4) | vs, qi])
    out += marker(0xC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ) + (() if gray else (
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    )):
        out += marker(0xC4, bytes([(cls << 4) | tid] + bits) + bytes(vals))
    sos = bytes([len(comps)])
    for cid, _, _, qi in comps:
        sos += bytes([cid, 0 if qi == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += marker(0xDA, sos)

    dc_l = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    # per-component padded planes at their own resolution
    planes = []
    for idx, (cid, hs, vs, qi) in enumerate(comps):
        if gray or idx == 0:
            p = y_plane
        else:
            p = cb if cid == 2 else cr
        if hs < hmax or vs < vmax:  # 4:2:0 chroma: 2x2 box downsample
            p = _pad_to(p, 2, 2)
            p = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
        p = _pad_to(p, 8 * vs, 8 * hs) if (hs == hmax and vs == vmax) else _pad_to(p, 8, 8)
        planes.append(p)
    # pad the full-res plane(s) so MCU grids align
    mcu_h, mcu_w = 8 * vmax, 8 * hmax
    planes[0] = _pad_to(planes[0], mcu_h, mcu_w)
    n_mcu_y = planes[0].shape[0] // mcu_h
    n_mcu_x = planes[0].shape[1] // mcu_w
    for i in range(1, len(planes)):
        hs, vs = comps[i][1], comps[i][2]
        planes[i] = _pad_to(planes[i], 8 * n_mcu_y * vs // 1, 8 * n_mcu_x * hs // 1)[
            : 8 * n_mcu_y * vs, : 8 * n_mcu_x * hs
        ]

    wtr = _BitWriter()
    preds = [0] * len(comps)
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            for i, (cid, hs, vs, qi) in enumerate(comps):
                p = planes[i]
                qt = ql if qi == 0 else qc
                dc_tab = dc_l if qi == 0 else dc_c
                ac_tab = ac_l if qi == 0 else ac_c
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8][None, :, :]
                        preds[i] = _encode_component(wtr, blk, qt, dc_tab, ac_tab, preds[i])
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Sequential MSB-first bit reader over UNSTUFFED entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        self.acc = (self.acc << 8) | self.data[self.pos]
        self.pos += 1
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

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


def _extend(bits: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude bits -> signed value."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _entropy_scan_bytes(data: bytes, start: int) -> tuple[bytes, int]:
    """Raw entropy bytes of one scan (stuffing and RSTn retained) and
    the position of the next real marker."""
    i = start
    n = len(data)
    while i < n:
        if data[i] == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            break
        i += 1
    return data[start:i], i


def _split_segments(raw: bytes) -> list[bytes]:
    """Split raw entropy bytes on RSTn markers, unstuffing 0xFF00."""
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        byte = raw[i]
        if byte == 0xFF:
            nxt = raw[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(byte)
        i += 1
    segments.append(bytes(cur))
    return segments


def _decode_block_seq(rdr, dc_tab, ac_tab, pred: int) -> tuple[list[int], int]:
    """One baseline-sequential block -> (zigzag coefficients, new pred)."""
    zz = [0] * 64
    s = rdr.read_huff(dc_tab)
    if s > 16:  # T.81 F.1.2.1: DC difference categories are 0..16
        raise ValueError("JPEG DC category out of range")
    diff = _extend(rdr.read_bits(s), s) if s else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k <= 63:
        rs = rdr.read_huff(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _extend(rdr.read_bits(s), s)
        k += 1
    return zz, pred


def _noninterleaved_dims(comp, w, h, hmax, vmax) -> tuple[int, int]:
    """Non-interleaved block-raster dims (T.81 A.2.2): ceil over the
    component's own sample grid, NOT the padded MCU grid."""
    cw = -(-(w * comp["h"]) // hmax)
    ch = -(-(h * comp["v"]) // vmax)
    return -(-cw // 8), -(-ch // 8)


def _decode_scan_sequential(scan, segments, n_mcu_x, n_mcu_y, w, h, hmax, vmax):
    """Baseline/extended-sequential scan: full-spectrum DC+AC Huffman,
    interleaved when ns > 1, the component's own raster when ns == 1."""
    ri = scan["ri"]
    preds = {sc[0]["id"]: 0 for sc in scan["comps"]}
    rdr = _BitReader(segments[0])
    seg_idx = 0
    unit = 0

    def maybe_restart():
        nonlocal rdr, seg_idx, preds
        if ri and unit and unit % ri == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing JPEG restart segment")
            rdr = _BitReader(segments[seg_idx])
            preds = {sc[0]["id"]: 0 for sc in scan["comps"]}

    if len(scan["comps"]) > 1:
        for my in range(n_mcu_y):
            for mx in range(n_mcu_x):
                maybe_restart()
                for comp, dc_tab, ac_tab in scan["comps"]:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            zz, preds[comp["id"]] = _decode_block_seq(
                                rdr, dc_tab, ac_tab, preds[comp["id"]]
                            )
                            bi = (my * comp["v"] + by) * comp["bw"] + (
                                mx * comp["h"] + bx
                            )
                            comp["coef"][bi] = zz
                unit += 1
    else:
        comp, dc_tab, ac_tab = scan["comps"][0]
        nbx, nby = _noninterleaved_dims(comp, w, h, hmax, vmax)
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart()
                zz, preds[comp["id"]] = _decode_block_seq(
                    rdr, dc_tab, ac_tab, preds[comp["id"]]
                )
                comp["coef"][by * comp["bw"] + bx] = zz
                unit += 1


def _decode_scan_progressive(scan, segments, n_mcu_x, n_mcu_y, w, h, hmax, vmax):
    """One progressive scan (T.81 §G.2): DC first/refine (interleaved or
    single-component), AC first/refine (always single-component, the
    component's own block raster), EOB runs, restart handling."""
    Ss, Se, Ah, Al = scan["Ss"], scan["Se"], scan["Ah"], scan["Al"]
    ri = scan["ri"]
    rdr = _BitReader(segments[0])
    seg_idx = 0
    state = {"eobrun": 0, "preds": {sc[0]["id"]: 0 for sc in scan["comps"]}}

    def restart():
        nonlocal rdr, seg_idx
        seg_idx += 1
        if seg_idx >= len(segments):
            raise ValueError("missing JPEG restart segment")
        rdr = _BitReader(segments[seg_idx])
        state["eobrun"] = 0
        state["preds"] = {sc[0]["id"]: 0 for sc in scan["comps"]}

    if Ss == 0:
        if Se != 0:
            raise ValueError("progressive scan mixes DC and AC (Ss=0, Se>0)")

        def dc_block(comp, dc_tab, bi):
            coef = comp["coef"]
            if Ah == 0:
                if dc_tab is None:
                    raise ValueError("JPEG scan references missing Huffman table")
                s = rdr.read_huff(dc_tab)
                if s > 16:  # T.81 F.1.2.1
                    raise ValueError("JPEG DC category out of range")
                diff = _extend(rdr.read_bits(s), s) if s else 0
                state["preds"][comp["id"]] += diff
                coef[bi, 0] = state["preds"][comp["id"]] << Al
            else:
                if rdr.read_bit():
                    coef[bi, 0] = int(coef[bi, 0]) | (1 << Al)

        unit = 0
        if len(scan["comps"]) > 1:
            for my in range(n_mcu_y):
                for mx in range(n_mcu_x):
                    if ri and unit and unit % ri == 0:
                        restart()
                    for comp, dc_tab, _ac in scan["comps"]:
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                bi = (my * comp["v"] + by) * comp["bw"] + (
                                    mx * comp["h"] + bx
                                )
                                dc_block(comp, dc_tab, bi)
                    unit += 1
        else:
            comp, dc_tab, _ac = scan["comps"][0]
            nbx, nby = _noninterleaved_dims(comp, w, h, hmax, vmax)
            for by in range(nby):
                for bx in range(nbx):
                    if ri and unit and unit % ri == 0:
                        restart()
                    dc_block(comp, dc_tab, by * comp["bw"] + bx)
                    unit += 1
        return

    # AC scans: always non-interleaved, one component
    if len(scan["comps"]) != 1:
        raise ValueError("progressive AC scan must be single-component")
    comp, _dc, ac_tab = scan["comps"][0]
    if ac_tab is None:
        raise ValueError("JPEG scan references missing Huffman table")
    coef = comp["coef"]
    nbx, nby = _noninterleaved_dims(comp, w, h, hmax, vmax)
    p1 = 1 << Al
    m1 = -1 << Al
    unit = 0
    for by in range(nby):
        for bx in range(nbx):
            if ri and unit and unit % ri == 0:
                restart()
            unit += 1
            bi = by * comp["bw"] + bx
            if Ah == 0:
                # ------- AC first scan (G.1.2.2) -------
                if state["eobrun"] > 0:
                    state["eobrun"] -= 1
                    continue
                k = Ss
                while k <= Se:
                    rs = rdr.read_huff(ac_tab)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += rdr.read_bits(r)
                        break
                    k += r
                    if k > Se:
                        raise ValueError("AC coefficient index overflow")
                    coef[bi, k] = _extend(rdr.read_bits(s), s) << Al
                    k += 1
            else:
                # ------- AC refinement scan (G.1.2.3) -------
                k = Ss
                if state["eobrun"] == 0:
                    while k <= Se:
                        rs = rdr.read_huff(ac_tab)
                        r, s = rs >> 4, rs & 0xF
                        val = 0
                        if s:
                            if s != 1:
                                raise ValueError(
                                    "AC refinement code with size != 1"
                                )
                            val = p1 if rdr.read_bit() else m1
                        elif r != 15:
                            state["eobrun"] = (1 << r)
                            if r:
                                state["eobrun"] += rdr.read_bits(r)
                            break
                        # advance over r zero-history coefficients,
                        # appending a correction bit to each nonzero one
                        while k <= Se:
                            c = int(coef[bi, k])
                            if c != 0:
                                if rdr.read_bit() and (c & p1) == 0:
                                    coef[bi, k] = c + (p1 if c >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s:
                            if k > Se:
                                raise ValueError(
                                    "AC refinement ran past the spectral band"
                                )
                            coef[bi, k] = val
                        k += 1
                if state["eobrun"] > 0:
                    # inside / entering an EOB run: every remaining
                    # nonzero coefficient still takes one correction bit
                    while k <= Se:
                        c = int(coef[bi, k])
                        if c != 0:
                            if rdr.read_bit() and (c & p1) == 0:
                                coef[bi, k] = c + (p1 if c >= 0 else m1)
                        k += 1
                    state["eobrun"] -= 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF/JPEG bytes -> (h, w, 3) uint8 RGB (or (h, w, 3) replicated
    gray for 1-component streams — matches the BMP/PNG decoders' RGB
    output contract).  Handles baseline/extended sequential (SOF0/1) and
    PROGRESSIVE (SOF2) Huffman streams: multi-scan parsing, spectral
    selection, successive approximation (DC + AC refinement, EOB runs),
    restart markers in any scan.  Arithmetic coding, hierarchical and
    lossless processes raise ValueError — as does malformed input of
    ANY shape (short segments, dangling component ids, corrupt counts
    surface from the parse as slice/lookup errors and are normalized
    here, so the featurizer's lax skip contract holds)."""
    try:
        return _decode_jpeg_inner(data)
    except (
        IndexError,
        KeyError,
        StopIteration,
        ZeroDivisionError,
        OverflowError,
        MemoryError,
    ) as e:
        raise ValueError(f"malformed JPEG stream ({type(e).__name__})") from e


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    progressive = False
    scans: list[dict] = []
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker sync lost")
        m = data[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue  # parameterless
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        if seglen < 2:  # malformed length would stall the marker walk
            raise ValueError("invalid JPEG segment length")
        seg = data[pos + 2 : pos + seglen]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(seg[i : i + 64], np.uint8).astype(np.int64)
                    i += 64
                else:
                    vals = np.frombuffer(seg[i : i + 128], ">u2").astype(np.int64)
                    i += 128
                qtabs[tq] = vals[_UNZIGZAG].reshape(8, 8)
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential) / SOF2 (progressive)
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            progressive = m == 0xC2
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, sf, tq = seg[6 + 3 * i : 9 + 3 * i]
                hs, vs = sf >> 4, sf & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):  # T.81 B.2.2
                    raise ValueError("JPEG sampling factor out of range")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF marker 0xFF{m:02X}); "
                "sequential and progressive Huffman decode here"
            )
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htabs[(cls, tid)] = _huff_decode_table(bits, vals)
                i += 17 + n
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:  # SOS — record the scan, keep walking (SOF2 has many)
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                # snapshot the table dicts NOW: DHT between scans
                # replaces (not mutates) entries.  The QUANT table is
                # snapshotted at the component's FIRST scan too — a
                # later DQT redefinition applies to subsequent scans
                # only (T.81 B.2.4.1), and coefficients dequantize once
                # at the end
                if "qt" not in comp:
                    comp["qt"] = qtabs.get(comp["tq"])
                scan_comps.append(
                    (comp, htabs.get((0, tt >> 4)), htabs.get((1, tt & 0xF)))
                )
            Ss, Se, AhAl = seg[1 + 2 * ns : 4 + 2 * ns]
            raw, nxt = _entropy_scan_bytes(data, pos + seglen)
            scans.append(
                {
                    "comps": scan_comps,
                    "Ss": Ss,
                    "Se": Se,
                    "Ah": AhAl >> 4,
                    "Al": AhAl & 0xF,
                    "ri": restart_interval,
                    "raw": raw,
                }
            )
            pos = nxt
            continue
        pos += seglen
    if not scans or not comps or not h or not w:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    n_mcu_x = -(-w // (8 * hmax))
    n_mcu_y = -(-h // (8 * vmax))
    # sanity-bound declared dimensions against the payload: every coded
    # block costs >= 1 bit in SOME scan, so a valid file has at most
    # 8*len(data) blocks — a crafted 200-byte SOF declaring 65535x65535
    # must raise, not allocate ~17 GB of coefficients (the mp4
    # _bounded() class of fix)
    total_blocks = sum(n_mcu_x * c["h"] * n_mcu_y * c["v"] for c in comps)
    if total_blocks > 8 * max(1, len(data)):
        raise ValueError(
            f"implausible JPEG geometry: {total_blocks} declared blocks "
            f"for a {len(data)}-byte payload"
        )
    for c in comps:
        c["bw"] = n_mcu_x * c["h"]
        c["bh"] = n_mcu_y * c["v"]
        # RAW zigzag coefficients; dequantized after ALL scans land
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)

    for scan in scans:
        segments = _split_segments(scan["raw"])
        if progressive:
            _decode_scan_progressive(scan, segments, n_mcu_x, n_mcu_y, w, h, hmax, vmax)
        else:
            if scan["Ss"] != 0 or scan["Se"] != 63:
                raise ValueError("sequential JPEG scan with partial spectrum")
            for comp, dc_tab, ac_tab in scan["comps"]:
                if dc_tab is None or ac_tab is None:
                    raise ValueError("JPEG scan references missing Huffman table")
            _decode_scan_sequential(scan, segments, n_mcu_x, n_mcu_y, w, h, hmax, vmax)

    # dequantize + inverse DCT for all blocks of each component at once
    # (batched matmul), reassemble planes, upsample, color-convert
    planes = []
    for c in comps:
        qt = c.get("qt")  # snapshotted at the component's first scan
        if qt is None:
            raise ValueError("JPEG component references missing quant table")
        nat = c["coef"][:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64) * qt
        blocks = _D.T @ nat @ _D + 128.0
        plane = (
            blocks.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        if c["h"] < hmax or c["v"] < vmax:
            plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Progressive encoder (fixture/test synthesis; T.81 §G.1.2)
# --------------------------------------------------------------------------


def _emit_correction_bits(w: _BitWriter, br: list[int]) -> None:
    for b in br:
        w.write(b, 1)
    br.clear()


def _encode_ac_first_block(w, zz, Ss, Se, Al, ac_tab) -> None:
    """AC first scan for one block (G.1.2.2).  EOB runs are capped at 1
    (plain EOB0 per block) so the Annex K baseline Huffman tables — which
    define only EOB0 + ZRL among the s=0 codes — stay sufficient."""
    r = 0
    for k in range(Ss, Se + 1):
        v = int(zz[k])
        t = abs(v) >> Al
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac_tab[0xF0]
            w.write(code, ln)
            r -= 16
        s = t.bit_length()
        sv = t if v > 0 else -t
        bits = sv if sv > 0 else sv + (1 << s) - 1
        code, ln = ac_tab[(r << 4) | s]
        w.write(code, ln)
        w.write(bits, s)
        r = 0
    if r > 0:
        code, ln = ac_tab[0x00]  # EOB0
        w.write(code, ln)


def _encode_ac_refine_block(w, zz, Ss, Se, Al, ac_tab) -> None:
    """AC refinement scan for one block (G.1.2.3): newly-significant
    coefficients code (run<<4|1)+sign, already-significant ones append
    buffered correction bits after the next emitted code.  ZRLs are
    emitted at EVERY nonzero coefficient while the zero run exceeds 15
    and a newly-significant coefficient still follows (k <= EOB) —
    runs past the last insertion fold into the EOB instead, matching
    the decoder's correction-bit walk exactly.  EOB runs capped at 1
    as in _encode_ac_first_block."""
    absv = [abs(int(zz[k])) >> Al for k in range(Ss, Se + 1)]
    eob = Ss - 1  # position of the LAST newly-significant coefficient
    for k in range(Ss, Se + 1):
        if absv[k - Ss] == 1:
            eob = k
    r = 0
    br: list[int] = []
    for k in range(Ss, Se + 1):
        t = absv[k - Ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            code, ln = ac_tab[0xF0]
            w.write(code, ln)
            _emit_correction_bits(w, br)
            r -= 16
        if t > 1:
            br.append(t & 1)  # history coefficient: correction bit
            continue
        # t == 1: newly significant in THIS scan
        code, ln = ac_tab[(r << 4) | 1]
        w.write(code, ln)
        w.write(1 if int(zz[k]) > 0 else 0, 1)
        _emit_correction_bits(w, br)
        r = 0
    if r > 0 or br:
        code, ln = ac_tab[0x00]  # EOB0
        w.write(code, ln)
        _emit_correction_bits(w, br)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    successive: bool = True,
) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) gray -> PROGRESSIVE (SOF2) JFIF
    bytes.  Scan script: one interleaved DC-first scan, per-component
    full-band AC-first scans; with ``successive`` the first scans run at
    Al=1 and matching DC/AC refinement scans complete the stream to
    Al=0, exercising the successive-approximation decode paths.  Uses
    the Annex K baseline Huffman tables (valid here because EOB runs are
    capped at 1 — see _encode_ac_first_block)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_jpeg_progressive expects (h, w[, 3]) uint8")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if gray:
        y_plane = img.astype(np.float64)
        comps = [(1, 1, 1, 0)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y_plane = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        elif subsampling == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # per-component padded planes (same pipeline as the baseline encoder)
    planes = []
    for idx, (cid, hs, vs, qi) in enumerate(comps):
        if gray or idx == 0:
            p = y_plane
        else:
            p = cb if cid == 2 else cr
        if hs < hmax or vs < vmax:
            p = _pad_to(p, 2, 2)
            p = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
        planes.append(_pad_to(p, 8, 8))
    planes[0] = _pad_to(planes[0], 8 * vmax, 8 * hmax)
    n_mcu_y = planes[0].shape[0] // (8 * vmax)
    n_mcu_x = planes[0].shape[1] // (8 * hmax)
    for i in range(1, len(planes)):
        hs, vs = comps[i][1], comps[i][2]
        planes[i] = _pad_to(planes[i], 8 * n_mcu_y * vs, 8 * n_mcu_x * hs)[
            : 8 * n_mcu_y * vs, : 8 * n_mcu_x * hs
        ]

    # quantized zigzag coefficients per component, full padded grid
    coefs = []
    for i, (cid, hs, vs, qi) in enumerate(comps):
        qt = ql if qi == 0 else qc
        blocks = _tile_blocks(planes[i])
        f = _D @ (blocks - 128.0) @ _D.T
        q = np.round(f / qt).astype(np.int64)
        coefs.append(q.reshape(len(q), 64)[:, ZIGZAG])  # (nblocks, 64) zigzag
    grid = [(n_mcu_x * hs, n_mcu_y * vs) for (_c, hs, vs, _q) in comps]

    def marker(m: int, payload: bytes) -> bytes:
        return bytes([0xFF, m]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += marker(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += marker(0xDB, bytes([0]) + bytes(ql.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += marker(0xDB, bytes([1]) + bytes(qc.reshape(-1)[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for cid, hs, vs, qi in comps:
        sof += bytes([cid, (hs << 4) | vs, qi])
    out += marker(0xC2, sof)  # SOF2: progressive
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ) + (() if gray else (
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    )):
        out += marker(0xC4, bytes([(cls << 4) | tid] + bits) + bytes(vals))

    dc_tabs = [
        _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
        if qi == 0
        else _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
        for (_c, _h, _v, qi) in comps
    ]
    ac_tabs = [
        _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
        if qi == 0
        else _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
        for (_c, _h, _v, qi) in comps
    ]

    def sos_header(comp_ids: list[int], tabsel: list[int], Ss, Se, Ah, Al) -> bytes:
        p = bytes([len(comp_ids)])
        for cid, tt in zip(comp_ids, tabsel):
            p += bytes([cid, tt])
        return marker(0xDA, p + bytes([Ss, Se, (Ah << 4) | Al]))

    def dc_first_scan(Al: int) -> bytes:
        w_ = _BitWriter()
        preds = [0] * len(comps)
        for my in range(n_mcu_y):
            for mx in range(n_mcu_x):
                for i, (_cid, hs, vs, _qi) in enumerate(comps):
                    bw = grid[i][0]
                    for by in range(vs):
                        for bx in range(hs):
                            bi = (my * vs + by) * bw + (mx * hs + bx)
                            t = int(coefs[i][bi, 0]) >> Al  # arithmetic shift
                            s, bits = _magnitude(t - preds[i])
                            preds[i] = t
                            code, ln = dc_tabs[i][s]
                            w_.write(code, ln)
                            if s:
                                w_.write(bits, s)
        return w_.flush()

    def dc_refine_scan(Al: int) -> bytes:
        w_ = _BitWriter()
        for my in range(n_mcu_y):
            for mx in range(n_mcu_x):
                for i, (_cid, hs, vs, _qi) in enumerate(comps):
                    bw = grid[i][0]
                    for by in range(vs):
                        for bx in range(hs):
                            bi = (my * vs + by) * bw + (mx * hs + bx)
                            w_.write((int(coefs[i][bi, 0]) >> Al) & 1, 1)
        return w_.flush()

    def ac_scan(i: int, Ss, Se, Ah, Al) -> bytes:
        """Non-interleaved raster over the component's REAL block grid."""
        comp = {"h": comps[i][1], "v": comps[i][2]}
        nbx, nby = _noninterleaved_dims(comp, w, h, hmax, vmax)
        bw = grid[i][0]
        w_ = _BitWriter()
        for by in range(nby):
            for bx in range(nbx):
                zz = coefs[i][by * bw + bx]
                if Ah == 0:
                    _encode_ac_first_block(w_, zz, Ss, Se, Al, ac_tabs[i])
                else:
                    _encode_ac_refine_block(w_, zz, Ss, Se, Al, ac_tabs[i])
        return w_.flush()

    cids = [c[0] for c in comps]
    dctab_sel = [0 if qi == 0 else 0x10 for (_c, _h, _v, qi) in comps]
    al0 = 1 if successive else 0
    # scan 1: interleaved DC first at Al=al0
    out += sos_header(cids, dctab_sel, 0, 0, 0, al0) + dc_first_scan(al0)
    # per-component AC first scans (full band) at Al=al0
    for i, (cid, _hs, _vs, qi) in enumerate(comps):
        out += sos_header([cid], [0 if qi == 0 else 0x11], 1, 63, 0, al0)
        out += ac_scan(i, 1, 63, 0, al0)
    if successive:
        out += sos_header(cids, [0] * len(comps), 0, 0, 1, 0) + dc_refine_scan(0)
        for i, (cid, _hs, _vs, qi) in enumerate(comps):
            out += sos_header([cid], [0 if qi == 0 else 0x11], 1, 63, 1, 0)
            out += ac_scan(i, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)
