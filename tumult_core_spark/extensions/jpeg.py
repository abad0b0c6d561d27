"""From-scratch baseline JFIF (JPEG) codec — stdlib + NumPy only.

Closes the "real multimodal corpora carry JPEG" capability edge the
same way the PNG codec did (``multimodal.py``): the format is a public
spec (ITU-T T.81 / ISO 10918-1; constants below are the Annex K
example tables), and the container has no external codec library, so
the DCT / quantization / Huffman pipeline is implemented directly.

Scope — the profiles that cover essentially all real-world JPEGs:

* decode: baseline/extended sequential DCT (SOF0/SOF1, interleaved or
  per-component scans) AND progressive DCT (SOF2: spectral selection
  + successive approximation, DC and AC initial/refinement scans, EOB
  run-length coding per T.81 §G.1.2), 8-bit precision, grayscale or
  YCbCr, sampling factors 1-4 with integer ratios (4:4:4, 4:2:2,
  4:2:0, 4:1:1, ...), restart intervals (DRI/RSTn), multi-table
  DQT/DHT segments.  Arithmetic coding, 12-bit, lossless, and
  hierarchical modes raise ``ValueError`` (callers in ``auto`` mode
  fall back to the stub; ``real`` mode propagates — same contract as
  PNG).
* encode: SOF0 sequential or SOF2 progressive (IJG-style scan
  script), grayscale or color at 4:4:4 or 4:2:0, IJG-style quality
  scaling of the Annex K tables (``quality=100`` → all-ones tables,
  which makes constant 8x8 blocks round-trip EXACTLY — the property
  the independent driver oracle pins), optional restart intervals.
  Progressive and sequential encodings carry the SAME quantized
  coefficients, so the two decodes of one source are bit-identical —
  the cross-check the tests pin (the sequential path is itself
  validated against codec-free a-priori pixel fixtures, so the
  progressive scan coding cannot hide a symmetric encoder/decoder
  bug in the coefficient math; the scan-coding layer is additionally
  exercised across noise images, subsampling, and restart markers).

Performance honesty (the PNG-Paeth note's sibling): the per-symbol
Huffman loop is plain Python — roughly 1-3 MB/s of entropy data per
core — while everything after it (dequantize, IDCT via one einsum
over all blocks, chroma upsample, colorspace) is vectorized NumPy.
mapInPandas parallelism across 32+ cores makes that throughput usable
for profiling/sampling workloads; for bulk decode of a 100 TB image
corpus, swap ``_decode_jpeg`` for Pillow/libjpeg-turbo behind the
same signature.

Reference parity: the reference exposes opaque-binary decode UDFs
(``tmlt/core`` has no image codecs either); this module exists for
the training-data-pipeline surface, not reference parity.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# ---------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K)
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
], dtype=np.int64)
#: natural index -> position in zigzag stream (inverse permutation)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits-per-length[1..16], symbol values) — canonical Huffman specs
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

#: orthonormal 8-point DCT-II matrix: fwd = M @ B @ M.T, inv = M.T @ F @ M
_DCT_M = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = (1.0 / np.sqrt(2.0)) if _k == 0 else 1.0
        _DCT_M[_k, _n] = 0.5 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def scale_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling; ``quality=100`` yields the all-ones table
    (the lossless-for-constant-blocks configuration)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self._out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self._out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self._out)


def _huff_encode_table(bits, vals):
    """symbol -> (code, length) from a canonical (bits, vals) spec."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return table


_ENC_DC_LUMA = _huff_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
_ENC_DC_CHROMA = _huff_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
_ENC_AC_LUMA = _huff_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
_ENC_AC_CHROMA = _huff_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)


def _magnitude(v: int):
    """(size, bits) VLI coding of a coefficient value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(by, bx, 64) quantized zigzagged coefficients for an 8-aligned
    float plane (already level-shifted by -128)."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coeff = np.einsum("ij,byjk,lk->byil", _DCT_M, blocks, _DCT_M)
    quant = np.round(coeff.reshape(h // 8, w // 8, 64) / q[np.newaxis, np.newaxis, :])
    return quant.astype(np.int64)[:, :, ZIGZAG]


def _pad_to(plane: np.ndarray, mult_h: int, mult_w: Optional[int] = None) -> np.ndarray:
    if mult_w is None:
        mult_w = mult_h
    h, w = plane.shape
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block(writer, zz, dc_pred, dc_table, ac_table) -> int:
    """Huffman-encode one zigzagged 64-coefficient block; returns the
    block's DC value (the caller's next predictor)."""
    dc = int(zz[0])
    size, bits = _magnitude(dc - dc_pred)
    code, length = dc_table[size]
    writer.write(code, length)
    writer.write(bits, size)
    run = 0
    last_nonzero = 0
    for k in range(63, 0, -1):
        if zz[k] != 0:
            last_nonzero = k
            break
    for k in range(1, last_nonzero + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_table[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_table[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if last_nonzero < 63:
        code, length = ac_table[0x00]  # EOB
        writer.write(code, length)
    return dc


def _enc_ac_first_block(writer, zz, ss, se, al, ac_table) -> None:
    """Progressive AC initial scan for one block (G.1.2.2): band
    Ss..Se of the point-transformed coefficients, run-length coded;
    trailing zeros fold into a single-block EOB (run length 1 — the
    standard Annex K tables carry no EOBn>0 symbols, so runs are never
    accumulated across blocks; decoders accept that unconditionally)."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al  # point transform: magnitude shift (toward 0)
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, length = ac_table[0xF0]  # ZRL
            writer.write(code, length)
            r -= 16
        if v < 0:
            t = -t
        size, bits = _magnitude(t)
        code, length = ac_table[(r << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        r = 0
    if r > 0:
        code, length = ac_table[0x00]  # EOB, run of exactly 1
        writer.write(code, length)


def _enc_ac_refine_block(writer, zz, ss, se, al, ac_table) -> None:
    """Progressive AC refinement scan for one block (G.1.2.3, the
    figure G.7 algorithm): newly-significant coefficients (|coef|>>Al
    == 1) are coded with runs over zero-history positions; positions
    already nonzero in earlier scans contribute one buffered
    correction bit each, flushed right after the next ZRL / symbol /
    EOB so the decoder consumes them positionally."""
    ab = [0] * 64
    eob = ss - 1  # index of last NEWLY-significant coefficient
    for k in range(ss, se + 1):
        t = abs(int(zz[k])) >> al
        ab[k] = t
        if t == 1:
            eob = k
    r = 0
    br = []  # buffered correction bits
    for k in range(ss, se + 1):
        t = ab[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:  # ZRLs not foldable into EOB
            code, length = ac_table[0xF0]
            writer.write(code, length)
            r -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if t > 1:  # history coefficient: correction bit only
            br.append(t & 1)
            continue
        code, length = ac_table[(r << 4) | 1]
        writer.write(code, length)
        writer.write(1 if int(zz[k]) >= 0 else 0, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        code, length = ac_table[0x00]  # EOB (run 1)
        writer.write(code, length)
        for b in br:
            writer.write(b, 1)


def _rgb_to_ycbcr(img: np.ndarray):
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _encode_jpeg(
    img: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """uint8 HxW / HxWx1 (grayscale) or HxWx3 (RGB) -> JFIF bytes.
    ``subsampling`` is ``"444"``, ``"420"``, ``"422"``, or ``"411"``
    (ignored for grayscale);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    scan units (exercises the decoder's restart path).
    ``progressive=True`` emits SOF2 with an IJG-style scan script —
    interleaved DC first/refine with successive approximation (Al
    1->0) plus per-component AC spectral-selection scans with
    successive approximation on luma (Al 2->1->0) — coding the SAME
    quantized coefficients as the sequential mode, so both encodings
    of one source decode identically (pinned by tests)."""
    if img.ndim == 2:
        img = img[:, :, np.newaxis]
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("expected uint8 HxW[x1|x3] image")
    _SUB_FACTORS = {"444": (1, 1), "420": (2, 2), "422": (2, 1), "411": (4, 1)}
    if subsampling not in _SUB_FACTORS:
        raise ValueError(f"subsampling must be one of {sorted(_SUB_FACTORS)}")
    height, width, ncomp = img.shape
    if height == 0 or width == 0:
        raise ValueError("empty image")
    gray = ncomp == 1
    q_luma = scale_quant_table(QUANT_LUMA, quality).astype(np.float64)
    q_chroma = scale_quant_table(QUANT_CHROMA, quality).astype(np.float64)

    sub = (1, 1) if gray else _SUB_FACTORS[subsampling]
    hmax, vmax = sub
    mcu_w, mcu_h = 8 * hmax, 8 * vmax

    if gray:
        y = img[:, :, 0].astype(np.float64)
        planes = [(_pad_to(y, 8) - 128.0, q_luma)]
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        y = _pad_to(y, mcu_h, mcu_w)
        if sub != (1, 1):
            # box-average hmax x vmax; the chroma grid is then
            # (mcu/vmax, mcu/hmax)-aligned, i.e. 8-aligned
            cbp = _pad_to(cb, mcu_h, mcu_w)
            crp = _pad_to(cr, mcu_h, mcu_w)
            ch, cw = cbp.shape
            cb = cbp.reshape(ch // vmax, vmax, cw // hmax, hmax).mean(axis=(1, 3))
            cr = crp.reshape(ch // vmax, vmax, cw // hmax, hmax).mean(axis=(1, 3))
        else:
            cb = _pad_to(cb, 8)
            cr = _pad_to(cr, 8)
        planes = [
            (y - 128.0, q_luma),
            (cb - 128.0, q_chroma),
            (cr - 128.0, q_chroma),
        ]
    comps_zz = [_fdct_quant(p, q) for p, q in planes]

    # ---- headers -----------------------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    for tq, table in ((0, q_luma), (1, q_chroma)) if not gray else ((0, q_luma),):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(table[z]) for z in ZIGZAG)
    ncomps = 1 if gray else 3
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + struct.pack(">HBHHB", 8 + 3 * ncomps, 8, height, width, ncomps)
    if gray:
        out += bytes([1, 0x11, 0])
    else:
        out += bytes([1, (hmax << 4) | vmax, 0, 2, 0x11, 1, 3, 0x11, 1])
    hts = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if not gray:
        hts += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc_th])
        out += bytes(bits) + bytes(vals)
    if restart_interval > 0:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    # ---- entropy-coded data ------------------------------------------
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    dc_tabs = [_ENC_DC_LUMA] + [_ENC_DC_CHROMA] * 2
    ac_tabs = [_ENC_AC_LUMA] + [_ENC_AC_CHROMA] * 2
    comp_sub = [(hmax, vmax)] + [(1, 1)] * 2

    def run_units(encode_unit, total_units, fresh_state):
        """Drive one scan's entropy coding with RSTn every
        ``restart_interval`` units (DC predictors reset per interval)."""
        nonlocal out
        writer = _BitWriter()
        state = fresh_state()
        rst_idx = 0
        for u in range(total_units):
            if restart_interval and u and u % restart_interval == 0:
                out += writer.flush()
                out += bytes([0xFF, 0xD0 + rst_idx])
                rst_idx = (rst_idx + 1) % 8
                writer = _BitWriter()
                state = fresh_state()
            encode_unit(writer, u, state)
        out += writer.flush()

    if not progressive:
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomps, ncomps)
        if gray:
            out += bytes([1, 0x00])
        else:
            out += bytes([1, 0x00, 2, 0x11, 3, 0x11])
        out += bytes([0, 63, 0])

        def seq_mcu(writer, u, dc_pred):
            my, mx = divmod(u, mcus_x)
            for ci, zzgrid in enumerate(comps_zz):
                ch, cv = comp_sub[ci]
                for by in range(cv):
                    for bx in range(ch):
                        zz = zzgrid[my * cv + by, mx * ch + bx]
                        dc_pred[ci] = _encode_block(
                            writer, zz, dc_pred[ci], dc_tabs[ci], ac_tabs[ci]
                        )

        run_units(seq_mcu, mcus_x * mcus_y, lambda: [0, 0, 0])
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # ---- progressive scan script (IJG-style: spectral selection plus
    # successive approximation on both DC and AC) ----------------------
    if gray:
        script = [
            ("dc", None, 0, 0, 0, 1),
            ("ac", 0, 1, 63, 0, 1),
            ("dc", None, 0, 0, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]
    else:
        script = [
            ("dc", None, 0, 0, 0, 1),
            ("ac", 0, 1, 5, 0, 2),
            ("ac", 1, 1, 63, 0, 1),
            ("ac", 2, 1, 63, 0, 1),
            ("ac", 0, 6, 63, 0, 2),
            ("ac", 0, 1, 63, 2, 1),
            ("dc", None, 0, 0, 1, 0),
            ("ac", 1, 1, 63, 1, 0),
            ("ac", 2, 1, 63, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]
    for kind, target, ss, se, ah, al in script:
        if kind == "dc":
            out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomps, ncomps)
            if gray:
                out += bytes([1, 0x00])
            else:
                out += bytes([1, 0x00, 2, 0x10, 3, 0x10])
            out += bytes([ss, se, (ah << 4) | al])
            if ah == 0:

                def dc_first_mcu(writer, u, dc_pred, _al=al):
                    my, mx = divmod(u, mcus_x)
                    for ci, zzgrid in enumerate(comps_zz):
                        ch, cv = comp_sub[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                v = int(zzgrid[my * cv + by, mx * ch + bx][0]) >> _al
                                size, bits = _magnitude(v - dc_pred[ci])
                                code, length = dc_tabs[ci][size]
                                writer.write(code, length)
                                writer.write(bits, size)
                                dc_pred[ci] = v

                run_units(dc_first_mcu, mcus_x * mcus_y, lambda: [0, 0, 0])
            else:

                def dc_refine_mcu(writer, u, _state, _al=al):
                    my, mx = divmod(u, mcus_x)
                    for ci, zzgrid in enumerate(comps_zz):
                        ch, cv = comp_sub[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                v = int(zzgrid[my * cv + by, mx * ch + bx][0])
                                writer.write((v >> _al) & 1, 1)

                run_units(dc_refine_mcu, mcus_x * mcus_y, lambda: None)
        else:
            ci = target
            out += b"\xff\xda" + struct.pack(">HB", 6 + 2, 1)
            out += bytes([ci + 1, 0x00 if ci == 0 else 0x01])
            out += bytes([ss, se, (ah << 4) | al])
            ch, cv = comp_sub[ci]
            comp_w = -(-width * ch // hmax)
            comp_h = -(-height * cv // vmax)
            bw = -(-comp_w // 8)
            bh = -(-comp_h // 8)
            grid = comps_zz[ci]
            enc = _enc_ac_first_block if ah == 0 else _enc_ac_refine_block

            def ac_unit(writer, u, _state, _grid=grid, _bw=bw, _ss=ss,
                        _se=se, _al=al, _tab=ac_tabs[ci], _enc=enc):
                by, bx = divmod(u, _bw)
                _enc(writer, _grid[by, bx], _ss, _se, _al, _tab)

            run_units(ac_unit, bw * bh, lambda: None)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman decode table (F.2.2.3 mincode/maxcode/valptr)
    plus an 8-bit lookahead LUT: symbols whose codes are <= 8 bits
    (the overwhelming majority in real streams) resolve with one table
    index instead of a per-bit loop — measured ~2x faster symbol
    decode in the Python hot loop."""

    def __init__(self, bits, vals) -> None:
        # A corrupt DHT can declare more codes than the value list
        # carries, or more codes at a length than its code space holds
        # (Kraft overflow) — either would surface as an IndexError
        # deep in the hot loop instead of this module's ValueError.
        if sum(bits) > len(vals):
            raise ValueError("corrupt JPEG Huffman table (count exceeds values)")
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.lut = [None] * 256
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                if code + n > (1 << length):
                    raise ValueError("corrupt JPEG Huffman table (code overflow)")
                self.valptr[length] = k
                self.mincode[length] = code
                if length <= 8:
                    for _ in range(n):
                        prefix = code << (8 - length)
                        entry = (vals[k], length)
                        for i in range(1 << (8 - length)):
                            self.lut[prefix | i] = entry
                        code += 1
                        k += 1
                else:
                    code += n
                    k += n
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1


class _BitReader:
    """MSB-first reader over one de-stuffed entropy chunk."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos < len(self.data):
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8  # spec: pad exhausted stream with 0 bits
            self.nbits += 8

    def bit(self) -> int:
        self._fill(1)
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        self._fill(8)
        peek = (self.acc >> (self.nbits - 8)) & 0xFF
        hit = table.lut[peek]
        if hit is not None:  # fast path: code length <= 8
            sym, length = hit
            self.nbits -= length
            self.acc &= (1 << self.nbits) - 1
            return sym
        # slow path: the 8-bit prefix exceeds every <=8-bit code, so
        # continue the canonical search from length 8
        self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1
        code = peek
        length = 8
        while code > table.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG entropy data (bad Huffman code)")
            code = (code << 1) | self.bit()
        return table.vals[table.valptr[length] + code - table.mincode[length]]


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _split_scan(payload: bytes, start: int):
    """(chunks, end_pos): de-stuffed entropy chunks split on RSTn, and
    the offset of the terminating marker (EOI or next segment)."""
    chunks = []
    cur = bytearray()
    pos = start
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            break
        m = payload[pos + 1]
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            chunks.append(bytes(cur))
            cur = bytearray()
            pos += 2
        elif m == 0xFF:  # fill byte
            pos += 1
        else:
            break  # EOI or next segment
    chunks.append(bytes(cur))
    return chunks, pos


def _decode_block_seq(reader, zz, dct, act, dc_pred):
    """Sequential-mode block: DPCM DC + full-band run-length AC
    (F.2.2).  Returns the new DC predictor."""
    size = reader.decode_symbol(dct)
    if size > 11:  # T.81 F.1.2.1: 8-bit DC difference categories are 0-11
        raise ValueError("corrupt JPEG DC size category")
    dc_pred += _extend(reader.bits(size), size)
    zz[0] = dc_pred
    k = 1
    while k < 64:
        sym = reader.decode_symbol(act)
        if sym == 0x00:  # EOB
            break
        run = sym >> 4
        size = sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError("corrupt JPEG AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        zz[k] = _extend(reader.bits(size), size)
        k += 1
    return dc_pred


def _decode_block_ac_first(reader, zz, act, ss, se, al, eobrun):
    """Progressive AC initial scan for one block (G.1.2.2 with EOBn
    run-length coding).  Returns the remaining end-of-band run."""
    if eobrun > 0:
        return eobrun - 1  # this block's whole band is zero
    k = ss
    while k <= se:
        sym = reader.decode_symbol(act)
        r = sym >> 4
        s = sym & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = 1 << r
            if r:
                eobrun += reader.bits(r)
            return eobrun - 1  # current block is the run's first member
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        zz[k] = _extend(reader.bits(s), s) << al
        k += 1
    return 0


def _refine_nonzero(reader, zz, k, p1, m1):
    """Apply one correction bit to an already-nonzero coefficient
    (G.1.2.3): a 1-bit increases the magnitude by p1 if this scan has
    not already contributed that bit."""
    if reader.bit():
        if (int(zz[k]) & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1


def _decode_block_ac_refine(reader, zz, act, ss, se, al, eobrun):
    """Progressive AC refinement scan for one block (G.1.2.3):
    newly-significant coefficients arrive as ±1<<Al with runs counted
    over zero-HISTORY positions only; already-nonzero positions each
    consume a correction bit.  Returns the remaining end-of-band run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = reader.decode_symbol(act)
            r = sym >> 4
            s = sym & 0x0F
            if s:
                if s != 1:
                    raise ValueError("corrupt JPEG AC refinement symbol")
                s = p1 if reader.bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.bits(r)
                    break  # band tail handled by the EOB branch below
                # s == 0, r == 15: ZRL — skip 16 zero-history positions
            while k <= se:
                if zz[k] != 0:
                    _refine_nonzero(reader, zz, k, p1, m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s and k <= se:
                zz[k] = s
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                _refine_nonzero(reader, zz, k, p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_one_scan(
    payload, data_start, scan_comps, ss, se, ah, al,
    frame, grids, huff, restart_interval, progressive,
):
    """Entropy-decode one scan into the coefficient ``grids``;
    returns the payload offset of the terminating marker."""
    height, width = frame["h"], frame["w"]
    by_id = {c["id"]: c for c in frame["comps"]}
    order = []
    for sc in scan_comps:
        if sc["id"] not in by_id:
            raise ValueError("JPEG scan references unknown component")
        order.append({**by_id[sc["id"]], **sc})
    hmax = frame["hmax"]
    vmax = frame["vmax"]
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    if progressive:
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            kind = "dc_first" if ah == 0 else "dc_refine"
        else:
            if len(order) != 1:
                raise ValueError("progressive AC scan must be single-component")
            kind = "ac_first" if ah == 0 else "ac_refine"
    else:
        if ss != 0 or se != 63:
            raise ValueError("sequential scan must cover the full band")
        kind = "seq"
    for c in order:
        if kind in ("seq", "dc_first") and (0, c["td"]) not in huff:
            raise ValueError("JPEG component references missing DC table")
        if kind in ("seq", "ac_first", "ac_refine") and (1, c["ta"]) not in huff:
            raise ValueError("JPEG component references missing AC table")

    interleaved = len(order) > 1
    if interleaved:
        total_units = mcus_x * mcus_y
    else:
        c = order[0]
        comp_w = -(-width * c["h"] // hmax)
        comp_h = -(-height * c["v"] // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        total_units = bw * bh

    chunks, end_pos = _split_scan(payload, data_start)
    per_chunk = restart_interval if restart_interval else total_units
    unit = 0
    for chunk in chunks:
        if unit >= total_units:
            break
        reader = _BitReader(chunk)
        dc_pred = {c["id"]: 0 for c in order}
        eobrun = 0
        end = min(total_units, unit + per_chunk)
        while unit < end:
            if interleaved:
                my, mx = divmod(unit, mcus_x)
                for c in order:
                    grid = grids[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = grid[my * c["v"] + by, mx * c["h"] + bx]
                            if kind == "seq":
                                dc_pred[c["id"]] = _decode_block_seq(
                                    reader, zz, huff[(0, c["td"])],
                                    huff[(1, c["ta"])], dc_pred[c["id"]],
                                )
                            elif kind == "dc_first":
                                size = reader.decode_symbol(huff[(0, c["td"])])
                                if size > 11:
                                    raise ValueError("corrupt JPEG DC size category")
                                dc_pred[c["id"]] += _extend(reader.bits(size), size)
                                zz[0] = dc_pred[c["id"]] << al
                            else:  # dc_refine
                                if reader.bit():
                                    zz[0] = int(zz[0]) | (1 << al)
            else:
                c = order[0]
                by, bx = divmod(unit, bw)
                zz = grids[c["id"]][by, bx]
                if kind == "seq":
                    dc_pred[c["id"]] = _decode_block_seq(
                        reader, zz, huff[(0, c["td"])],
                        huff[(1, c["ta"])], dc_pred[c["id"]],
                    )
                elif kind == "dc_first":
                    size = reader.decode_symbol(huff[(0, c["td"])])
                    if size > 11:
                        raise ValueError("corrupt JPEG DC size category")
                    dc_pred[c["id"]] += _extend(reader.bits(size), size)
                    zz[0] = dc_pred[c["id"]] << al
                elif kind == "dc_refine":
                    if reader.bit():
                        zz[0] = int(zz[0]) | (1 << al)
                elif kind == "ac_first":
                    eobrun = _decode_block_ac_first(
                        reader, zz, huff[(1, c["ta"])], ss, se, al, eobrun
                    )
                else:  # ac_refine
                    eobrun = _decode_block_ac_refine(
                        reader, zz, huff[(1, c["ta"])], ss, se, al, eobrun
                    )
            unit += 1
    if unit < total_units:
        raise ValueError("truncated JPEG entropy data")
    return end_pos


def _decode_jpeg(payload: bytes) -> Optional[np.ndarray]:
    """JFIF -> HxWxC uint8 (C in {1, 3}), or None for a non-JPEG
    payload.  Decodes baseline sequential (SOF0/SOF1, interleaved or
    per-component scans) AND progressive (SOF2: spectral selection +
    successive approximation, DC and AC initial/refinement scans, EOB
    runs).  Arithmetic coding, 12-bit precision, lossless, and
    hierarchical modes raise ``ValueError`` (the module's PNG
    contract); truncation raises too."""
    if payload[:2] != b"\xff\xd8":
        return None
    qt = {}
    huff = {}
    frame = None
    grids = {}
    restart_interval = 0
    pos = 2
    n = len(payload)
    saw_scan = False
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG (expected marker)")
        while pos + 1 < n and payload[pos + 1] == 0xFF:  # fill bytes
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if pos + 2 + seglen > n:
            raise ValueError("truncated JPEG")
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    table = np.frombuffer(body, np.uint8, 64, i).astype(np.int64)
                    i += 64
                elif pq == 1:
                    table = np.frombuffer(body, ">u2", 64, i).astype(np.int64)
                    i += 128
                else:
                    raise ValueError("bad DQT precision")
                nat = np.zeros(64, np.int64)
                nat[ZIGZAG] = table
                qt[tq] = nat
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                count = sum(bits)
                vals = list(body[i + 17 : i + 17 + count])
                huff[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + count
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if frame is not None:
                raise ValueError("multiple JPEG frames unsupported")
            if len(body) < 6:  # struct.error is not ValueError
                raise ValueError("corrupt JPEG frame header")
            prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * nc:
                raise ValueError("corrupt JPEG frame header (short components)")
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec} (8 only)")
            if height == 0 or width == 0:
                raise ValueError("bad JPEG dimensions")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4) or (
                    hmax % c["h"] or vmax % c["v"]
                ):
                    raise ValueError("unsupported JPEG sampling factors")
            frame = {
                "h": height, "w": width, "comps": comps,
                "hmax": hmax, "vmax": vmax,
                "progressive": marker == 0xC2,
            }
            mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                grids[c["id"]] = np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG mode (arithmetic/lossless/hierarchical); "
                "baseline sequential and progressive only"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("corrupt JPEG DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            if len(body) < 1 or len(body) < 4 + 2 * body[0]:
                raise ValueError("corrupt JPEG scan header (short SOS)")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan_comps.append({"id": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            # spectral-selection / successive-approximation bounds come
            # from the file: validate them (T.81 B.2.3) or a corrupt
            # scan header indexes the 64-coefficient block out of range
            if not (0 <= ss <= se <= 63) or (ahal >> 4) > 13 or (ahal & 0x0F) > 13:
                raise ValueError("corrupt JPEG scan header (bad Ss/Se/Ah/Al)")
            pos = _decode_one_scan(
                payload, pos + 2 + seglen, scan_comps, ss, se,
                ahal >> 4, ahal & 0x0F, frame, grids, huff,
                restart_interval, frame["progressive"],
            )
            saw_scan = True
            continue
        # APPn / COM / DNL / anything else: skip
        pos += 2 + seglen
    if frame is None or not saw_scan:
        raise ValueError("truncated JPEG (no frame/scan)")
    # The entropy reader zero-pads an exhausted chunk (the spec's
    # convention for the <=7 legal pad bits of a FINAL byte), so a
    # stream cut mid-scan can still "complete" every MCU with garbage
    # in the tail.  A structurally complete JPEG always terminates at
    # an EOI marker at the position the segment/scan walk stopped —
    # entropy chunks are de-stuffed, so FF D9 cannot occur inside one.
    # T.81 permits any number of 0xFF fill bytes before a marker, so
    # ... FF FF D9 at EOF is a complete file: skip fills first.
    end = pos
    while end + 2 < n and payload[end] == 0xFF and payload[end + 1] == 0xFF:
        end += 1
    if payload[end : end + 2] != b"\xff\xd9":
        raise ValueError("truncated JPEG (missing EOI)")

    comps = frame["comps"]
    height, width = frame["h"], frame["w"]
    hmax = frame["hmax"]
    vmax = frame["vmax"]
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("JPEG component references missing DQT table")

    # dequantize + IDCT, all blocks of each component at once
    planes = []
    for c in comps:
        zz = grids[c["id"]]
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz
        nat = nat * qt[c["tq"]][np.newaxis, np.newaxis, :]
        by, bx = nat.shape[:2]
        blocks = nat.reshape(by, bx, 8, 8).astype(np.float64)
        pix = np.einsum("ji,byjk,kl->byil", _DCT_M, blocks, _DCT_M) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full resolution (nearest/box, the common choice)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        out = planes[0][:, :, np.newaxis]
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=2)
    else:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
