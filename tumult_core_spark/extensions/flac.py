"""From-scratch FLAC codec — stdlib + NumPy only.

FLAC is the dominant losslessly-compressed audio format in archival /
training corpora; like PNG (zlib) and JPEG (T.81), the format is a
public spec (RFC 9639 / the xiph.org format document) and decodes
with no external library: frames of Rice-coded prediction residuals
under fixed-polynomial or LPC predictors, with optional inter-channel
decorrelation.

Scope:

* decode: every subframe type (CONSTANT, VERBATIM, FIXED orders 0-4,
  LPC orders 1-32), partitioned Rice residuals (both RICE and RICE2
  methods, escaped unencoded partitions), wasted bits, all channel
  assignments (independent 1-8, left-side, right-side, mid-side),
  8-32 bit samples, fixed and variable blocking, CRC-8 frame-header
  and CRC-16 frame verification, and the STREAMINFO MD5 check of the
  fully decoded stream (an in-format integrity oracle computed by the
  ORIGINATING encoder over the raw samples — any decode defect
  surfaces as an MD5 mismatch).
* encode (for fixtures/synthesis): 16-bit mono/stereo, CONSTANT /
  VERBATIM / FIXED 0-2 subframes chosen per block, single-partition
  Rice residuals, selectable stereo decorrelation, correct CRCs and
  STREAMINFO MD5 — every stream it emits is an ordinary FLAC any
  player accepts.

Performance honesty (the JPEG note's sibling): Rice coding is a
per-sample bit-level loop in plain Python — roughly 0.5-2 MB/s of
compressed audio per core; the predictor reconstruction is a serial
recurrence too (each sample depends on the previous outputs).
mapInPandas parallelism across cores makes it usable for
profiling/feature extraction; swap in libFLAC/soundfile behind
``_decode_flac``'s signature for bulk decode.

Reference parity: the reference has no audio codecs; this module
serves the training-data-pipeline surface.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional, Tuple

import numpy as np

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader with byte-position tracking (CRC spans)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0  # bits consumed of current byte

    def eof(self) -> bool:
        return self.bytepos >= len(self.data)

    def read(self, n: int) -> int:
        v = 0
        data = self.data
        while n > 0:
            if self.bytepos >= len(data):
                raise ValueError("truncated FLAC")
            avail = 8 - self.bitpos
            take = min(n, avail)
            byte = data[self.bytepos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if n and v >= (1 << (n - 1)):
            v -= 1 << n
        return v

    def unary(self) -> int:
        """Count 0-bits up to the terminating 1-bit."""
        n = 0
        while True:
            if self.read(1):
                return n
            n += 1

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _read_utf8_coded(bits: _Bits) -> int:
    """UTF-8-style variable-length number (frame/sample index, up to
    36 bits over at most 7 bytes)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad FLAC coded number")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = bits.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad FLAC coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _write_utf8_coded(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    # payload bits: (7 - nbytes) in the lead byte + 6 per continuation
    # byte = 5*nbytes + 1 total, so an nbytes-byte coding holds values
    # < 1 << (5*nbytes + 1) (e.g. 2 bytes -> 11 bits -> < 2048).
    while v >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    body = []
    for _ in range(nbytes - 1):
        body.append(0x80 | (v & 0x3F))
        v >>= 6
    lead_prefix = (0xFF << (8 - nbytes)) & 0xFF
    out = [lead_prefix | v] + body[::-1]
    return bytes(out)


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> List[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide block size")
    out: List[int] = []
    for p in range(nparts):
        count = blocksize >> porder
        if p == 0:
            count -= order
        if count < 0:
            raise ValueError("bad FLAC partition layout")
        param = bits.read(plen)
        if param == escape:
            nbits = bits.read(5)
            if nbits == 0:
                out.extend([0] * count)
            else:
                for _ in range(count):
                    out.append(bits.read_signed(nbits))
        else:
            for _ in range(count):
                q = bits.unary()
                u = (q << param) | bits.read(param)
                out.append(u >> 1 if (u & 1) == 0 else -((u + 1) >> 1))
    return out


def _predict(warmup: List[int], residual: List[int], coeffs: List[int], shift: int) -> List[int]:
    samples = list(warmup)
    order = len(coeffs)
    for r in residual:
        acc = 0
        for i, c in enumerate(coeffs):
            acc += c * samples[-1 - i]
        samples.append(r + (acc >> shift))
    return samples


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> List[int]:
    if bits.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("bad FLAC wasted-bits count")
    if stype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [bits.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warmup = [bits.read_signed(eff) for _ in range(order)]
        residual = _decode_residual(bits, blocksize, order)
        samples = _predict(warmup, residual, FIXED_COEFFS[order], 0)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warmup = [bits.read_signed(eff) for _ in range(order)]
        precision = bits.read(4)
        if precision == 15:
            raise ValueError("invalid FLAC LPC precision")
        precision += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coeffs = [bits.read_signed(precision) for _ in range(order)]
        residual = _decode_residual(bits, blocksize, order)
        samples = _predict(warmup, residual, coeffs, shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


_BLOCKSIZE_TABLE = {
    0x1: 192, 0x2: 576, 0x3: 1152, 0x4: 2304, 0x5: 4608,
    0x8: 256, 0x9: 512, 0xA: 1024, 0xB: 2048, 0xC: 4096,
    0xD: 8192, 0xE: 16384, 0xF: 32768,
}
_RATE_TABLE = {
    0x1: 88200, 0x2: 176400, 0x3: 192000, 0x4: 8000, 0x5: 16000,
    0x6: 22050, 0x7: 24000, 0x8: 32000, 0x9: 44100, 0xA: 48000,
    0xB: 96000,
}
_SAMPLE_SIZE_TABLE = {0x1: 8, 0x2: 12, 0x4: 16, 0x5: 20, 0x6: 24, 0x7: 32}


def _decode_flac(payload: bytes) -> Optional[Tuple[np.ndarray, int, int]]:
    """FLAC -> (int32 samples shaped [n, channels], sample_rate,
    bits_per_sample), or None for a non-FLAC payload.  Verifies frame
    CRC-8/CRC-16 and, when STREAMINFO carries one, the stream MD5 of
    the decoded output; raises ``ValueError`` on corruption or
    reserved/unsupported layouts."""
    if payload[:4] != b"fLaC":
        return None
    pos = 4
    n = len(payload)
    info = None
    while True:
        if pos + 4 > n:
            raise ValueError("truncated FLAC metadata")
        header = payload[pos]
        last = bool(header & 0x80)
        btype = header & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:  # STREAMINFO
            if length < 34:
                raise ValueError("short FLAC STREAMINFO")
            b = _Bits(body)
            b.read(16)  # min blocksize
            b.read(16)  # max blocksize
            b.read(24)  # min framesize
            b.read(24)  # max framesize
            rate = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            md5 = body[18:34]
            info = {
                "rate": rate, "channels": channels, "bps": bps,
                "total": total, "md5": md5,
            }
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")

    channels_out: List[List[int]] = [[] for _ in range(info["channels"])]
    while pos < n:
        frame_start = pos
        bits = _Bits(payload, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        if bits.read(1):
            raise ValueError("bad FLAC frame reserved bit")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        rate_code = bits.read(4)
        chan_code = bits.read(4)
        size_code = bits.read(3)
        if bits.read(1):
            raise ValueError("bad FLAC frame reserved bit")
        _read_utf8_coded(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if rate_code == 0xC:
            bits.read(8)
        elif rate_code in (0xD, 0xE):
            bits.read(16)
        elif rate_code == 0xF:
            raise ValueError("invalid FLAC sample rate code")
        if size_code == 0:
            bps = info["bps"]
        elif size_code == 3:
            raise ValueError("reserved FLAC sample size code")
        else:
            bps = _SAMPLE_SIZE_TABLE[size_code]
        header_end = bits.bytepos  # CRC-8 covers up to here (bit-aligned)
        if bits.bitpos:
            raise ValueError("FLAC frame header not byte-aligned")
        crc8_stored = bits.read(8)
        if _crc8(payload[frame_start:header_end]) != crc8_stored:
            raise ValueError("FLAC frame header CRC mismatch")

        if chan_code <= 7:
            nch = chan_code + 1
            mode = "independent"
        elif chan_code == 8:
            nch, mode = 2, "left_side"
        elif chan_code == 9:
            nch, mode = 2, "right_side"
        elif chan_code == 10:
            nch, mode = 2, "mid_side"
        else:
            raise ValueError("reserved FLAC channel assignment")
        if nch != info["channels"]:
            raise ValueError("FLAC frame channel count differs from STREAMINFO")

        subs = []
        for ch in range(nch):
            ch_bps = bps
            if (mode == "left_side" and ch == 1) or (
                mode == "right_side" and ch == 0
            ) or (mode == "mid_side" and ch == 1):
                ch_bps += 1  # the side channel carries one extra bit
            subs.append(_decode_subframe(bits, blocksize, ch_bps))
        bits.align()
        crc16_end = bits.bytepos
        crc16_stored = bits.read(16)
        if _crc16(payload[frame_start:crc16_end]) != crc16_stored:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = bits.bytepos

        if mode == "independent":
            decoded = subs
        elif mode == "left_side":
            left, side = subs
            decoded = [left, [l - s for l, s in zip(left, side)]]
        elif mode == "right_side":
            side, right = subs
            decoded = [[r + s for s, r in zip(side, right)], right]
        else:  # mid_side
            mid, side = subs
            left = []
            right = []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            decoded = [left, right]
        for ch in range(info["channels"]):
            channels_out[ch].extend(decoded[ch])

    total = info["total"]
    if total and any(len(c) != total for c in channels_out):
        raise ValueError("FLAC decoded sample count differs from STREAMINFO")
    out = np.array(channels_out, dtype=np.int64).T.astype(np.int32, copy=False)
    if info["md5"] != b"\x00" * 16:
        width = (info["bps"] + 7) // 8
        m = hashlib.md5()
        # raw little-endian interleaved samples, exactly what the
        # originating encoder hashed — an in-format decode oracle
        flat = out.reshape(-1)
        if width == 1:
            m.update((flat.astype(np.int8)).tobytes())
        elif width == 2:
            m.update(flat.astype("<i2").tobytes())
        elif width == 3:
            b32 = flat.astype("<i4").tobytes()
            arr = np.frombuffer(b32, dtype=np.uint8).reshape(-1, 4)
            m.update(arr[:, :3].tobytes())
        else:
            m.update(flat.astype("<i4").tobytes())
        if m.digest() != info["md5"]:
            raise ValueError("FLAC stream MD5 mismatch (decode defect or corrupt file)")
    return out, info["rate"], info["bps"]


# ---------------------------------------------------------------------------
# Encoder (fixtures / synthesis)
# ---------------------------------------------------------------------------


class _BitWriterB:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _rice_cost(residual: List[int], param: int) -> int:
    total = 0
    for r in residual:
        u = (r << 1) if r >= 0 else (((-r) << 1) - 1)
        total += (u >> param) + 1 + param
    return total


def _best_rice_param(residual: List[int]) -> int:
    if not residual:
        return 0
    best, best_cost = 0, _rice_cost(residual, 0)
    for p in range(1, 15):
        c = _rice_cost(residual, p)
        if c < best_cost:
            best, best_cost = p, c
    return best


def _encode_subframe(w: _BitWriterB, samples: List[int], bps: int) -> None:
    if all(s == samples[0] for s in samples):
        w.write(0, 1)          # pad
        w.write(0, 6)          # CONSTANT
        w.write(0, 1)          # no wasted bits
        w.write(samples[0], bps)
        return
    # pick the fixed order 0-2 with the smallest residual magnitude
    best_order, best_res, best_sum = None, None, None
    for order in (0, 1, 2):
        if len(samples) <= order:
            continue
        coeffs = FIXED_COEFFS[order]
        res = []
        for i in range(order, len(samples)):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
            res.append(samples[i] - pred)
        s = sum(abs(r) for r in res)
        if best_sum is None or s < best_sum:
            best_order, best_res, best_sum = order, res, s
    # verbatim fallback when residuals don't help (dense noise)
    param = _best_rice_param(best_res)
    rice_bits = best_order * bps + 2 + 4 + 4 + _rice_cost(best_res, param)
    if rice_bits >= len(samples) * bps:
        w.write(0, 1)
        w.write(1, 6)          # VERBATIM
        w.write(0, 1)
        for s in samples:
            w.write(s, bps)
        return
    w.write(0, 1)
    w.write(8 + best_order, 6)  # FIXED order
    w.write(0, 1)
    for s in samples[:best_order]:
        w.write(s, bps)
    w.write(0, 2)               # residual method: RICE (4-bit params)
    w.write(0, 4)               # partition order 0
    w.write(param, 4)
    for r in best_res:
        u = (r << 1) if r >= 0 else (((-r) << 1) - 1)
        w.write_unary(u >> param)
        w.write(u, param)


def _encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    block_size: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """int16 samples shaped [n] or [n, channels] -> FLAC bytes.
    ``stereo_mode`` (2-channel input only): ``independent``,
    ``left_side``, ``right_side``, or ``mid_side`` — each emits the
    corresponding channel assignment so decoders exercise every
    decorrelation path."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, np.newaxis]
    if arr.dtype != np.int16 or arr.ndim != 2:
        raise ValueError("expected int16 [n] or [n, channels] samples")
    nsamples, channels = arr.shape
    if nsamples == 0 or channels == 0 or channels > 8:
        raise ValueError("bad sample shape")
    if stereo_mode != "independent" and channels != 2:
        raise ValueError("stereo_mode requires 2 channels")
    bps = 16

    md5 = hashlib.md5(arr.astype("<i2").tobytes()).digest()
    out = bytearray(b"fLaC")
    si = _BitWriterB()
    nb = min(block_size, nsamples)
    si.write(nb, 16)
    si.write(min(block_size, max(nsamples, 16)), 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(nsamples, 36)
    streaminfo = si.bytes() + md5
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    frame_no = 0
    for start in range(0, nsamples, block_size):
        block = arr[start : start + block_size]
        blocksize = block.shape[0]
        w = _BitWriterB()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)          # fixed blocksize strategy
        w.write(7, 4)          # blocksize as 16-bit value-1 field
        w.write(0, 4)          # sample rate from STREAMINFO
        chan_code = {
            "independent": channels - 1,
            "left_side": 8,
            "right_side": 9,
            "mid_side": 10,
        }[stereo_mode]
        w.write(chan_code, 4)
        w.write(4, 3)          # 16-bit samples
        w.write(0, 1)
        header = bytearray(w.bytes())
        header += _write_utf8_coded(frame_no)
        header += struct.pack(">H", blocksize - 1)
        header.append(_crc8(bytes(header)))

        body = _BitWriterB()
        cols = [block[:, c].astype(int).tolist() for c in range(channels)]
        if stereo_mode == "independent":
            chans = [(col, bps) for col in cols]
        else:
            left, right = cols
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left_side":
                chans = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                chans = [(side, bps + 1), (right, bps)]
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                chans = [(mid, bps), (side, bps + 1)]
        for col, ch_bps in chans:
            _encode_subframe(body, col, ch_bps)
        body.align()
        frame = bytes(header) + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
