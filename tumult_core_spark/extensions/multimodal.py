"""Multimodal (image / audio / video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata; all
per-item processing (decode, feature extraction, resize, frame
sampling) runs as Arrow-batched ``mapInPandas`` over the binary
column, so the Spark-side contract — schema, partitioning, UDF
signature, batch shape — is identical whatever the decoder.

Decoders are REAL for every format expressible with stdlib + NumPy —
uncompressed PPM (P6) / PGM (P5) images, uncompressed BI_RGB BMP
(24/32-bit), baseline PNG (8-bit gray/RGB/palette/alpha, zlib inflate
+ NumPy scanline unfiltering — DEFLATE ships in the stdlib, so PNG
needs no external codec), sequential AND progressive JFIF/JPEG
(from-scratch Huffman + IDCT per the public ITU-T T.81 spec — see
:mod:`tumult_core_spark.extensions.jpeg`; grayscale/YCbCr, 4:4:4 /
4:2:2 / 4:2:0, restart markers, SOF2 spectral selection + successive
approximation), GIF87a/89a (from-scratch LZW with interlacing and
local/global color tables; first frame of animations), baseline TIFF
(strip-organized, uncompressed / TIFF-LZW / PackBits, predictor,
gray/RGB/RGBA/palette, both byte orders), 8/16-bit PCM
WAV audio, lossless FLAC audio
(from-scratch Rice + fixed/LPC predictor decoder with CRC and stream
MD5 verification — see :mod:`tumult_core_spark.extensions.flac`),
uncompressed YUV4MPEG2 (.y4m) video, and AVI/MJPEG video (one JFIF
per ``00dc`` chunk, decoded by the same JPEG machinery).  The
remaining formats (MP3/MP4/WebP/VP9/H.264...) need Pillow/ffmpeg,
which are NOT available in this environment; per the ``decoder``
mode they either fall back to a deterministic sha256-seeded stub
(``"auto"``, default — keeps pipelines runnable end-to-end) or raise
``NotImplementedError`` at the exact point a real codec would slot in
(``"real"``).  ``"fake"`` forces the stub for every payload.
Swapping in full codecs changes only the inner per-batch decode
function, never the Spark plan.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA_FIELDS = [
    T.StructField("media_type", T.StringType(), False),  # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
]

_DECODER_MODES = ("auto", "real", "fake")


def _check_mode(decoder: str) -> None:
    if decoder not in _DECODER_MODES:
        raise ValueError(f"decoder must be one of {_DECODER_MODES}, got {decoder!r}")


def attach_media_metadata(
    df: DataFrame, binary_col: str, media_type: str, mime: Optional[str] = None
) -> DataFrame:
    """Add the typed metadata struct for an opaque media column."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(mime).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


# ---------------------------------------------------------------------------
# Real decoders (pure NumPy, codec-free formats)
# ---------------------------------------------------------------------------


def _decode_pnm(payload: bytes) -> Optional[np.ndarray]:
    """Binary PPM (P6) / PGM (P5) -> HxWxC uint8 array, or None."""
    if payload[:2] not in (b"P6", b"P5"):
        return None
    channels = 3 if payload[:2] == b"P6" else 1
    # header: magic, width, height, maxval as whitespace-separated
    # tokens with '#' comments; pixel data starts after the single
    # whitespace byte following maxval
    pos, fields = 2, []
    n = len(payload)
    while len(fields) < 3 and pos < n:
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            while pos < n and payload[pos] not in b"\r\n":
                pos += 1
        elif c in b"0123456789":
            # byte-wise ASCII check: chr(c).isdigit() is True for
            # non-ASCII Unicode digits (e.g. 0xB2 '²'), which int()
            # then rejects
            start = pos
            while pos < n and payload[pos] in b"0123456789":
                pos += 1
            fields.append(int(payload[start:pos]))
        else:
            return None
    if len(fields) < 3 or pos >= n:
        return None
    width, height, maxval = fields
    if not (0 < width and 0 < height and 0 < maxval < 256):
        return None
    pos += 1  # the single whitespace after maxval
    need = width * height * channels
    data = payload[pos : pos + need]
    if len(data) < need:
        return None
    img = np.frombuffer(data, dtype=np.uint8).reshape(height, width, channels)
    if maxval != 255:
        # rescale to full 8-bit range (maxval 15 means 15 = white): raw
        # samples would otherwise profile ~255/maxval times too dark in
        # image_stats / feature extraction with no error
        img = (
            (img.astype(np.uint32) * 255 + maxval // 2) // maxval
        ).astype(np.uint8)
    return img


_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(data: bytes, min_code_size: int, expected: int) -> List[int]:
    """GIF-variant LZW (LSB-first codes, 12-bit max, clear/end codes)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict = {i: (i,) for i in range(clear)}
    next_code = end + 1
    out: List[int] = []
    prev: Optional[tuple] = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < expected:
        v = 0
        for i in range(code_size):
            v |= ((data[bitpos >> 3] >> (bitpos & 7)) & 1) << i
            bitpos += 1
        if v == clear:
            table = {i: (i,) for i in range(clear)}
            code_size = min_code_size + 1
            next_code = end + 1
            prev = None
            continue
        if v == end:
            break
        if prev is None:
            entry = table.get(v)
            if entry is None:
                raise ValueError("bad GIF LZW start code")
        else:
            if v in table:
                entry = table[v]
            elif v == next_code:
                entry = prev + (prev[0],)
            else:
                raise ValueError("bad GIF LZW code")
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code >= (1 << code_size) and code_size < 12:
                code_size += 1
        out.extend(entry)
        prev = entry
    if len(out) < expected:
        raise ValueError("truncated GIF pixel data")
    return out[:expected]


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(height: int) -> List[int]:
    order = []
    for start, step in _GIF_INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


def _decode_gif(payload: bytes) -> Optional[np.ndarray]:
    """GIF87a/89a -> HxWx3 uint8 (first frame), or None for non-GIF.

    REAL decode via from-scratch LZW (the GIF variant: LSB-first
    variable-width codes, 12-bit cap, clear/end codes — public spec).
    Global and local color tables, interlacing, and extension-block
    skipping are handled; animation renders as its first frame (the
    standard profile-a-corpus behavior); transparency is ignored for
    stats purposes."""
    if payload[:6] not in _GIF_MAGICS:
        return None
    if len(payload) < 13:
        raise ValueError("truncated GIF")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF color table")
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(-1, 3)
        pos += 3 * n
    data_len = len(payload)
    while pos < data_len:
        block = payload[pos]
        if block == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < data_len and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor (first frame wins)
            if pos + 10 > data_len:
                raise ValueError("truncated GIF image descriptor")
            _left, _top, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
            iflags = payload[pos + 9]
            pos += 10
            palette = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                if pos + 3 * n > data_len:
                    raise ValueError("truncated GIF color table")
                palette = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(-1, 3)
                pos += 3 * n
            if palette is None:
                raise ValueError("GIF image without color table")
            if iw == 0 or ih == 0:
                raise ValueError("bad GIF dimensions")
            if pos >= data_len:
                raise ValueError("truncated GIF (no LZW code size)")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError("bad GIF LZW minimum code size")
            lzw = bytearray()
            while pos < data_len and payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            # structural completeness, as PNG requires IEND and JPEG
            # EOI: the sub-block chain must end at an explicit 0
            # terminator, and the byte after it must open a VALID next
            # block — the 0x3B trailer, another image (animation), or
            # an extension — so a file cut inside or right after the
            # image data is truncated even when every pixel happened to
            # survive, while animated GIFs (first frame returned) pass
            if pos >= data_len:
                raise ValueError("truncated GIF (unterminated image data)")
            pos += 1
            if pos >= data_len or payload[pos] not in (0x21, 0x2C, 0x3B):
                raise ValueError("truncated GIF (missing trailer)")
            indices = _gif_lzw_decode(bytes(lzw), min_code, iw * ih)
            idx = np.array(indices, dtype=np.int64).reshape(ih, iw)
            idx = np.minimum(idx, len(palette) - 1)
            img = palette[idx]
            if iflags & 0x40:  # interlaced: rows arrive in pass order
                out = np.zeros_like(img)
                out[_gif_interlace_order(ih)] = img
                img = out
            return img
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    raise ValueError("GIF with no image data")


def _encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlaced: bool = False
) -> bytes:
    """Index array [h, w] + palette [n, 3] -> GIF89a bytes, for
    fixtures/tests.  Emits a literal-only LZW stream (each pixel as
    its own code, clear codes keeping the width fixed) — larger than a
    real compressor's output but a perfectly valid stream every
    decoder accepts."""
    h, w = indices.shape
    npal = len(palette)
    if npal < 2 or npal > 256:
        raise ValueError("palette must have 2-256 entries")
    bits = max(2, (npal - 1).bit_length())
    size_field = bits - 1
    table_n = 1 << bits
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[:npal] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | size_field, 0, 0])
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlaced else 0])
    min_code = bits
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    out.append(min_code)
    rows = indices[_gif_interlace_order(h)] if interlaced else indices
    flat = rows.reshape(-1).tolist()
    acc = 0
    nbits = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # LSB-first packing
        nbits += code_size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    literals = 0
    for v in flat:
        # each literal grows the decoder's table; clear before the
        # table would force a wider code
        if end + 1 + literals >= (1 << code_size) - 1:
            emit(clear)
            literals = 0
        emit(int(v))
        literals += 1
    emit(end)
    if nbits:
        stream.append(acc & 0xFF)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (MSB-first codes, 12-bit cap, EarlyChange=1:
    the code width bumps one code EARLIER than GIF's variant)."""
    clear, end = 256, 257
    code_size = 9
    table: dict = {}
    next_code = 258
    out = bytearray()
    prev: Optional[bytes] = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < expected:
        v = 0
        for _ in range(code_size):
            v = (v << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        if v == clear:
            table = {}
            code_size = 9
            next_code = 258
            prev = None
            continue
        if v == end:
            break
        if prev is None:
            if v >= 256:
                raise ValueError("bad TIFF LZW start code")
            entry = bytes([v])
        else:
            if v < 256:
                entry = bytes([v])
            elif v in table:
                entry = table[v]
            elif v == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError("bad TIFF LZW code")
            table[next_code] = prev + entry[:1]
            next_code += 1
            # EarlyChange: widen when ONE code of headroom remains
            if next_code + 1 >= (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise ValueError("truncated TIFF LZW data")
    return bytes(out[:expected])


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773)."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and len(out) < expected:
        h = data[pos]
        pos += 1
        if h < 128:  # literal run of h+1 bytes
            out += data[pos : pos + h + 1]
            pos += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if pos >= n:
                break
            out += bytes([data[pos]]) * (257 - h)
            pos += 1
        # h == 128: no-op
    if len(out) < expected:
        raise ValueError("truncated TIFF PackBits data")
    return bytes(out[:expected])


def _decode_tiff(payload: bytes) -> Optional[np.ndarray]:
    """Baseline TIFF -> HxWxC uint8 (first IFD), or None for non-TIFF.

    REAL decode per the public TIFF 6.0 spec: both byte orders (II/MM),
    strip-organized images, compression 1 (none), 5 (LZW with the
    TIFF code variant + horizontal differencing predictor), and 32773
    (PackBits); 8-bit grayscale, RGB, RGBA, and palette-color.  Tiled,
    JPEG-in-TIFF, CCITT, and 16-bit variants raise ``ValueError``
    (auto mode stubs them — same contract as PNG/JPEG)."""
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        return None

    def u16(off):
        if off + 2 > len(payload):  # struct.error is not ValueError:
            raise ValueError("truncated TIFF")  # keep the decode contract
        return struct.unpack_from(bo + "H", payload, off)[0]

    def u32(off):
        if off + 4 > len(payload):
            raise ValueError("truncated TIFF")
        return struct.unpack_from(bo + "I", payload, off)[0]

    ifd = u32(4)
    if ifd + 2 > len(payload):
        raise ValueError("truncated TIFF")
    count = u16(ifd)
    tags = {}
    type_sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    for i in range(count):
        e = ifd + 2 + 12 * i
        if e + 12 > len(payload):
            raise ValueError("truncated TIFF IFD")
        tag = u16(e)
        ttype = u16(e + 2)
        n = u32(e + 4)
        # Skip value types the consumed tags never use (ASCII,
        # RATIONAL, unknown) and empty tags: materializing a
        # placeholder list of a corrupt 32-bit count would allocate
        # gigabytes, and an empty list would crash the `[0]` defaults.
        if ttype not in (1, 3, 4) or n == 0:
            continue
        size = type_sizes[ttype] * n
        off = e + 8 if size <= 4 else u32(e + 8)
        if off + size > len(payload):
            raise ValueError("truncated TIFF value data")
        vals = []
        for k in range(n):
            if ttype == 3:
                vals.append(u16(off + 2 * k))
            elif ttype == 4:
                vals.append(u32(off + 4 * k))
            else:  # ttype == 1
                vals.append(payload[off + k])
        tags[tag] = vals
    width = tags.get(256, [0])[0]
    height = tags.get(257, [0])[0]
    bits = tags.get(258, [8])
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    strip_offsets = tags.get(273)
    samples = tags.get(277, [len(bits)])[0]
    rows_per_strip = tags.get(278, [height])[0]
    strip_counts = tags.get(279)
    predictor = tags.get(317, [1])[0]
    palette = tags.get(320)
    if width <= 0 or height <= 0 or not strip_offsets:
        raise ValueError("bad TIFF geometry")
    if any(b != 8 for b in bits):
        raise ValueError("unsupported TIFF bit depth (8 only)")
    if compression not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if tags.get(322):  # TileWidth
        raise ValueError("tiled TIFF unsupported (strips only)")
    if samples not in (1, 3, 4):
        raise ValueError(f"unsupported TIFF sample count {samples}")
    if strip_counts is None:
        strip_counts = [len(payload) - o for o in strip_offsets]

    row_bytes = width * samples
    raw = bytearray()
    row0 = 0
    for si, (off, cnt) in enumerate(zip(strip_offsets, strip_counts)):
        nrows = min(rows_per_strip, height - row0)
        if nrows <= 0:
            break
        expected = nrows * row_bytes
        chunk = payload[off : off + cnt]
        if compression == 1:
            if len(chunk) < expected:
                raise ValueError("truncated TIFF strip")
            raw += chunk[:expected]
        elif compression == 5:
            raw += _tiff_lzw_decode(chunk, expected)
        else:
            raw += _packbits_decode(chunk, expected)
        row0 += nrows
    if len(raw) < height * row_bytes:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")
    img = np.frombuffer(bytes(raw), np.uint8, height * row_bytes).reshape(
        height, width, samples
    )
    if predictor == 2:  # horizontal differencing: per-sample prefix sum
        img = np.cumsum(img.astype(np.uint64), axis=1, dtype=np.uint64)
        img = (img & 0xFF).astype(np.uint8)
    if photometric == 3:  # palette-color: 16-bit TIFF colormap, R then G then B
        if not palette or samples != 1:
            raise ValueError("bad TIFF palette image")
        ncol = len(palette) // 3
        cmap = (np.array(palette, np.uint32).reshape(3, ncol).T // 257).astype(np.uint8)
        img = cmap[np.minimum(img[:, :, 0], ncol - 1)]
    elif photometric == 0:  # WhiteIsZero: invert to the usual polarity
        img = 255 - img
    return img


def _encode_tiff(
    img: np.ndarray, compression: int = 1, predictor: bool = False
) -> bytes:
    """uint8 HxW[xC] -> little-endian single-strip TIFF (compression
    1=none, 5=LZW, 32773=PackBits), for fixtures/tests."""
    if img.ndim == 2:
        img = img[:, :, np.newaxis]
    h, w, c = img.shape
    data = img
    if predictor:
        first = data[:, :1, :].astype(np.int16)
        diff = np.diff(data.astype(np.int16), axis=1)
        data = np.concatenate([first, diff], axis=1).astype(np.uint8)
    flat = data.tobytes()
    if compression == 5:
        # literal-only TIFF LZW with EarlyChange-aware clear codes
        out_bits = bytearray()
        acc = 0
        nbits = 0
        code_size = 9

        def emit(code):
            nonlocal acc, nbits
            acc = (acc << code_size) | code
            nbits += code_size
            while nbits >= 8:
                out_bits.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8
                acc &= (1 << nbits) - 1

        emit(256)
        lits = 0
        for b in flat:
            if 258 + lits + 1 >= (1 << code_size) - 1:
                emit(256)
                lits = 0
            emit(b)
            lits += 1
        emit(257)
        if nbits:
            out_bits.append((acc << (8 - nbits)) & 0xFF)
        strip = bytes(out_bits)
    elif compression == 32773:
        strip = bytearray()
        for row in data.reshape(h, w * c):
            rb = row.tobytes()
            i = 0
            while i < len(rb):
                run = 1
                while i + run < len(rb) and run < 128 and rb[i + run] == rb[i]:
                    run += 1
                if run >= 2:
                    strip += bytes([257 - run, rb[i]])
                    i += run
                else:
                    j = i + 1
                    while (
                        j < len(rb) and j - i < 128
                        and not (j + 1 < len(rb) and rb[j] == rb[j + 1])
                    ):
                        j += 1
                    strip += bytes([j - i - 1]) + rb[i:j]
                    i = j
        strip = bytes(strip)
    else:
        strip = flat

    header_size = 8
    strip_off = header_size
    ifd_off = strip_off + len(strip) + (len(strip) & 1)
    photometric = 1 if c == 1 else 2
    entries = [
        (256, 3, 1, w), (257, 3, 1, h),
        (259, 3, 1, compression), (262, 3, 1, photometric),
        (273, 4, 1, strip_off), (277, 3, 1, c),
        (278, 3, 1, h), (279, 4, 1, len(strip)),
    ]
    bits_extra = b""
    if c == 1:
        entries.insert(2, (258, 3, 1, 8))
    else:
        # BitsPerSample needs c shorts -> store out-of-line after the IFD
        bits_off = ifd_off + 2 + 12 * (len(entries) + 1 + (1 if predictor else 0)) + 4
        entries.insert(2, (258, 3, c, bits_off))
        bits_extra = struct.pack(f"<{c}H", *([8] * c))
    if predictor:
        entries.append((317, 3, 1, 2))
    entries.sort()
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += strip
    if len(strip) & 1:
        out += b"\x00"
    out += struct.pack("<H", len(entries))
    for tag, ttype, n, val in entries:
        out += struct.pack("<HHI", tag, ttype, n)
        if ttype == 3 and n == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # next IFD
    out += bits_extra
    return bytes(out)


def _decode_bmp(payload: bytes) -> Optional[np.ndarray]:
    """Uncompressed (BI_RGB) 24/32-bit BMP -> HxWx3 uint8, or None."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        return None
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3  # rows pad to 4 bytes
    need = stride * height
    if len(payload) < data_offset + need:
        return None
    raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=data_offset)
    rows = raw.reshape(height, stride)[:, : width * bytes_pp]
    img = rows.reshape(height, width, bytes_pp)[:, :, :3][:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/
    Paeth).  ``raw`` is the inflated stream of ``height`` rows of
    ``1 + stride`` bytes; ``bpp`` is the filter unit (bytes per pixel,
    min 1).  Rows decode sequentially (each filter references the row
    above); None/Up are fully vectorized and Sub is a per-lane cumsum
    (measured ~100-530 MB/s per core on 512x512 RGB), while
    Average/Paeth are true per-byte recurrences (cur[x] needs the
    DECODED cur[x-bpp]) run as Python list loops — ~3-6 MB/s per core.
    Across a 32-core executor that is ~100-200 MB/s of Paeth-heavy PNG,
    adequate for feature/stats extraction; swap Pillow into
    ``_decode_image_real`` if a deployment needs bulk re-encoding.
    (Measured alternatives, both rejected: vectorizing across the bpp
    lanes with per-pixel numpy ops runs ~10x SLOWER — numpy dispatch
    overhead dwarfs 3-element math — and precomputing the
    prev-row-only Paeth terms |b-c| and b-2c vectorized buys only
    ~13%; the a-dependency chain is inherently serial.)"""
    rows = raw.reshape(height, 1 + stride)
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(rows[y, 0])
        line = rows[y, 1:]
        if ftype == 0:  # None — vectorized
            cur = line.copy()
        elif ftype == 1:  # Sub — per-lane prefix sum mod 256, vectorized
            lanes = line.reshape(-1, bpp).astype(np.uint64)
            cur = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up — vectorized
            cur = line + prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average — sequential in x; Python lists beat
            # numpy scalar indexing ~10x in this inner loop
            lp = line.tolist()
            pv = prev.tolist()
            cl = [0] * stride
            for x in range(stride):
                left = cl[x - bpp] if x >= bpp else 0
                cl[x] = (lp[x] + ((left + pv[x]) >> 1)) & 0xFF
            cur = np.array(cl, dtype=np.uint8)
        elif ftype == 4:  # Paeth — sequential in x
            lp = line.tolist()
            pv = prev.tolist()
            cl = [0] * stride
            for x in range(stride):
                a = cl[x - bpp] if x >= bpp else 0
                b = pv[x]
                c = pv[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cl[x] = (lp[x] + pred) & 0xFF
            cur = np.array(cl, dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out


def _decode_png(payload: bytes) -> Optional[np.ndarray]:
    """Baseline PNG -> HxWxC uint8 array, or None for a non-PNG.

    REAL decode via stdlib zlib + NumPy unfiltering (PNG is DEFLATE
    plus per-scanline prediction filters — no external codec needed;
    format per the public W3C PNG spec / RFC 2083).  Supports the
    baseline everything-writes profile: bit depth 8, color types 0
    (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
    non-interlaced.  16-bit and Adam7-interlaced images raise (callers
    in ``auto`` mode fall back to the stub; ``real`` mode propagates).
    """
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        return None
    import zlib

    pos = len(_PNG_SIG)
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    saw_iend = False
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        # validate the declared length against the payload BEFORE
        # slicing: a truncated/corrupt file with an oversized length
        # would otherwise yield a short body and fail IHDR parsing
        # with struct.error instead of this module's ValueError
        # contract.
        if pos + 12 + length > n:
            raise ValueError("truncated PNG")
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            if len(body) != 13:  # struct.error is not ValueError
                raise ValueError("corrupt PNG IHDR length")
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            saw_iend = True
            break
        pos += 12 + length  # length + type + body + crc
    if width is None or not idat:
        raise ValueError("truncated PNG")
    # A file cut between the last IDAT and IEND still carries complete
    # pixel data, but it IS truncated: require the spec-mandated IEND
    # terminator so the truncation contract is uniform across codecs
    # (JPEG requires its EOI the same way).
    if not saw_iend:
        raise ValueError("truncated PNG (missing IEND)")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (8 only)")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG unsupported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"bad PNG color type {color_type}")
    try:
        inflated = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # zlib.error is not a ValueError
        raise ValueError(f"corrupt PNG deflate stream: {exc}") from exc
    raw = np.frombuffer(inflated, dtype=np.uint8)
    stride = width * channels
    if raw.size != height * (1 + stride):
        raise ValueError("PNG pixel data size mismatch")
    img = _png_unfilter(raw, height, stride, channels).reshape(
        height, width, channels
    )
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        # clamp out-of-range indices (corrupt palette PNGs) like the
        # GIF/TIFF decoders do — a raw IndexError would violate the
        # module's ValueError corrupt-file contract
        img = palette[np.minimum(img[:, :, 0], len(palette) - 1)]
    return img


def _decode_image_real(payload: bytes) -> Optional[np.ndarray]:
    """Decode codec-free formats; None means 'needs a real codec'."""
    if payload[:1] == b"P":
        return _decode_pnm(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import _decode_jpeg

        return _decode_jpeg(payload)
    if payload[:6] in _GIF_MAGICS:
        return _decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff(payload)
    return _decode_bmp(payload)


def _try_decode(fn, payload: bytes, decoder: str):
    """Run a real decoder under the mode contract: in ``auto`` mode a
    malformed payload (header-parse crash included) falls back to the
    stub instead of failing the executor task; in ``real`` mode the
    parse error propagates."""
    if decoder == "fake":
        return None
    try:
        return fn(payload)
    except Exception:
        if decoder == "auto":
            return None
        raise


def _decode_y4m(payload: bytes) -> Optional[List[np.ndarray]]:
    """Uncompressed YUV4MPEG2 -> list of HxW uint8 luma (Y) planes.

    Y4M is the codec-free raw video interchange format (the input
    format of every encoder test suite): a plain-text stream header
    ``YUV4MPEG2 W<w> H<h> ...`` then per-frame ``FRAME\\n`` markers
    followed by raw planar YUV.  4:2:0 / 4:2:2 / 4:4:4 supported;
    chroma planes are skipped (frames are consumed as grayscale).
    """
    if not payload.startswith(b"YUV4MPEG2"):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    colorspace = b"420"
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok[1:]
    if not w or not h or w <= 0 or h <= 0:
        return None
    if colorspace.startswith(b"420"):
        chroma = (w // 2) * (h // 2) * 2
    elif colorspace.startswith(b"422"):
        chroma = (w // 2) * h * 2
    elif colorspace.startswith(b"444"):
        chroma = w * h * 2
    elif colorspace.startswith(b"mono"):
        chroma = 0
    else:
        return None
    ysize = w * h
    frames: List[np.ndarray] = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            return None
        pos = fnl + 1
        if pos + ysize > n:
            return None
        frames.append(
            np.frombuffer(payload, np.uint8, count=ysize, offset=pos).reshape(h, w)
        )
        pos += ysize + chroma
    return frames or None


def _decode_avi_mjpeg(payload: bytes) -> Optional[List[np.ndarray]]:
    """AVI container with MJPEG frames -> list of HxW uint8 grayscale
    frames, or None for a non-AVI payload.

    MJPEG ("a JPEG per frame") is the one compressed video codec this
    module can decode for real, because each ``00dc`` chunk is an
    ordinary JFIF image handled by :mod:`.jpeg`.  The RIFF walk is
    lenient: it scans for the ``movi`` LIST and decodes every
    ``..dc``/``..db`` chunk whose body starts with the JPEG SOI
    marker; color frames collapse to luma-mean grayscale (the frame
    consumers here emit P5)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    from .jpeg import _decode_jpeg

    n = len(payload)
    frames: List[np.ndarray] = []

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if cid == b"LIST":
                ltype = payload[body_start : body_start + 4]
                if ltype in (b"movi", b"hdrl", b"rec "):
                    walk(body_start + 4, body_end)
            elif cid[2:4] in (b"dc", b"db"):
                body = payload[body_start:body_end]
                if body[:2] == b"\xff\xd8":
                    img = _decode_jpeg(body)
                    if img is None:
                        raise ValueError("bad MJPEG frame")
                    if img.shape[2] == 1:
                        frames.append(img[:, :, 0])
                    else:
                        frames.append(
                            np.clip(
                                np.round(img.astype(np.float64).mean(axis=2)), 0, 255
                            ).astype(np.uint8)
                        )
            pos = body_start + size + (size & 1)  # chunks pad to even

    walk(12, n)
    if not frames:
        raise ValueError("AVI without decodable MJPEG frames")
    return frames


def _avi_chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _encode_avi_mjpeg(
    jpeg_frames: List[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG payloads -> a minimal valid AVI/MJPEG container (for
    fixtures/tests; ordinary players accept it)."""
    if not jpeg_frames:
        raise ValueError("no frames")
    nframes = len(jpeg_frames)
    maxsz = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, maxsz * fps, 0, 0x10, nframes, 0, 1, maxsz,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, nframes, maxsz, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    strl = b"strl" + _avi_chunk(b"strh", strh) + _avi_chunk(b"strf", strf)
    hdrl = (
        b"hdrl" + _avi_chunk(b"avih", avih)
        + b"LIST" + struct.pack("<I", len(strl)) + strl
    )
    movi = b"movi" + b"".join(_avi_chunk(b"00dc", f) for f in jpeg_frames)
    riff_body = (
        b"AVI "
        + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + struct.pack("<I", len(movi)) + movi
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _decode_video_frames(payload: bytes) -> Optional[List[np.ndarray]]:
    """Decode codec-free video formats to grayscale frame planes;
    None means 'needs ffmpeg'.  Y4M (raw planar YUV) and AVI/MJPEG
    (per-frame JFIF via the from-scratch :mod:`.jpeg` decoder) both
    decode for real."""
    frames = _decode_y4m(payload)
    if frames is not None:
        return frames
    return _decode_avi_mjpeg(payload)


def _decode_wav(payload: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """8/16-bit PCM WAV -> (float64 mono samples in [-1, 1], rate).

    Structural strictness (same contract as the image codecs, r14): a
    chunk whose declared size runs past the payload is truncation and
    raises ValueError — a cut-off crawl artifact must surface as
    corrupt, not decode as silently-shortened audio."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE" or len(payload) < 44:
        return None
    pos, n = 12, len(payload)
    rate = channels = bits = None
    samples = None
    while pos + 8 <= n:
        chunk_id = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > n:
            raise ValueError("truncated WAV chunk")
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            if len(body) < 16:
                return None
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits not in (8, 16) or not channels or not rate:
                return None  # non-PCM needs a real codec
        elif chunk_id == b"data":
            samples = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        return None
    if bits == 16:
        x = np.frombuffer(samples, dtype="<i2")[: len(samples) // 2].astype(np.float64)
        x /= 32768.0
    else:
        x = np.frombuffer(samples, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return x, rate


def _segment_pool(values: np.ndarray, dim: int) -> np.ndarray:
    """Mean over ``dim`` contiguous segments (the codec-free feature
    extractor: a deterministic global-average-pool 'encoder')."""
    if len(values) == 0:
        return np.zeros(dim)
    bounds = np.linspace(0, len(values), dim + 1).astype(np.int64)
    sums = np.add.reduceat(values, bounds[:-1])
    counts = np.maximum(np.diff(bounds), 1)
    return sums / counts


def _unit_norm(v: np.ndarray) -> np.ndarray:
    return (v / max(float(np.linalg.norm(v)), 1e-12)).astype(np.float32)


def _position_checksum(arr: np.ndarray) -> float:
    """Position-weighted pixel mean: mean(p_i * w_i) over the C-order
    flattening, with deterministic pseudo-random weights
    ``w_i = ((i + 1) * 2654435761 mod 1000003) / 1000003``.  Unlike a
    plain mean it is ORDER-SENSITIVE — any pixel permutation a decode
    defect could introduce (block transposition, swapped scanlines,
    channel shuffling) changes the value — so driver oracles that pin
    it catch mean-preserving defects the plain mean cannot.  Pure
    statistic on the array: fixture generators may compute it from the
    a-priori pixels without touching any codec."""
    p = np.asarray(arr, dtype=np.float64).reshape(-1)
    idx = np.arange(1, p.size + 1, dtype=np.int64)
    w = (idx * 2654435761 % 1000003).astype(np.float64) / 1000003.0
    return float((p * w).mean()) if p.size else 0.0


def _fake_stats(payload: bytes):
    """Deterministic stub (width, height, channels, mean_value) from
    the payload hash — :func:`image_stats`'s fake-mode counterpart of
    :func:`_fake_features`."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    width = 1 + seed % 64
    height = 1 + (seed >> 8) % 64
    channels = (1, 3, 4)[(seed >> 16) % 3]
    mean_value = float((seed >> 24) % 25600) / 100.0
    return width, height, channels, mean_value


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic unit-norm pseudo-embedding from the payload hash.

    The norm uses ``math.fsum`` over float64 squares: exactly-rounded
    summation is bit-identical on every CPU, where ``np.linalg.norm``'s
    SIMD dispatch (AVX2 vs AVX-512 lane association) can differ by an
    ulp between machines — enough to flip a round-half-up digit at a
    rounding boundary and break the cross-machine fixture oracle
    (observed r18: 3 of 5000 sf0.1 rows).
    """
    import math

    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    norm = math.sqrt(math.fsum(float(x) * float(x) for x in v))
    return v / max(norm, 1e-12)


def _codec_error(what: str) -> NotImplementedError:
    return NotImplementedError(
        f"real {what} requires codecs (Pillow/ffmpeg) not present in this "
        "environment; PPM/PGM/BMP/baseline-PNG/baseline-JPEG/PCM-WAV/Y4M "
        "decode codec-free — use decoder='auto' to fall back to the "
        "deterministic stub for other formats"
    )


# ---------------------------------------------------------------------------
# Codec swap-in seam
# ---------------------------------------------------------------------------

#: The bulk-decode injection registry.  The from-scratch entropy loops
#: here (jpeg.py:35-42 documents 1-3 MB/s/core honestly) are fine for
#: profiling and sampling but a 100 TB corpus decode wants a library
#: (Pillow / soundfile / pyav).  ``register_codec`` swaps one in
#: WITHOUT touching any operator: every media operator snapshots the
#: registry at plan-build time (driver side) and captures the override
#: into its Arrow-UDF closure, so the swapped decoder ships to
#: executors with the task — a plain module-level monkeypatch would be
#: invisible there, because cloudpickle serializes module functions by
#: reference and each Python worker re-imports the unpatched module.
#: Contract (the seam test in TestMultimodal pins it): an override for
#: ``"image"`` maps payload-bytes -> HxWxC uint8 ndarray or None
#: ("can't decode"); ``"audio"`` maps payload-bytes ->
#: (float64 mono samples in [-1, 1], rate) or None — exactly the
#: signatures of :func:`_decode_image_real` / :func:`_decode_audio_real`.
_CODEC_OVERRIDES: Dict[str, Callable] = {}


def register_codec(kind: str, fn: Callable) -> None:
    """Swap a library decoder in for bulk decode (kind: 'image' or
    'audio').  Affects operators PLANNED after the call; plans already
    built keep the decoder they captured."""
    if kind not in ("image", "audio"):
        raise ValueError(f"kind must be 'image' or 'audio', got {kind!r}")
    if not callable(fn):
        raise TypeError("decoder override must be callable")
    _CODEC_OVERRIDES[kind] = fn


def unregister_codec(kind: str) -> None:
    """Remove an override; the built-in from-scratch decoder resumes."""
    _CODEC_OVERRIDES.pop(kind, None)


def _snapshot_decoder(kind: str, default: Callable) -> Callable:
    """Plan-build-time resolution of the decode callable (see
    :data:`_CODEC_OVERRIDES` for why capture-by-closure is required)."""
    return _CODEC_OVERRIDES.get(kind, default)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def extract_image_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    dim: int = 64,
    decoder: str = "auto",
    fake: Optional[bool] = None,
) -> DataFrame:
    """(id, features array<float>) per image payload.

    Supported payloads (PPM/PGM/BMP/PNG/JPEG/GIF/TIFF) decode for real
    and featurize as unit-normalized mean-pooled grayscale intensity
    over ``dim`` segments.  Undecodable payloads follow the unified
    media-operator mode contract (r14, same as :func:`image_stats`):
    ``auto`` yields NULL features (a curation pipeline filters corrupt
    and unsupported media with one null check), ``real`` raises where a
    missing codec would slot in, ``fake`` returns the deterministic
    sha256-derived stub (never null).  ``fake=True/False`` is the
    legacy spelling of ``decoder="fake"/"real"``.
    """
    decoder = _legacy_mode(decoder, fake)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType(), False), True),
        ]
    )

    # plan-build-time snapshot: ships the (possibly
    # register_codec-overridden) decoder to executors
    decode_image = _snapshot_decoder("image", _decode_image_real)
    def one(payload: bytes) -> Optional[List[float]]:
        img = _try_decode(decode_image, payload, decoder)
        if img is not None:
            # pool over COLOR planes only: averaging the alpha channel
            # in made an opaque RGBA image's features diverge from the
            # identical RGB image (docstring promises grayscale
            # intensity) — slice 2ch -> gray plane, 4ch -> RGB
            ch = img.shape[2]
            color = img[:, :, :1] if ch == 2 else img[:, :, :3] if ch >= 4 else img
            gray = color.mean(axis=2).ravel() / 255.0
            return _unit_norm(_segment_pool(gray, dim)).tolist()
        if decoder == "real":
            raise _codec_error("image decode")
        if decoder == "fake":
            return _fake_features(payload, dim).tolist()
        return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [one(bytes(b) if b is not None else b"") for b in pdf[binary_col]]
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "features": feats})

    return df.select(id_col, binary_col).mapInPandas(run, schema=out_schema)


def _legacy_mode(decoder: str, fake: Optional[bool]) -> str:
    if fake is not None:
        decoder = "fake" if fake else "real"
    _check_mode(decoder)
    return decoder


def resize_images(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    width: int,
    height: int,
    decoder: str = "auto",
    fake: Optional[bool] = None,
) -> DataFrame:
    """(id, resized binary, width, height).

    Supported formats resample for real (nearest-neighbor) and are
    re-emitted as binary PPM (P6), so resized outputs round-trip
    through this module's own decoder.  Undecodable payloads follow
    the unified media-operator mode contract (r14): ``auto`` yields a
    NULL resized payload (and null dimensions), ``real`` raises where
    a missing codec would slot in, ``fake`` emits a deterministic
    payload-hash stub (never null).
    """
    decoder = _legacy_mode(decoder, fake)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("resized", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )

    # plan-build-time snapshot: ships the (possibly
    # register_codec-overridden) decoder to executors
    decode_image = _snapshot_decoder("image", _decode_image_real)
    def one(payload: bytes) -> Optional[bytes]:
        img = _try_decode(decode_image, payload, decoder)
        if img is not None:
            h, w = img.shape[:2]
            rows = (np.arange(height) * h // height).clip(0, h - 1)
            cols = (np.arange(width) * w // width).clip(0, w - 1)
            resized = img[rows][:, cols]
            # collapse to the 3 COLOR planes the P6 header promises:
            # gray+alpha (2ch) and RGBA (4ch) previously serialized
            # their raw buffers after a P6 header — RGBA re-decoded as
            # silently wrong RGB pixels, gray+alpha as a short-body
            # "corrupt" payload
            ch = resized.shape[2]
            if ch == 1:
                resized = np.repeat(resized, 3, axis=2)
            elif ch == 2:  # gray + alpha: replicate the gray plane
                resized = np.repeat(resized[:, :, :1], 3, axis=2)
            elif ch >= 4:  # drop alpha
                resized = resized[:, :, :3]
            header = f"P6\n{width} {height}\n255\n".encode()
            return header + resized.astype(np.uint8).tobytes()
        if decoder == "real":
            raise _codec_error("image resize")
        if decoder == "fake":
            return hashlib.sha256(payload + f"{width}x{height}".encode()).digest()
        return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [one(bytes(b) if b is not None else b"") for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "resized": payloads,
                    "width": [None if p is None else width for p in payloads],
                    "height": [None if p is None else height for p in payloads],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    num_frames: int = 4,
    decoder: str = "auto",
    fake: Optional[bool] = None,
) -> DataFrame:
    """Explode each video payload into ``num_frames`` frame rows:
    (id, frame_index, frame binary).

    Uncompressed YUV4MPEG2 (.y4m) AND AVI/MJPEG payloads decode FOR
    REAL (the latter one JFIF per frame through the from-scratch
    :mod:`.jpeg` decoder): evenly spaced frames are extracted and
    re-emitted as binary PGM (P5), so sampled frames round-trip
    through this module's own image decoder and feature extractor.
    Undecodable payloads (inter-frame-compressed containers like
    MP4/WebM need ffmpeg; corrupt Y4M/AVI) follow the unified
    media-operator mode contract (r14): ``"real"`` raises where the
    missing codec would slot in, ``"auto"`` still emits the
    ``num_frames`` rows (stable per-payload cardinality) but with NULL
    frame payloads, and ``"fake"`` emits deterministic sha-stub frames
    (never null).
    """
    decoder = _legacy_mode(decoder, fake)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def one(payload: bytes) -> List[Optional[bytes]]:
        frames = _try_decode(_decode_video_frames, payload, decoder)
        if frames is not None:
            picks = np.linspace(0, len(frames) - 1, num_frames).round().astype(int)
            out = []
            for i in picks:
                y = frames[int(i)]
                header = f"P5\n{y.shape[1]} {y.shape[0]}\n255\n".encode()
                out.append(header + y.tobytes())
            return out
        if decoder == "real":
            raise _codec_error("video frame sampling")
        if decoder == "fake":
            return [
                hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
                for i in range(num_frames)
            ]
        return [None] * num_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: List[int] = []
            idxs: List[int] = []
            frames: List[bytes] = []
            for rid, b in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(b) if b is not None else b""
                for i, fr in enumerate(one(payload)):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {id_col: ids, "frame_index": idxs, "frame": frames}
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=out_schema)


def _decode_audio_real(payload: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """Decode codec-free audio formats to (float64 mono samples in
    [-1, 1], rate); None means 'needs a real codec'.  PCM WAV and
    FLAC (from-scratch lossless decoder, :mod:`.flac`) both decode
    for real; multi-channel audio mixes down by channel mean."""
    wav = _decode_wav(payload)
    if wav is not None:
        return wav
    if payload[:4] == b"fLaC":
        from .flac import _decode_flac

        decoded = _decode_flac(payload)
        if decoded is not None:
            samples, rate, bps = decoded
            scale = float(1 << (bps - 1))
            mono = samples.astype(np.float64).mean(axis=1) / scale
            return mono, rate
    return None


def _audio_samples_from_bytes(
    seed_bytes: bytes, n_samples: int = 4000, stereo: bool = False
) -> np.ndarray:
    """Deterministic int16 test audio from arbitrary bytes: two
    sha256-derived sine partials plus mild deterministic noise —
    smooth enough that FLAC's fixed predictors engage, noisy enough
    that Rice coding carries real residuals.  Returns [n] mono or
    [n, 2] stereo."""
    seed = int.from_bytes(hashlib.sha256(seed_bytes).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples)
    f1 = 100.0 + seed % 800
    f2 = 900.0 + (seed >> 16) % 2000
    a1 = 6000.0 + (seed >> 8) % 8000
    a2 = 1000.0 + (seed >> 24) % 4000
    x = a1 * np.sin(2 * np.pi * f1 * t / 16000.0) + a2 * np.sin(
        2 * np.pi * f2 * t / 16000.0
    )
    x = x + rng.integers(-64, 64, n_samples)
    left = np.clip(np.round(x), -32768, 32767).astype(np.int16)
    if not stereo:
        return left
    y = 0.6 * a1 * np.sin(2 * np.pi * f1 * t / 16000.0 + 0.5) + rng.integers(
        -64, 64, n_samples
    )
    right = np.clip(np.round(y), -32768, 32767).astype(np.int16)
    return np.stack([left, right], axis=1)


def synthesize_flac_audio(
    df: DataFrame,
    seed_col: str,
    id_col: str,
    n_samples: int = 4000,
    out_col: str = "payload",
) -> DataFrame:
    """(id, payload binary): a valid FLAC stream per row — int16 test
    audio derived deterministically from ``seed_col``'s bytes, encoded
    by the REAL from-scratch encoder (:mod:`.flac`), cycling
    mono/stereo by ``id % 2`` and the stereo decorrelation mode by
    ``id`` (independent / left-side / right-side / mid-side), with a
    1024-sample block size so every stream carries multiple frames
    plus an odd tail block.  FLAC is lossless, so decoded samples
    equal the a-priori synthesis exactly — the driver oracle pins
    features computed from those samples with no codec involved.  The
    WAV/PNG/JPEG siblings follow the same pattern."""
    from .flac import _encode_flac

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(out_col, T.BinaryType(), False),
        ]
    )
    modes = ["independent", "left_side", "right_side", "mid_side"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, s in zip(pdf[id_col], pdf[seed_col]):
                raw = s if isinstance(s, (bytes, bytearray)) else str(s or "").encode("utf-8")
                stereo = bool(int(i) % 2)
                samples = _audio_samples_from_bytes(bytes(raw), n_samples, stereo)
                # odd ids are stereo; (i // 2) % 4 walks all four
                # decorrelation modes across the odd ids
                mode = modes[(int(i) // 2) % 4] if stereo else "independent"
                payloads.append(
                    _encode_flac(samples, 16000, block_size=1024, stereo_mode=mode)
                )
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: payloads})

    return df.select(id_col, seed_col).mapInPandas(run, schema=out_schema)


def audio_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    dim: int = 32,
    decoder: str = "auto",
    fake: Optional[bool] = None,
) -> DataFrame:
    """(id, features array<float>, duration_ms).

    PCM WAV and FLAC decode for real: features are unit-normalized
    per-segment RMS energy over ``dim`` windows and ``duration_ms``
    comes from the sample count and rate.  Undecodable payloads —
    corrupt WAV/FLAC as much as formats needing a real codec
    (mp3/ogg) — follow the unified media-operator mode contract (r14,
    same as :func:`image_stats`): ``auto`` yields NULL features and
    duration so a curation pipeline's null filter drops corrupt audio
    exactly like corrupt images, ``real`` raises, ``fake`` returns the
    deterministic sha-derived stub (hash features, payload length as
    duration; never null).
    """
    decoder = _legacy_mode(decoder, fake)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType(), False), True),
            T.StructField("duration_ms", T.LongType(), True),
        ]
    )

    decode_audio = _snapshot_decoder("audio", _decode_audio_real)
    def one(payload: bytes) -> Tuple[Optional[List[float]], Optional[int]]:
        decoded = _try_decode(decode_audio, payload, decoder)
        if decoded is not None:
            x, rate = decoded
            rms = np.sqrt(_segment_pool(x * x, dim))
            return _unit_norm(rms).tolist(), int(len(x) * 1000 // rate)
        if decoder == "real":
            raise _codec_error("audio decode")
        if decoder == "fake":
            return _fake_features(payload, dim).tolist(), len(payload)
        return None, None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, durs = [], []
            for b in pdf[binary_col]:
                f, d = one(bytes(b) if b is not None else b"")
                feats.append(f)
                durs.append(d)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "features": feats,
                    "duration_ms": durs,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# PNG encoder + codec-validation operators
# ---------------------------------------------------------------------------


def _encode_png(img: np.ndarray, filter_type: int = 4) -> bytes:
    """HxWxC (or HxW) uint8 -> baseline PNG bytes, REAL encode via
    stdlib zlib: forward-filters every scanline with ``filter_type``
    (0=None 1=Sub 2=Up 3=Average 4=Paeth, vectorized per row) then
    deflates.  Gray (C=1), gray+alpha (2), RGB (3) and RGBA (4) map to
    the matching PNG color type; output is readable by any PNG decoder.
    """
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad PNG filter type {filter_type}")
    flat = img.reshape(h, w * ch).astype(np.int32)
    zeros = np.zeros((h, ch), dtype=np.int32)
    left = np.concatenate([zeros, flat[:, :-ch]], axis=1)
    up = np.concatenate([np.zeros((1, w * ch), dtype=np.int32), flat[:-1]], axis=0)
    upleft = np.concatenate([zeros, up[:, :-ch]], axis=1)
    if filter_type == 0:
        filtered = flat
    elif filter_type == 1:
        filtered = flat - left
    elif filter_type == 2:
        filtered = flat - up
    elif filter_type == 3:
        filtered = flat - ((left + up) >> 1)
    else:  # Paeth
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
        filtered = flat - pred
    body = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8),
         (filtered & 0xFF).astype(np.uint8)],
        axis=1,
    ).tobytes()

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return b"".join(
        [_PNG_SIG, chunk(b"IHDR", ihdr), chunk(b"IDAT", zlib.compress(body)),
         chunk(b"IEND", b"")]
    )


def _pixels_from_bytes(
    seed_bytes: bytes, height: int, width: int, channels: int = 3
) -> np.ndarray:
    """Deterministic sha256-seeded uint8 test image from arbitrary
    bytes — shared by :func:`synthesize_png_images` and the oracle
    fixture generator so both sides derive identical pixels."""
    seed = int.from_bytes(hashlib.sha256(seed_bytes).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def synthesize_png_images(
    df: DataFrame,
    seed_col: str,
    id_col: str,
    height: int = 12,
    width: int = 9,
    out_col: str = "payload",
) -> DataFrame:
    """(id, payload binary): a valid baseline-PNG test pattern per row,
    pixels derived deterministically from ``seed_col``'s bytes and
    encoded with the REAL stdlib encoder, cycling the scanline filter
    by ``id % 5`` so a corpus exercises all five filter types.  Use it
    to validate codec plumbing end-to-end (the driver oracle does) or
    to fabricate image corpora for pipeline tests; payloads are
    ordinary PNGs any external tool can open."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(out_col, T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, s in zip(pdf[id_col], pdf[seed_col]):
                raw = s if isinstance(s, (bytes, bytearray)) else str(s or "").encode("utf-8")
                img = _pixels_from_bytes(bytes(raw), height, width)
                payloads.append(_encode_png(img, filter_type=int(i) % 5))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: payloads})

    return df.select(id_col, seed_col).mapInPandas(run, schema=out_schema)


def _block_pixels_from_bytes(
    seed_bytes: bytes, blocks_h: int, blocks_w: int
) -> np.ndarray:
    """Deterministic grayscale test image of constant 8x8 blocks, one
    sha256-derived value per block.  Constant blocks excite only each
    block's DC coefficient, so a quality-100 (all-ones quant tables)
    JPEG round-trip reproduces the pixels EXACTLY — the property the
    independent driver oracle pins (expected stats computable from the
    block values alone, no codec involved)."""
    seed = int.from_bytes(hashlib.sha256(seed_bytes).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, size=(blocks_h, blocks_w), dtype=np.uint8)
    return np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)


def synthesize_jpeg_images(
    df: DataFrame,
    seed_col: str,
    id_col: str,
    blocks_h: int = 2,
    blocks_w: int = 3,
    out_col: str = "payload",
) -> DataFrame:
    """(id, payload binary): a valid JFIF grayscale test image per
    row — constant 8x8 blocks derived deterministically from
    ``seed_col``'s bytes, encoded at quality 100 by the REAL
    from-scratch encoder (:mod:`.jpeg`), cycling restart intervals by
    ``id % 3`` (none / every MCU / every 2 MCUs) and alternating
    sequential/progressive (SOF0/SOF2) by ``id % 2``, so a corpus
    exercises the decoder's RSTn resynchronization AND the progressive
    successive-approximation scan paths.  Constant blocks excite only
    DC coefficients, so quality-100 round-trips are exact in BOTH
    modes (the driver oracle pins this against codec-free a-priori
    pixel stats).  Payloads are ordinary JPEGs any external tool can
    open; the PNG sibling is :func:`synthesize_png_images`."""
    from .jpeg import _encode_jpeg

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(out_col, T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, s in zip(pdf[id_col], pdf[seed_col]):
                raw = s if isinstance(s, (bytes, bytearray)) else str(s or "").encode("utf-8")
                img = _block_pixels_from_bytes(bytes(raw), blocks_h, blocks_w)
                payloads.append(
                    _encode_jpeg(
                        img,
                        quality=100,
                        restart_interval=int(i) % 3,
                        progressive=bool(int(i) % 2),
                    )
                )
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: payloads})

    return df.select(id_col, seed_col).mapInPandas(run, schema=out_schema)


def synthesize_media_payloads(
    df: DataFrame,
    seed_col: str,
    id_col: str,
    out_col: str = "payload",
) -> DataFrame:
    """(id, payload binary): a MIXED-format media corpus in one pass —
    each row becomes a genuine PNG / JPEG / GIF / TIFF (format chosen
    by ``id % 4``), pixels derived deterministically from ``seed_col``
    exactly as the per-format synthesizers do.  Per-format variants
    (PNG filter types, JPEG restart/progressive, GIF interlace, TIFF
    compression/predictor) cycle on ``id // 4`` — NOT on ``id``
    directly, because ``id % 4`` fixes the parity of the ids each
    format sees (JPEG ids would all be odd → always progressive, GIF
    ids all even → never interlaced), which would silently drop whole
    decoder paths from any corpus built here.  Prefer this over
    unioning the four per-format synthesizers when you want every
    format from a single relation: one scan + one Arrow-batched
    ``mapInPandas`` instead of four filtered branches, so the plan has
    no union fan-out and the source is read once — the shape a 100 TB
    synthetic-corpus job needs."""
    from .jpeg import _encode_jpeg

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(out_col, T.BinaryType(), False),
        ]
    )

    def one(i: int, raw: bytes) -> bytes:
        kind = i % 4
        j = i >> 2  # variant selector: full parity/residue range per format
        if kind == 0:
            return _encode_png(_pixels_from_bytes(raw, 12, 9), filter_type=j % 5)
        if kind == 1:
            return _encode_jpeg(
                _block_pixels_from_bytes(raw, 2, 3),
                quality=100,
                restart_interval=j % 3,
                progressive=bool(j % 2),
            )
        if kind == 2:
            idx, palette = _gif_test_image_from_bytes(raw, 16, 21)
            return _encode_gif(idx, palette, interlaced=bool(j % 2))
        px = _pixels_from_bytes(raw, 10, 14)
        comp = (1, 5, 32773)[j % 3]
        return _encode_tiff(px, comp, predictor=comp == 5 and bool(j % 2))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, s in zip(pdf[id_col], pdf[seed_col]):
                raw = s if isinstance(s, (bytes, bytearray)) else str(s or "").encode("utf-8")
                payloads.append(one(int(i), bytes(raw)))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: payloads})

    return df.select(id_col, seed_col).mapInPandas(run, schema=out_schema)


#: (format, media_type, byte offset, magic bytes) — ordered: first hit
#: wins, so more-specific rules (RIFF subtypes, ftyp-at-4) precede
#: catch-alls.  Pure data; the classifier compiles it to Catalyst.
MAGIC_RULES = [
    ("png", "image", 0, b"\x89PNG\r\n\x1a\n"),
    ("jpeg", "image", 0, b"\xff\xd8"),
    ("gif", "image", 0, b"GIF87a"),
    ("gif", "image", 0, b"GIF89a"),
    ("bmp", "image", 0, b"BM"),
    ("tiff", "image", 0, b"II*\x00"),
    ("tiff", "image", 0, b"MM\x00*"),
    ("ppm", "image", 0, b"P6"),
    ("pgm", "image", 0, b"P5"),
    ("flac", "audio", 0, b"fLaC"),
    ("y4m", "video", 0, b"YUV4MPEG2"),
    ("ogg", "audio", 0, b"OggS"),
    ("mp3", "audio", 0, b"ID3"),
    ("mp3", "audio", 0, b"\xff\xfb"),
    ("mp3", "audio", 0, b"\xff\xf3"),
    ("mp3", "audio", 0, b"\xff\xf2"),
    ("mp4", "video", 4, b"ftyp"),
    ("pdf", "document", 0, b"%PDF"),
    ("gzip", "archive", 0, b"\x1f\x8b"),
    ("zip", "archive", 0, b"PK\x03\x04"),
]
#: RIFF containers share a magic; the subtype lives at offset 8
RIFF_RULES = [
    ("wav", "audio", b"WAVE"),
    ("avi", "video", b"AVI "),
    ("webp", "image", b"WEBP"),
]


def detect_media_format(
    df: DataFrame, binary_col: str, out_format: str = "media_format",
    out_type: str = "media_type",
) -> DataFrame:
    """Add (``media_format``, ``media_type``) columns classifying each
    binary payload by magic bytes — the triage step every mixed-media
    crawl runs before routing payloads to decoders.

    Pure Catalyst: each rule is a hex-prefix comparison on a
    ``substring`` of the binary column (JVM-side, whole-stage
    codegen'd, no Python in the plan — pinned by a plan test), so at
    100 TB this runs at scan speed and never shuffles.  Rules cover
    the formats this module decodes plus common corpus contaminants
    (PDF/zip/gzip/ogg/mp3/mp4/webp); unknown payloads classify as
    ``("unknown", "unknown")``."""
    col = F.col(binary_col)

    def prefix_hex(offset: int, magic: bytes):
        return F.hex(F.substring(col, offset + 1, len(magic))) == magic.hex().upper()

    riff = prefix_hex(0, b"RIFF")
    fmt = None
    typ = None
    for name, mtype, sub in RIFF_RULES:
        cond = riff & prefix_hex(8, sub)
        fmt = F.when(cond, F.lit(name)) if fmt is None else fmt.when(cond, F.lit(name))
        typ = F.when(cond, F.lit(mtype)) if typ is None else typ.when(cond, F.lit(mtype))
    for name, mtype, offset, magic in MAGIC_RULES:
        cond = prefix_hex(offset, magic)
        fmt = fmt.when(cond, F.lit(name))
        typ = typ.when(cond, F.lit(mtype))
    return df.withColumn(out_format, fmt.otherwise(F.lit("unknown"))).withColumn(
        out_type, typ.otherwise(F.lit("unknown"))
    )


def _gif_test_image_from_bytes(
    seed_bytes: bytes, height: int = 16, width: int = 21
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic (index array [h, w], palette [n, 3]) from
    arbitrary bytes — the a-priori pixel source for GIF round-trip
    oracles (palette size walks 2..256 across seeds)."""
    seed = int.from_bytes(hashlib.sha256(seed_bytes).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    npal = 2 + seed % 255
    palette = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
    idx = rng.integers(0, npal, size=(height, width))
    return idx, palette


def synthesize_gif_images(
    df: DataFrame,
    seed_col: str,
    id_col: str,
    height: int = 16,
    width: int = 21,
    out_col: str = "payload",
) -> DataFrame:
    """(id, payload binary): a valid GIF89a per row — palette and
    index pixels derived deterministically from ``seed_col``'s bytes
    (palette sizes walk 2..256), LZW-encoded by the REAL from-scratch
    encoder, alternating interlaced/progressive-scan row order by
    ``id % 2``.  GIF is lossless, so decoded pixels equal
    ``palette[idx]`` exactly — the driver oracle pins stats computed
    from those pixels with no codec involved."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(out_col, T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, s in zip(pdf[id_col], pdf[seed_col]):
                raw = s if isinstance(s, (bytes, bytearray)) else str(s or "").encode("utf-8")
                idx, palette = _gif_test_image_from_bytes(bytes(raw), height, width)
                payloads.append(
                    _encode_gif(idx, palette, interlaced=bool(int(i) % 2))
                )
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: payloads})

    return df.select(id_col, seed_col).mapInPandas(run, schema=out_schema)


def synthesize_tiff_images(
    df: DataFrame,
    seed_col: str,
    id_col: str,
    height: int = 10,
    width: int = 14,
    out_col: str = "payload",
) -> DataFrame:
    """(id, payload binary): a valid TIFF per row — RGB pixels derived
    deterministically from ``seed_col``'s bytes, cycling the
    compression scheme by ``id % 3`` (none / LZW / PackBits) and the
    LZW horizontal-differencing predictor by ``id % 2``, so a corpus
    exercises every strip-decode path.  TIFF is lossless, so decoded
    pixels equal the a-priori synthesis exactly — the driver oracle
    pins stats computed from those pixels with no codec involved."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(out_col, T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, s in zip(pdf[id_col], pdf[seed_col]):
                raw = s if isinstance(s, (bytes, bytearray)) else str(s or "").encode("utf-8")
                px = _pixels_from_bytes(bytes(raw), height, width)
                comp = (1, 5, 32773)[int(i) % 3]
                pred = comp == 5 and bool(int(i) % 2)
                payloads.append(_encode_tiff(px, comp, predictor=pred))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: payloads})

    return df.select(id_col, seed_col).mapInPandas(run, schema=out_schema)


def synthesize_mjpeg_videos(
    df: DataFrame,
    seed_col: str,
    id_col: str,
    num_frames: int = 4,
    blocks_h: int = 2,
    blocks_w: int = 3,
    out_col: str = "payload",
) -> DataFrame:
    """(id, payload binary): a valid AVI/MJPEG clip per row —
    ``num_frames`` grayscale constant-block frames derived
    deterministically from ``seed_col``'s bytes (frame f seeded by
    appending f), each encoded as quality-100 JFIF (sequential or
    progressive alternating by id+frame), wrapped in a minimal AVI.
    Constant blocks at quality 100 round-trip exactly, so the driver
    oracle pins per-frame stats computed from the a-priori pixels with
    no codec involved."""
    from .jpeg import _encode_jpeg

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(out_col, T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, s in zip(pdf[id_col], pdf[seed_col]):
                raw = s if isinstance(s, (bytes, bytearray)) else str(s or "").encode("utf-8")
                jpegs = []
                for f in range(num_frames):
                    px = _block_pixels_from_bytes(
                        bytes(raw) + bytes([f]), blocks_h, blocks_w
                    )
                    jpegs.append(
                        _encode_jpeg(
                            px, quality=100, progressive=bool((int(i) + f) % 2)
                        )
                    )
                payloads.append(
                    _encode_avi_mjpeg(jpegs, blocks_w * 8, blocks_h * 8)
                )
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: payloads})

    return df.select(id_col, seed_col).mapInPandas(run, schema=out_schema)


def image_stats(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    decoder: str = "auto",
    position_checksum: bool = False,
) -> DataFrame:
    """(id, width, height, channels, mean_value) per image payload —
    the decode-and-profile operator: real formats (PPM/PGM/BMP/PNG)
    report true pixel statistics; in ``auto`` mode an undecodable
    payload yields null dimensions (rather than failing the pipeline),
    ``real`` mode raises where a missing codec would slot in, and
    ``fake`` mode returns deterministic sha256-derived stub stats (the
    same convention as :func:`extract_image_features`'s stub — never
    nulls, so fake-mode pipelines exercise the non-null code path).

    ``position_checksum=True`` appends a ``pos_checksum`` column
    (:func:`_position_checksum` of the decoded pixels) — an
    order-sensitive statistic so an oracle pinning the output catches
    mean-preserving decode defects (swapped scanlines, transposed
    blocks) that width/height/mean alone would miss."""
    _check_mode(decoder)
    fields = [
        T.StructField(id_col, T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_value", T.DoubleType(), True),
    ]
    if position_checksum:
        fields.append(T.StructField("pos_checksum", T.DoubleType(), True))
    out_schema = T.StructType(fields)

    # plan-build-time snapshot: ships the (possibly
    # register_codec-overridden) decoder to executors
    decode_image = _snapshot_decoder("image", _decode_image_real)
    def one(payload: bytes):
        img = _try_decode(decode_image, payload, decoder)
        if img is not None:
            h, w, ch = img.shape
            # the O(pixels) checksum only when requested — the default
            # profiling path must not pay for a column it drops
            pc = _position_checksum(img) if position_checksum else None
            return w, h, ch, float(img.mean()), pc
        if decoder == "real":
            raise _codec_error("image decode")
        if decoder == "fake":
            w, h, ch, mv = _fake_stats(payload)
            pc = None
            if position_checksum:
                # stub checksum: same sha-derived convention, never null
                seed = int.from_bytes(hashlib.sha256(payload).digest()[8:16], "big")
                pc = float(seed % 25600) / 100.0
            return w, h, ch, mv, pc
        return None, None, None, None, None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {id_col: pdf[id_col].to_numpy(), "width": [], "height": [],
                    "channels": [], "mean_value": []}
            if position_checksum:
                cols["pos_checksum"] = []
            for b in pdf[binary_col]:
                w, h, ch, mv, pc = one(bytes(b) if b is not None else b"")
                cols["width"].append(w)
                cols["height"].append(h)
                cols["channels"].append(ch)
                cols["mean_value"].append(mv)
                if position_checksum:
                    cols["pos_checksum"].append(pc)
            yield pd.DataFrame(cols)

    return df.select(id_col, binary_col).mapInPandas(run, schema=out_schema)
