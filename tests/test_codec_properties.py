"""Hypothesis property round-trips for the from-scratch codecs.

Fixed-shape unit tests miss parameter-corner defects — the r13 FLAC
frame-number varint bug lived exactly in such a corner (frame numbers
>= 2048 overflowed a 2-byte coding).  These properties drive the
encoders and decoders across the whole accepted parameter space with
random content: the lossless codecs (PNG / GIF / TIFF / FLAC) must
reproduce EVERY input bit-exactly at ANY dimensions down to 1x1,
every channel count / palette size / compression scheme / scanline
filter / stereo decorrelation, and JPEG must be exact for the inputs
where exactness is mathematically guaranteed (quality-100 with
constant 8x8 blocks, where only DC coefficients are excited).

No SparkSession here (the suite stays fast and failures shrink to
minimal reproducers) — except TestCorruptMediaSymmetry at the bottom,
whose subject is the OPERATOR-level corrupt-payload contract and so
must run through mapInPandas.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# heavy hypothesis sweeps: full lane only (fast lane = -m "not slow")
pytestmark = pytest.mark.slow


def _rng_bytes(seed: int, shape, lo=0, hi=256, dtype=np.uint8):
    return np.random.default_rng(seed).integers(lo, hi, size=shape).astype(dtype)


class TestPngProperty:
    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        ch=st.sampled_from([1, 2, 3, 4]),
        filter_type=st.integers(0, 4),
        seed=st.integers(0, 2**32 - 1),
    )
    def test_roundtrip_exact(self, h, w, ch, filter_type, seed):
        from tumult_core_spark.extensions.multimodal import (
            _decode_png,
            _encode_png,
        )

        img = _rng_bytes(seed, (h, w, ch))
        dec = _decode_png(_encode_png(img, filter_type=filter_type))
        assert dec is not None and dec.shape[:2] == (h, w)
        assert np.array_equal(dec.reshape(h, w, -1), img)


class TestGifProperty:
    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        npal=st.integers(2, 256),
        interlaced=st.booleans(),
        seed=st.integers(0, 2**32 - 1),
    )
    def test_roundtrip_exact(self, h, w, npal, interlaced, seed):
        from tumult_core_spark.extensions.multimodal import (
            _decode_gif,
            _encode_gif,
        )

        rng = np.random.default_rng(seed)
        palette = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        idx = rng.integers(0, npal, size=(h, w))
        dec = _decode_gif(_encode_gif(idx, palette, interlaced=interlaced))
        assert dec is not None
        assert np.array_equal(dec, palette[idx])


class TestTiffProperty:
    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        ch=st.sampled_from([1, 3, 4]),
        compression=st.sampled_from([1, 5, 32773]),
        predictor=st.booleans(),
        seed=st.integers(0, 2**32 - 1),
    )
    def test_roundtrip_exact(self, h, w, ch, compression, predictor, seed):
        from tumult_core_spark.extensions.multimodal import (
            _decode_tiff,
            _encode_tiff,
        )

        # the horizontal-differencing predictor is an LZW companion
        predictor = predictor and compression == 5
        img = _rng_bytes(seed, (h, w, ch))
        dec = _decode_tiff(_encode_tiff(img, compression, predictor=predictor))
        assert dec is not None and dec.shape[:2] == (h, w)
        assert np.array_equal(dec.reshape(h, w, -1), img)


class TestFlacProperty:
    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 4000),
        channels=st.integers(1, 2),
        block_size=st.sampled_from([16, 64, 256, 4096]),
        mode=st.sampled_from(
            ["independent", "left_side", "right_side", "mid_side"]
        ),
        kind=st.sampled_from(["noise", "smooth", "const", "mixed"]),
        seed=st.integers(0, 2**32 - 1),
    )
    def test_roundtrip_exact(self, n, channels, block_size, mode, kind, seed):
        from tumult_core_spark.extensions.flac import _decode_flac, _encode_flac

        rng = np.random.default_rng(seed)
        if kind == "noise":
            x = rng.integers(-32768, 32768, size=(n, channels))
        elif kind == "smooth":
            t = np.arange(n)[:, None]
            x = (np.sin(t * 0.01 + np.arange(channels)) * 12000).astype(int)
        elif kind == "const":
            x = np.full((n, channels), int(rng.integers(-32768, 32768)))
        else:  # mixed: smooth + sparse spikes (escape-code territory)
            t = np.arange(n)[:, None]
            x = (np.sin(t * 0.02) * 8000).astype(int) + rng.integers(
                -20, 21, size=(n, channels)
            )
            spikes = rng.integers(0, n, size=max(1, n // 50))
            x[spikes] = rng.integers(-32768, 32768, size=(len(spikes), channels))
        x = np.clip(x, -32768, 32767).astype(np.int16)
        stereo_mode = mode if channels == 2 else "independent"
        dec, rate, bps = _decode_flac(
            _encode_flac(x, 16000, block_size=block_size, stereo_mode=stereo_mode)
        )
        assert (rate, bps) == (16000, 16)
        assert np.array_equal(dec, x.astype(np.int32))


class TestJpegProperty:
    @settings(max_examples=30, deadline=None)
    @given(
        blocks_h=st.integers(1, 4),
        blocks_w=st.integers(1, 4),
        progressive=st.booleans(),
        restart_interval=st.integers(0, 3),
        seed=st.integers(0, 2**32 - 1),
    )
    def test_constant_block_q100_exact(
        self, blocks_h, blocks_w, progressive, restart_interval, seed
    ):
        """Constant 8x8 blocks excite only DC coefficients, so a
        quality-100 (all-ones quant tables) round-trip must be EXACT
        in both sequential and progressive modes at any grid size and
        restart interval — the invariant the driver oracles pin."""
        from tumult_core_spark.extensions.jpeg import _decode_jpeg, _encode_jpeg

        vals = _rng_bytes(seed, (blocks_h, blocks_w))
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        dec = _decode_jpeg(
            _encode_jpeg(
                img,
                quality=100,
                restart_interval=restart_interval,
                progressive=progressive,
            )
        )
        assert dec is not None
        assert np.array_equal(dec.reshape(img.shape), img)

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        value=st.integers(0, 255),
        progressive=st.booleans(),
    )
    def test_constant_image_any_dims_q100_exact(self, h, w, value, progressive):
        """Non-multiple-of-8 dimensions force edge padding in the MCU
        grid; a globally constant image must survive that padding and
        the final crop exactly at quality 100."""
        from tumult_core_spark.extensions.jpeg import _decode_jpeg, _encode_jpeg

        img = np.full((h, w), value, np.uint8)
        dec = _decode_jpeg(_encode_jpeg(img, quality=100, progressive=progressive))
        assert dec is not None and dec.shape[:2] == (h, w)
        assert np.array_equal(dec.reshape(h, w), img)


class TestTruncationErrorContract:
    """Truncated payloads must raise ValueError (or return None for a
    wrong magic) — never hang, crash with an internal IndexError, or
    silently return wrong pixels.  Decoders run inside mapInPandas at
    100 TB: an unhandled exception type fails the whole task set."""

    @settings(max_examples=40, deadline=None)
    @given(
        codec=st.sampled_from(["png", "gif", "tiff", "flac", "jpeg"]),
        frac=st.floats(0.05, 0.95),
        seed=st.integers(0, 2**32 - 1),
    )
    def test_truncation_raises_or_none(self, codec, frac, seed):
        from tumult_core_spark.extensions.flac import _decode_flac, _encode_flac
        from tumult_core_spark.extensions.jpeg import _decode_jpeg, _encode_jpeg
        from tumult_core_spark.extensions.multimodal import (
            _decode_gif,
            _decode_png,
            _decode_tiff,
            _encode_gif,
            _encode_png,
            _encode_tiff,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
        if codec == "png":
            payload, dec = _encode_png(img), _decode_png
        elif codec == "gif":
            pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
            payload, dec = _encode_gif(img[:, :, 0] % 16, pal), _decode_gif
        elif codec == "tiff":
            payload, dec = _encode_tiff(img, 5, predictor=True), _decode_tiff
        elif codec == "flac":
            x = rng.integers(-32768, 32768, size=2000).astype(np.int16)
            payload, dec = _encode_flac(x, 16000, block_size=256), _decode_flac
        else:
            payload, dec = _encode_jpeg(img, quality=90), _decode_jpeg
        cut = max(1, int(len(payload) * frac))
        try:
            out = dec(payload[:cut])
        except ValueError:
            return  # the documented contract
        # a tiny prefix may no longer carry the magic -> None is fine;
        # tolerate only that, never a "successful" decode of a stump
        assert out is None


class TestAuxDecoderRobustness:
    """The same flip/truncation contract for the remaining decoders
    (WAV / PNM / BMP / Y4M / AVI-MJPEG): ValueError or None, never an
    internal exception type, a stall, or a silent stump decode."""

    @staticmethod
    def _make(codec, r):
        import struct

        from tumult_core_spark.extensions.jpeg import _encode_jpeg
        from tumult_core_spark.extensions.multimodal import (
            _decode_avi_mjpeg,
            _decode_bmp,
            _decode_pnm,
            _decode_wav,
            _decode_y4m,
            _encode_avi_mjpeg,
        )

        if codec == "wav":
            x = r.integers(-32768, 32768, size=int(r.integers(1, 4000))).astype("<i2")
            data = x.tobytes()
            payload = (
                b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                + b"data" + struct.pack("<I", len(data)) + data
            )
            return payload, _decode_wav
        if codec == "ppm":
            h, w = int(r.integers(1, 16)), int(r.integers(1, 16))
            body = r.integers(0, 256, size=h * w * 3).astype(np.uint8).tobytes()
            return b"P6\n%d %d\n255\n" % (w, h) + body, _decode_pnm
        if codec == "bmp":
            h, w = int(r.integers(1, 12)), int(r.integers(1, 12))
            row = (w * 3 + 3) & ~3
            px = r.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            data = bytearray()
            for y in range(h - 1, -1, -1):
                data += px[y].tobytes() + b"\x00" * (row - w * 3)
            hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
            info = struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
            )
            return bytes(hdr + info + data), _decode_bmp
        if codec == "y4m":
            h, w = int(r.integers(2, 12)) * 2, int(r.integers(2, 12)) * 2
            out = b"YUV4MPEG2 W%d H%d F25:1 C420\n" % (w, h)
            for _ in range(int(r.integers(1, 4))):
                out += b"FRAME\n" + r.integers(
                    0, 256, size=w * h * 3 // 2
                ).astype(np.uint8).tobytes()
            return out, _decode_y4m
        h, w = int(r.integers(1, 3)) * 8, int(r.integers(1, 3)) * 8
        jf = [
            _encode_jpeg(
                r.integers(0, 256, size=(h // 8, w // 8))
                .astype(np.uint8).repeat(8, 0).repeat(8, 1),
                quality=100,
            )
            for _ in range(int(r.integers(1, 4)))
        ]
        return _encode_avi_mjpeg(jf, w, h), _decode_avi_mjpeg

    @settings(max_examples=50, deadline=None)
    @given(
        codec=st.sampled_from(["wav", "ppm", "bmp", "y4m", "avi"]),
        frac=st.floats(0.05, 0.95),
        nflips=st.integers(1, 3),
        seed=st.integers(0, 2**32 - 1),
    )
    def test_flip_and_truncation_contract(self, codec, frac, nflips, seed):
        r = np.random.default_rng(seed)
        payload, dec = self._make(codec, r)
        bad = bytearray(payload)
        for _ in range(nflips):
            i = int(r.integers(0, len(bad)))
            bad[i] ^= int(r.integers(1, 256))
        cut = max(1, int(len(payload) * frac))
        for probe in (bytes(bad), bytes(payload[:cut])):
            try:
                dec(probe)  # flips may decode (formats lack checksums)
            except ValueError:
                pass


class TestCorruptMediaSymmetry:
    """The r14 unified media-operator mode contract, pinned across
    modalities with CORRUPT KNOWN-FORMAT payloads (not just wrong
    magic): auto -> NULL outputs, fake -> deterministic non-null stub,
    real -> raises.  Before r14 audio_features returned its stub in
    auto mode while image_stats returned NULLs, so a null-filtered
    curation pipeline silently kept corrupt audio — the asymmetry this
    class exists to keep dead.  (One Spark fixture use in this
    otherwise pure-codec file: the contract is about the OPERATORS,
    so it must run through mapInPandas.)"""

    @staticmethod
    def _corrupt_payloads():
        import struct

        from tumult_core_spark.extensions.flac import _encode_flac
        from tumult_core_spark.extensions.jpeg import _encode_jpeg
        from tumult_core_spark.extensions.multimodal import _encode_png

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
        png = _encode_png(img)
        jpeg = _encode_jpeg(img, quality=90)
        x = rng.integers(-32768, 32768, size=2000).astype("<i2")
        data = x.tobytes()
        wav = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )
        flac = _encode_flac(x.astype(np.int16), 16000, block_size=256)
        # truncate to 60%: magic survives, structure does not
        return {
            name: p[: max(8, int(len(p) * 0.6))]
            for name, p in
            {"png": png, "jpeg": jpeg, "wav": wav, "flac": flac}.items()
        }

    def test_auto_nulls_fake_stubs_real_raises(self, spark):
        from tumult_core_spark.extensions.multimodal import (
            audio_features,
            extract_image_features,
            image_stats,
        )

        payloads = self._corrupt_payloads()
        imgs = spark.createDataFrame(
            [(0, bytearray(payloads["png"])), (1, bytearray(payloads["jpeg"]))],
            "doc_id long, payload binary",
        )
        auds = spark.createDataFrame(
            [(0, bytearray(payloads["wav"])), (1, bytearray(payloads["flac"]))],
            "doc_id long, payload binary",
        )
        # auto: NULL across every modality — the one-filter curation contract
        assert image_stats(imgs, "payload", "doc_id").filter(
            "width is null and mean_value is null"
        ).count() == 2
        assert extract_image_features(imgs, "payload", "doc_id", dim=4).filter(
            "features is null"
        ).count() == 2
        assert audio_features(auds, "payload", "doc_id", dim=4).filter(
            "features is null and duration_ms is null"
        ).count() == 2
        # fake: deterministic stub, never null, across every modality
        assert image_stats(imgs, "payload", "doc_id", decoder="fake").filter(
            "width is not null and mean_value is not null"
        ).count() == 2
        assert audio_features(
            auds, "payload", "doc_id", dim=4, decoder="fake"
        ).filter("features is not null and duration_ms is not null").count() == 2
        # real: the corrupt payload surfaces as a task error
        with pytest.raises(Exception):
            image_stats(imgs, "payload", "doc_id", decoder="real").collect()
        with pytest.raises(Exception):
            audio_features(auds, "payload", "doc_id", dim=4, decoder="real").collect()
