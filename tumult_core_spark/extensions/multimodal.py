"""Multimodal (image / audio / video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata; all
per-item processing (decode, feature extraction, resize, frame
sampling) runs as Arrow-batched ``mapInPandas`` over the binary
column, so the Spark-side contract — schema, partitioning, UDF
signature, batch shape — is real and tested even though the actual
codecs are NOT available in this environment.

Decoding is therefore STUBBED: with ``fake=True`` (default) each stub
derives a deterministic payload-dependent result (sha256-seeded), so
pipelines are testable end-to-end; with ``fake=False`` the stubs raise
``NotImplementedError`` at the point where a real codec (Pillow,
ffmpeg, torchaudio) would be called.  Swapping in real decoders
changes only the inner per-batch function, never the Spark plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List, Optional

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


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic unit-norm pseudo-embedding from the payload hash."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / max(float(np.linalg.norm(v)), 1e-12)


def extract_image_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    dim: int = 64,
    fake: bool = True,
) -> DataFrame:
    """(id, features array<float>) per image payload.

    Real implementation point: decode with Pillow + run a vision
    encoder inside the batch loop.  Batch shape and output schema are
    identical for the real and fake paths.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType(), False), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires Pillow/codecs not present in this "
                    "environment; run with fake=True for the deterministic stub"
                )
            feats = [
                _fake_features(bytes(b) if b is not None else b"", dim).tolist()
                for b in pdf[binary_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "features": feats})

    return df.select(id_col, binary_col).mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    width: int,
    height: int,
    fake: bool = True,
) -> DataFrame:
    """(id, resized binary, width, height) — stubbed resize.

    The fake path emits a deterministic payload (hash of input +
    target size) with the declared dimensions so downstream schema
    logic is exercised.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("resized", T.BinaryType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real image resize requires Pillow")
            payloads = [
                hashlib.sha256(
                    (bytes(b) if b is not None else b"") + f"{width}x{height}".encode()
                ).digest()
                for b in pdf[binary_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "resized": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    num_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Explode each video payload into ``num_frames`` frame rows:
    (id, frame_index, frame binary).  Stubbed frame extraction."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            ids: List[int] = []
            idxs: List[int] = []
            frames: List[bytes] = []
            for rid, b in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(b) if b is not None else b""
                for i in range(num_frames):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(
                        hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_index": idxs, "frame": frames}
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=out_schema)


def audio_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    dim: int = 32,
    fake: bool = True,
) -> DataFrame:
    """(id, features array<float>, duration_ms) — stubbed audio decode."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType(), False), False),
            T.StructField("duration_ms", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real audio decode requires torchaudio/ffmpeg")
            feats, durs = [], []
            for b in pdf[binary_col]:
                payload = bytes(b) if b is not None else b""
                feats.append(_fake_features(payload, dim).tolist())
                durs.append(len(payload))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "features": feats,
                    "duration_ms": durs,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=out_schema)
