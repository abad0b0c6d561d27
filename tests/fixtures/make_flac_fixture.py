"""Generate the expected-output fixture for the multimodal_flac oracle.

Computes per-document audio features DIRECTLY from the deterministic
sha256-seeded sample arrays (``_audio_samples_from_bytes``) with plain
pyarrow+numpy — FLAC is never touched here.  The Spark-side query
synthesizes the same samples, encodes them as real FLAC (fixed
predictors, Rice residuals, all stereo decorrelation modes cycled by
doc_id), decodes them back with the real from-scratch decoder (which
also verifies the stream MD5), and featurizes — so a defect anywhere
in the Rice/predictor/decorrelation path flips the value hash.
Because FLAC is lossless, the expected features equal the synthesized
samples' features exactly (same float32 math as the operator).

One fixture file covers all SFs via the same ``sf_key`` content
fingerprint as the other fixtures; the oracle errors loudly when no
block matches.

Run from the repo root:
    python tests/fixtures/make_flac_fixture.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixture_util import round_half_up  # noqa: E402

from tumult_core_spark.extensions.multimodal import (  # noqa: E402
    _audio_samples_from_bytes,
    _segment_pool,
    _unit_norm,
)

SF_DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "flac_expected.parquet")
N_SAMPLES, RATE, DIM = 4000, 16000, 8


def block(sf_dir: str) -> pa.Table:
    sf_key = duckdb.sql(
        f"SELECT bit_xor(hash(doc_id, text)) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    rows = {"f0": [], "f1": [], "f2": []}
    for i, text in zip(doc_ids, texts):
        stereo = bool(int(i) % 2)
        samples = _audio_samples_from_bytes(
            (text or "").encode("utf-8"), N_SAMPLES, stereo
        )
        if samples.ndim == 1:
            samples = samples[:, np.newaxis]
        # same mono mix + feature math as the operator, no codec
        x = samples.astype(np.float64).mean(axis=1) / 32768.0
        feats = _unit_norm(np.sqrt(_segment_pool(x * x, DIM)))
        rows["f0"].append(round_half_up(float(feats[0]), 5))
        rows["f1"].append(round_half_up(float(feats[1]), 5))
        rows["f2"].append(round_half_up(float(feats[2]), 5))
    n = len(doc_ids)
    return pa.table(
        {
            "sf_key": pa.array([sf_key] * n, pa.uint64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "f0": pa.array(rows["f0"], pa.float64()),
            "f1": pa.array(rows["f1"], pa.float64()),
            "f2": pa.array(rows["f2"], pa.float64()),
            "duration_ms": pa.array([N_SAMPLES * 1000 // RATE] * n, pa.int64()),
        }
    )


def main() -> None:
    table = pa.concat_tables([block(d) for d in SF_DIRS])
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} rows ({len(SF_DIRS)} SFs) to {OUT}")


if __name__ == "__main__":
    main()
