"""Generate the expected-output fixture for the multimodal_video oracle.

Computes per-(document, sampled frame) statistics DIRECTLY from the
deterministic constant-block pixel arrays (``_block_pixels_from_bytes``
seeded per frame) with plain pyarrow+numpy — no JPEG, no AVI, no
codec anywhere.  The Spark-side query synthesizes 4-frame MJPEG clips,
samples 2 evenly spaced frames (indices 0 and 3) through the real
RIFF-walk + JPEG decode path, and profiles the re-emitted P5 frames —
so a defect anywhere in the container walk / JPEG decode / frame
selection flips the value hash.

Run from the repo root:
    python tests/fixtures/make_video_fixture.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixture_util import round_half_up  # noqa: E402

from tumult_core_spark.extensions.multimodal import (  # noqa: E402
    _block_pixels_from_bytes,
    _position_checksum,
)

SF_DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "video_expected.parquet")
BLOCKS_H, BLOCKS_W = 2, 3
NUM_FRAMES, SAMPLED = 4, 2
# linspace(0, 3, 2).round() -> synthesized frame indices 0 and 3
PICKS = [0, 3]


def block(sf_dir: str) -> pa.Table:
    sf_key = duckdb.sql(
        f"SELECT bit_xor(hash(doc_id, text)) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = {"doc_id": [], "frame_index": [], "mean_value": [], "pos_checksum": []}
    for i, text in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        raw = (text or "").encode("utf-8")
        for out_idx, f in enumerate(PICKS):
            px = _block_pixels_from_bytes(raw + bytes([f]), BLOCKS_H, BLOCKS_W)
            rows["doc_id"].append(i)
            rows["frame_index"].append(out_idx)
            rows["mean_value"].append(round_half_up(float(px.mean()), 5))
            rows["pos_checksum"].append(round_half_up(_position_checksum(px), 5))
    n = len(rows["doc_id"])
    return pa.table(
        {
            "sf_key": pa.array([sf_key] * n, pa.uint64()),
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "frame_index": pa.array(rows["frame_index"], pa.int32()),
            "width": pa.array([BLOCKS_W * 8] * n, pa.int32()),
            "height": pa.array([BLOCKS_H * 8] * n, pa.int32()),
            "mean_value": pa.array(rows["mean_value"], pa.float64()),
            "pos_checksum": pa.array(rows["pos_checksum"], pa.float64()),
        }
    )


def main() -> None:
    table = pa.concat_tables([block(d) for d in SF_DIRS])
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} rows ({len(SF_DIRS)} SFs) to {OUT}")


if __name__ == "__main__":
    main()
