"""Generate the expected-output fixture for the multimodal_tiff oracle.

Computes per-document image statistics DIRECTLY from the deterministic
sha256-seeded pixel arrays (``_pixels_from_bytes``) with plain
pyarrow+numpy — TIFF is never touched here.  The Spark-side query
synthesizes the same pixels, writes them as real TIFF (cycling
uncompressed / LZW±predictor / PackBits by doc_id), decodes them back
with the real strip decoder, and reports the stats — so a defect
anywhere in the IFD/strip/LZW/PackBits/predictor path flips the value
hash.

One fixture file covers all SFs via the same ``sf_key`` content
fingerprint as the other fixtures (DuckDB ``bit_xor(hash(doc_id,
text))`` over the documents table); the oracle errors loudly when no
block matches.

Run from the repo root:
    python tests/fixtures/make_tiff_fixture.py [sf_dir ...]
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
    _pixels_from_bytes,
    _position_checksum,
)

SF_DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tiff_expected.parquet")
HEIGHT, WIDTH = 10, 14


def block(sf_dir: str) -> pa.Table:
    sf_key = duckdb.sql(
        f"SELECT bit_xor(hash(doc_id, text)) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    means = []
    checks = []
    for text in texts:
        px = _pixels_from_bytes((text or "").encode("utf-8"), HEIGHT, WIDTH)
        means.append(round_half_up(float(px.mean()), 5))
        checks.append(round_half_up(_position_checksum(px), 5))
    n = len(doc_ids)
    return pa.table(
        {
            "sf_key": pa.array([sf_key] * n, pa.uint64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "width": pa.array([WIDTH] * n, pa.int32()),
            "height": pa.array([HEIGHT] * n, pa.int32()),
            "channels": pa.array([3] * n, pa.int32()),
            "mean_value": pa.array(means, pa.float64()),
            "pos_checksum": pa.array(checks, pa.float64()),
        }
    )


def main() -> None:
    table = pa.concat_tables([block(d) for d in SF_DIRS])
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} rows ({len(SF_DIRS)} SFs) to {OUT}")


if __name__ == "__main__":
    main()
