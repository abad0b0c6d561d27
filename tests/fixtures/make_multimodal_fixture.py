"""Generate the expected-output fixture for the multimodal oracle.

Computes the deterministic fake image features (sha256-seeded, see
``tumult_core_spark/extensions/multimodal.py``) for the sf0.01
``documents`` table with plain pyarrow+numpy — no Spark — so the
oracle checks the whole Spark plumbing (column alignment, Arrow batch
handling, schema) against an independently produced result.

Run from the repo root:  python tests/fixtures/make_multimodal_fixture.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from tumult_core_spark.extensions.multimodal import _fake_features  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "multimodal_expected_sf001.parquet")


def main() -> None:
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    rows = {"doc_id": [], "f0": [], "f1": [], "f2": [], "dim": []}
    for doc_id, text in zip(doc_ids, texts):
        feats = _fake_features((text or "").encode("utf-8"), 16)
        rows["doc_id"].append(doc_id)
        rows["f0"].append(round(float(feats[0]), 5))
        rows["f1"].append(round(float(feats[1]), 5))
        rows["f2"].append(round(float(feats[2]), 5))
        rows["dim"].append(16)
    table = pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "f0": pa.array(rows["f0"], pa.float64()),
            "f1": pa.array(rows["f1"], pa.float64()),
            "f2": pa.array(rows["f2"], pa.float64()),
            "dim": pa.array(rows["dim"], pa.int32()),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {len(doc_ids)} rows to {OUT}")


if __name__ == "__main__":
    main()
