"""Generate the expected-output fixture for the multimodal oracle.

Computes the deterministic fake image features (sha256-seeded, see
``tumult_core_spark/extensions/multimodal.py``) for the ``documents``
table of EVERY scale factor with plain pyarrow+numpy — no Spark — so
the oracle checks the whole Spark plumbing (column alignment, Arrow
batch handling, schema) against an independently produced result.

One fixture file covers all SFs: each block carries an ``sf_key``
column — DuckDB's ``bit_xor(hash(doc_id, text))`` content fingerprint
of its source documents table — and the oracle SQL selects the block
whose fingerprint matches the documents view it runs against, erroring
loudly when none does (an sf0.01-pinned fixture silently mismatching
at another SF was the round-6 hazard this closes).

Run from the repo root:
    python tests/fixtures/make_multimodal_fixture.py [sf_dir ...]
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

from tumult_core_spark.extensions.multimodal import _fake_features  # noqa: E402

SF_DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "multimodal_expected.parquet")


def block(sf_dir: str) -> pa.Table:
    sf_key = duckdb.sql(
        f"SELECT bit_xor(hash(doc_id, text)) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    rows = {"doc_id": [], "f0": [], "f1": [], "f2": [], "dim": []}
    for doc_id, text in zip(doc_ids, texts):
        feats = _fake_features((text or "").encode("utf-8"), 16)
        rows["doc_id"].append(doc_id)
        rows["f0"].append(round_half_up(float(feats[0]), 5))
        rows["f1"].append(round_half_up(float(feats[1]), 5))
        rows["f2"].append(round_half_up(float(feats[2]), 5))
        rows["dim"].append(16)
    return pa.table(
        {
            "sf_key": pa.array([sf_key] * len(doc_ids), pa.uint64()),
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "f0": pa.array(rows["f0"], pa.float64()),
            "f1": pa.array(rows["f1"], pa.float64()),
            "f2": pa.array(rows["f2"], pa.float64()),
            "dim": pa.array(rows["dim"], pa.int32()),
        }
    )


def main() -> None:
    table = pa.concat_tables([block(d) for d in SF_DIRS])
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} rows ({len(SF_DIRS)} SFs) to {OUT}")


if __name__ == "__main__":
    main()
