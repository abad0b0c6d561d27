"""Generate the independent PCA oracle fixture.

Computes the top-2 principal-component projection of every scale
factor's ``embeddings.parquet`` using ONLY pyarrow + numpy — no
tumult_core_spark imports — so the fixture is an independent
re-derivation of what ``pca_fit`` / ``pca_project`` must produce
(same covariance convention: E[xx^T] - mean mean^T over n, no Bessel
correction; same sign convention: each component's
largest-|coordinate| positive; projections rounded to 6 decimals like
``q_pca_project``).

One fixture file covers all SFs, keyed by ``sf_key`` = DuckDB's
``bit_xor(hash(vec_id, embedding))`` fingerprint of the source
embeddings table (see make_multimodal_fixture.py for the rationale).

Run:  python tests/fixtures/make_pca_fixture.py [sf_dir ...]
"""

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixture_util import round_half_up  # noqa: E402

SF_DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "pca_expected.parquet")


def block(sf_dir: str) -> pa.Table:
    sf_key = duckdb.sql(
        f"SELECT bit_xor(hash(vec_id, embedding)) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()[0]
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    x = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    n = x.shape[0]
    mean = x.sum(axis=0) / n
    cov = (x.T @ x) / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:2]
    comps = v[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    y = (x - mean) @ comps.T
    return pa.table(
        {
            "sf_key": pa.array([sf_key] * n, pa.uint64()),
            "vec_id": pa.array(ids.astype("int64")),
            "pc1": pa.array([round_half_up(v, 6) for v in y[:, 0]]),
            "pc2": pa.array([round_half_up(v, 6) for v in y[:, 1]]),
        }
    )


def main():
    out = pa.concat_tables([block(d) for d in SF_DIRS])
    pq.write_table(out, OUT)
    print(f"wrote {OUT}: {out.num_rows} rows ({len(SF_DIRS)} SFs)")


if __name__ == "__main__":
    main()
