"""Generate the independent PCA oracle fixture for sf0.01.

Computes the top-2 principal-component projection of
``/root/testdata/sf0.01/embeddings.parquet`` using ONLY
pyarrow + numpy — no tumult_core_spark imports — so the fixture is an
independent re-derivation of what ``pca_fit`` / ``pca_project`` must
produce (same covariance convention: E[xx^T] - mean mean^T over n, no
Bessel correction; same sign convention: each component's
largest-|coordinate| positive; projections rounded to 6 decimals like
``q_pca_project``).

Run:  python tests/fixtures/make_pca_fixture.py
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "pca_expected_sf001.parquet")


def main():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
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
    out = pa.table(
        {
            "vec_id": pa.array(ids.astype("int64")),
            "pc1": pa.array(np.round(y[:, 0], 6)),
            "pc2": pa.array(np.round(y[:, 1], 6)),
        }
    )
    pq.write_table(out, OUT)
    print(f"wrote {OUT}: {out.num_rows} rows")


if __name__ == "__main__":
    main()
