"""Sequence packing: greedy assignment of documents into fixed-size
context windows (the "sample packing" step of LLM training-data
preparation).

Sequential greedy packing is inherently order-serial (each bin's fill
state feeds the next decision), so it cannot be one big window
function.  The distributed form: shard documents into ``num_buckets``
deterministic hash buckets, then run the serial greedy scan
INDEPENDENTLY per bucket inside ``applyInPandas`` — each bucket's
packing depends only on (ids, sizes) in that bucket, never on
partitioning or cluster layout, so results are bit-reproducible and
the whole operator is one shuffle by bucket.  At 100 TB, buckets
number in the tens of thousands and each scan is a short in-memory
loop; no state crosses buckets.

The assignment rule (clamp size to the window; walk ids in ascending
order; open a new bin when the next document would overflow) is simple
enough to restate as a recursive CTE, which is exactly how the duckdb
oracle verifies it row-for-row.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    window: int,
    num_buckets: int = 32,
) -> DataFrame:
    """(id, bucket, bin) — greedy sequential packing of each hash
    bucket's documents (ascending id) into bins of capacity
    ``window``.  Sizes larger than the window are clamped (such a
    document occupies a full bin by itself); NULL or negative sizes
    clamp to zero (they pack for free) — a negative size would
    otherwise DECREMENT the running fill and silently overpack bins
    past the model context they feed, and a NULL would crash the
    int64 conversion inside the executor.

    Rows with a NULL ``id_col`` are DROPPED: the output is an
    (id -> bin) mapping, so an id-less row has no addressable
    assignment (and NULL ids hash to their own bucket, so dropping
    them never changes any other document's bin).  ``bucket`` is
    always in ``[0, num_buckets)`` — negative ids bucket by ``pmod``,
    not Spark's sign-keeping ``%``."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("bucket", T.LongType(), False),
            T.StructField("bin", T.LongType(), False),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        raw = pdf[size_col].to_numpy(dtype=np.float64)  # NULL -> NaN
        sizes = np.clip(np.nan_to_num(raw, nan=0.0), 0, window).astype(
            np.int64
        )
        bins = np.empty(len(pdf), dtype=np.int64)
        b, fill = 0, 0
        for i, t in enumerate(sizes):
            if fill + t > window:
                b += 1
                fill = int(t)
            else:
                fill += int(t)
            bins[i] = b
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(dtype=np.int64),
                "bucket": pdf["__bucket"].to_numpy(dtype=np.int64),
                "bin": bins,
            }
        )

    return (
        df.select(
            F.col(id_col).cast("long").alias(id_col),
            F.col(size_col).cast("long").alias(size_col),
            F.pmod(F.col(id_col).cast("long"), F.lit(num_buckets)).alias(
                "__bucket"
            ),
        )
        .where(F.col(id_col).isNotNull())
        .groupBy("__bucket")
        .applyInPandas(pack, schema=out_schema)
    )
