"""Deterministic, input-order-independent group truncation.

DP joins and per-user contribution bounding need "keep at most k rows
per key" where the *choice* of kept rows must not depend on row order
or partitioning (those are adversary-influenceable).  Mechanism
(reference ``tmlt/core/utils/truncation.py:24-313``): order rows
within a group by a content hash, keep the first k by ``row_number`` /
``dense_rank``.

Physical deltas vs the reference, for 100 TB scale:

* The hash is multi-column ``xxhash64(*cols)`` instead of SHA-256 over
  a JSON rendering of the row — no per-row string serialization, and
  the hash evaluates inside WholeStageCodegen.  Neither hash is keyed,
  so both are equally predictable to an adversary; the property that
  matters (independence from row order / partitioning) is preserved.
* The reference adds a within-duplicate index via an extra window over
  *all* columns so the sort key is a total order
  (``utils/truncation.py:24-88``).  For truncation that extra shuffle
  is unnecessary: hash ties only occur between identical rows (or
  vanishing-probability collisions), and identical rows are
  interchangeable — any k of them is the same multiset.  Dropping it
  halves the shuffles: one window per truncation.

Skew note: a single hot key concentrates its group in one task; the
window shuffle is bounded by the threshold after the first pass.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _row_hash(df: DataFrame) -> F.Column:
    """Deterministic per-row content hash over all columns (JVM-side)."""
    return F.xxhash64(*[F.col(c) for c in df.columns])


def truncate_large_groups(
    df: DataFrame, grouping_columns: List[str], threshold: int
) -> DataFrame:
    """Keep at most ``threshold`` hash-chosen rows per group."""
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    if threshold == 0:
        return df.limit(0)
    cols = df.columns
    w = Window.partitionBy(*grouping_columns).orderBy(_row_hash(df))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= threshold)
        .select(*cols)
    )


def drop_large_groups(
    df: DataFrame, grouping_columns: List[str], threshold: int
) -> DataFrame:
    """Drop entire groups with more than ``threshold`` rows."""
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    if threshold == 0:
        return df.limit(0)
    cols = df.columns
    w = Window.partitionBy(*grouping_columns)
    return (
        df.withColumn("__cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("__cnt") <= threshold)
        .select(*cols)
    )


def limit_keys_per_group(
    df: DataFrame,
    grouping_columns: List[str],
    key_columns: List[str],
    threshold: int,
) -> DataFrame:
    """Keep rows for at most ``threshold`` distinct keys per group.

    Keys are chosen by a hash of (group, key) so the surviving key set
    is deterministic and order-independent.
    """
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    if threshold == 0:
        return df.limit(0)
    cols = df.columns
    key_hash = F.xxhash64(
        *[F.col(c) for c in grouping_columns + key_columns]
    )
    w = Window.partitionBy(*grouping_columns).orderBy(
        key_hash, *[F.col(c) for c in key_columns]
    )
    return (
        df.withColumn("__dr", F.dense_rank().over(w))
        .filter(F.col("__dr") <= threshold)
        .select(*cols)
    )
