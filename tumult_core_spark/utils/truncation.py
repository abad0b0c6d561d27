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

Skew note: ``truncate_large_groups`` runs a salted two-phase window
(local top-k per input-partition salt, exact top-k over the bounded
survivors), so a hot key is ranked by many tasks instead of
concentrating its full group in one; the result is identical to the
single global window.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _row_hash(df: DataFrame) -> F.Column:
    """Deterministic per-row content hash over all columns (JVM-side)."""
    return F.xxhash64(*[F.col(c) for c in df.columns])


def truncate_large_groups(
    df: DataFrame,
    grouping_columns: List[str],
    threshold: int,
    salt_buckets: int = 32,
) -> DataFrame:
    """Keep at most ``threshold`` hash-chosen rows per group.

    Skew-safe two-phase window: a local pass keeps the top
    ``threshold`` rows per (group, salt) — the salt is the input
    partition id, so a hot key is ranked by up to ``salt_buckets``
    tasks instead of collapsing onto one — and the exact pass ranks
    the at most ``threshold * salt_buckets`` survivors per group.

    The result is identical to a single global window and still
    partition-independent: any row in a group's true hash-ordered
    top-``threshold`` is by construction in the local top-``threshold``
    of whichever salt bucket it landed in, so the pre-filter never
    drops a winner, and the final pass uses only the deterministic
    content-hash order.  ``salt_buckets=1`` (or 0) disables the local
    pass.
    """
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    if threshold == 0:
        return df.limit(0)
    cols = df.columns
    row_hash = F.xxhash64(*[F.col(c) for c in cols])
    if salt_buckets and salt_buckets > 1:
        salted = df.withColumn(
            "__salt", (F.spark_partition_id() % salt_buckets).cast("int")
        )
        w_local = Window.partitionBy(*grouping_columns, "__salt").orderBy(row_hash)
        df = (
            salted.withColumn("__rn", F.row_number().over(w_local))
            .filter(F.col("__rn") <= threshold)
            .select(*cols)
        )
    w = Window.partitionBy(*grouping_columns).orderBy(row_hash)
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
