"""Deterministic, input-order-independent group truncation.

DP joins and per-user contribution bounding need "keep at most k rows
per key" where the *choice* of kept rows must not depend on row order
or partitioning (those are adversary-influenceable).  The reference's
trick (``tmlt/core/utils/truncation.py:24-313``): order rows within a
group by a SHA-256 hash of the full row plus a within-duplicate index,
then keep the first k by ``row_number`` / ``dense_rank``.

All pure built-in Spark: ``sha2`` / ``to_json`` / window functions —
one shuffle on the grouping key, no Python.  Skew note: a single hot
key concentrates its group in one task; AQE skew-join handling does
not apply to windows, so extreme skew is bounded by the truncation
threshold itself after the first pass.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _row_hash(df: DataFrame, columns: List[str]) -> F.Column:
    """Deterministic per-row hash over ``columns`` + duplicate index.

    Identical rows get distinct hashes via a within-duplicate
    ``row_number``, so ties are broken stably no matter the input
    order.
    """
    payload = F.to_json(F.struct(*[F.col(c) for c in columns]))
    dup_index = F.row_number().over(
        Window.partitionBy(*columns).orderBy(F.lit(1))
    )
    return F.sha2(F.concat(payload, F.lit("#"), dup_index.cast("string")), 256)


def truncate_large_groups(
    df: DataFrame, grouping_columns: List[str], threshold: int
) -> DataFrame:
    """Keep at most ``threshold`` hash-chosen rows per group."""
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    if threshold == 0:
        return df.limit(0)
    cols = df.columns
    hashed = df.withColumn("__hash", _row_hash(df, cols))
    w = Window.partitionBy(*grouping_columns).orderBy("__hash")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
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
    key_hash = F.sha2(
        F.to_json(F.struct(*[F.col(c) for c in grouping_columns + key_columns])),
        256,
    )
    w = Window.partitionBy(*grouping_columns).orderBy(
        key_hash, *[F.col(c) for c in key_columns]
    )
    return (
        df.withColumn("__dr", F.dense_rank().over(w))
        .filter(F.col("__dr") <= threshold)
        .select(*cols)
    )
