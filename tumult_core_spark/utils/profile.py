"""Exact column profiling (row count, null count, distinct count).

The data-quality pass a pipeline runs before/after every major stage
(post-dedup, post-filter) to catch schema drift and null explosions.
One aggregate over one scan computes every metric (Spark expands the
multi-column distinct aggregation internally); the single result row
is reshaped to long format with ``stack`` — no per-column jobs, no
driver-side loop over data.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Optional[List[str]] = None,
    approximate: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per profiled column.

    ``n_distinct`` counts distinct NON-NULL values (SQL COUNT(DISTINCT)
    semantics, identical across engines).  Exact mode plans through
    Spark's ``Expand`` (the scan is logically replicated once per
    distinct-aggregated column); ``approximate=True`` swaps in
    HyperLogLog++ sketches (``approx_count_distinct`` at relative
    error ``rsd``), which profile every column in ONE un-expanded
    pass — the right mode at 100 TB, where an exact multi-column
    distinct multiplies the shuffle by the column count.
    """
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"No such column(s): {missing}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(
            F.approx_count_distinct(F.col(c), rsd=rsd).alias(f"__dist_{c}")
            if approximate
            else F.countDistinct(F.col(c)).alias(f"__dist_{c}")
        )
    row = df.agg(*aggs)
    triples = ", ".join(
        f"'{c}', `__nulls_{c}`, `__dist_{c}`" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {triples}) AS (column, n_nulls, n_distinct)",
        "__n AS n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct")


def profile_numeric(
    df: DataFrame, columns: Optional[List[str]] = None
) -> DataFrame:
    """(column, n_rows, n_nulls, min, max, mean) for numeric columns —
    exact, one aggregate over one scan, reshaped long like
    :func:`profile_table`.  Defaults to every numeric column.

    The mean is accumulated as ``SUM(CAST(col AS DECIMAL(38,12))) /
    COUNT(col)`` rather than a float ``avg``: decimal addition is
    exact and therefore independent of partition count and merge
    order, so the reported mean is bit-identical across engines and
    across cluster sizes.  A float ``avg`` is not — when the true mean
    lands near a rounding boundary, the accumulation order (which
    varies with partitioning) can flip the last digit, which showed up
    as a one-in-many-runs hash flake against the DuckDB oracle.
    Values with more than 26 integer digits would overflow
    DECIMAL(38,12); numeric *profiling* inputs are far inside that."""
    from pyspark.sql.types import NumericType

    numeric = [
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    ]
    cols = columns or numeric
    bad = [c for c in cols if c not in numeric]
    if bad:
        raise ValueError(f"Not numeric column(s): {bad}")
    if not cols:
        raise ValueError("no numeric columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
        aggs.append(
            (
                F.sum(F.col(c).cast("decimal(38,12)")).cast("double")
                / F.count(F.col(c))
            ).alias(f"__mean_{c}")
        )
    row = df.agg(*aggs)
    tuples = ", ".join(
        f"'{c}', `__nulls_{c}`, `__min_{c}`, `__max_{c}`, `__mean_{c}`"
        for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {tuples}) AS (column, n_nulls, min, max, mean)",
        "__n AS n_rows",
    ).select("column", "n_rows", "n_nulls", "min", "max", "mean")


def profile_quantiles(
    df: DataFrame,
    columns: Optional[List[str]] = None,
    probs=(0.25, 0.5, 0.75),
    approximate: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-column quantiles in one aggregate over one scan, long-form
    ``(column, p, value)``.

    Exact mode uses ``percentile`` (linear interpolation at rank
    ``p*(n-1)`` — the same definition as DuckDB/numpy ``quantile_cont``
    / type-7), which buffers a per-column value-count map in the final
    aggregation: fine for the quantized/low-cardinality columns typical
    of profiling, but for corpus-scale high-cardinality doubles pass
    ``approximate=True`` to use ``percentile_approx`` (bounded-memory
    KLL-style sketch, mergeable map-side) instead.
    """
    from pyspark.sql.types import NumericType

    numeric = [
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    ]
    cols = columns or numeric
    bad = [c for c in cols if c not in numeric]
    if bad:
        raise ValueError(f"Not numeric column(s): {bad}")
    if not cols:
        raise ValueError("no numeric columns to profile")
    probs = [float(p) for p in probs]
    if not probs or any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError("probs must be in [0, 1]")
    aggs = []
    for c in cols:
        for i, p in enumerate(probs):
            src = F.col(c).cast("double")
            agg = (
                F.percentile_approx(src, F.lit(p), F.lit(accuracy))
                if approximate
                else F.percentile(src, F.lit(p))
            )
            aggs.append(agg.alias(f"__q_{i}_{c}"))
    row = df.agg(*aggs)
    tuples = ", ".join(
        f"'{c}', CAST({p} AS DOUBLE), `__q_{i}_{c}`"
        for c in cols
        for i, p in enumerate(probs)
    )
    return row.selectExpr(
        f"stack({len(cols) * len(probs)}, {tuples}) AS (column, p, value)"
    )
