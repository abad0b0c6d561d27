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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ref(name: str) -> Column:
    """Column reference for a LITERAL name: backtick-quoted with
    internal backticks doubled (Spark's documented identifier escape),
    so profiled names containing quotes or backticks resolve instead
    of breaking the attribute parser."""
    return F.col("`" + name.replace("`", "``") + "`")


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
    # aggregate aliases are INDEX-based and the profiled name appears
    # only as a literal: splicing raw names into a stack() SQL string
    # broke on quotes/backticks in column names
    aggs = [F.count(F.lit(1)).alias("__n")]
    for j, c in enumerate(cols):
        aggs.append(F.sum(_ref(c).isNull().cast("long")).alias(f"__nulls_{j}"))
        aggs.append(
            F.approx_count_distinct(_ref(c), rsd=rsd).alias(f"__dist_{j}")
            if approximate
            else F.countDistinct(_ref(c)).alias(f"__dist_{j}")
        )
    row = df.agg(*aggs)
    stacked = F.stack(
        F.lit(len(cols)),
        *[
            e
            for j, c in enumerate(cols)
            for e in (F.lit(c), F.col(f"__nulls_{j}"), F.col(f"__dist_{j}"))
        ],
    ).alias("column", "n_nulls", "n_distinct")
    return row.select(stacked, F.col("__n").alias("n_rows")).select(
        "column", "n_rows", "n_nulls", "n_distinct"
    )


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

    NaN/Infinity propagate to the mean like SQL ``avg`` would (a NaN
    column mean is NaN, not a value quietly computed over the cast-
    droppable rows): the decimal path cannot represent them, so the
    same scan counts non-finite values and the mean falls back to NaN
    / +-Inf when any exist.  The decimal SUM can overflow past
    DECIMAL(38,12)'s 1e26 capacity: under ANSI mode (the default) the
    sum itself aborts loudly with NUMERIC_VALUE_OUT_OF_RANGE, and
    under non-ANSI — where it would silently return NULL — a bound
    check (|sum| <= SUM(ABS(col)) as a double, computed in the same
    scan; deliberately NOT the looser n * max|col| proxy, which one
    large outlier in a big table would trip even when the true sum
    fits) raises an explicit error instead.  A silent NULL mean is
    never returned in either mode."""
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
    from pyspark.sql.types import DoubleType, FloatType

    floaty = {
        f.name: isinstance(f.dataType, (DoubleType, FloatType))
        for f in df.schema.fields
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for j, c in enumerate(cols):
        col = _ref(c)
        d = col.cast("double")
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__nulls_{j}"))
        aggs.append(F.min(col).cast("double").alias(f"__min_{j}"))
        aggs.append(F.max(col).cast("double").alias(f"__max_{j}"))
        if floaty[c]:
            bad_row = F.isnan(d) | (F.abs(d) == F.lit(float("inf")))
            nonfinite = F.coalesce(F.sum(bad_row.cast("long")), F.lit(0))
            dec_src = F.when(~bad_row, col)
        else:
            nonfinite = F.lit(0)
            dec_src = col
        dec_mean = (
            F.sum(dec_src.cast("decimal(38,12)")).cast("double")
            / F.count(col)
        )
        # overflow guard: |sum| <= sum(|x|), computed as a double in the
        # SAME scan (map-side combinable; double rounding error ~1e-16
        # relative, far inside the 1% guard band).  Past the
        # DECIMAL(38,12) capacity (1e26) the decimal sum would silently
        # return NULL — fail loudly instead.  A count*max(|min|,|max|)
        # proxy was rejected: one large outlier in a big table trips it
        # even when the true sum fits easily.
        bound = F.coalesce(
            F.sum(F.abs(dec_src.cast("double"))), F.lit(0.0)
        )
        guarded = F.when(
            bound > F.lit(0.99e26),
            F.raise_error(
                F.lit(
                    f"profile_numeric: column {c!r} could overflow the "
                    "DECIMAL(38,12) sum accumulator; rescale it first"
                )
            ).cast("double"),
        ).otherwise(dec_mean)
        # NaN/Inf cannot ride the decimal path: propagate them through
        # a float avg (SQL semantics) instead of silently averaging
        # only the finite rows
        aggs.append(
            F.when(nonfinite > 0, F.avg(d)).otherwise(guarded).alias(
                f"__mean_{j}"
            )
        )
    row = df.agg(*aggs)
    stacked = F.stack(
        F.lit(len(cols)),
        *[
            e
            for j, c in enumerate(cols)
            for e in (
                F.lit(c),
                F.col(f"__nulls_{j}"),
                F.col(f"__min_{j}"),
                F.col(f"__max_{j}"),
                F.col(f"__mean_{j}"),
            )
        ],
    ).alias("column", "n_nulls", "min", "max", "mean")
    return row.select(stacked, F.col("__n").alias("n_rows")).select(
        "column", "n_rows", "n_nulls", "min", "max", "mean"
    )


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
    for j, c in enumerate(cols):
        for i, p in enumerate(probs):
            src = _ref(c).cast("double")
            agg = (
                F.percentile_approx(src, F.lit(p), F.lit(accuracy))
                if approximate
                else F.percentile(src, F.lit(p))
            )
            aggs.append(agg.alias(f"__q_{i}_{j}"))
    row = df.agg(*aggs)
    stacked = F.stack(
        F.lit(len(cols) * len(probs)),
        *[
            e
            for j, c in enumerate(cols)
            for i, p in enumerate(probs)
            for e in (
                F.lit(c),
                F.lit(float(p)),
                F.col(f"__q_{i}_{j}"),
            )
        ],
    ).alias("column", "p", "value")
    return row.select(stacked)
