"""Exact (pre-noise) aggregation transformations.

Count / CountDistinct / CountGrouped / CountDistinctGrouped / Sum /
SumGrouped plus dispatch factories.  Grouped variants consume a
:class:`GroupedDataFrame` and emit exactly one row per public key with
0-fill (see ``utils/grouped_dataframe.py``); scalar variants return
numpy scalars.

Parity: reference ``transformations/spark_transformations/agg.py:45-1266``.
Notable semantics preserved:

* ``CountDistinct`` counts null-containing rows as distinct values
  (``df.distinct().count()``, *not* SQL ``count(DISTINCT ...)`` which
  drops nulls) — reference ``agg.py:255``.
* ``Sum`` clips to ``[lower, upper]`` before summing; sensitivity is
  ``max(|lower|, |upper|)`` under SymmetricDifference and
  ``upper - lower`` under HammingDistance (``agg.py:788-801``).
* Empty input sums to 0 (``agg.py:821-822``).
"""

from __future__ import annotations

from typing import Any, Optional, Union

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..base import Transformation
from ..domains import (
    NumpyFloatDomain,
    NumpyIntegerDomain,
    SparkDataFrameDomain,
    SparkFloatColumnDescriptor,
    SparkGroupedDataFrameDomain,
    SparkIntegerColumnDescriptor,
)
from ..exact_number import ExactNumber
from ..metrics import (
    AbsoluteDifference,
    HammingDistance,
    IfGroupedBy,
    Metric,
    OnColumn,
    RootSumOfSquared,
    SumOf,
    SymmetricDifference,
)
from ..utils.grouped_dataframe import GroupedDataFrame

MAX_SUM_BOUND = ExactNumber(2) ** 970  # avoid float overflow in sensitivity math


class Count(Transformation):
    """Total row count -> np.int64."""

    def __init__(self, input_domain: SparkDataFrameDomain, input_metric: Metric):
        if not isinstance(input_metric, (SymmetricDifference, HammingDistance)):
            raise ValueError(f"Unsupported metric {input_metric!r}")
        super().__init__(
            input_domain, input_metric, NumpyIntegerDomain(), AbsoluteDifference()
        )

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        d = ExactNumber(d_in)
        return d * 2 if isinstance(self.input_metric, HammingDistance) else d

    def __call__(self, data: DataFrame) -> np.int64:
        return np.int64(data.count())


class CountDistinct(Transformation):
    """Distinct-row count; rows containing nulls are counted."""

    def __init__(self, input_domain: SparkDataFrameDomain, input_metric: Metric):
        if not isinstance(input_metric, (SymmetricDifference, HammingDistance)):
            raise ValueError(f"Unsupported metric {input_metric!r}")
        super().__init__(
            input_domain, input_metric, NumpyIntegerDomain(), AbsoluteDifference()
        )

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        d = ExactNumber(d_in)
        return d * 2 if isinstance(self.input_metric, HammingDistance) else d

    def __call__(self, data: DataFrame) -> np.int64:
        return np.int64(data.distinct().count())


class CountGrouped(Transformation):
    """Per-group row count with 0-fill for empty public groups."""

    def __init__(
        self,
        input_domain: SparkGroupedDataFrameDomain,
        input_metric: Union[SumOf, RootSumOfSquared],
        count_column: str = "count",
    ):
        if not isinstance(input_metric, (SumOf, RootSumOfSquared)):
            raise ValueError(f"Unsupported metric {input_metric!r}")
        if input_metric.inner_metric != SymmetricDifference():
            raise ValueError("Inner metric must be SymmetricDifference")
        if count_column in input_domain.groupby_columns:
            raise ValueError(f"count_column {count_column!r} collides with a group key")
        out_schema = {
            c: input_domain.schema[c] for c in input_domain.groupby_columns
        }
        out_schema[count_column] = SparkIntegerColumnDescriptor(size=64)
        agg_metric = (
            RootSumOfSquared(AbsoluteDifference())
            if isinstance(input_metric, RootSumOfSquared)
            else SumOf(AbsoluteDifference())
        )
        super().__init__(
            input_domain,
            input_metric,
            SparkDataFrameDomain(out_schema),
            OnColumn(count_column, agg_metric),
        )
        self.count_column = count_column

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        return ExactNumber(d_in)

    def __call__(self, data: GroupedDataFrame) -> DataFrame:
        return data.agg(F.count(F.lit(1)).alias(self.count_column), fill_value=0)


class CountDistinctGrouped(Transformation):
    """Per-group distinct-row count with 0-fill."""

    def __init__(
        self,
        input_domain: SparkGroupedDataFrameDomain,
        input_metric: Union[SumOf, RootSumOfSquared],
        count_column: str = "count_distinct",
    ):
        if not isinstance(input_metric, (SumOf, RootSumOfSquared)):
            raise ValueError(f"Unsupported metric {input_metric!r}")
        if count_column in input_domain.groupby_columns:
            raise ValueError(f"count_column {count_column!r} collides with a group key")
        out_schema = {
            c: input_domain.schema[c] for c in input_domain.groupby_columns
        }
        out_schema[count_column] = SparkIntegerColumnDescriptor(size=64)
        agg_metric = (
            RootSumOfSquared(AbsoluteDifference())
            if isinstance(input_metric, RootSumOfSquared)
            else SumOf(AbsoluteDifference())
        )
        super().__init__(
            input_domain,
            input_metric,
            SparkDataFrameDomain(out_schema),
            OnColumn(count_column, agg_metric),
        )
        self.count_column = count_column

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        return ExactNumber(d_in)

    def __call__(self, data: GroupedDataFrame) -> DataFrame:
        # collect_set over the non-key struct counts null-containing
        # rows (count(DISTINCT) would drop them).
        value_cols = [
            c for c in data.dataframe.columns if c not in data.groupby_columns
        ]
        expr = F.size(F.collect_set(F.struct(*[F.col(c) for c in value_cols])))
        return data.agg(expr.cast("long").alias(self.count_column), fill_value=0)


def _validate_sum_bounds(descriptor, lower, upper):
    lo, hi = ExactNumber(lower), ExactNumber(upper)
    if not lo.is_finite or not hi.is_finite:
        raise ValueError("Sum bounds must be finite")
    if lo > hi:
        raise ValueError(f"lower ({lo}) > upper ({hi})")
    if abs(lo) > MAX_SUM_BOUND or abs(hi) > MAX_SUM_BOUND:
        raise ValueError("Sum bounds exceed 2^970")
    if isinstance(descriptor, SparkIntegerColumnDescriptor):
        if not lo.is_integer or not hi.is_integer:
            raise ValueError("Integer column requires integer bounds")
    return lo, hi


def _check_measure_column(input_domain, measure_column: str):
    schema = (
        input_domain.schema
        if not isinstance(input_domain, SparkGroupedDataFrameDomain)
        else input_domain.schema
    )
    if measure_column not in schema:
        raise ValueError(f"Column {measure_column!r} not in domain")
    desc = schema[measure_column]
    if not isinstance(desc, (SparkIntegerColumnDescriptor, SparkFloatColumnDescriptor)):
        raise ValueError(f"Column {measure_column!r} is not numeric")
    if desc.allow_null:
        raise ValueError(f"Sum requires a null-free column; drop/replace nulls first")
    if isinstance(desc, SparkFloatColumnDescriptor) and (desc.allow_nan or desc.allow_inf):
        raise ValueError("Sum requires NaN/Inf-free column; drop/replace them first")
    return desc


def _clip_expr(column: str, lo: ExactNumber, hi: ExactNumber, is_int: bool):
    if is_int:
        l, u = int(lo.expr), int(hi.expr)
    else:
        # Round the float clip range INWARD (lower up, upper down, as
        # the reference does at agg.py:804-810): the sensitivity claim
        # comes from the EXACT bounds, so the implemented clip must
        # never pass a value outside them — rounding outward would let
        # a value slightly past the exact bound through and the true
        # sensitivity of the implemented function would exceed the
        # claimed one.  For non-float-representable lower == upper the
        # inward rounding inverts the pair; collapse to the lower side
        # (reference TODO(#1023) handling).
        l, u = lo.to_float(round_up=True), hi.to_float(round_up=False)
        if l > u:
            u = l
    c = F.col(column)
    return F.when(c < l, F.lit(l)).when(c > u, F.lit(u)).otherwise(c)


class Sum(Transformation):
    """Clip to [lower, upper], then sum -> numpy scalar."""

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        input_metric: Metric,
        measure_column: str,
        lower,
        upper,
    ):
        if not isinstance(input_metric, (SymmetricDifference, HammingDistance)):
            raise ValueError(f"Unsupported metric {input_metric!r}")
        desc = _check_measure_column(input_domain, measure_column)
        self._is_int = isinstance(desc, SparkIntegerColumnDescriptor)
        self.lower, self.upper = _validate_sum_bounds(desc, lower, upper)
        out_domain = NumpyIntegerDomain() if self._is_int else NumpyFloatDomain()
        super().__init__(input_domain, input_metric, out_domain, AbsoluteDifference())
        self.measure_column = measure_column

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        d = ExactNumber(d_in)
        if isinstance(self.input_metric, HammingDistance):
            return d * (self.upper - self.lower)
        return d * max(abs(self.lower), abs(self.upper))

    def __call__(self, data: DataFrame):
        clipped = _clip_expr(self.measure_column, self.lower, self.upper, self._is_int)
        row = data.select(F.sum(clipped).alias("s")).first()
        value = row["s"]
        if value is None:
            value = 0
        return np.int64(value) if self._is_int else np.float64(value)


class SumGrouped(Transformation):
    """Per-group clipped sum with 0-fill."""

    def __init__(
        self,
        input_domain: SparkGroupedDataFrameDomain,
        input_metric: Union[SumOf, RootSumOfSquared],
        measure_column: str,
        lower,
        upper,
        sum_column: Optional[str] = None,
    ):
        if not isinstance(input_metric, (SumOf, RootSumOfSquared)):
            raise ValueError(f"Unsupported metric {input_metric!r}")
        desc = _check_measure_column(input_domain, measure_column)
        self._is_int = isinstance(desc, SparkIntegerColumnDescriptor)
        self.lower, self.upper = _validate_sum_bounds(desc, lower, upper)
        sum_column = sum_column or f"sum({measure_column})"
        if sum_column in input_domain.groupby_columns:
            raise ValueError(f"sum_column {sum_column!r} collides with a group key")
        out_schema = {
            c: input_domain.schema[c] for c in input_domain.groupby_columns
        }
        out_schema[sum_column] = (
            SparkIntegerColumnDescriptor(size=64)
            if self._is_int
            else SparkFloatColumnDescriptor(size=64)
        )
        agg_metric = (
            RootSumOfSquared(AbsoluteDifference())
            if isinstance(input_metric, RootSumOfSquared)
            else SumOf(AbsoluteDifference())
        )
        super().__init__(
            input_domain,
            input_metric,
            SparkDataFrameDomain(out_schema),
            OnColumn(sum_column, agg_metric),
        )
        self.measure_column = measure_column
        self.sum_column = sum_column

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        return ExactNumber(d_in) * max(abs(self.lower), abs(self.upper))

    def __call__(self, data: GroupedDataFrame) -> DataFrame:
        clipped = _clip_expr(self.measure_column, self.lower, self.upper, self._is_int)
        target = "long" if self._is_int else "double"
        return data.agg(
            F.sum(clipped).cast(target).alias(self.sum_column), fill_value=0
        )


def create_count_aggregation(
    input_domain,
    input_metric,
    count_column: str = "count",
):
    """Dispatch Count vs CountGrouped on the input domain type."""
    if isinstance(input_domain, SparkGroupedDataFrameDomain):
        return CountGrouped(input_domain, input_metric, count_column=count_column)
    return Count(input_domain, input_metric)


def create_count_distinct_aggregation(
    input_domain,
    input_metric,
    count_column: str = "count_distinct",
):
    if isinstance(input_domain, SparkGroupedDataFrameDomain):
        return CountDistinctGrouped(input_domain, input_metric, count_column=count_column)
    return CountDistinct(input_domain, input_metric)


def create_sum_aggregation(
    input_domain,
    input_metric,
    measure_column: str,
    lower,
    upper,
    sum_column: Optional[str] = None,
):
    if isinstance(input_domain, SparkGroupedDataFrameDomain):
        return SumGrouped(
            input_domain, input_metric, measure_column, lower, upper, sum_column
        )
    return Sum(input_domain, input_metric, measure_column, lower, upper)
