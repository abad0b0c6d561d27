"""Per-group contribution bounding transformations.

``LimitRowsPerGroup`` / ``LimitKeysPerGroup`` / ``LimitRowsPerKeyPerGroup``
convert an ``IfGroupedBy`` metric into a bounded-contribution metric by
deterministically truncating each group (hash ordering — see
``utils/truncation.py``).  Stabilities per reference
``transformations/spark_transformations/truncation.py:18-576``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from ..base import Transformation
from ..domains import SparkDataFrameDomain
from ..exact_number import ExactNumber
from ..metrics import (
    IfGroupedBy,
    Metric,
    RootSumOfSquared,
    SumOf,
    SymmetricDifference,
)
from ..utils.truncation import limit_keys_per_group, truncate_large_groups


def _validate_grouping_column(
    domain: SparkDataFrameDomain, column: str
) -> None:
    """The IfGroupedBy column must exist (otherwise the failure is a
    late Spark AnalysisException inside the truncation job) and must
    not be float-typed (forbidden by the metric — metrics.py:204,
    reference metrics.py:998 — since Spark's -0.0/NaN grouping
    normalization diverges from the metric's multiset semantics)."""
    from ..domains import SparkFloatColumnDescriptor

    if column not in domain.schema:
        raise ValueError(
            f"IfGroupedBy column {column!r} is not in the input domain"
        )
    if isinstance(domain[column], SparkFloatColumnDescriptor):
        raise ValueError(
            f"IfGroupedBy on float column {column!r} is not supported"
        )


class LimitRowsPerGroup(Transformation):
    """Keep at most ``threshold`` rows per group.

    Metric: ``IfGroupedBy(col, SymmetricDifference) ->
    SymmetricDifference``; stability ``threshold * d_in``.
    """

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        input_metric: IfGroupedBy,
        threshold: int,
    ):
        if not isinstance(input_metric, IfGroupedBy) or not isinstance(
            input_metric.inner_metric, SymmetricDifference
        ):
            raise ValueError(
                "input metric must be IfGroupedBy(col, SymmetricDifference())"
            )
        if threshold < 0:
            raise ValueError("threshold must be >= 0")
        _validate_grouping_column(input_domain, input_metric.column)
        super().__init__(
            input_domain, input_metric, input_domain, SymmetricDifference()
        )
        self.threshold = threshold
        self.grouping_column = input_metric.column

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        return ExactNumber(d_in) * self.threshold

    def __call__(self, data: DataFrame) -> DataFrame:
        return truncate_large_groups(data, [self.grouping_column], self.threshold)


class LimitKeysPerGroup(Transformation):
    """Keep rows for at most ``threshold`` distinct keys per group.

    Input metric: ``IfGroupedBy(group, SymmetricDifference)`` (a
    changed group counts 2, a wholly added/removed one counts 1).
    Output metric — the three reference options
    (``truncation.py:255-358``), selected via ``output_metric``:

    * ``IfGroupedBy(key, SumOf(IfGroupedBy(group, SymmetricDifference())))``
      (the DEFAULT, and the metric :class:`LimitRowsPerKeyPerGroup`
      chains from) — stability ``threshold * d_in``: each unit of
      input group distance touches at most ``threshold`` key slices,
      contributing 1 per (key, group) subgroup it adds/removes.
    * ``IfGroupedBy(key, RootSumOfSquared(IfGroupedBy(group,
      SymmetricDifference())))`` — stability ``sqrt(threshold) * d_in``
      (the L2 form for zCDP parallel composition).
    * ``IfGroupedBy(group, SymmetricDifference())`` — stability
      ``d_in`` (truncation is per-group deterministic, so a changed
      group maps to a changed group).

    The pre-r5 output metric ``IfGroupedBy(key, SymmetricDifference())``
    at stability ``threshold * d_in`` was UNSOUND by a factor of 2
    under that metric's changed-group-counts-2 semantics (a wholly
    replaced input group can swap all ``threshold`` kept keys, each a
    +2 "changed" key group when other groups share those keys); it is
    no longer offered.
    """

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        input_metric: IfGroupedBy,
        key_column: str,
        threshold: int,
        output_metric: Metric = None,
    ):
        if not isinstance(input_metric, IfGroupedBy) or not isinstance(
            input_metric.inner_metric, SymmetricDifference
        ):
            raise ValueError(
                "input metric must be IfGroupedBy(col, SymmetricDifference())"
            )
        if key_column not in input_domain.schema:
            raise ValueError(f"Key column {key_column!r} not in domain")
        if key_column == input_metric.column:
            raise ValueError("Grouping and key columns must be different")
        if threshold < 0:
            raise ValueError("threshold must be >= 0")
        _validate_grouping_column(input_domain, input_metric.column)
        grouping_column = input_metric.column
        if output_metric is None:
            output_metric = IfGroupedBy(
                key_column,
                SumOf(IfGroupedBy(grouping_column, SymmetricDifference())),
            )
        valid = [
            IfGroupedBy(
                key_column,
                SumOf(IfGroupedBy(grouping_column, SymmetricDifference())),
            ),
            IfGroupedBy(
                key_column,
                RootSumOfSquared(
                    IfGroupedBy(grouping_column, SymmetricDifference())
                ),
            ),
            IfGroupedBy(grouping_column, SymmetricDifference()),
        ]
        if output_metric not in valid:
            raise ValueError(
                f"Unsupported output metric {output_metric!r}; must be one "
                f"of {valid!r}"
            )
        super().__init__(input_domain, input_metric, input_domain, output_metric)
        self.threshold = threshold
        self.key_column = key_column
        self.grouping_column = grouping_column

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        d = ExactNumber(d_in)
        if self.output_metric == IfGroupedBy(
            self.grouping_column, SymmetricDifference()
        ):
            return d
        if isinstance(self.output_metric.inner_metric, RootSumOfSquared):
            return d * ExactNumber(self.threshold) ** ExactNumber("1/2")
        return d * self.threshold

    def __call__(self, data: DataFrame) -> DataFrame:
        return limit_keys_per_group(
            data, [self.grouping_column], [self.key_column], self.threshold
        )


class LimitRowsPerKeyPerGroup(Transformation):
    """Keep at most ``threshold`` rows per (group, key) pair.

    Accepts the three reference input metrics
    (``truncation.py:440-571``), inferring the grouping column from
    the metric shape:

    * ``IfGroupedBy(group, SymmetricDifference)`` -> same metric out,
      stability ``d_in`` (the metric counts *groups* whose contents
      differ, and deterministic per-group truncation maps a changed
      group to a changed group).
    * ``IfGroupedBy(key, SumOf(IfGroupedBy(group, SymmetricDifference())))``
      (what :class:`LimitKeysPerGroup` emits) -> ``SymmetricDifference``
      out, stability ``threshold * d_in``: each unit of the input
      distance is one added/removed (key, group) subgroup, which after
      truncation holds at most ``threshold`` rows.
    * ``IfGroupedBy(key, RootSumOfSquared(IfGroupedBy(group,
      SymmetricDifference())))`` -> ``IfGroupedBy(key,
      RootSumOfSquared(SymmetricDifference()))`` out, stability
      ``threshold * d_in``.
    """

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        input_metric: IfGroupedBy,
        key_column: str,
        threshold: int,
    ):
        if not isinstance(input_metric, IfGroupedBy):
            raise ValueError("input metric must be IfGroupedBy")
        if key_column not in input_domain.schema:
            raise ValueError(f"Key column {key_column!r} not in domain")
        if threshold < 0:
            raise ValueError("threshold must be >= 0")
        inner = input_metric.inner_metric
        if isinstance(inner, SymmetricDifference):
            grouping_column = input_metric.column
            output_metric: Metric = IfGroupedBy(
                grouping_column, SymmetricDifference()
            )
            self._per_unit = False
        elif (
            isinstance(inner, (SumOf, RootSumOfSquared))
            and isinstance(inner.inner_metric, IfGroupedBy)
            and isinstance(inner.inner_metric.inner_metric, SymmetricDifference)
        ):
            if input_metric.column != key_column:
                raise ValueError(
                    "For the nested metric form, the outer IfGroupedBy "
                    f"column must be the key column {key_column!r}"
                )
            grouping_column = inner.inner_metric.column
            # RootSumOfSquared subclasses SumOf — check it FIRST
            output_metric = (
                IfGroupedBy(key_column, RootSumOfSquared(SymmetricDifference()))
                if isinstance(inner, RootSumOfSquared)
                else SymmetricDifference()
            )
            self._per_unit = True
        else:
            raise ValueError(
                "input metric must be IfGroupedBy(group, "
                "SymmetricDifference()) or IfGroupedBy(key, "
                "SumOf/RootSumOfSquared(IfGroupedBy(group, "
                "SymmetricDifference())))"
            )
        if grouping_column == key_column:
            raise ValueError("Grouping and key columns must be different")
        _validate_grouping_column(input_domain, grouping_column)
        super().__init__(input_domain, input_metric, input_domain, output_metric)
        self.threshold = threshold
        self.key_column = key_column
        self.grouping_column = grouping_column

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        d = ExactNumber(d_in)
        return d * self.threshold if self._per_unit else d

    def __call__(self, data: DataFrame) -> DataFrame:
        return truncate_large_groups(
            data, [self.grouping_column, self.key_column], self.threshold
        )
