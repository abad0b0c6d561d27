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
from ..metrics import IfGroupedBy, Metric, SumOf, SymmetricDifference
from ..utils.truncation import limit_keys_per_group, truncate_large_groups


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

    Metric: ``IfGroupedBy(group, SymmetricDifference) ->
    IfGroupedBy(key, SymmetricDifference)``; stability
    ``threshold * d_in``.
    """

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        input_metric: IfGroupedBy,
        key_column: str,
        threshold: int,
    ):
        if not isinstance(input_metric, IfGroupedBy) or not isinstance(
            input_metric.inner_metric, SymmetricDifference
        ):
            raise ValueError(
                "input metric must be IfGroupedBy(col, SymmetricDifference())"
            )
        if key_column not in input_domain.schema:
            raise ValueError(f"Key column {key_column!r} not in domain")
        if threshold < 0:
            raise ValueError("threshold must be >= 0")
        super().__init__(
            input_domain,
            input_metric,
            input_domain,
            IfGroupedBy(key_column, SymmetricDifference()),
        )
        self.threshold = threshold
        self.key_column = key_column
        self.grouping_column = input_metric.column

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        return ExactNumber(d_in) * self.threshold

    def __call__(self, data: DataFrame) -> DataFrame:
        return limit_keys_per_group(
            data, [self.grouping_column], [self.key_column], self.threshold
        )


class LimitRowsPerKeyPerGroup(Transformation):
    """Keep at most ``threshold`` rows per (group, key) pair.

    Metric: ``IfGroupedBy(group, SymmetricDifference) ->
    IfGroupedBy(group, SymmetricDifference)``.  The metric counts
    *groups* whose contents differ, and deterministic per-group
    truncation maps a changed group to a changed group, so stability
    is ``d_in`` (reference ``truncation.py:553-570``).
    """

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        input_metric: IfGroupedBy,
        key_column: str,
        threshold: int,
    ):
        if not isinstance(input_metric, IfGroupedBy) or not isinstance(
            input_metric.inner_metric, SymmetricDifference
        ):
            raise ValueError(
                "input metric must be IfGroupedBy(col, SymmetricDifference())"
            )
        if key_column not in input_domain.schema:
            raise ValueError(f"Key column {key_column!r} not in domain")
        if threshold < 0:
            raise ValueError("threshold must be >= 0")
        super().__init__(
            input_domain,
            input_metric,
            input_domain,
            IfGroupedBy(input_metric.column, SymmetricDifference()),
        )
        self.threshold = threshold
        self.key_column = key_column
        self.grouping_column = input_metric.column

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        return ExactNumber(d_in)

    def __call__(self, data: DataFrame) -> DataFrame:
        return truncate_large_groups(
            data, [self.grouping_column, self.key_column], self.threshold
        )
