"""Metric-conversion transformations (no-ops on data).

Reference ``transformations/converters.py:24-110``.
"""

from __future__ import annotations

from typing import Any

from ..base import Transformation
from ..domains import Domain
from ..exact_number import ExactNumber
from ..metrics import (
    HammingDistance,
    IfGroupedBy,
    RootSumOfSquared,
    SumOf,
    SymmetricDifference,
)


class UnwrapIfGroupedBy(Transformation):
    """``IfGroupedBy(c, SumOf(SymDiff))`` -> ``SymmetricDifference``.

    Total symmetric difference is at most the sum over groups of
    within-group symmetric differences, so stability is 1.
    """

    def __init__(self, domain: Domain, input_metric: IfGroupedBy):
        if not isinstance(input_metric, IfGroupedBy) or not isinstance(
            input_metric.inner_metric, (SumOf, SymmetricDifference)
        ):
            raise ValueError(
                "input metric must be IfGroupedBy(c, SumOf(SymmetricDifference()))"
            )
        super().__init__(domain, input_metric, domain, SymmetricDifference())

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        return ExactNumber(d_in)

    def __call__(self, data: Any) -> Any:
        return data


class HammingDistanceToSymmetricDifference(Transformation):
    """Hamming -> SymmetricDifference; one changed row = one add + one
    remove, so d_out = 2 * d_in."""

    def __init__(self, domain: Domain):
        super().__init__(
            domain, HammingDistance(), domain, SymmetricDifference()
        )

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        return ExactNumber(d_in) * 2

    def __call__(self, data: Any) -> Any:
        return data
