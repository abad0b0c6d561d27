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
    """``IfGroupedBy(c, SumOf/RootSumOfSquared(SymDiff))`` ->
    ``SymmetricDifference`` (reference ``converters.py:24-78``).

    Total symmetric difference is at most the sum over groups of
    within-group symmetric differences, so stability is ``d_in`` under
    SumOf; under RootSumOfSquared it is ``d_in**2``: per-group
    contributions are nonnegative INTEGERS, so their L1 sum is at most
    the sum of their squares, i.e. at most the L2 norm squared.  The
    plain
    ``IfGroupedBy(c, SymmetricDifference())`` inner metric is REFUSED
    (as in the reference): its distance counts groups, and a single
    added group may contain unboundedly many rows, so no finite
    row-level stability exists.
    """

    def __init__(self, domain: Domain, input_metric: IfGroupedBy):
        if not isinstance(input_metric, IfGroupedBy) or not isinstance(
            input_metric.inner_metric, (SumOf, RootSumOfSquared)
        ):
            raise ValueError(
                "input metric must be IfGroupedBy(c, "
                "SumOf/RootSumOfSquared(SymmetricDifference())) — the plain "
                "SymmetricDifference inner metric counts groups of unbounded "
                "size and admits no finite row-level stability"
            )
        # RootSumOfSquared subclasses SumOf: check the subclass first
        self._is_l2 = isinstance(input_metric.inner_metric, RootSumOfSquared)
        super().__init__(domain, input_metric, domain, SymmetricDifference())

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        d = ExactNumber(d_in)
        return d * d if self._is_l2 else d

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
