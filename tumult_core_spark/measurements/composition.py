"""Composition and post-processing of measurements.

``Composition([m1, ..., mk])`` runs every measurement on the same
input; privacy loss adds (PureDP / zCDP scalars; ApproxDP
componentwise) — reference ``measurements/composition.py:20-160``.

``PostProcess(m, f)`` applies an arbitrary DP-free function to a
measurement's output; privacy is unchanged (post-processing theorem) —
reference ``measurements/postprocess.py:14-190``.
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence

from ..exceptions import (
    DomainMismatchError,
    MeasureMismatchError,
    MetricMismatchError,
)
from ..base import Measurement
from ..exact_number import ExactNumber
from ..measures import ApproxDP, PureDP, RhoZCDP


class Composition(Measurement):
    """Run several measurements on the same input; budgets add."""

    def __init__(self, measurements: Sequence[Measurement]):
        if not measurements:
            raise ValueError("Composition requires at least one measurement")
        first = measurements[0]
        # interactivity is checked for EVERY element, including the
        # first: an interactive measurement answered through a
        # non-interactive Composition would hand out a live queryable
        # with no retire cascade (reference composition.py:88 rejects
        # all of them; r16 review found the first element slipping by)
        for m in measurements:
            if m.is_interactive:
                raise ValueError("Cannot compose interactive measurements")
        for m in measurements[1:]:
            if m.input_domain != first.input_domain:
                raise DomainMismatchError(
                    "All measurements must share an input domain"
                )
            if m.input_metric != first.input_metric:
                raise MetricMismatchError(
                    "All measurements must share an input metric"
                )
            if m.output_measure != first.output_measure:
                raise MeasureMismatchError(
                    "All measurements must share an output measure"
                )
        super().__init__(
            first.input_domain, first.input_metric, first.output_measure
        )
        self.measurements = list(measurements)

    def privacy_function(self, d_in: Any) -> Any:
        losses = [m.privacy_function(d_in) for m in self.measurements]
        if isinstance(self.output_measure, ApproxDP):
            eps = sum((ExactNumber(l[0]) for l in losses), ExactNumber(0))
            delta = sum((ExactNumber(l[1]) for l in losses), ExactNumber(0))
            if delta > 1:
                delta = ExactNumber(1)
            return (eps, delta)
        return sum((ExactNumber(l) for l in losses), ExactNumber(0))

    def __call__(self, data: Any) -> List[Any]:
        return [m(data) for m in self.measurements]


class PostProcess(Measurement):
    """Apply a DP-free function to a measurement's output."""

    def __init__(self, measurement: Measurement, f: Callable[[Any], Any]):
        if measurement.is_interactive:
            raise ValueError("Cannot post-process an interactive measurement")
        super().__init__(
            measurement.input_domain,
            measurement.input_metric,
            measurement.output_measure,
        )
        self.measurement = measurement
        self.f = f

    def privacy_function(self, d_in: Any) -> Any:
        return self.measurement.privacy_function(d_in)

    def __call__(self, data: Any) -> Any:
        return self.f(self.measurement(data))


class NonInteractivePostProcess(Measurement):
    """Close an *interactive* measurement behind a driver function.

    ``f`` receives the queryable produced by the interactive
    measurement, drives the whole interaction internally, and returns
    a plain value — it must not leak the queryable.  The result is a
    non-interactive measurement at the interactive measurement's
    budget (reference ``measurements/postprocess.py:93-150``).
    """

    def __init__(self, measurement: Measurement, f: Callable[[Any], Any]):
        if not measurement.is_interactive:
            raise ValueError(
                "Measurement must be interactive; use PostProcess instead"
            )
        super().__init__(
            measurement.input_domain,
            measurement.input_metric,
            measurement.output_measure,
            is_interactive=False,
        )
        self.measurement = measurement
        self.f = f

    def privacy_function(self, d_in: Any) -> Any:
        return self.measurement.privacy_function(d_in)

    def __call__(self, data: Any) -> Any:
        return self.f(self.measurement(data))
