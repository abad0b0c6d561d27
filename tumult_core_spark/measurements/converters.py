"""Measure conversion wrappers.

``PureDPToRhoZCDP``: eps-DP implies (eps^2)/2-zCDP.
``PureDPToApproxDP``: eps-DP implies (eps, 0)-approxDP.
``RhoZCDPToApproxDP``: rho-zCDP implies (rho + 2 sqrt(rho ln(1/delta)),
delta)-approxDP for any delta > 0 (Bun & Steinke 2016, Prop. 1.3).

Reference: ``tmlt/core/measurements/converters.py:17-230``.
"""

from __future__ import annotations

from typing import Any

import sympy as sp

from ..base import Measurement
from ..exact_number import ExactNumber
from ..measures import ApproxDP, PureDP, RhoZCDP


class PureDPToApproxDP(Measurement):
    """Reinterpret an eps-DP measurement as (eps, 0)-approxDP."""

    def __init__(self, measurement: Measurement):
        if not isinstance(measurement.output_measure, PureDP):
            raise ValueError("Inner measurement must be PureDP")
        super().__init__(
            measurement.input_domain,
            measurement.input_metric,
            ApproxDP(),
            measurement.is_interactive,
        )
        self.measurement = measurement

    def privacy_function(self, d_in: Any):
        eps = ExactNumber(self.measurement.privacy_function(d_in))
        return (eps, ExactNumber(0))

    def __call__(self, data: Any) -> Any:
        return self.measurement(data)


class PureDPToRhoZCDP(Measurement):
    """Reinterpret an eps-DP measurement as (eps^2/2)-zCDP."""

    def __init__(self, measurement: Measurement):
        if not isinstance(measurement.output_measure, PureDP):
            raise ValueError("Inner measurement must be PureDP")
        super().__init__(
            measurement.input_domain,
            measurement.input_metric,
            RhoZCDP(),
            measurement.is_interactive,
        )
        self.measurement = measurement

    def privacy_function(self, d_in: Any) -> ExactNumber:
        eps = ExactNumber(self.measurement.privacy_function(d_in))
        return eps**2 / 2

    def __call__(self, data: Any) -> Any:
        return self.measurement(data)


class RhoZCDPToApproxDP(Measurement):
    """Reinterpret a rho-zCDP measurement as (eps(delta), delta)-approxDP."""

    def __init__(self, measurement: Measurement, delta: Any):
        if not isinstance(measurement.output_measure, RhoZCDP):
            raise ValueError("Inner measurement must be RhoZCDP")
        self.delta = ExactNumber(delta)
        if self.delta <= 0 or self.delta > 1:
            raise ValueError("delta must be in (0, 1]")
        super().__init__(
            measurement.input_domain,
            measurement.input_metric,
            ApproxDP(),
            measurement.is_interactive,
        )
        self.measurement = measurement

    def privacy_function(self, d_in: Any):
        rho = ExactNumber(self.measurement.privacy_function(d_in))
        if not rho.is_finite:
            return (rho, self.delta)
        if rho == 0:
            return (ExactNumber(0), self.delta)
        eps = rho.expr + 2 * sp.sqrt(rho.expr * sp.log(1 / self.delta.expr))
        return (ExactNumber(eps), self.delta)

    def __call__(self, data: Any) -> Any:
        return self.measurement(data)
