"""Noise-scale calculation from (d_in, d_out, measure).

Solved exactly so budget arithmetic composes without rounding
(reference ``tmlt/core/utils/parameters.py:17-60``):

* PureDP (additive mechanisms Laplace / two-sided geometric):
  ``scale = d_in / epsilon``.
* RhoZCDP (Gaussian / discrete Gaussian): ``sigma^2 = d_in^2 / (2 rho)``.
"""

from __future__ import annotations

from ..exact_number import ExactNumber, ExactNumberInput
from ..measures import Measure, PureDP, RhoZCDP


def calculate_noise_scale(
    d_in: ExactNumberInput, d_out: ExactNumberInput, output_measure: Measure
) -> ExactNumber:
    d_in_e = ExactNumber(d_in)
    d_out_e = ExactNumber(d_out)
    if d_in_e < 0:
        raise ValueError("d_in must be >= 0")
    if d_out_e <= 0:
        if d_out_e == 0:
            return ExactNumber(float("inf")) if d_in_e > 0 else ExactNumber(0)
        raise ValueError("d_out must be >= 0")
    if d_in_e == 0:
        return ExactNumber(0)
    if isinstance(output_measure, PureDP):
        return d_in_e / d_out_e
    if isinstance(output_measure, RhoZCDP):
        return d_in_e**2 / (d_out_e * 2)
    raise ValueError(f"Unsupported measure {output_measure!r}")
